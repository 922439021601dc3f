package graft.tools
import org.apache.spark.sql.SparkSession

/** Quick per-query physical-plan audit: one summary line (exchange /
  * join / aggregate / window counts) plus the join-and-aggregate lines
  * of the executed plan, for the queries named on the command line —
  * the fast loop for "is this the plan I'd want at 100 TB" while
  * [[PlanDump]] remains the exhaustive formatted dump.
  *
  *   sbt "runMain graft.tools.PlanCheck dedup_fuzzy_names text_dsir_topk"
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def count(s: String) = plan.sliding(s.length).count(_ == s)
      println(s"=== $name: exchanges=${count("Exchange")} bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} objhash=${count("ObjectHashAggregate")} sortagg=${count("SortAggregate")} wscg=${count("WholeStageCodegen")} window=${count("Window")}")
      println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Aggregate") || l.contains("Exchange") || l.contains("Sort ")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
