package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump formatted physical plans for every registered query to
  * a file, plus a per-query one-line audit (pushdown, broadcast, codegen).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off for the AUDIT ONLY: an unfinalized AdaptiveSparkPlan hides
      // codegen ids and runtime join selections, so the static plan is the
      // honest thing to read here. Bench/Verify keep AQE on.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // FormattedMode lists every operator once in the tree and once in
        // the details section — count tree nodes ("(n) Op") only; codegen
        // spans appear as "[codegen id : k]".
        val nScans = "\\(\\d+\\) Scan parquet".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).length
        val nBroadcast = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).length
        val nSMJ = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).length
        val nExchange = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
        val nWSCG = "codegen id : (\\d+)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        println(f"[plan] $name%-26s scans=$nScans pushedFilterScans=$pushed bhj=$nBroadcast smj=$nSMJ exchanges=$nExchange wscg=$nWSCG")
        sb.append(s"\n================ $name ================\n").append(plan)
      } catch { case e: Throwable =>
        println(s"[plan] $name FAILED: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
