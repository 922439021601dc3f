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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val nScans = "Scan parquet".r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
          .count(m => !m.contains("PushedFilters: []"))
        val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
        val nSMJ = "SortMergeJoin".r.findAllIn(plan).length
        val nExchange = "Exchange".r.findAllIn(plan).length
        val nWSCG = "WholeStageCodegen".r.findAllIn(plan).length
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
