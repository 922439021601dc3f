package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * Each query is forced through the `noop` sink — a plain `.count()`
  * would let Catalyst prune away all per-row expression work (project
  * pushdown makes counting free), which benchmarks the scan instead of
  * the operator.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadAvg()

    // JVM/codegen warmup on the smallest sf so first-query JIT noise
    // doesn't land on a measured query
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // SPARK_GRAFT_BENCH_REPEATS > 1 reports the per-query MINIMUM over N
    // passes — the BASELINE.md protocol for filtering machine noise; the
    // driver's per-round run keeps the default single pass.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "1").toInt
    // per-query UTC wall-clock provenance on stderr: if an external load
    // spike inflates a contiguous block of queries (seen in two driver
    // rounds), the timestamps localize the noise window directly instead
    // of requiring forensic analysis of the alphabetical ordering
    def nowUtc(): String = java.time.Instant.now().toString
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val startedAt = nowUtc()
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[bench] $startedAt $name%-28s ${times.min}%8.3f s (min of $repeats)")
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = loadAvg()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","load_start":$loadStart%.2f,"load_end":$loadEnd%.2f}""")
    // Short headline line LAST: the driver's capture has truncated the
    // long per-query line head-first in past rounds, losing `"total"`.
    // Anything tail-anchored keeps this parseable summary. Distinct
    // metric name so a consumer grepping "total" never double-counts.
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""{"metric":"total_summary","value":$total%.3f,"unit":"sec","n_queries":${results.size},"slowest":$slowest,"sf":"$sfDir","load_start":$loadStart%.2f,"load_end":$loadEnd%.2f}""")
    spark.stop()
  }

  /** 1-minute load average — recorded at start/end of the run so a
    * noisy benchmark (external load inflating a block of queries, seen
    * in two driver rounds) self-identifies in the JSON instead of
    * requiring forensic timestamp analysis. -1 if unavailable.
    */
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }
}
