package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the dedup_lsh_grown scale outlier. */
object ProbeLshGrown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/gendata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-lsh").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val table = t("ensureGrown (build or reuse)")(
      graft.operators.MinHash.ensureGrownShingleIndex(spark, dir))
    val store = spark.table(table)
    t("store scan")(noop(store))
    val repSh = store.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("shingles"))
    val sigs = repSh.select(col("doc_id"),
      graft.functions.functions.minhash_sig(col("shingles"), 128).as("sig"))
    t("sig")(noop(sigs))
    t("bands")(noop(graft.operators.MinHash.bands(sigs)))
    t("full probe")(noop(graft.operators.MinHash.minhashDedupBucketed(spark, dir, table)))
    t("full probe again")(noop(graft.operators.MinHash.minhashDedupBucketed(spark, dir, table)))
    spark.stop()
  }
}
