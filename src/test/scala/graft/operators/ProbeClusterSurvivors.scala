package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the dedup_cluster_survivors sf1 outlier
  * (12.7× in the round-8 drill): times each stage of the near-dup
  * family build and then the cluster-survivors readout twice, so the
  * build cost and the per-run (memo-hit) cost separate.
  */
object ProbeClusterSurvivors {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/gendata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-cs").config("spark.sql.shuffle.partitions", "32")
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
    t("shingle_array memo")(noop(
      MinHash.cachedShingleArray(spark, dir)))
    t("dup_classes memo")(noop(
      MinHash.cachedDupClasses(spark, dir)))
    t("verified_pairs memo")(noop(
      MinHash.verifiedPairs(spark, dir)))
    t("cluster_labels memo")(noop(
      MinHash.clusterLabels(spark, dir, 0.5)))
    t("clusterSurvivors run 1")(noop(
      MinHash.clusterSurvivors(spark, dir)))
    t("clusterSurvivors run 2")(noop(
      MinHash.clusterSurvivors(spark, dir)))
    t("clusterSurvivors run 3")(noop(
      MinHash.clusterSurvivors(spark, dir)))
    spark.stop()
  }
}
