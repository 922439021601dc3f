package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.MinHash
import graft.Tables

/** Dev profiler: exactJaccard composition. */
object ProfileJaccard2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val sh = MinHash.shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    val cand = MinHash.candidatePairs(MinHash.bands(MinHash.signatures(docs)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("materialize sh")(sh.count())
    time("materialize cand")(cand.count())
    val ej = MinHash.exactJaccard(cand, sh)
    time("exactJaccard persisted")(ej.count())
    println("===PLAN===")
    println(ej.queryExecution.executedPlan.toString.take(6000))
    time("full minhashDedup")(MinHash.minhashDedup(spark, dir).count())
    spark.stop()
  }
}
