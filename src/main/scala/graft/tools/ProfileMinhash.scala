package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.MinHash
import graft.Tables

/** Dev profiler: times each stage of the minhash pipeline. */
object ProfileMinhash {
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
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val sh = MinHash.shingles(docs)
    time("shingles")(sh.count())
    time("signatures")(MinHash.signatures(docs).count())
    time("bands")(MinHash.bands(MinHash.signatures(docs)).count())
    time("candidatePairs")(MinHash.candidatePairs(
      MinHash.bands(MinHash.signatures(docs))).count())
    val cand = MinHash.candidatePairs(MinHash.bands(MinHash.signatures(docs)))
    time("exactJaccard")(MinHash.exactJaccard(cand, sh).count())
    time("full minhashDedup")(MinHash.minhashDedup(spark, dir).count())
    time("ngramJaccard")(MinHash.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
