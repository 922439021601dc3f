package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.operators.MinHash
import graft.Tables

/** Dev profiler: isolate why the shingle self-join is slow. */
object ProfileJaccard {
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

    // variant A: raw self-join of freshly-built shingles (current shape)
    val shA = MinHash.shingles(docs)
    time("selfjoin fresh sh") {
      shA.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(shA.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").count().count()
    }

    // variant B: persisted shingles
    val shB = MinHash.shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    time("materialize sh")(shB.count())
    time("selfjoin persisted sh") {
      shB.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(shB.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").count().count()
    }

    // variant C: explicit repartition by shingle before join
    time("selfjoin repartitioned") {
      val s = shB.repartition(col("shingle"))
      s.select(col("doc_id").as("doc_a"), col("shingle"))
        .join(s.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").count().count()
    }

    val plan = shB.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(shB.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").count()
    println(plan.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
