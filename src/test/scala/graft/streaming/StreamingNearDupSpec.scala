package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming LSH candidates: cross-batch matching via band state. */
class StreamingNearDupSpec extends SparkSpec {
  import StreamingNearDup._

  private def t(s: String) = Timestamp.valueOf(s)
  private val shared =
    "the quick brown fox jumps over the lazy dog and keeps on running far away"

  test("near-dup docs match across batches; unrelated docs never pair") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Doc]
    val q = candidates(input.toDS())
      .writeStream.format("memory").queryName("cand").outputMode("append").start()
    try {
      input.addData(Doc(1L, shared, t("2024-01-01 00:00:00")),
                    Doc(50L, "completely different words about astronomy telescopes and galaxies spinning", t("2024-01-01 00:00:01")))
      q.processAllAvailable()
      assert(spark.table("cand").count() === 0) // nothing matches yet
      // a near-identical doc arrives two batches later
      input.addData(Doc(99L, "unrelated payload text goes here with many extra tokens for padding", t("2024-01-01 00:01:00")))
      q.processAllAvailable()
      input.addData(Doc(7L, shared, t("2024-01-01 00:02:00")))
      q.processAllAvailable()
      val pairs = spark.table("cand").as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).distinct
      assert(pairs.toSeq === Seq((1L, 7L))) // matched across batches, ordered a<b
    } finally q.stop()
  }

  test("band TTL: a dup arriving after expiry is NOT matched; within TTL it is") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Doc]
    val q = candidates(input.toDS(), ttlMillis = 60_000) // 1 min bands
      .writeStream.format("memory").queryName("candttl").outputMode("append").start()
    try {
      input.addData(Doc(1L, shared, t("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // within TTL: match
      input.addData(Doc(2L, shared, t("2024-01-01 00:00:30")))
      q.processAllAvailable()
      assert(spark.table("candttl").as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).distinct.toSeq === Seq((1L, 2L)))
      // push the watermark well past expiry (re-armed at 00:00:30 + 1 min)
      input.addData(Doc(100L, "a b c d e f g h i j k l m n o p q r s", t("2024-01-01 00:05:00")))
      q.processAllAvailable()
      input.addData(Doc(101L, "z y x w v u t s r q p o n m l k j i h", t("2024-01-01 00:05:10")))
      q.processAllAvailable()
      input.addData(Doc(102L, "alpha bravo charlie delta echo foxtrot golf hotel india", t("2024-01-01 00:05:20")))
      q.processAllAvailable()
      // the shared-band state is gone: a new duplicate starts fresh
      input.addData(Doc(3L, shared, t("2024-01-01 00:05:30")))
      q.processAllAvailable()
      val pairs = spark.table("candttl").as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).distinct.toSet
      assert(pairs === Set((1L, 2L))) // no (1,3)/(2,3): docs aged out
    } finally q.stop()
  }

  test("identical docs in ONE batch pair up; band cap bounds a degenerate band") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val input = MemoryStream[Doc]
    val q = candidates(input.toDS(), maxDocsPerBand = 3)
      .writeStream.format("memory").queryName("cand2").outputMode("append").start()
    try {
      input.addData((1 to 10).map(i => Doc(i.toLong, shared, t("2024-01-01 00:00:00"))): _*)
      q.processAllAvailable()
      val pairs = spark.table("cand2").as[CandPair].collect()
        .map(p => (p.doc_a, p.doc_b)).distinct
      assert(pairs.nonEmpty)
      pairs.foreach { case (a, b) => assert(a < b) }
      // cap: with 3 stored docs per band, pair count stays far below the
      // uncapped 10*9/2 per band
      assert(pairs.length < 45)
    } finally q.stop()
  }
}
