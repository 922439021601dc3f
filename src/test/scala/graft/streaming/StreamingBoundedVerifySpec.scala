package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.provider.NoRetryStrategy

/** Bounded-state verify (`dropDuplicatesWithinWatermark`): within the
  * dedup window a pair verifies once; after the watermark passes the
  * window, its state is reclaimed and a re-surfacing pair re-verifies —
  * the documented at-least-once-with-bounded-state tradeoff.
  */
class StreamingBoundedVerifySpec extends SparkSpec {
  import StreamingNearDup._

  private def t(s: String) = Timestamp.valueOf(s)
  private val shared =
    "the quick brown fox jumps over the lazy dog and keeps on running far away"

  test("pair verifies once within the window; band TTL ages docs out of candidates") {
    implicit val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext

    val root = java.nio.file.Files.createTempDirectory("bverify-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bverify-ckpt").toString
    val allDocs = Seq(
      Doc(1L, shared, t("2024-01-01 00:00:00")),
      Doc(7L, shared, t("2024-01-01 00:00:30")),
      Doc(9L, shared, t("2024-01-01 00:00:40")))
    val store = graft.operators.MinHash.shingleArray(
      allDocs.toDF("doc_id", "text", "event_time"))
    val sink = new ExactlyOnceSink(root, "parquet", new NoRetryStrategy)

    val input = MemoryStream[Doc]
    // chained-stateful topology: the conservative global-watermark check
    // must be off (see verifiedPairsBounded scaladoc); restore after
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prior = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
      // band TTL 5 min, dedup window 10 min — candidate state and pair
      // state are both watermark-reclaimed
      val q = StreamingVerify.verifiedPairsBounded(
        StreamingNearDup.candidatesTimed(input.toDS(), ttlMillis = 300_000,
          watermarkDelay = "0 seconds"),
        store, sink, ckpt, withinWatermark = "10 minutes")
      try {
        input.addData(allDocs(0))
        q.processAllAvailable()
        input.addData(allDocs(1)) // near-dup of doc 1, 30s later: one pair
        q.processAllAvailable()
        // the same pair again via doc 9 would be (1,9)/(7,9) — new pairs;
        // (1,7) must NOT re-verify inside the window
        input.addData(allDocs(2))
        q.processAllAvailable()
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(checkKey, v)
      case None    => spark.conf.unset(checkKey)
    }

    val pairs = spark.read.parquet(root)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs.count(_ == (1L, 7L)) === 1, s"got $pairs")
    assert(pairs.contains((1L, 9L)) && pairs.contains((7L, 9L)))
    assert(pairs.distinct.size === pairs.size)
  }
}
