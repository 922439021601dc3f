package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOf

/** The custom as-of merge operator: identical rows to the composed
  * union+window formulation, with the intended physical shape (one
  * exchange per side, a single AsOfMergeJoinExec, no window exec).
  */
class AsOfMergeJoinSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("planted fixture: ≤ semantics, max-(time,id) tie-break, null when no match") {
    val s = spark; import s.implicits._
    val left = Seq(
      ("k1", t("2024-01-01 00:00:10"), 100L),
      ("k1", t("2024-01-01 00:00:20"), 101L),
      ("k2", t("2024-01-01 00:00:05"), 102L), // before any right row
      ("k3", t("2024-01-01 00:00:30"), 103L)  // key absent on the right
    ).toDF("key", "ts", "id")
    val right = Seq(
      ("k1", t("2024-01-01 00:00:10"), 1L, 11L), // same-ts: matches (≤)
      ("k1", t("2024-01-01 00:00:10"), 2L, 12L), // same key+ts: max id wins
      ("k1", t("2024-01-01 00:00:15"), 3L, 13L),
      ("k2", t("2024-01-01 00:00:06"), 4L, 14L)  // after the only k2 left row
    ).toDF("key", "ts", "id", "v")
    val got = AsOfMergeJoin.asOf(left, right, Seq("key"), "ts", "id", "v")
      .select("key", "id", "asof_v").as[(String, Long, Option[Long])]
      .collect().toSet
    assert(got === Set(
      ("k1", 100L, Some(12L)), // ≤ at equal ts; (ts,id)-max of the two
      ("k1", 101L, Some(13L)),
      ("k2", 102L, None),
      ("k3", 103L, None)))
    // and the composed formulation agrees on the same fixture
    val composed = AsOf.asOfJoin(left, right.withColumnRenamed("v", "rv"),
        Seq("key"), "ts", "id", "rv")
      .select(col("key"), col("id"), col("asof_rv").as("asof_v"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(composed === got)
  }

  test("attribution via exec ≡ composed attribution on the events table") {
    val a = AsOf.purchaseAttribution(spark, sfDir).collect().toSet
    val b = AsOf.purchaseAttributionExec(spark, sfDir).collect().toSet
    assert(a.nonEmpty && a === b)
  }

  test("physical shape: one AsOfMergeJoinExec, one exchange per side, no window") {
    val df = AsOf.purchaseAttributionExec(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n${plan.take(800)}")
    assert(!plan.contains("Window"), s"window machinery crept back in:\n${plan.take(800)}")
    assert("Exchange".r.findAllIn(plan).size === 2,
      s"expected exactly two exchanges (one per side):\n${plan.take(1200)}")
  }

  test("property: exec ≡ composed on random keyed time series (ties, gaps, lone keys)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = spark; import s.implicits._
    val keyGen = Gen.oneOf("k1", "k2", "k3", "k4", "k5")
    // coarse 0..12 offsets force plenty of same-timestamp collisions
    def rowsGen(n: Int) = Gen.listOfN(n,
      Gen.zip(keyGen, Gen.chooseNum(0L, 12L)))
    (1 to 6).foreach { i =>
      val params = Gen.Parameters.default
      def ts(off: Long) =
        java.sql.Timestamp.from(t("2024-01-01 00:00:00").toInstant.plusSeconds(off))
      val lRows = rowsGen(40).apply(params, Seed(100L + i)).get
        .zipWithIndex.map { case ((k, off), ix) => (k, ts(off), ix.toLong) }
      val rRows = rowsGen(40).apply(params, Seed(200L + i)).get
        .zipWithIndex.map { case ((k, off), ix) => (k, ts(off), 1000L + ix, 5000L + ix) }
      val left = lRows.toDF("key", "ts", "id")
      val right = rRows.toDF("key", "ts", "id", "v")
      val exec = AsOfMergeJoin.asOf(left, right, Seq("key"), "ts", "id", "v")
        .select("key", "id", "asof_v").as[(String, Long, Option[Long])]
        .collect().toSet
      val composed = AsOf.asOfJoin(left, right, Seq("key"), "ts", "id", "v")
        .select(col("key"), col("id"), col("asof_v"))
        .as[(String, Long, Option[Long])].collect().toSet
      assert(exec === composed, s"sample $i diverged")
    }
  }

  test("result independent of input partitioning") {
    val e = graft.Tables.events(spark, sfDir)
    def run(parts: Int) = {
      val purchases = e.filter(col("event_type") === "purchase")
        .repartition(parts).select(col("user_id"), col("ts"), col("event_id"))
      val views = e.filter(col("event_type") === "view")
        .repartition(parts)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("view_event_id"))
      AsOfMergeJoin.asOf(purchases, views, Seq("user_id"), "ts", "event_id",
        "view_event_id").collect().toSet
    }
    assert(run(1) === run(13))
  }
}
