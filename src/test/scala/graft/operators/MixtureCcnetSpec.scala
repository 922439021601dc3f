package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the CCNet bucketing and mixture-sampler lanes (oracle rows
  * `text_ccnet_buckets` / `q_sample_mixture`): ntile tercile shape and
  * tie-break, per-language independence, the all-int64 rate arithmetic,
  * the 10000-bp cap, and hash-cutoff membership.
  */
class MixtureCcnetSpec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ── ccnetBucketsOf ──

  private def scoredRow(id: Long, lang: String, nTri: Long, freqSum: Long) =
    (id, nTri, freqSum, freqSum.toDouble / nTri.toDouble, lang)

  private def buckets(rows: Seq[(Long, Long, Long, Double, String)]) =
    TextOps.ccnetBucketsOf(
      rows.toDF("doc_id", "n_tri", "freq_sum", "avg_freq", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("9 docs split 3/3/3 by descending score; sums land per bucket") {
    // scores 9,8,...,1 on doc_ids 1..9 (freq_sum = score * n_tri=10)
    val rows = (1L to 9L).map(i => scoredRow(i, "en", 10L, (10L - i) * 10L))
    val b = buckets(rows)
    assert(b(("en", "head")) === ((3L, 30L, 10L * (9 + 8 + 7))))
    assert(b(("en", "middle")) === ((3L, 30L, 10L * (6 + 5 + 4))))
    assert(b(("en", "tail")) === ((3L, 30L, 10L * (3 + 2 + 1))))
  }

  test("10 docs: SQL-standard ntile gives the head the extra row (4/3/3)") {
    val rows = (1L to 10L).map(i => scoredRow(i, "en", 10L, (11L - i) * 10L))
    val b = buckets(rows)
    assert(b(("en", "head"))._1 === 4L)
    assert(b(("en", "middle"))._1 === 3L && b(("en", "tail"))._1 === 3L)
  }

  test("score ties break by doc_id; languages tile independently") {
    // all-equal scores: head = lowest doc_ids
    val ties = (1L to 6L).map(i => scoredRow(i, "de", 10L, 50L))
    val other = (1L to 3L).map(i => scoredRow(100 + i, "fr", 10L, (4L - i) * 10L))
    val b = buckets(ties ++ other)
    assert(b(("de", "head"))._1 === 2L && b(("fr", "head"))._1 === 1L)
    // fr head is its highest-score doc regardless of the de frame
    assert(b(("fr", "head"))._3 === 30L)
  }

  // ── mixtureSampleOf ──

  private def mixture(rows: Seq[(Long, String, String)], budgetPct: Int = 30) =
    TextOps.mixtureSampleOf(rows.toDF("doc_id", "lang", "text"), budgetPct)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("rate arithmetic is exact int64 and caps at 10000 bp") {
    // en: 8 docs x 10 tokens = 80; zh: 1 doc x 20 = 20; total 100
    val en = (1L to 8L).map(i => (i, "en", Seq.fill(10)("w").mkString(" ")))
    val zh = Seq((100L, "zh", Seq.fill(20)("z").mkString(" ")))
    val m = mixture(en ++ zh)
    // target_en = 100*30/100*40/100 = 12; rate = 12*10000/80 = 1500
    val (nDocsEn, availEn, rateEn, _, _) = m("en")
    assert(nDocsEn === 8L && availEn === 80L && rateEn === 1500L)
    // target_zh = 100*30/100*15/100 = 4; rate = 4*10000/20 = 2000
    assert(m("zh")._3 === 2000L)
    // a tiny language with target >= avail caps at 10000
    val m2 = mixture(en ++ Seq((200L, "fr", "one two")), budgetPct = 90)
    // total=82: target_fr = (82*90 DIV 100)*15 DIV 100 = 10 > avail 2 -> cap
    assert(m2("fr")._3 === 10000L && m2("fr")._4 === 1L && m2("fr")._5 === 2L)
  }

  test("membership is exactly the id-hash basis-point cutoff") {
    val docs = (1L to 50L).map(i => (i, "en", Seq.fill(4)("t").mkString(" ")))
    val m = mixture(docs, budgetPct = 50)
    val rate = m("en")._3
    val expected = docs.map(_._1).filter(id => h60(id.toString) % 10000 < rate)
    assert(m("en")._4 === expected.size.toLong)
    assert(m("en")._5 === expected.size.toLong * 4)
  }

  test("a language with zero sampled docs still reports its row") {
    // rate can be 0 when the target floors to 0
    val en = (1L to 40L).map(i => (i, "en", Seq.fill(50)("w").mkString(" ")))
    val de = Seq((900L, "de", "a b c"))
    val m = mixture(en ++ de, budgetPct = 1)
    // total=2003: target_de = 2003*1/100*15/100 = 3; rate=3*10000/3=10000
    assert(m("de")._3 === 10000L)
    // target_en = 2003*1/100*40/100 = 8; rate = 8*10000/2000 = 40 bp
    assert(m("en")._3 === 40L)
    val sampledEn = (1L to 40L).count(id => h60(id.toString) % 10000 < 40L).toLong
    assert(m("en")._4 === sampledEn)
  }
}
