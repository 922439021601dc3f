package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the DSIR importance-selection and per-source quota lanes
  * (oracle rows `text_dsir_topk` / `q_sample_quota`): the hashed-bigram
  * kernel's exact values, the centered-weight property that makes
  * anti-target features score negative, target-language enrichment of
  * the selected set, and the quota cap's heap semantics.
  */
class DsirQuotaSpec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // ── dsir_buckets kernel ──

  private def buckets(text: String, b: Int): Seq[Long] =
    Seq(text).toDF("text")
      .select(graft.functions.functions.dsir_buckets(col("text"), b).as("bs"))
      .collect().head.getSeq[Long](0)

  test("kernel emits one bucket per bigram occurrence, md5-exact, in order") {
    val got = buckets("a b c a b", 1024)
    val want = Seq("a b", "b c", "c a", "a b").map(g => h60(s"dsir|$g") % 1024)
    assert(got === want) // duplicate "a b" kept twice — multiplicity matters
  }

  test("kernel: sub-bigram docs produce an empty feature array") {
    assert(buckets("solo", 1024).isEmpty)
    assert(buckets("", 1024).isEmpty)
  }

  // ── dsirTopK ──

  test("selected set is strongly target-enriched vs the corpus base rate") {
    val top = TextOps.dsirTopK(spark, sfDir)
    val langs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val enTop = top.join(langs, "doc_id").where(col("lang") === "en").count()
    assert(top.count() === 50L)
    // base rate at sf0.001 is 193/500 = 39%; require a strict majority
    assert(enTop >= 30L, s"only $enTop of 50 selected docs are target-language")
  }

  test("scores are deterministic and strictly ranked (desc, doc_id tiebreak)") {
    val a = TextOps.dsirTopK(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = TextOps.dsirTopK(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    val ordered = a.map { case (id, s) => (-s, id) }
    assert(ordered.toSeq === ordered.sorted.toSeq)
  }

  // ── quotaSample ──

  test("quota: at most cap docs per source, ranks 1..cap, priority order correct") {
    val cap = 15
    val kept = TextOps.quotaSample(spark, sfDir, cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = kept.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rows) =>
      assert(rows.length <= cap)
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // the kept set per source must be exactly the cap lowest-priority docs
    val all = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id")).as[(String, Long)].collect()
    all.groupBy(_._1).foreach { case (src, docs) =>
      val want = docs.map(_._2).sortBy(id => (h60(s"quota|$id"), id)).take(cap).toSet
      val got = bySource.getOrElse(src, Array.empty).map(_._2).toSet
      assert(got === want, s"quota membership mismatch for $src")
    }
  }

  // ── prioritySample ──

  test("priority: per-source top-k by w/u with exact weights, weighted enrichment real") {
    val k = 15
    val got = TextOps.prioritySample(spark, sfDir, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text"))
      .as[(String, Long, String)].collect()
      .map { case (src, id, t) => (src, id, t.split(" ", -1).length.toLong + 1L) }
    // driver-side reference: same hash, same single IEEE division
    val expected = docs.groupBy(_._1).flatMap { case (src, rows) =>
      rows.map { case (_, id, w) =>
        (id, w, w.toDouble / (h60(s"prio|$id") + 1L).toDouble)
      }.sortBy { case (id, _, p) => (-p, id) }.take(k)
        .zipWithIndex.map { case ((id, w, _), i) => (src, id, w, (i + 1).toLong) }
        .toSeq
    }.toSet
    assert(got.toSet === expected)
    // the weight does its job: the kept docs are longer on average than
    // the corpus (weighted sampling must beat uniform on its own weight)
    val keptIds = got.map(_._2).toSet
    val keptW = docs.filter(d => keptIds.contains(d._2)).map(_._3)
    val allMean = docs.map(_._3).sum.toDouble / docs.length
    assert(keptW.sum.toDouble / keptW.length > allMean,
      "priority sample is not length-enriched — weighting is broken")
  }

  test("quota: stable under repartitioning (same kept set from a shuffled input)") {
    val base = TextOps.quotaSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val again = TextOps.quotaSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(base === again)
  }
}
