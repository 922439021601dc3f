package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the PII scrub lane (TextOps.piiScrub, oracle rows
  * `text_pii_scrub` / `pipeline_pii_report`): per-class counts on raw
  * text, sequential email → phone → IPv4 masking, and the
  * engine-neutral pattern subset's edge behavior.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(texts: String*) =
    TextOps.piiScrubOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .orderBy(col("doc_id")).collect()

  test("each class matches and masks its canonical forms") {
    val r = scrub(
      "mail john.doe+x@exam-ple.org now",
      "host 10.0.255.1 down",
      "call +1 555-123-4567 today")
    assert(r(0).getLong(1) === 1 && r(0).getString(4) === "mail <EMAIL> now")
    assert(r(1).getLong(3) === 1 && r(1).getString(4) === "host <IP> down")
    // the +1 country prefix: \+?\d{1,3}[- ] backtracks to the 555 block
    assert(r(2).getLong(2) === 1 && r(2).getString(4) === "call +1 <PHONE> today")
  }

  test("counts are raw-text facts; masking is sequential (email wins an overlap)") {
    // the digits-and-dashes local part matches BOTH classes on raw
    // text; the mask applies email first, so no <PHONE> appears
    val r = scrub("x 555-123-4567@mail.com y")
    assert(r(0).getLong(1) === 1) // n_emails
    assert(r(0).getLong(2) === 1) // n_phones (raw-text count)
    assert(r(0).getString(4) === "x <EMAIL> y")
  }

  test("IPv4 \\b boundaries: no match inside longer dotted runs") {
    val r = scrub("v 1.2.3.4.5 w", "ok 8.8.8.8.")
    // 1.2.3.4.5: the \b...\b pattern still finds 1.2.3.4 (the '.' after
    // 4 is a non-word char, so \b holds) — the standard C4-class regex
    // behavior, pinned so both engines agree rather than idealized
    assert(r(0).getLong(3) === 1)
    assert(r(1).getLong(3) === 1 && r(1).getString(4) === "ok <IP>.")
  }

  test("no PII -> zero counts and text unchanged") {
    val r = scrub("plain words only here")
    assert(r(0).getLong(1) === 0 && r(0).getLong(2) === 0 && r(0).getLong(3) === 0)
    assert(r(0).getString(4) === "plain words only here")
  }

  test("multiple spans per doc all count and all mask") {
    val r = scrub("a@b.co c@d.org 1.2.3.4 5.6.7.8 555-111-2222 999-333-4444")
    assert(r(0).getLong(1) === 2 && r(0).getLong(2) === 2 && r(0).getLong(3) === 2)
    assert(r(0).getString(4) === "<EMAIL> <EMAIL> <IP> <IP> <PHONE> <PHONE>")
  }

  test("report row aggregates per source with scrubbed-doc count") {
    val out = TextOps.piiReport(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // scrubbed docs <= docs
      assert(r.getLong(3) + r.getLong(4) + r.getLong(5) >= r.getLong(2))
    }
    // the doc_id-keyed seeding guarantees every source has scrubs
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("ruleMatrix agrees with its three component gates recounted per source") {
    val m = Curation.ruleMatrix(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val seeded = TextOps.piiSeeded(docs)
    val src = docs.select(col("doc_id"), col("source"))
    def perSource(df: org.apache.spark.sql.DataFrame, fail: org.apache.spark.sql.Column) =
      df.select(col("doc_id"), fail.as("__f")).join(src, "doc_id")
        .groupBy("source").agg(sum(col("__f")).as("f"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val qf = perSource(TextOps.gopherRulesOf(seeded), lit(1L) - col("passes"))
    val rf = perSource(TextOps.repetitionRulesOf(seeded), lit(1L) - col("passes"))
    val pf = perSource(TextOps.piiScrubOf(seeded),
      ((col("n_emails") + col("n_phones") + col("n_ipv4")) > 0).cast("bigint"))
    assert(m.keySet === qf.keySet)
    m.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_fail_quality") === qf(s), s"quality fails at $s")
      assert(r.getAs[Long]("n_fail_repetition") === rf(s), s"repetition fails at $s")
      assert(r.getAs[Long]("n_pii_docs") === pf(s), s"pii docs at $s")
      assert(r.getAs[Long]("n_clean") <= r.getAs[Long]("n_docs") -
        Seq(qf(s), rf(s), pf(s)).max)
    }
    // the seeding makes the PII column non-vacuous in every source
    assert(m.values.forall(_.getAs[Long]("n_pii_docs") > 0))
  }
}
