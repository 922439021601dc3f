package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE merge-loop trainer (TextOps.bpeTrain, oracle row
  * `text_bpe_train`): greedy non-overlapping merge semantics, training
  * on its own output (later rounds merge earlier new_tokens), the
  * deterministic (count desc, pair) tie-break, bit-determinism across
  * runs, bounded rounds, and hostile-input exclusion.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("single merge counts pairs frequency-weighted and greedy non-overlapping") {
    // "aaaa" contributes 3 (a,a) positions per occurrence; "ab" adds an
    // (a,b). Two docs ⇒ 'aa' count 6, wins.
    val out = TextOps.bpeTrainOf(docs("aaaa ab", "aaaa"), 1).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(1) === "a" && r.getString(2) === "a")
    assert(r.getString(3) === "aa")
    assert(r.getLong(4) === 6L)
  }

  test("later rounds merge ON earlier new_tokens (the trainer property)") {
    // round 1: (l,o) dominates; round 2 must merge the NEW token: 'lo'+'w'
    val corpus = Seq.fill(8)("low lower lowest").mkString(" ")
    val out = TextOps.bpeTrainOf(docs(corpus), 2)
      .orderBy(col("merge_rank")).collect()
    assert(out(0).getString(3) === "lo") // l+o appears in all three words
    assert(out(1).getString(1) === "lo" && out(1).getString(2) === "w")
    assert(out(1).getString(3) === "low")
  }

  test("greedy scan: a just-merged token never re-merges within its round") {
    // one word "aaa" ×5: greedy (a,a) on "aaa" -> [aa, a] (count 2·5=10,
    // NOT 10+5 as an overlapping count would give); round 2 then sees
    // exactly the (aa, a) boundary pair with count 5
    val out = TextOps.bpeTrainOf(docs(Seq.fill(5)("aaa").mkString(" ")), 2)
      .orderBy(col("merge_rank")).collect()
    assert(out(0).getString(3) === "aa" && out(0).getLong(4) === 10L)
    assert(out(1).getString(1) === "aa" && out(1).getString(2) === "a")
    assert(out(1).getLong(4) === 5L)
  }

  test("tie-break is (count desc, pair bytes asc)") {
    // 'xy' and 'xz' both appear exactly once; 'xy' < 'xz' byte-wise
    val out = TextOps.bpeTrainOf(docs("xz xy"), 1).collect()
    assert(out.head.getString(3) === "xy")
  }

  test("bit-deterministic across runs and repartitionings") {
    val d = graft.Tables.documents(spark, sfDir)
    val a = TextOps.bpeTrainOf(d, 4).collect().map(_.toString).sorted
    val b = TextOps.bpeTrainOf(d.repartition(7), 4).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("round bound: corpus exhaustion and merges cap fail loudly") {
    // a single 2-char word exhausts after one merge
    val e = intercept[IllegalArgumentException](
      TextOps.bpeTrainOf(docs("ab ab"), 2).collect())
    assert(e.getMessage.contains("exhausted"))
    val e2 = intercept[IllegalArgumentException](
      TextOps.bpeTrainOf(docs("abc"), TextOps.BpeMaxMerges + 1).collect())
    assert(e2.getMessage.contains("merges"))
  }

  test("words containing private-use chars are excluded from training") {
    // the PUA char would collide with merge-token encoding; both engines
    // drop such words up front
    val hostile = "qqqq"
    val out = TextOps.bpeTrainOf(docs(s"$hostile $hostile zz zz zz"), 1).collect()
    assert(out.head.getString(3) === "zz" && out.head.getLong(4) === 3L)
  }
}
