package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the tokenizer-apply lanes (TextOps.bpeEncode / packAssignBpe,
  * oracle rows `text_bpe_encode` / `text_pack_bpe`): the replace-chain
  * encoder's greedy per-word semantics, merge-on-merged-token encoding,
  * the no-cross-word-boundary property of the full-text chain, the
  * count invariants (ws-tokens ≤ bpe-symbols ≤ non-space chars), pack
  * arithmetic, and merge-memo determinism.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("one merge: each fused pair counts one symbol") {
    val d = docs("ab ab ab", "abc ab")
    val ms = TextOps.bpeMergesOf(d, 1)
    assert(ms.head.token === "ab")
    val out = d.select(col("doc_id"), TextOps.bpeTokenCount(ms).as("n"))
      .orderBy(col("doc_id")).collect()
    assert(out(0).getLong(1) === 3L) // "ab ab ab" -> three 1-symbol words
    assert(out(1).getLong(1) === 3L) // "abc ab" -> [ab][c] + [ab]
  }

  test("encoding applies merges in training order, on merged tokens") {
    val corpus = Seq.fill(8)("low lower lowest").mkString(" ")
    val d = docs(corpus)
    val ms = TextOps.bpeMergesOf(d, 2) // round 1: lo; round 2: lo+w
    assert(ms.map(_.token) === Seq("lo", "low"))
    val n = docs("low lower lowest")
      .select(TextOps.bpeTokenCount(ms)).head().getLong(0)
    // [low] + [low][e][r] + [low][e][s][t]
    assert(n === 1L + 3L + 4L)
  }

  test("the full-text replace chain never merges across a word boundary") {
    val train = docs("ab ab ab")
    val ms = TextOps.bpeMergesOf(train, 1)
    val n = docs("a b").select(TextOps.bpeTokenCount(ms)).head().getLong(0)
    assert(n === 2L) // 'a b' contains the chars of the pair but no merge fires
  }

  test("greedy non-overlapping scan inside a word") {
    // pair (a,a) over "aaa": greedy gives [aa][a] = 2 symbols, not 1
    val ms = TextOps.bpeMergesOf(docs(Seq.fill(5)("aaaa").mkString(" ")), 1)
    assert(ms.head.token === "aa")
    val n = docs("aaa").select(TextOps.bpeTokenCount(ms)).head().getLong(0)
    assert(n === 2L)
  }

  test("empty and whitespace-degenerate docs encode to zero symbols") {
    val ms = TextOps.bpeMergesOf(docs("ab ab"), 1)
    val out = docs("", " ", "ab").select(col("doc_id"),
      TextOps.bpeTokenCount(ms).as("n")).orderBy(col("doc_id")).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 0L, 1L))
  }

  test("lane invariants at sf0.001: ws-tokens ≤ bpe-symbols ≤ non-space chars") {
    val out = TextOps.bpeEncode(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(out.length.toLong === nDocs) // driver corpus has no PUA chars
    out.foreach { r =>
      val (ws, bpe) = (r.getLong(2), r.getLong(3))
      assert(ws <= bpe, s"doc ${r.getLong(0)}: each word is >= 1 symbol")
      assert(bpe <= r.getLong(1), s"doc ${r.getLong(0)}: symbols <= chars")
    }
    // merges must actually fire somewhere: total symbols < total chars
    assert(out.map(_.getLong(3)).sum < out.map(_.getLong(1)).sum)
  }

  test("pack assignment: pack_id = prior-token running sum DIV budget, per lang") {
    val rows = TextOps.packAssignBpe(spark, sfDir, budget = 256).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      var prior = 0L
      g.sortBy(_._2).foreach { case (_, _, n, packId) =>
        assert(packId === prior / 256)
        prior += n
      }
    }
  }

  test("merge memo: ensure is idempotent and the cached list is reused") {
    TextOps.ensureBpeMerges(spark, sfDir)
    val a = TextOps.bpeEncode(spark, sfDir).collect().map(_.toString).sorted
    TextOps.ensureBpeMerges(spark, sfDir)
    val b = TextOps.bpeEncode(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("decode inverts encode byte-for-byte (tokenizer round trip)") {
    val d = docs("ab ab ab", "abc ab x", "no pairs here at all", "")
    val ms = TextOps.bpeMergesOf(d, 4)
    assert(ms.nonEmpty)
    val out = d.select(col("doc_id"), col("text"),
        TextOps.bpeDecoded(ms, TextOps.bpeEncoded(ms)).as("rt"),
        TextOps.bpeEncoded(ms).as("enc"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) === r.getString(1), s"round trip broke doc ${r.getLong(0)}")
    }
    // the encode genuinely changed something (non-vacuous round trip)
    assert(out.exists(r => r.getString(3) !== r.getString(1)))
    // and on the real corpus: every doc the encode lane covers
    val ms2 = TextOps.bpeMergesOf(
      graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), 8)
    val corpus = graft.Tables.documents(spark, sfDir)
      .filter(!col("text").rlike("[\\uE000-\\uF8FF]"))
      .select(col("text"), TextOps.bpeDecoded(ms2, TextOps.bpeEncoded(ms2)).as("rt"))
      .filter(col("rt") =!= col("text")).count()
    assert(corpus === 0L, "corpus round trip must be exact for every doc")
  }
}
