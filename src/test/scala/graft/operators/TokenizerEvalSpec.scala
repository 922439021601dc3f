package graft.operators

import graft.SparkSpec

/** Tokenizer-selection eval spec: the fertility table must recompute
  * from the three per-doc encode frames, and the segmentation theory
  * must hold in aggregate — Viterbi minimizes token count over the
  * same vocabulary, so unigram ≤ maxmatch and unigram ≤ BPE
  * everywhere; every word is at least one token, so whitespace ≤ all
  * subword counts.
  */
class TokenizerEvalSpec extends SparkSpec {

  test("tokenizerEval recomputes from the encode frames; dominance laws hold") {
    val rows = TextOps.tokenizerEval(spark, sfDir).collect()
      .map(r => (r.getAs[String]("tokenizer"), r.getAs[String]("lang")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_chars"), r.getAs[Long]("tokens_per_kchar"))).toMap
    assert(rows.nonEmpty)
    val tokenizers = rows.keySet.map(_._1)
    assert(tokenizers === Set("whitespace", "bpe", "maxmatch", "unigram"))
    // every tokenizer sees the identical doc/char population
    val langs = rows.keySet.map(_._2)
    langs.foreach { l =>
      val perTok = tokenizers.toSeq.map(t => rows((t, l)))
      assert(perTok.map(x => (x._1, x._3)).toSet.size === 1,
        s"doc/char totals diverge across tokenizers for lang $l")
    }
    // ratio column is pure integer arithmetic over the sums
    rows.values.foreach { case (_, nt, nc, r) =>
      assert(r === (if (nc == 0) 0L else nt * 1000 / nc))
    }
    // dominance: viterbi is the minimum-token segmentation over the
    // same vocab (<= maxmatch, <= bpe); a word is >= 1 token (ws <= all)
    langs.foreach { l =>
      val ws = rows(("whitespace", l))._2
      val bpe = rows(("bpe", l))._2
      val mm = rows(("maxmatch", l))._2
      val ug = rows(("unigram", l))._2
      assert(ug <= mm, s"unigram > maxmatch for lang $l")
      assert(ug <= bpe, s"unigram > bpe for lang $l")
      assert(ws <= ug, s"whitespace > unigram for lang $l")
    }
    // recompute the bpe row sums from the per-doc encode frame
    val perDoc = TextOps.bpeEncode(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val expected = perDoc.groupBy(r => docs(r.getAs[Long]("doc_id")))
      .map { case (l, rs) =>
        l -> (rs.length.toLong, rs.map(_.getAs[Long]("n_bpe_tokens")).sum,
          rs.map(_.getAs[Long]("n_chars")).sum) }
    expected.foreach { case (l, (nd, nt, nc)) =>
      val got = rows(("bpe", l))
      assert((got._1, got._2, got._3) === ((nd, nt, nc)), s"bpe row for $l")
    }
  }
}
