package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the unigram-LM Viterbi kernel (`unigram_viterbi`, lane
  * `text_unigram_tokens`) where it DIFFERS from both other tokenizer
  * inference algorithms: global-optimum segmentation (vs maximal
  * munch's greedy prefix), the frequency tie-break, code-point
  * fallback, and word independence.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(text: String, vocab: Seq[(String, Long)]): (Long, Long) = {
    val r = Seq(text).toDF("text")
      .select(graft.functions.functions.unigram_viterbi(col("text"),
        typedLit(vocab.map(_._1)), typedLit(vocab.map(_._2))).as("uv"))
      .select(col("uv.n_tokens"), col("uv.freq_sum"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def munch(text: String, vocab: Seq[String]): Long =
    Seq(text).toDF("text")
      .select(graft.functions.functions.max_match_count(col("text"),
        typedLit(vocab)).as("n")).as[Long].head()

  test("Viterbi finds the global optimum where maximal munch goes greedy") {
    // vocab {ab, bcd} on "abcd": munch grabs "ab" and strands "cd"
    // (ab + c + d = 3); Viterbi backs off to a + bcd = 2 tokens.
    val vocab = Seq("ab" -> 5L, "bcd" -> 3L)
    assert(munch("abcd", vocab.map(_._1)) === 3L)
    assert(seg("abcd", vocab) === ((2L, 3L)))
  }

  test("frequency breaks token-count ties (unigram-LM likelihood order)") {
    // "abc" over {ab(5), bc(7)}: both [ab, c] and [a, bc] are 2 tokens;
    // the higher-frequency bc wins the likelihood tie-break.
    assert(seg("abc", Seq("ab" -> 5L, "bc" -> 7L)) === ((2L, 7L)))
    // flip the frequencies, the other segmentation wins
    assert(seg("abc", Seq("ab" -> 9L, "bc" -> 7L)) === ((2L, 9L)))
  }

  test("fewest tokens always beats frequency (count is the major key)") {
    // [abc] (1 token, freq 1) beats [ab, c] (2 tokens, freq 100)
    assert(seg("abc", Seq("ab" -> 100L, "abc" -> 1L)) === ((1L, 1L)))
  }

  test("no match advances one CODE POINT (astral-safe), empty words free") {
    assert(seg("😀😀", Seq("zz" -> 1L)) === ((2L, 0L)),
      "two astral emoji = two fallback tokens, not four UTF-16 units")
    assert(seg("", Seq("zz" -> 1L)) === ((0L, 0L)))
    assert(seg("  ", Seq("zz" -> 1L)) === ((0L, 0L)), "runs of spaces carry no words")
  }

  test("words segment independently (tokens never span a space)") {
    assert(seg("ab cd", Seq("ab" -> 2L, "cd" -> 3L, "b c" -> 9L)) === ((2L, 5L)))
  }

  test("lane on the gate corpus: never more tokens than maximal munch") {
    val uni = TextOps.unigramEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val mm = TextOps.maxMatchEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(uni.nonEmpty && uni.keySet === mm.keySet)
    uni.foreach { case (id, (k, _)) =>
      assert(k <= mm(id), s"doc $id: Viterbi $k > munch ${mm(id)} — not optimal")
    }
    // non-vacuous: vocab tokens actually fire (somewhere the DP chose a
    // multi-char token and accumulated its frequency). A STRICT munch
    // improvement is vocab-dependent — the trained 8-merge vocab has no
    // greedy trap on this corpus; the synthetic cases above pin it.
    assert(uni.values.exists(_._2 > 0L), "vacuous: no vocab token ever chosen")
  }
}
