package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the greedy maximal-munch kernel (`max_match_count`, lane
  * `text_maxmatch_tokens`) where it DIFFERS from the BPE replace
  * chain: longest-match-first on nested vocab entries, code-point
  * fallback, and word independence.
  */
class MaxMatchSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, vocab: Seq[String]): Long =
    Seq(text).toDF("text")
      .select(graft.functions.functions.max_match_count(col("text"),
        typedLit(vocab)).as("n")).as[Long].head()

  test("maximal munch takes the longest token; BPE rank order would not") {
    // vocab nests: "ab" ⊂ "abc". Munch on "abcd": abc + d = 2 tokens.
    // A rank-ordered BPE chain with "ab" ranked first would produce
    // ab + c + d = 3 — the two segmentation semantics genuinely differ.
    assert(count("abcd", Seq("ab", "abc")) === 2L)
    assert(count("abd", Seq("ab", "abc")) === 2L, "falls back to the shorter entry")
  }

  test("greedy restart after a match: aaa over {a, aa} = aa + a") {
    assert(count("aaa", Seq("a", "aa")) === 2L)
  }

  test("no match advances one CODE POINT (astral-safe), empty words free") {
    assert(count("😀😀", Seq("zz")) === 2L,
      "two astral emoji = two fallback tokens, not four UTF-16 units")
    assert(count("", Seq("zz")) === 0L)
    assert(count("  ", Seq("zz")) === 0L, "runs of spaces carry no words")
  }

  test("words segment independently (tokens never span a space)") {
    assert(count("ab cd", Seq("ab", "cd", "b c")) === 2L)
  }

  test("lane on the gate corpus: multi-char tokens actually fire") {
    val rows = TextOps.maxMatchEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ws, mm) = (r.getLong(1), r.getLong(2))
      assert(mm >= ws, "at least one token per word")
    }
    // non-vacuous: somewhere the trained vocab compressed below the
    // per-char count (chars minus spaces strictly exceeds the munch)
    val chars = graft.Tables.documents(spark, sfDir)
      .select(sum(length(regexp_replace(col("text"), " ", ""))).cast("long"))
      .as[Long].head()
    val mmTotal = rows.map(_.getLong(2)).sum
    assert(mmTotal < chars, s"vacuous: munch $mmTotal never beat chars $chars")
  }
}
