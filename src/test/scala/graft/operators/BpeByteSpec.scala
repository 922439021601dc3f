package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Byte-level BPE (oracle rows `text_bpe_bytes` / `text_bpe_bytes_encode`):
  * the byte_repr alphabet map, ASCII-equivalence with the char-level
  * trainer (where the two lineages must agree), and non-ASCII
  * divergence (where byte-level must differ — merges operate on UTF-8
  * bytes, not codepoints).
  */
class BpeByteSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Independent Scala derivation of the mapped-byte repr. */
  private def reprOf(s: String): String =
    s.getBytes("UTF-8").map(b => (0x100 + (b & 0xff)).toChar).mkString

  test("byte_repr: every UTF-8 byte becomes U+0100+b (independent derivation)") {
    val inputs = Seq("hello", "héllo", "日本語", "", " ", "ab", "🙂")
    val got = inputs.toDF("s")
      .select(graft.functions.functions.byte_repr(col("s")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq === inputs.map(reprOf))
    // alphabet property: all chars in U+0100–U+01FF, length = byte count
    inputs.zip(got).foreach { case (in, r) =>
      assert(r.length === in.getBytes("UTF-8").length)
      assert(r.forall(c => c >= 0x100 && c <= 0x1ff))
    }
  }

  test("ASCII corpus: byte trainer ≡ char trainer through the alphabet map") {
    val corpus = Seq.fill(6)("low lower lowest ab aaaa").mkString(" ")
    val char = TextOps.bpeMergesOf(docs(corpus), 4)
    val byte = TextOps.bpeByteMergesOf(docs(corpus), 4)
    // same ranks and counts; tokens map 1:1 (ASCII char c ↦ U+0100+c)
    assert(byte.map(m => (m.rank, m.n)) === char.map(m => (m.rank, m.n)))
    assert(byte.map(_.token) === char.map(m => reprOf(m.token)))
  }

  test("non-ASCII: a byte merge can capture PART of a codepoint") {
    // words ending in 'é' (C3 A9) after distinct consonants: the
    // dominant pair is (A9-end, space-free boundary)… construct so the
    // most frequent adjacent byte pair is (b-of-consonant, C3) — a
    // pair STRADDLING a codepoint boundary, inexpressible char-level
    val corpus = (Seq.fill(5)("né") ++ Seq.fill(5)("té") ++ Seq.fill(5)("sé")).mkString(" ")
    val byte = TextOps.bpeByteMergesOf(docs(corpus), 1)
    // 'é' = C3 A9 appears 15×: pair (C3,A9) count 15 dominates — a
    // merge of the two bytes WITHIN one codepoint, invisible char-level
    assert(byte.head.n === 15L)
    assert(byte.head.token === reprOf("é"))
    // char-level round 1 on the same corpus merges a (consonant, é)
    // pair instead — the two lineages genuinely diverge here
    val char = TextOps.bpeMergesOf(docs(corpus), 1)
    assert(char.head.n === 5L)
  }

  test("hostile PUA chars need no pre-filter byte-level (they decompose)") {
    // U+E000 inside a word would collide with merge symbols char-level
    // (and is excluded there); byte-level it maps to three byte chars
    val corpus = Seq.fill(4)("a\uE000a xy").mkString(" ")
    val byte = TextOps.bpeByteMergesOf(docs(corpus), 1)
    // all candidate pairs tie at 4; bytes-asc tie-break picks the pair
    // starting at 'a' INSIDE the PUA-bearing word — trained on it
    assert(byte.head.n === 4L)
    assert(byte.head.token === reprOf("a\uE000").take(2))
    val char = TextOps.bpeMergesOf(docs(corpus), 1)
    assert(char.head.token === "xy") // char-level trained only on the rest
  }

  test("encode: ASCII corpus gives identical symbol counts in both alphabets") {
    val d = docs("low lower lowest", "aaaa ab aaaa", "")
    val charMs = TextOps.bpeMergesOf(d, 3)
    val byteMs = TextOps.bpeByteMergesOf(d, 3)
    val viaChar = d.select(col("doc_id"), TextOps.bpeTokenCount(charMs).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaByte = d.select(col("doc_id"), TextOps.bpeByteTokenCount(byteMs).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaByte === viaChar)
    assert(viaByte(2L) === 0L) // empty doc encodes to zero symbols
  }
}
