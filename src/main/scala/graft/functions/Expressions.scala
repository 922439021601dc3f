package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the engine's hot loops. Each replaces
  * a multi-operator declarative pipeline with one per-row pass, keeping
  * IDENTICAL semantics (the DuckDB oracle SQL for the corresponding
  * queries is unchanged and still matches exactly).
  *
  * Codegen: each expression generates a static call into
  * [[ExpressionKernels]] via `defineCodeGen`, so the surrounding
  * operators stay inside whole-stage codegen (no CodegenFallback
  * interpretation in the hot path).
  */
object ExpressionKernels extends Serializable {

  private val HexChars = "0123456789abcdef".toCharArray

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // table-based hex: String.format here was ~100M calls per sf0.1 query
  private def md5hex(s: String): String = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 60 bits of md5(s) — same value as
    * `conv(substring(md5(s),1,15),16,10)` / DuckDB `('0x'||substr(md5(s),1,15))::UBIGINT`.
    */
  def md5Prefix60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  /** Cosine similarity of two float vectors with LEFT-TO-RIGHT double
    * accumulation — bit-for-bit the same as
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, _+_) / (sqrt(...)*sqrt(...))`
    * and DuckDB's `list_sum(list_transform(list_zip(a,b), ...))`.
    */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Integer squared L2 between two int64 arrays — see [[L2SqInt]]. */
  def l2SqLL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  /** 60-bit SimHash over DISTINCT tokens: token hash = md5Prefix60, bit b
    * set iff strictly more tokens have bit b set than clear — identical
    * to the declarative vote pipeline in MinHash.simhash's oracle SQL.
    */
  def simhash60(tokens: ArrayData): Long = {
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i).toString
      if (seen.add(t)) {
        val h = md5Prefix60(t)
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** NFC-normalize + casefold — the canonicalization pre-pass for exact
    * text dedup: composed and decomposed encodings of the same glyphs
    * (U+00E9 vs e + U+0301) md5 identically after it, as do case
    * variants. Lowercasing is codepoint-wise simple mapping —
    * locale-independent (no Turkish dotted-I surprises) and the exact
    * semantics of DuckDB's utf8proc `lower`, which the oracle composes
    * with `nfc_normalize` in the same order.
    */
  def nfcCasefold(text: UTF8String): UTF8String = {
    val s = text.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    // codepoint-wise SIMPLE lowercase (Character.toLowerCase), not
    // String.toLowerCase: the latter applies full context-sensitive
    // mappings (Greek final sigma, U+0130 → "i̇") that DuckDB's
    // utf8proc `lower` — the oracle's half of this contract — does not
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Byte-level BPE symbol alphabet: every UTF-8 byte b of the input
    * becomes codepoint U+0100+b. Codepoints 0x100–0x1FF encode as
    * exactly two UTF-8 bytes (0b110_000xx 0b10_xxxxxx), so the output
    * is built directly as bytes — no String round trip, no decoding of
    * the input (arbitrary byte sequences inside the UTF8String are
    * mapped byte-for-byte, exactly like DuckDB's
    * `chr(256 + byte-of(encode(s)))` on its side of the oracle).
    */
  def byteRepr(text: UTF8String): UTF8String = {
    val in = text.getBytes
    val out = new Array[Byte](in.length * 2)
    var i = 0
    while (i < in.length) {
      val cp = 0x100 + (in(i) & 0xff)
      out(2 * i) = (0xc0 | (cp >> 6)).toByte
      out(2 * i + 1) = (0x80 | (cp & 0x3f)).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Distinct word k-gram shingles of a single-space-separated string —
    * one pass, first-occurrence order (same contents as
    * array_distinct(transform(sequence…, concat_ws(element_at…)))), which
    * chains four non-codegen higher-order functions to do the same thing.
    * Split keeps trailing empty tokens (limit -1), matching Spark's
    * `split(col, " ")` and DuckDB's string_split, so gram sets derived
    * here agree with positional grams built from `TextOps.tokens` and
    * with the SQL oracle on texts with trailing whitespace.
    */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - (k - 1)
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var o = 0
      while (o < k) {
        if (o > 0) sb.append(' ')
        sb.append(toks(i + o))
        o += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hashed word-bigram feature buckets WITH multiplicity — the DSIR
    * hashed n-gram feature map (importance-resampling data selection):
    * for every adjacent token pair, `md5Prefix60("dsir|" w_i " " w_{i+1})
    * mod b`. Unlike [[wordShingles]] this keeps every occurrence (the
    * feature counts are frequencies, not presence), and hashes straight
    * to the bucket id so the bigram strings never materialize.
    */
  def dsirBuckets(text: UTF8String, b: Int): ArrayData = {
    val toks = text.toString.split(' ')
    val n = toks.length - 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append("dsir|").append(toks(i)).append(' ').append(toks(i + 1))
      out(i) = md5Prefix60(sb.toString) % b
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Length-normalized DSIR importance score against a DENSE bucket
    * weight vector (index = feature bucket, length = bucket count):
    * `floor(Σ wt[h(bigram) mod b] / n_bigrams)` — the int64 sum and the
    * single floored division are exactly the staged-aggregation scoring
    * path ([[graft.operators.TextOps.dsirTopK]]), collapsed to one
    * stateless per-row pass for the serving/streaming shape where the
    * weight table is a broadcast plan literal. Sub-bigram docs score 0
    * (no features — neutral by the centering convention).
    */
  /** Greedy maximal-munch (MaxMatch / WordPiece-inference) token count:
    * per whitespace word, repeatedly advance by the LONGEST vocab token
    * prefixing the remainder (one code point when none matches — the
    * alphabet is implicitly char-complete, so no UNK path), counting
    * one output token per step. Tokens matching at one position are
    * prefixes of each other, so longest-in-UTF-16 ≡ longest-in-code-
    * points (the oracle's `length()` unit) — no surrogate hazard.
    */
  def maxMatchCount(text: UTF8String, vocab: ArrayData): Long = {
    val words = text.toString.split(' ')
    val nv = vocab.numElements()
    val toks = new Array[String](nv)
    var j = 0
    while (j < nv) { toks(j) = vocab.getUTF8String(j).toString; j += 1 }
    var total = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var i = 0
      while (i < w.length) {
        var best = 0
        var k = 0
        while (k < nv) {
          val t = toks(k)
          if (t.length > best && w.startsWith(t, i)) best = t.length
          k += 1
        }
        if (best == 0) best = Character.charCount(w.codePointAt(i))
        i += best
        total += 1L
      }
      wi += 1
    }
    total
  }

  /** Unigram-LM (SentencePiece-style) Viterbi segmentation — the third
    * tokenizer-inference algorithm beside the BPE replace chain and
    * WordPiece's maximal munch ([[maxMatchCount]]). Kudo 2018 segments
    * by Viterbi over per-token log-probabilities; to stay bit-exact
    * across engines the additive score is the LOG-FREE integer
    * surrogate cost(t) = T − freq(t) (single-char fallback freq 0),
    * whose minimization is exactly the lexicographic objective
    * (fewest tokens, then highest total token frequency). The DP here
    * runs that lexicographic form directly in exact integers — no T,
    * no overflow at any corpus scale; the SQL oracle carries the
    * T-encoded cost (valid while any word's frequency sum < T = 10^12,
    * guarded loudly in the lane builder).
    *
    * Genuinely diverges from maximal munch: vocab {ab, bcd}, word
    * "abcd" → munch takes "ab" then falls back twice (3 tokens);
    * Viterbi finds [a, bcd] (2 tokens). UnigramSpec constructs this.
    *
    * Positions are UTF-16 code units with single-char steps advancing
    * one CODE POINT ([[maxMatchCount]]'s discipline), so counts match
    * the oracle's code-point DP on supplementary-plane text.
    *
    * Returns (n_tokens, freq_sum) summed over the row's words.
    */
  def unigramViterbi(text: UTF8String, vocab: ArrayData, freqs: ArrayData): InternalRow = {
    val words = text.toString.split(' ')
    val nv = vocab.numElements()
    val toks = new Array[String](nv)
    val fr = new Array[Long](nv)
    var j = 0
    while (j < nv) {
      toks(j) = vocab.getUTF8String(j).toString
      fr(j) = freqs.getLong(j)
      j += 1
    }
    var totK = 0L
    var totS = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      val L = w.length
      if (L > 0) {
        // forward DP over boundaries; non-code-point-boundary positions
        // stay unreachable (every reachable advance lands on a boundary)
        val bk = new Array[Long](L + 1)
        val bs = new Array[Long](L + 1)
        java.util.Arrays.fill(bk, Long.MaxValue)
        bk(0) = 0L
        var i = 0
        while (i < L) {
          if (bk(i) != Long.MaxValue) {
            val ki = bk(i); val si = bs(i)
            // single-code-point fallback, frequency 0
            val nxt = i + Character.charCount(w.codePointAt(i))
            if (ki + 1 < bk(nxt) || (ki + 1 == bk(nxt) && si > bs(nxt))) {
              bk(nxt) = ki + 1; bs(nxt) = si
            }
            var k = 0
            while (k < nv) {
              val t = toks(k)
              if (w.startsWith(t, i)) {
                val e = i + t.length
                val s2 = si + fr(k)
                if (ki + 1 < bk(e) || (ki + 1 == bk(e) && s2 > bs(e))) {
                  bk(e) = ki + 1; bs(e) = s2
                }
              }
              k += 1
            }
          }
          i += 1
        }
        totK += bk(L)
        totS += bs(L)
      }
      wi += 1
    }
    InternalRow(totK, totS)
  }

  def dsirScore(text: UTF8String, wts: ArrayData): Long = {
    val toks = text.toString.split(' ')
    val n = toks.length - 1
    if (n <= 0) return 0L
    val b = wts.numElements()
    var s = 0L
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append("dsir|").append(toks(i)).append(' ').append(toks(i + 1))
      s += wts.getLong((md5Prefix60(sb.toString) % b).toInt)
      i += 1
    }
    Math.floor(s.toDouble / n).toLong
  }

  private val jlSignCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  /** ±1 sign matrix of the JL sign projection, derived from md5 so the
    * oracle re-derives it cell-for-cell; CONSTANT per (dim, dPrime), so
    * it is computed once per executor JVM and cached — never per row.
    */
  private def jlSigns(dim: Int, dPrime: Int): Array[Array[Long]] =
    jlSignCache.computeIfAbsent((dim, dPrime), { k =>
      Array.tabulate(k._2)(j => Array.tabulate(k._1)(i =>
        if (md5Prefix60(s"jl|$i|$j") % 2 == 0) 1L else -1L))
    })

  /** Johnson–Lindenstrauss SIGN-projection sketch of a float vector:
    * components quantized `floor(1e6·x)` to int64, projected to dPrime
    * dims through the cached ±1 matrix (exact integer sums), reduced to
    * `struct(proj_checksum = Σ p_j·(j+1), proj_norm2 = Σ p_j²)` — the
    * distance-preserving dimensionality-reduction step of an ANN
    * index-build, made oracle-exact end to end.
    */
  def jlSketch(emb: ArrayData, dPrime: Int): InternalRow = {
    val d = emb.numElements()
    val signs = jlSigns(d, dPrime)
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      q(i) = math.floor(1e6 * emb.getFloat(i).toDouble).toLong
      i += 1
    }
    var checksum = 0L
    var norm2 = 0L
    var j = 0
    while (j < dPrime) {
      val row = signs(j)
      var p = 0L
      var k = 0
      while (k < d) { p += row(k) * q(k); k += 1 }
      checksum += p * (j + 1)
      norm2 += p * p
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](checksum, norm2))
  }

  private val StopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "a", "of", "and", "is", "to", "in").foreach(s.add)
    s
  }

  /** One-pass Gopher-style repetition statistics (Rae et al. 2021,
    * Table A1 "repetition" filters) of a single-space-separated string.
    * For word n-grams joined by a single space (so a gram's char length
    * includes its n−1 joining spaces; overlapping occurrences all
    * count):
    *
    *  - n = 2..4: `topN` = the character coverage of the single
    *    most-covering n-gram, max over grams of count × charLen —
    *    the deterministic, tie-free variant of the paper's
    *    "fraction of characters in the most frequent n-gram"
    *    (coverage is what the rule thresholds; argmax-by-count would
    *    need a tie-break that the coverage max doesn't),
    *  - n = 5..10: `dupN` = the character coverage of all DUPLICATED
    *    n-grams, Σ count × charLen over grams with count ≥ 2.
    *
    * All char counts are Unicode CODE POINTS (DuckDB `length` parity —
    * Java String.length would diverge on astral chars). Returns
    * (den = code points of the whole text, top2..top4, dup5..dup10);
    * a doc with fewer than n tokens contributes 0 for that n.
    */
  def repStats(text: UTF8String): InternalRow = {
    val toks = text.toString.split(' ')
    val out = new Array[Any](10)
    out(0) = text.numChars().toLong
    var n = 2
    var slot = 1
    while (n <= 10) {
      var top = 0L
      var dup = 0L
      if (toks.length >= n) {
        val counts = new java.util.HashMap[String, Integer]()
        val last = toks.length - n
        var i = 0
        while (i <= last) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          counts.merge(sb.toString, Integer.valueOf(1),
            (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
          i += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val g = e.getKey
          val c = e.getValue.longValue
          val cover = c * g.codePointCount(0, g.length)
          if (cover > top) top = cover
          if (c >= 2L) dup += cover
        }
      }
      out(slot) = if (n <= 4) top else dup
      slot += 1
      n += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** One-pass token statistics of a single-space-separated string:
    * (n_chars, n_tokens, n_types, n_stopwords) — same values as the
    * four-HOF chain length/size(split)/size(array_distinct)/size(filter),
    * which runs interpreted (CodegenFallback) per row in Spark 4.
    */
  def tokenStats(text: UTF8String): InternalRow = {
    val toks = text.toString.split(' ')
    val types = new java.util.HashSet[String]()
    var stops = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      types.add(t)
      if (StopSet.contains(t)) stops += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](text.numChars().toLong, toks.length.toLong,
        types.size.toLong, stops.toLong))
  }

  private val LangMarkerSets: Array[java.util.HashSet[String]] = {
    val markers = Seq(
      Seq("the", "a", "is", "of", "and"),      // en
      Seq("der", "die", "und", "ist", "das"),  // de
      Seq("el", "la", "los", "es", "y"),       // es
      Seq("le", "les", "et", "est", "du"),     // fr
      Seq("de5", "shi4", "le5"))               // zh
    markers.map { m =>
      val s = new java.util.HashSet[String]()
      m.foreach(s.add)
      s
    }.toArray
  }

  /** One-pass language-marker hit counts: (s_en, s_de, s_es, s_fr, s_zh)
    * — replaces five interpreted `size(filter(toks, isInCollection))`
    * passes over the token array.
    */
  def langScores(text: UTF8String): InternalRow = {
    val toks = text.toString.split(' ')
    val counts = new Array[Long](LangMarkerSets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var l = 0
      while (l < LangMarkerSets.length) {
        if (LangMarkerSets(l).contains(t)) counts(l) += 1
        l += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      counts.map(c => c: Any))
  }

  /** Per-subspace squared-L2 distances for product quantization:
    * element s = floor(1e6 · Σ_i (a[s·d+i] − b[s·d+i])²), the inner fold
    * left-to-right — identical doubles to DuckDB's list_sum over
    * list_transform on the same slice, and the floor(×1e6) quantization
    * makes downstream sums/argmins pure integer arithmetic (no cross-row
    * double accumulation anywhere in the PQ pipeline).
    */
  def pqSubDists(a: ArrayData, b: ArrayData, m: Int, subDim: Int): ArrayData = {
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val idx = s * subDim + i
        val diff = a.getFloat(idx).toDouble - b.getFloat(idx).toDouble
        d += diff * diff
        i += 1
      }
      out(s) = math.floor(d * 1000000.0).toLong
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Largest supported hyperplane count — covers the log₂(n) scaling rule
    * (Similarity.planesFor) far past 100 TB corpus sizes (2^24 buckets).
    */
  val MaxPlanes = 24

  /** Hyperplane weight table for the LSH bucket — same md5-derived
    * integers as Similarity.planeWeight and the oracle SQL's w CTE.
    * Planes beyond the default 8 extend the SAME family (plane p's
    * weights depend only on p), so a (p+1)-plane bucketing is always a
    * strict refinement of the p-plane one.
    */
  private lazy val PlaneWeights: Array[Array[Long]] =
    Array.tabulate(MaxPlanes, 64) { (p, d) =>
      (java.lang.Long.parseLong(md5hex(s"${p}_$d").substring(0, 15), 16) % 2001L) - 1000L
    }

  /** `planes`-plane LSH bucket of a float vector in one pass: bit p set
    * iff Σ_d w(p,d)·floor(x_d·1000) > 0 — pure integer math, identical to
    * the interpreted zip_with/aggregate passes it replaces and to the
    * DuckDB oracle's integer-quantized projection.
    */
  def lshBucket(emb: ArrayData, planes: Int): Long = {
    val n = math.min(emb.numElements(), 64)
    val np = math.min(planes, MaxPlanes)
    var bucket = 0L
    var p = 0
    while (p < np) {
      val w = PlaneWeights(p)
      var proj = 0L
      var d = 0
      while (d < n) {
        proj += w(d) * math.floor(emb.getFloat(d).toDouble * 1000.0).toLong
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Winnowing fingerprints (the MOSS scheme: Schleimer, Wilkerson &
    * Aiken, SIGMOD'03): hash every positional word k-gram (md5Prefix60),
    * slide a window of `w` consecutive hashes, take the minimum of each
    * FULL window, return the distinct minima sorted ascending. One pass,
    * O(n) via a monotonic deque. Selecting minima by VALUE (not by
    * position) makes the output independent of tie-breaking, so a SQL
    * `min() OVER (ROWS w-1 FOLLOWING)` + DISTINCT reproduces it exactly.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.toString.split(' ')
    val n = toks.length - (k - 1)
    if (n < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var o = 0
      while (o < k) {
        if (o > 0) sb.append(' ')
        sb.append(toks(i + o))
        o += 1
      }
      hs(i) = md5Prefix60(sb.toString)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) out.add(hs(deque.peekFirst()))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** MinHash signature: element j = min over shingles of the hex digest
    * md5(j + "|" + shingle), compared lexicographically — identical to
    * `min(md5(concat(j,'|',shingle)))` per hash family in the oracle SQL.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[String](k)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val s = shingles.getUTF8String(i).toString
      var j = 0
      while (j < k) {
        val h = md5hex(j.toString + "|" + s)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(m => UTF8String.fromString(if (m == null) "" else m)))
  }
}

/** cosine(array<float>, array<float>) → double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExpressionKernels.cosineFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExpressionKernels.cosineFF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** l2_sq(array<bigint>, array<bigint>) → bigint: integer squared L2 —
  * the SQ8 asymmetric distance's hot pair loop as one codegen'd kernel
  * call (the zip_with/aggregate chain it replaces is CodegenFallback —
  * interpreted per candidate×query pair). Exact: micro components are
  * |x| ≤ ~4·10⁶, so 64 squared diffs sum well under 2⁶³.
  */
case class L2SqInt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExpressionKernels.l2SqLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExpressionKernels.l2SqLL($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash60(array<string>) → long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.simhash60(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.simhash60($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** nfc_casefold(string) → string: NFC normalization + root-locale
  * lowercase (see [[ExpressionKernels.nfcCasefold]]).
  */
case class NfcCasefold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.nfcCasefold(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.nfcCasefold($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** word_shingles(string, k) → array<string> of distinct k-gram shingles. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.wordShingles(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dsir_buckets(string, b) → array<long> of hashed word-bigram feature
  * buckets, one per occurrence.
  */
case class DsirBuckets(child: Expression, b: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.dsirBuckets(v.asInstanceOf[UTF8String], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.dsirBuckets($c, $b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** dsir_score(string, array<long>) → length-normalized int64 importance
  * score against a dense bucket weight vector.
  */
case class DsirScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any, w: Any): Any =
    ExpressionKernels.dsirScore(t.asInstanceOf[UTF8String], w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.functions.ExpressionKernels.dsirScore($t, $w)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** max_match_count(text, vocab) → greedy maximal-munch token count. */
case class MaxMatchCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any, v: Any): Any =
    ExpressionKernels.maxMatchCount(t.asInstanceOf[UTF8String], v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v) => s"graft.functions.ExpressionKernels.maxMatchCount($t, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** unigram_viterbi(text, vocab, freqs) → struct(n_tokens, freq_sum):
  * lexicographic Viterbi segmentation over a frequency-weighted
  * vocabulary — see [[ExpressionKernels.unigramViterbi]].
  */
case class UnigramViterbi(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("freq_sum", LongType, nullable = false)))
  override def nullSafeEval(t: Any, v: Any, f: Any): Any =
    ExpressionKernels.unigramViterbi(t.asInstanceOf[UTF8String],
      v.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, v, f) =>
      s"graft.functions.ExpressionKernels.unigramViterbi($t, $v, $f)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** jl_sketch(array<float>, dPrime) → struct(proj_checksum, proj_norm2). */
case class JlSketch(child: Expression, dPrime: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("proj_checksum", LongType, nullable = false),
    StructField("proj_norm2", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.jlSketch(v.asInstanceOf[ArrayData], dPrime)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.jlSketch($c, $dPrime)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** minhash_sig(array<string>, k) → array<string> of k hex digests. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** token_stats(string) → struct(n_chars, n_tokens, n_types, n_stopwords). */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.tokenStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.tokenStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** rep_stats(string) → struct(den, top2..top4, dup5..dup10): Gopher
  * repetition numerators, see [[ExpressionKernels.repStats]].
  */
case class RepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    (Seq("den", "top2", "top3", "top4") ++ (5 to 10).map("dup" + _))
      .map(StructField(_, LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.repStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.repStats($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lang_scores(string) → struct(s_en, s_de, s_es, s_fr, s_zh). */
case class LangScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    Seq("s_en", "s_de", "s_es", "s_fr", "s_zh")
      .map(StructField(_, LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.langScores(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.langScores($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_sub_dists(array<float>, array<float>) → array<long> of m quantized
  * per-subspace squared-L2 distances.
  */
case class PqSubDists(left: Expression, right: Expression, m: Int, subDim: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    ExpressionKernels.pqSubDists(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExpressionKernels.pqSubDists($a, $b, $m, $subDim)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** winnow(string, k, w) → array<long> of distinct window-min fingerprints. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.winnow(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** lsh_bucket(array<float>, planes) → long bucket id (default 8 planes;
  * up to [[ExpressionKernels.MaxPlanes]] — plane p's weights depend only
  * on p, so more planes strictly refine the bucketing).
  */
case class LshBucket(child: Expression, planes: Int = 8) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.lshBucket(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.lshBucket($c, $planes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** byte_repr(string) → string: each UTF-8 byte b of the input becomes
  * the single character U+0100+b — the byte-level BPE symbol alphabet
  * ([[graft.operators.TextOps]] byte lanes). A uniform offset map
  * (instead of GPT-2's mixed printable/shifted table) keeps the oracle
  * a one-line `chr(256 + byte)` in DuckDB while preserving the defining
  * byte-level property: the base vocabulary is exactly 256 symbols and
  * multi-byte characters decompose into them. Injective, and the image
  * (U+0100–U+01FF) is disjoint from the private-use merge symbols
  * (U+E000+), so hostile corpora need no pre-filter.
  */
case class ByteRepr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.byteRepr(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.byteRepr($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points (Spark 4: Column↔Expression bridging goes
  * through classic.ExpressionUtils).
  */
object functions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSim(toExpression(a), toExpression(b)))
  def l2_sq(a: Column, b: Column): Column =
    toColumn(L2SqInt(toExpression(a), toExpression(b)))
  def simhash60(tokens: Column): Column = toColumn(SimHash60(toExpression(tokens)))
  def word_shingles(text: Column, k: Int): Column =
    toColumn(WordShingles(toExpression(text), k))
  def dsir_buckets(text: Column, b: Int): Column =
    toColumn(DsirBuckets(toExpression(text), b))
  def dsir_score(text: Column, weights: Column): Column =
    toColumn(DsirScore(toExpression(text), toExpression(weights)))
  def max_match_count(text: Column, vocab: Column): Column =
    toColumn(MaxMatchCount(toExpression(text), toExpression(vocab)))
  def unigram_viterbi(text: Column, vocab: Column, freqs: Column): Column =
    toColumn(UnigramViterbi(toExpression(text), toExpression(vocab),
      toExpression(freqs)))
  def jl_sketch(emb: Column, dPrime: Int): Column =
    toColumn(JlSketch(toExpression(emb), dPrime))
  def minhash_sig(shingles: Column, k: Int): Column =
    toColumn(MinHashSig(toExpression(shingles), k))
  def token_stats(text: Column): Column = toColumn(TokenStats(toExpression(text)))
  def rep_stats(text: Column): Column = toColumn(RepStats(toExpression(text)))
  def nfc_casefold(text: Column): Column = toColumn(NfcCasefold(toExpression(text)))
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFingerprints(toExpression(text), k, w))
  def pq_sub_dists(a: Column, b: Column, m: Int, subDim: Int): Column =
    toColumn(PqSubDists(toExpression(a), toExpression(b), m, subDim))
  def lang_scores(text: Column): Column = toColumn(LangScores(toExpression(text)))
  def lsh_bucket(emb: Column, planes: Int = 8): Column =
    toColumn(LshBucket(toExpression(emb), planes))
  def byte_repr(text: Column): Column = toColumn(ByteRepr(toExpression(text)))
}
