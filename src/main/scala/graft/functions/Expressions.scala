package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Distinct word k-gram shingles of a single-space-separated string —
    * one pass, first-occurrence order (same contents as
    * array_distinct(transform(sequence…, concat_ws(element_at…)))), which
    * chains four non-codegen higher-order functions to do the same thing.
    */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(' ')
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

/** simhash60(array<string>) → long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.simhash60(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.simhash60($c)")
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

/** minhash_sig(array<string>, k) → array<string> of k hex digests. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ExpressionKernels.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExpressionKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points (Spark 4: Column↔Expression bridging goes
  * through classic.ExpressionUtils).
  */
object functions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSim(toExpression(a), toExpression(b)))
  def simhash60(tokens: Column): Column = toColumn(SimHash60(toExpression(tokens)))
  def word_shingles(text: Column, k: Int): Column =
    toColumn(WordShingles(toExpression(text), k))
  def minhash_sig(shingles: Column, k: Int): Column =
    toColumn(MinHashSig(toExpression(shingles), k))
}
