package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{functions => gf}

/** Bit-for-bit equivalence of the custom expression kernels with their
  * declarative (higher-order-function) formulations — the property the
  * DuckDB oracle parity rests on. Guards future kernel edits.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSim kernel ≡ aggregate/zip_with declarative cosine, bit-exact") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(100)
    val a = emb.select(col("vec_id"), col("embedding").as("e1"))
    val b = emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("e2"))
    val pairs = a.join(b, "vec_id")
    val diff = pairs.select(
        gf.cosine_sim(col("e1"), col("e2")).as("fast"),
        graft.operators.Similarity.cosineDeclarative(col("e1"), col("e2")).as("slow"))
      .filter(col("fast") =!= col("slow")) // exact double equality
    assert(diff.isEmpty)
  }

  test("WordShingles kernel ≡ transform/array_distinct declarative shingling") {
    val docs = graft.Tables.documents(spark, sfDir).limit(100)
    val toks = split(col("text"), " ")
    val n = size(toks) - 2
    val declarative = array_distinct(when(n >= 1,
      transform(sequence(lit(1), n),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))).otherwise(array()))
    val diff = docs.select(
        gf.word_shingles(col("text"), 3).as("fast"),
        declarative.as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.isEmpty)
  }

  test("kernels handle degenerate inputs: empty text, short text") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "one two")).toDF("id", "text")
    val sh = df.select(col("id"), gf.word_shingles(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(2) === Seq.empty)
    assert(sh(3) === Seq.empty)
    // simhash of single-token text = that token's bit pattern
    val h = df.filter(col("id") === 2)
      .select(gf.simhash60(split(col("text"), " "))).as[Long].head()
    val expected = ExpressionKernels.md5Prefix60("one")
    assert(h === expected)
  }

  test("md5Prefix60 matches Spark's conv(substring(md5)) formulation") {
    val df = Seq("hello", "a", "spark engine").toDF("s")
    val sparkSide = df.select(
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("bigint")).as[Long].collect()
    val kernelSide = Seq("hello", "a", "spark engine").map(ExpressionKernels.md5Prefix60)
    assert(sparkSide.toSeq === kernelSide)
  }

  test("TokenStats kernel ≡ declarative quality pipeline on the corpus") {
    val fast = graft.operators.TextOps.qualityScore(spark, sfDir)
    val slow = graft.operators.TextOps.qualityScoreDeclarative(spark, sfDir)
    assert(fast.columns.toSeq === slow.columns.toSeq)
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("LangScores kernel ≡ declarative marker counting on the corpus") {
    val fast = graft.operators.TextOps.langId(spark, sfDir)
    val slow = graft.operators.TextOps.langIdDeclarative(spark, sfDir)
    assert(fast.columns.toSeq === slow.columns.toSeq)
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("LshBucket kernel ≡ declarative zip_with/aggregate projections") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val fast = graft.operators.Similarity.lshBuckets(emb).select("vec_id", "bucket")
    val slow = graft.operators.Similarity.lshBucketsDeclarative(emb).select("vec_id", "bucket")
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("PqSubDists kernel ≡ declarative slice/zip_with sub-distances") {
    val emb = graft.Tables.embeddings(spark, sfDir).limit(60)
    val a = emb.select(col("vec_id"), col("embedding").as("e1"))
    val b = emb.select((col("vec_id") + 1).as("vec_id"), col("embedding").as("e2"))
    val declarative = (0 until 8).map { s =>
      floor(aggregate(
        zip_with(slice(col("e1"), s * 8 + 1, 8), slice(col("e2"), s * 8 + 1, 8),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v) * 1e6).cast("long")
    }
    val diff = a.join(b, "vec_id").select(
        gf.pq_sub_dists(col("e1"), col("e2"), 8, 8).as("fast"),
        array(declarative: _*).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.isEmpty)
  }

  test("winnow: the MOSS guarantee — shared runs of ≥ w+k-1 tokens share a fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    def fps(s: String): Set[Long] =
      ExpressionKernels.winnow(UTF8String.fromString(s), 3, 4)
        .toLongArray().toSet
    // identical docs → identical fingerprints
    val a = "the quick brown fox jumps over the lazy dog again and again"
    assert(fps(a) === fps(a))
    // a shared 6-token (w+k-1 = 6) run embedded in different contexts
    // must produce at least one common fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val doc1 = s"one two three $shared seven eight nine ten eleven"
    val doc2 = s"xx yy $shared zz ww vv uu tt ss rr qq pp"
    assert(fps(doc1).intersect(fps(doc2)).nonEmpty)
    // unrelated docs share nothing
    val doc3 = "p q r s t u v w x y z aa bb cc dd"
    assert(fps(doc1).intersect(fps(doc3)).isEmpty)
    // short text (< w full windows) → empty, not a crash
    assert(fps("a b c") === Set.empty)
    // fingerprints are sorted ascending (deterministic array layout)
    val arr = ExpressionKernels.winnow(UTF8String.fromString(doc1), 3, 4).toLongArray()
    assert(arr.toSeq === arr.sorted.toSeq)
  }

  test("no CodegenFallback remains in the kernelized text/LSH plans") {
    Seq(
      graft.operators.TextOps.qualityScore(spark, sfDir),
      graft.operators.TextOps.langId(spark, sfDir),
      graft.operators.TextOps.corpusProfile(spark, sfDir),
      graft.operators.Similarity.lshBuckets(graft.Tables.embeddings(spark, sfDir))
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      // ArrayFilter/ArrayTransform/ArrayAggregate are the CodegenFallback
      // HOFs these kernels replace; none may survive in the plan
      Seq("array_filter", "ArrayFilter", "ArrayTransform", "ArrayAggregate", "ZipWith")
        .foreach(op => assert(!plan.contains(op), s"$op in:\n${plan.take(600)}"))
    }
  }
}
