package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** 1-bit binary-quantization index specs: trained thresholds equal the
  * exact per-dimension sums, packed codes reconstruct the bit rule,
  * the Hamming ranking matches a full driver-side recomputation, and
  * recall vs brute truth is the exact intersection.
  */
class BqSpec extends SparkSpec {
  import spark.implicits._

  private def microOf(emb: Array[Float]): Array[Long] =
    emb.map(x => math.floor(x.toDouble * 1e6).toLong)

  private def corpus() = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    .collect().map { case (id, e) => (id, microOf(e)) }

  private def packedOf(m: Array[Long], n: Long, s: Array[Long]): (Long, Long) = {
    val bits = Array.tabulate(Similarity.Dims)(d => if (m(d) * n > s(d)) 1L else 0L)
    val lo = (0 until 32).map(d => bits(d) << d).sum
    val hi = (32 until 64).map(d => bits(d) << (d - 32)).sum
    (lo, hi)
  }

  test("bqTrained: one row carrying the exact corpus count and per-dim sums") {
    val t = Similarity.bqTrained(spark, sfDir).collect()
    assert(t.length === 1)
    val n = t(0).getAs[Long]("n")
    val s = t(0).getAs[scala.collection.Seq[Long]]("s")
    val vecs = corpus()
    assert(n === vecs.length.toLong)
    assert(s.length === Similarity.Dims)
    (0 until Similarity.Dims).foreach { d =>
      assert(s(d) === vecs.map(_._2(d)).sum, s"sum at dim $d")
    }
  }

  test("bqCodes: two 32-bit words per vector reconstructing the mean-threshold bits") {
    val t = Similarity.bqTrained(spark, sfDir).collect()(0)
    val n = t.getAs[Long]("n")
    val s = t.getAs[scala.collection.Seq[Long]]("s").toArray
    val codes = Similarity.bqCodes(spark, sfDir)
      .select(col("vec_id"), col("lo"), col("hi"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val vecs = corpus()
    assert(codes.size === vecs.length)
    vecs.foreach { case (id, m) =>
      val (lo, hi) = codes(id)
      assert(lo >= 0L && lo < (1L << 32), s"lo out of word range for $id")
      assert(hi >= 0L && hi < (1L << 32), s"hi out of word range for $id")
      assert((lo, hi) === packedOf(m, n, s), s"packed code mismatch for $id")
    }
  }

  test("bqTopK: ranking equals a full driver-side Hamming recomputation") {
    val t = Similarity.bqTrained(spark, sfDir).collect()(0)
    val n = t.getAs[Long]("n")
    val s = t.getAs[scala.collection.Seq[Long]]("s").toArray
    val packed = corpus().map { case (id, m) => (id, packedOf(m, n, s)) }
    val expected = packed.filter(_._1 % 50 == 0).flatMap { case (qid, (qlo, qhi)) =>
      packed.filter(_._1 != qid)
        .map { case (cid, (lo, hi)) =>
          (cid, java.lang.Long.bitCount(lo ^ qlo).toLong +
            java.lang.Long.bitCount(hi ^ qhi).toLong)
        }
        .sortBy { case (cid, d) => (d, cid) }.take(5)
        .zipWithIndex
        .map { case ((cid, d), i) => (qid, cid, d, (i + 1).toLong) }
    }.toSet
    val got = Similarity.bqTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("ham_dist"), r.getAs[Long]("rnk"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "vacuous: no query produced a ranking")
  }

  test("bqRerankTopK: refine re-ranks the Hamming shortlist by exact cosine") {
    val pool = Similarity.bqTopK(spark, sfDir, k = 25)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (0 until Similarity.Dims).foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Similarity.bqRerankTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rnk")))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      // every refined hit comes from the Hamming shortlist…
      rows.foreach { case (_, v, _) => assert(pool(q).contains(v)) }
      // …and is exactly the cosine-sorted prefix of that shortlist
      val expect = pool(q).toSeq
        .map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, s) => (-s, v) }.take(5).map(_._1)
      assert(rows.sortBy(_._3).map(_._2).toSeq === expect, s"query $q")
    }
  }

  test("bqRecall: hits are the exact intersection with the brute truth") {
    val truth = Similarity.cosineTopK(spark, sfDir)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val apx = Similarity.bqTopK(spark, sfDir)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rec = Similarity.bqRecall(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("hits"), r.getAs[Long]("k")))
    assert(rec.nonEmpty)
    assert(rec.map(_._1).toSet === truth.keySet, "every truth query must appear")
    rec.foreach { case (q, hits, k) =>
      assert(k === 5L)
      val expect = truth(q).intersect(apx.getOrElse(q, Set.empty)).size.toLong
      assert(hits === expect, s"query $q")
      assert(hits >= 0L && hits <= k)
    }
  }
}
