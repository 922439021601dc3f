package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the residual-encoded IVFPQ (Similarity.ivfpqTopK, oracle rows
  * `ann_ivfpq_topk`/`_recall`): re-centering PQ on the integer list
  * means must buy recall over the plain (non-residual) IVFADC on the
  * IDENTICAL budget (same coarse codebook, nProbe, K, m), and the
  * integer-mean centers must be exact under any partitioning.
  */
class IvfpqSpec extends SparkSpec {
  import spark.implicits._

  test("residual encoding beats plain IVFADC on the same budget") {
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("hits")).as("h"), sum(col("k")).as("n")).head
    val res = total(Similarity.ivfpqRecall(spark, sfDir))
    val plain = total(Similarity.ivfadcRecall(spark, sfDir))
    info(s"ivfpq ${res.getLong(0)}/${res.getLong(1)} vs " +
      s"ivfadc ${plain.getLong(0)}/${plain.getLong(1)}")
    assert(res.getLong(1) === plain.getLong(1))
    assert(res.getLong(0) >= plain.getLong(0),
      "residual codes must not lose recall vs plain IVFADC")
  }

  test("list centers are exact integer means, repartition-stable") {
    val assigned = Similarity.ivfAssigned(spark, sfDir)
    // reference: driver-side exact integer mean of dim 0 per list
    val rows = assigned.select(col("list_id"),
        floor(element_at(col("embedding"), 1).cast("double") * 1000000)
          .cast("bigint").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (l, vs) =>
      val s = vs.map(_._2).sum
      val n = vs.length
      // the non-negative lift: floor division on any-sign sums
      l -> (Math.floorDiv(s + 2000000L * n, n.toLong) - 2000000L)
    }
    val got = assigned.select(col("list_id"),
        posexplode(transform(col("embedding"),
          x => floor(x.cast("double") * 1000000).cast("bigint")))
          .as(Seq("d", "v")))
      .filter(col("d") === 0)
      .repartition(7) // any partitioning — integer sums are exact
      .groupBy(col("list_id"))
      .agg(expr("(sum(v + 2000000) div count(1)) - 2000000").as("mv"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expect)
  }
}
