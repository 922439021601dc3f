package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the SQ8-compressed HNSW serving tier:
  *
  *  - the gate lane (`ann_hnsw_sq8_topk`) stays brute-force exact — the
  *    compressed walk's pool must cover the true top-k at the operating
  *    point so the exact-cosine refine reproduces the truth;
  *  - the compressed-domain approximate regime (`ann_hnsw_sq8_recall`,
  *    efS=16, ranked by the integer SQ8 walk distance — no refine)
  *    holds the same recall floor as the float lane;
  *  - the SQ8 store is MATERIALLY smaller at rest than the float
  *    bucketed store over the same graph — the production reason the
  *    tier exists (one-byte codes vs 4-byte floats).
  */
class HnswSq8Spec extends SparkSpec {
  import spark.implicits._

  test("compressed gate lane == brute-force truth (exact after refine)") {
    val truth = Similarity.cosineTopK(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("sim"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val got = Hnsw.hnswSq8TopK(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === truth)
  }

  test("compressed-domain approximate regime (efS=16) holds the recall floor") {
    val rec = Hnsw.hnswSq8Recall(spark, sfDir).agg(
      sum(col("hits")).as("h"), sum(col("k")).as("n")).collect()(0)
    val recall = rec.getLong(0).toDouble / rec.getLong(1)
    info(f"sq8 efS=16 mean recall = $recall%.4f over ${rec.getLong(1)} slots")
    assert(recall >= 0.85, s"recall=$recall")
  }

  test("sf1 residual: at most one slot in 800 misses (the float gate's measured limit)") {
    // the fixed-ef decay at 10x corpus — the float lane's Params
    // scaladoc documents exactly one slot in 800 at efS=128, knob-
    // insensitive; the SQ8 walk must not widen that residual
    val sf1Dir = sys.props.getOrElse(
      "graft.sf1.dir", "/root/repo/target/gendata/sf1")
    assume(new java.io.File(s"$sf1Dir/embeddings.parquet").exists(),
      s"sf1 drill corpus absent at $sf1Dir")
    val truth = Similarity.cosineTopK(spark, sf1Dir)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Hnsw.hnswSq8TopK(spark, sf1Dir)
      .select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- got
    info(s"sf1 sq8 gate: ${missed.size} of ${truth.size} slots missed")
    assert(missed.size <= 1,
      s"sq8 sf1 residual widened: ${missed.size} slots missed")
  }

  test("SQ8 store bytes < float store bytes over the same graph") {
    import graft.sources.FsPaths
    val sq8 = Hnsw.ensureSq8GraphStore(spark, sfDir)
    val flt = Hnsw.ensureBucketedGraphStore(spark, sfDir)
    def bytes(table: String): Long = {
      val p = FsPaths.warehouseTablePath(spark, table)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }
    val (bs, bf) = (bytes(sq8), bytes(flt))
    info(s"sq8 store = $bs bytes, float store = $bf bytes " +
      f"(ratio ${bs.toDouble / bf}%.3f)")
    assert(bs < bf, s"compressed store must be smaller: sq8=$bs float=$bf")
  }
}
