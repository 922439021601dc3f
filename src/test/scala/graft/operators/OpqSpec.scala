package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the OPQ rotation sweep (Similarity.opqRecall, oracle row
  * `ann_opq_recall`) on its selection contract:
  *
  *  - every candidate rotation is a true permutation of the dims
  *    (permutation matrices are orthogonal — the OPQ requirement);
  *  - the identity row IS plain PQ: its validation hits equal the
  *    standing `ann_pq_recall` lane's total hits on the same budget;
  *  - exactly one rotation is chosen, and its hits are >= identity's
  *    (so the shipped rotation's recall is >= plain PQ's — a rotation
  *    ships only when it validates at least as well).
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  test("every candidate rotation is a bijection over the dims") {
    val cands = Similarity.opqCandidates(spark, sfDir)
    assert(cands.map(_._1) ===
      Seq("identity", "snake", "roundrobin", "stride"))
    cands.foreach { case (name, perm) =>
      assert(perm.sorted === (0 until 64), s"$name must be a permutation")
    }
    assert(cands.head._2 === (0 until 64), "identity must be the identity")
  }

  test("identity row = plain PQ; chosen row's hits >= identity's") {
    val rows = Similarity.opqRecall(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length === 4)
    assert(rows.count(_._5 == 1L) === 1, "exactly one chosen rotation")
    val idRow = rows.find(_._1 == "identity").get
    val chosen = rows.find(_._5 == 1L).get
    assert(chosen._3 >= idRow._3,
      "the shipped rotation must validate >= plain PQ")
    // identity's validation hits = the standing PQ recall lane's total
    val pqHits = Similarity.pqRecall(spark, sfDir)
      .agg(sum(col("hits"))).head.getLong(0)
    assert(idRow._3 === pqHits, "identity row must BE plain PQ")
    // n_truth is shared and positive
    assert(rows.map(_._4).distinct.length === 1 && idRow._4 > 0)
  }
}
