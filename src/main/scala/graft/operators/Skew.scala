package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: the classic two-phase salted aggregate.
  *
  * A hot key at 100 TB sends its entire group through one reducer. With
  * a salt the first phase spreads each key over `saltFactor` reducers
  * (map-side partial agg still applies within each), and the second,
  * tiny phase merges the per-salt partials. Only aggregates with an
  * associative merge decomposition can be salted — count/sum/min/max
  * are provided here.
  *
  * Results are identical to the direct aggregation (asserted by
  * SkewSpec and by dedup_counts_salted sharing dedup_counts' DuckDB
  * oracle): decimal/long sums are order-independent, min/max associative.
  */
object Skew {

  sealed trait SaltedAgg { def col: String; def as: String }
  case class SaltedCount(as: String) extends SaltedAgg { val col = "" }
  case class SaltedSum(col: String, as: String) extends SaltedAgg
  case class SaltedMin(col: String, as: String) extends SaltedAgg
  case class SaltedMax(col: String, as: String) extends SaltedAgg

  /** Two-phase salted groupBy. `saltFactor` ≈ number of reducers a hot
    * key should spread across.
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String],
                      aggs: Seq[SaltedAgg], saltFactor: Int = 16): DataFrame = {
    // deterministic salt: spread rows of one key without RNG (hash of a
    // unique-ish projection of all columns would also work; monotonic id
    // is fine because phase 1 results are merged exactly in phase 2)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() * 31 + monotonically_increasing_id(), lit(saltFactor)))
    val phase1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(
        aggs.head match {
          case SaltedCount(as)   => count(lit(1)).as(as)
          case SaltedSum(c, as)  => sum(col(c)).as(as)
          case SaltedMin(c, as)  => min(col(c)).as(as)
          case SaltedMax(c, as)  => max(col(c)).as(as)
        },
        aggs.tail.map {
          case SaltedCount(as)   => count(lit(1)).as(as)
          case SaltedSum(c, as)  => sum(col(c)).as(as)
          case SaltedMin(c, as)  => min(col(c)).as(as)
          case SaltedMax(c, as)  => max(col(c)).as(as)
        }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(
        aggs.head match {
          case SaltedCount(as)   => sum(col(as)).as(as) // counts merge by sum
          case SaltedSum(c, as)  => sum(col(as)).as(as)
          case SaltedMin(c, as)  => min(col(as)).as(as)
          case SaltedMax(c, as)  => max(col(as)).as(as)
        },
        aggs.tail.map {
          case SaltedCount(as)   => sum(col(as)).as(as)
          case SaltedSum(c, as)  => sum(col(as)).as(as)
          case SaltedMin(c, as)  => min(col(as)).as(as)
          case SaltedMax(c, as)  => max(col(as)).as(as)
        }: _*)
  }

  /** Skew-resistant equi-join: salt the (skewed) probe side and replicate
    * the build side once per salt, so a hot key's rows spread across
    * `saltFactor` reducers instead of funneling through one. AQE's
    * skew-join split handles sort-merge cases adaptively; the explicit
    * salt is for when the skew is known a priori (or the join is
    * hash-based where AQE's splitter doesn't apply) — and it makes the
    * technique visible and testable.
    *
    * Semantics: identical to `probe.join(build, keys, "inner")`. Each
    * probe row carries exactly one deterministic salt (xxhash64 of the
    * whole row — no RNG, so re-execution of a failed task re-derives the
    * same salt); the build side is exploded to all salts, so every
    * (probe row, matching build row) pair meets exactly once.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltFactor: Int = 16): DataFrame = {
    val p = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(saltFactor)))
    val b = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
