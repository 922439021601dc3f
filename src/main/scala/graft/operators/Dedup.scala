package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record states of the dedup protocol.
  *
  * Values mirror the reference's `RecordState` enum
  * (reference: src/main/kotlin/com/stroiker/distributed/deduplicator/
  * provider/DeduplicationProvider.kt:250-257).
  */
object RecordState {
  val Success: Short   = 1
  val Duplicate: Short = 2
  val Retry: Short     = 3
  val Failed: Short    = 4
}

/** Set-oriented deduplication operators.
  *
  * The reference implements a per-call, keyed, first-writer-wins dedup
  * protocol over Cassandra: one partition per key, attempts time-ordered
  * by a `(time_uuid, record_uuid)` clustering key, winner = earliest
  * attempt (reference: DeduplicationProvider.kt:35-123, clustering order
  * :230-233, winner pick :68-69). Spark's shuffle gives that ordering
  * deterministically per key, so the batch translation needs no retry
  * loop: hash-partition by key, pick the minimum by the ordering columns.
  *
  * Scale notes (100 TB):
  *  - `firstWins` uses `min_by` aggregation, NOT a window. A window
  *    (`row_number over partition by key`) must sort every partition's
  *    full attempt list; `min_by` is a hash aggregation with map-side
  *    partial combine — the shuffle carries one row per key per input
  *    partition instead of every attempt. That partial combine is the
  *    built-in analog of the reference's in-process "burst absorber"
  *    (reference: absorber/impl/CachedDuplicateBurstAbsorber.kt:16-19),
  *    which exists to suppress duplicate storage round-trips the same way
  *    a combiner suppresses duplicate shuffle rows.
  *  - `auditStates` genuinely needs every attempt labeled, so it uses the
  *    window; it shuffles all rows by construction.
  */
object Dedup {

  /** Deterministic total order for attempts: time first, unique id as the
    * tie-break — mirrors the reference's compound clustering key
    * `(time_uuid ASC, record_uuid)` (DeduplicationProvider.kt:230-233).
    */
  private def orderStruct(orderCols: Seq[String]): Column =
    struct(orderCols.map(col): _*)

  /** First-writer-wins dedup: for each key keep exactly the earliest row
    * by `orderCols` (lexicographic). Exactly-one-winner-per-key is the
    * invariant the reference's whole protocol converges to
    * (DeduplicationProvider.kt:67-95).
    *
    * One shuffle on the key with map-side partial combine, executed by
    * ObjectHashAggregateExec via the custom
    * [[graft.functions.FirstByOrder]] TypedImperativeAggregate — the
    * built-in `min_by(struct, struct)` degrades to SortAggregate (struct
    * buffers aren't hash-mutable), which would sort every map partition.
    */
  def firstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val cols = df.columns
    val winner = df
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.FirstByOrder.first_by_order(
        struct(cols.map(col): _*), orderStruct(orderCols)).as("w"))
    winner.select(cols.map(c => winner.col(s"w.$c").as(c)): _*)
  }

  /** Top-k rows per key by `orderCols` (ascending lexicographic), with a
    * 1-based `rk` rank column — the k>1 generalization of [[firstWins]],
    * executed as a k-bounded heap inside a hash aggregation
    * ([[graft.functions.TopKByOrder]]). The window formulation
    * (`row_number <= k`) sorts every partition's full group; this ships
    * at most k rows per key per map split and never sorts globally.
    * Pass pre-negated numeric order columns for descending semantics.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[Column], k: Int): DataFrame = {
    val cols = df.columns
    val top = df
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.TopKByOrder.top_k_by_order(
        struct(cols.map(col): _*), struct(orderCols: _*), k).as("__top"))
      .select(posexplode(col("__top")).as(Seq("__pos", "__row")))
    top.select(
      (cols.map(c => top.col(s"__row.$c").as(c)) :+
        (col("__pos") + 1).cast("bigint").as("rk")): _*)
  }

  /** Bloom-prefiltered membership — the scale pattern every ingest
    * dedup runs before its exact check: a constant-size bit set built
    * from the corpus (j=4 md5-derived positions per key in an m-bit
    * space) is broadcast, and a batch doc goes to the expensive exact
    * path only if ALL its positions are set. Emits, per batch doc, the
    * bloom verdict NEXT TO the exact-membership truth, so the one-sided
    * contract is in the gated values themselves: exact_dup = 1 ⇒
    * bloom_maybe = 1 (no false negatives, ever), while bloom_maybe = 1
    * ∧ exact_dup = 0 rows count the false positives the m/j sizing
    * buys.
    *
    * Deliberately NOT Spark's built-in BloomFilter aggregate: its
    * murmur-based bits aren't reproducible in the oracle; the
    * md5-position formulation is value-identical in DuckDB, which makes
    * even the sketch itself oracle-checkable.
    *
    * Scale: the bit set is ≤ m rows (a constant) → broadcast; the batch
    * probe is j codegen'd hashes per row plus one broadcast join. At
    * 100 TB the win is that only the maybe-set (true dups + εm false
    * positives) reaches the exact semi-join.
    */
  def bloomPrefilter(spark: SparkSession, dir: String, m: Int = 2048,
                     batchMod: Int = 5): DataFrame =
    // memoized: the build references the keyed corpus from four
    // subtrees, so it stages once per session instead of re-scanning
    // per enumeration
    StageMemo.memoized(spark, s"bloom_prefilter_${m}_$batchMod", dir)(
      bloomPrefilterOf(graft.Tables.documents(spark, dir), m, batchMod))

  /** [[bloomPrefilter]] over an explicit document frame — the spec
    * seam for dup-heavy synthetic corpora. The registry default m=2048
    * is deliberately UNDERSIZED for the 400-key corpus (~1.6k set bits
    * → ~50% fill → ~8% false-positive band), so the maybe-but-not-dup
    * rows are visibly non-zero while the no-false-negative side stays
    * absolute; production sizes m = −n·ln(ε)/ln(2)² as usual, which
    * changes only this constant, not the plan.
    */
  private[graft] def bloomPrefilterOf(docs: DataFrame, m: Int,
                                      batchMod: Int): DataFrame = {
    val j = 4
    // four subtrees read the keyed frame (corpus bits, batch probe,
    // exact batch side, exact corpus side) — persist it so the source
    // scans once per build (the caller memoizes the build per session)
    // ASCII-only case fold (TextOps.asciiLower rationale): lower() is
    // engine-divergent on Unicode and this key is oracle-compared
    val k = docs.select(col("doc_id"),
      TextOps.asciiLower(trim(col("text"))).as("key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pos(h: Int) = pmod(
      conv(substring(md5(concat(lit(s"$h|"), col("key"))), 1, 15), 16, 10)
        .cast("bigint"), lit(m.toLong))
    val posArr = array_distinct(array((0 until j).map(pos): _*))
    val corpusBits = k.filter(col("doc_id") % batchMod =!= 0)
      .select(explode(posArr).as("bit")).distinct()
      .withColumn("hit", lit(1L))
    val mb = k.filter(col("doc_id") % batchMod === 0)
      .select(col("doc_id"), explode(posArr).as("bit"))
      .join(broadcast(corpusBits), Seq("bit"), "left")
      .groupBy(col("doc_id"))
      .agg(when(count(lit(1)) === sum(coalesce(col("hit"), lit(0L))), 1L)
        .otherwise(0L).as("bloom_maybe"))
    val ex = k.filter(col("doc_id") % batchMod === 0)
      .join(k.filter(col("doc_id") % batchMod =!= 0)
          .select(col("key")).distinct().withColumn("e", lit(1L)),
        Seq("key"), "left")
      .select(col("doc_id"),
        when(col("e").isNotNull, 1L).otherwise(0L).as("exact_dup"))
    val out = ex.join(mb, Seq("doc_id"))
      .select(col("doc_id"), col("bloom_maybe"), col("exact_dup"))
      .orderBy(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (batch-cardinality) result so the keyed
    // intermediate can be released now instead of pinning the source
    // scan for the session lifetime; StageMemo's persist of the
    // returned frame is then a same-level no-op
    out.count()
    k.unpersist()
    out
  }

  /** Built-in `min_by` formulation — kept as the reference semantics spec
    * for FirstByOrder (DedupSpec asserts equality).
    */
  def firstWinsMinBy(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val cols = df.columns
    val winner = df
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(cols.map(col): _*), orderStruct(orderCols)).as("w"))
    winner.select(cols.map(c => winner.col(s"w.$c").as(c)): _*)
  }

  /** Audit-log variant: keep every attempt, labeled with its protocol
    * state — rank 1 by the time order → SUCCESS(1), later attempts →
    * DUPLICATE(2) (reference outcome after the dust settles:
    * DeduplicationProviderTest.kt:104-143). RETRY is a transient artifact
    * of the per-call protocol (see graft.provider.DedupProvider) and does
    * not appear in batch output; FAILED rows come in via `failedCol`.
    *
    * @param failedCol optional boolean column marking attempts whose
    *        business block failed → FAILED(4), excluded from winner
    *        selection (reference filters FAILED out at read:
    *        DeduplicationProvider.kt:132).
    */
  def auditStates(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                  failedCol: Option[Column] = None): DataFrame = {
    val failed = failedCol.getOrElse(lit(false))
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((col("__failed") +: orderCols.map(col)): _*)
    df.withColumn("__failed", failed)
      .withColumn("__rn", row_number().over(w))
      .withColumn("state",
        when(col("__failed"), lit(RecordState.Failed))
          .when(col("__rn") === 1, lit(RecordState.Success))
          .otherwise(lit(RecordState.Duplicate)).cast("smallint"))
      .drop("__failed", "__rn")
  }

  /** TTL expiry filter: keep rows whose `eventTimeCol + ttlSeconds` is
    * still in the future relative to a *pinned* `now`. `ttlSeconds = 0`
    * means immortal — the reference's `USING TTL 0` contract
    * (DeduplicationProvider.kt:147,203; README.md:44). `now` is a
    * parameter, never `current_timestamp()`, so results are reproducible
    * (FIXTURES.md §3).
    */
  def ttlFilter(df: DataFrame, eventTimeCol: String, ttlSeconds: Long,
                now: java.sql.Timestamp): DataFrame =
    if (ttlSeconds == 0L) df
    else {
      // Algebraically `ts + ttl > now`, but written as `ts > now - ttl`
      // with the cutoff folded on the LITERAL side and cast to the
      // column's own type: the `+ INTERVAL` form (a) is a non-atomic
      // predicate parquet cannot push (every row group decodes), and
      // (b) on a TIMESTAMP_NTZ scan coerces the COLUMN per row to the
      // session zone. Both costs land exactly on the 100-TB path — the
      // scale corpora read `ts` as a raw parquet column where min/max
      // row-group skipping applies; integer-micros arithmetic makes the
      // two forms row-for-row identical.
      val cutoff = java.sql.Timestamp.from(now.toInstant.minusSeconds(ttlSeconds))
      df.filter(col(eventTimeCol) >
        lit(cutoff).cast(df.schema(eventTimeCol).dataType))
    }

  /** Per-key attempt histogram — the observable the reference's
    * integration tests assert on (row count + state values per key,
    * DeduplicationProviderTest.kt:78-284), as one aggregation.
    */
  def counts(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_attempts"),
        min(orderStruct(orderCols)).as("first_attempt"),
        max(orderStruct(orderCols)).as("last_attempt"))
      .select(
        (keyCols.map(col) ++ Seq(
          col("n_attempts"),
          col("first_attempt").getField(orderCols.head).as("first_time"),
          col("last_attempt").getField(orderCols.head).as("last_time"))): _*)

  /** Explicit map-side pre-dedup (the reference's burst absorber, O11,
    * made visible): inside each input partition keep only the first row
    * per key (bounded hash map = the absorber's bounded cache), then run
    * the global `firstWins`. Output is identical to `firstWins` alone —
    * verified by DedupSpec — the pre-pass only shrinks the shuffle, as
    * the absorber only shrinks storage round-trips
    * (CachedDuplicateBurstAbsorber.kt:16-19, README.md:73).
    */
  def absorberFirstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                        maxCacheSize: Int = 1 << 20): DataFrame = {
    val pre = mapSideFirstWins(df, keyCols, orderCols, maxCacheSize)
    firstWins(pre, keyCols, orderCols)
  }

  /** The map-side pass alone: per-partition first-row-per-key with a
    * bounded cache (rows past the bound pass through un-absorbed — safe,
    * because the global aggregation re-checks; mirrors the absorber being
    * an optimization, not a correctness gate).
    */
  private[graft] def mapSideFirstWins(df: DataFrame, keyCols: Seq[String],
                                      orderCols: Seq[String], maxCacheSize: Int): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = orderCols.map(schema.fieldIndex)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    // Typed lexicographic compare on the order columns — must agree with
    // Catalyst's struct ordering (nulls first) so the local winner is the
    // global winner, including on null order values.
    def earlier(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < ordIdx.length) {
        val x = a.get(ordIdx(i))
        val y = b.get(ordIdx(i))
        if (x == null || y == null) {
          if ((x == null) != (y == null)) return x == null // null < non-null
        } else {
          val c = x.asInstanceOf[Comparable[Any]].compareTo(y)
          if (c != 0) return c < 0
        }
        i += 1
      }
      false
    }
    df.mapPartitions { it =>
      val seen = new java.util.HashMap[Seq[Any], Row]()
      // Overflow rows STREAM through (constant memory beyond the bounded
      // cache): buffering them until partition end would re-create exactly
      // the unbounded-memory problem maxCacheSize exists to prevent on
      // wide partitions. Iterator.++ takes its right side by-name, so the
      // cache winners are snapshotted only after the input is drained.
      val overflow = it.flatMap { row =>
        val k = keyIdx.map(row.get)
        val prev = seen.get(k)
        if (prev == null) {
          if (seen.size < maxCacheSize) { seen.put(k, row); Iterator.empty }
          else Iterator.single(row) // absorber full: fall through to global agg
        } else {
          if (earlier(row, prev)) seen.put(k, row)
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      overflow ++ seen.values().iterator().asScala
    }
  }
}
