package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection: MinHash + LSH banding, SimHash, and exact
  * n-gram Jaccard — the scale path for corpus dedup.
  *
  * Design for 100 TB:
  *  - Shingling and signatures are per-row expression work (no shuffle).
  *  - LSH banding turns the O(n²) all-pairs problem into a shuffle on
  *    (band_id, band_key): only docs agreeing on a whole band meet. With
  *    r rows per band and b bands, a pair of Jaccard j collides with
  *    probability 1-(1-j^r)^b — r=4, b=3 passes j≥0.9 with ~99.9% and
  *    suppresses j≤0.3 to <2.4%.
  *  - Exact Jaccard verification joins only the candidate pairs back to
  *    their shingle sets (an inverted-index join on shingle), never the
  *    full cross product.
  *
  * Determinism: every hash in the pipeline is md5 (identical bytes in
  * Spark and DuckDB), and minima are taken over lowercase-hex strings
  * (byte-wise lexicographic in both engines), so the whole pipeline is
  * oracle-checkable — unusual for MinHash implementations, deliberate
  * here.
  */
object MinHash {

  val ShingleSize = 3
  val NumHashes   = 12
  val BandRows    = 4 // => 3 bands

  /** doc_id, shingle (distinct word k-grams).
    *
    * Distinctness is PER DOC, so `array_distinct` before the explode gives
    * the same rows as a global `.distinct()` — without the distinct's
    * two-exchange shuffle. element_at instead of slice(): slice copies a
    * sub-array per shingle (O(k) alloc each); element_at reads in place.
    */
  def shingles(docs: DataFrame, k: Int = ShingleSize): DataFrame =
    shingleArray(docs, k)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** doc_id, shingles: the same k-grams as `shingles` but as one array
    * per doc — no row explosion, so signature computation needs no
    * shuffle at all.
    */
  def shingleArray(docs: DataFrame, k: Int = ShingleSize): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.functions.word_shingles(col("text"), k).as("shingles"))

  /** doc_id, sig: array of NumHashes minhash values. Hash family j is
    * md5(j || '|' || shingle); the signature element is the lexicographic
    * minimum hex digest per family.
    *
    * Computed per-row by the custom [[graft.functions.MinHashSig]]
    * expression (single pass over the shingle array, stays in codegen) —
    * semantically identical to the groupBy(doc).agg(min(md5...)×k)
    * formulation the oracle SQL uses, but with ZERO shuffle.
    */
  def signatures(docs: DataFrame): DataFrame =
    shingleArray(docs).select(col("doc_id"),
      graft.functions.functions.minhash_sig(col("shingles"), NumHashes).as("sig"))

  /** doc_id, band_id, band_key — one row per band; band_key = md5 of the
    * band's concatenated signature rows.
    */
  def bands(sigs: DataFrame): DataFrame = {
    val nBands = NumHashes / BandRows
    val bandRows = (0 until nBands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|",
          (0 until BandRows).map(r => col("sig")(b * BandRows + r)): _*)).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandRows: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs (doc_a < doc_b) sharing at least one full band. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band_id"), col("band_key"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band_id"), col("band_key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact shingle-set Jaccard for given (doc_a, doc_b) pairs: joins the
    * pair list back to the shingle inverted index — cost proportional to
    * candidate pairs, not n².
    */
  def exactJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .join(pairs, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
  }

  /** MinHash-LSH near-dup pairs, exact-verified at `threshold`.
    *
    * `sh` feeds four joins (inverted index both sides + two size lookups)
    * and `cand` two — persist them so each shuffles once instead of being
    * recomputed per branch. (On a cluster this is the classic
    * materialize-the-inverted-index step; at 100 TB it would be a bucketed
    * table, not an in-memory cache.)
    */
  def minhashDedup(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = Tables.documents(spark, dir)
    val sh = shingles(docs).persist(MEMORY_AND_DISK)
    // signatures persisted too: the band self-join reads them twice
    val sigs = signatures(docs).persist(MEMORY_AND_DISK)
    val cand = candidatePairs(bands(sigs)).persist(MEMORY_AND_DISK)
    exactJaccard(cand, sh)
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Greedy near-dedup: drop every doc that is the larger id in a
    * verified near-dup pair; survivors are the canonical docs.
    */
  def minhashSurvivors(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val dupes = minhashDedup(spark, dir, threshold).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
      .join(dupes, Seq("doc_id"), "left_anti")
  }

  /** Exact n-gram Jaccard pairs over the shingle inverted index (no LSH):
    * the ground-truth near-dup op. Only docs sharing ≥1 shingle pair up,
    * so cost is Σ_shingle freq² — fine when shingles are selective.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(Tables.documents(spark, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val allPairs = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    allPairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 60-bit SimHash per document from distinct whitespace tokens.
    * Token hash = first 15 hex chars of md5 (60 bits); simhash bit b is
    * the majority vote of token bits. Computed in one pass per row by
    * the custom [[graft.functions.SimHash60]] expression (no explode, no
    * shuffle); the DuckDB oracle replays the equivalent declarative
    * vote pipeline and matches exactly.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.functions.simhash60(split(col("text"), " ")).as("simhash"))
      .orderBy(col("doc_id"))
}
