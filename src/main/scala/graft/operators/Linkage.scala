package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy record linkage: edit-distance near-duplicate detection over a
  * short-string key column — the entity-resolution counterpart of the
  * document-level near-dup lanes (catalog titles, product names, author
  * strings). Classic blocking-and-verify shape (Fellegi–Sunter style
  * blocking; Levenshtein verify), kept exact end-to-end: both engines
  * implement the same classic dynamic-programming edit distance on
  * integers, so the verified pairs are oracle-exact with no
  * quantization at all.
  *
  * Pipeline:
  *   1. DISTINCT-VALUE reduction first: group the corpus by the string
  *      key, carrying the occurrence count. Linkage then runs over the
  *      value vocabulary, never the row count — the same collapse the
  *      hot-band hardening applies to exact-dup classes (a 10k-copy
  *      name costs one vocabulary row, not 10k² candidate pairs).
  *   2. BLOCKING: candidate pairs must share at least one word token
  *      (explode + equi-join on the token — never an all-pairs cross).
  *      A pair sharing two tokens enters once (DISTINCT on the pair).
  *   3. VERIFY: `levenshtein(a, b) <= maxDist`, dist > 0 (exact equals
  *      are the exact-dedup lanes' job), ordered `name_a < name_b`.
  *
  * Scale: step 1 is one hash-agg over the corpus; the vocabulary is
  * orders of magnitude smaller than the data (64 names from 2000 parts
  * at sf0.01) and is broadcast into the blocking self-join. The verify
  * cost is |blocked pairs| · O(len²) DP — bounded by the blocking key's
  * selectivity, never corpus-quadratic. At 100 TB the vocabulary frame
  * for a short-string key is still dimension-sized; if a key's
  * vocabulary itself grew data-sized the blocking join degrades
  * gracefully to a shuffle join on the token.
  */
object Linkage {

  /** Near-duplicate name pairs in `part.p_name`: distinct names sharing
    * a word token, within `maxDist` edits, each with its occurrence
    * count — (name_a, name_b, dist, n_a, n_b).
    */
  def fuzzyNamePairs(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
    // counts ride THROUGH the blocking join (they're functionally
    // dependent on the name), so no post-verify count joins re-run the
    // distinct-name aggregation — the corpus is aggregated once per
    // join side instead of four times
    val tok = names.select(col("name"), col("n_parts"),
      explode(split(col("name"), " ")).as("t"))
    val a = tok.select(col("name").as("name_a"), col("n_parts").as("n_a"), col("t"))
    val b = tok.select(col("name").as("name_b"), col("n_parts").as("n_b"), col("t"))
    a.join(broadcast(b), Seq("t"))
      .where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b")).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .where(col("dist") > 0 && col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }
}
