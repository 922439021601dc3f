package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The end-to-end corpus-curation CAPSTONE: near-dup cluster survivor
  * selection ([[MinHash.clusterSurvivors]] — transitive-safe,
  * longest-member-wins) composed with a quality gate
  * ([[TextOps.qualityScore]] signals), summarized per provenance
  * source — the one-row-per-source report a training-data pipeline
  * publishes after every curation run: how much came in, what dedup
  * removed, what quality removed, what ships.
  *
  * The quality gate here is deliberately STRICTER than text_quality's
  * contract row (≥ 40 tokens, at least one English stopword, bounded
  * avg token length): the curation decision is a policy choice, and at
  * the test corpus's distribution this policy drops a meaningful
  * fraction on each leg, so every column of the report is non-vacuous.
  *
  * Scale: both inputs are session-staged intermediates (the cluster
  * labels memoize; the quality signals are one codegen pass), the
  * composition is two broadcast-sized joins against the documents scan,
  * and the output is source-cardinality.
  */
object Curation {

  def curationSummary(spark: SparkSession, dir: String,
                      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val kept = MinHash.clusterSurvivors(spark, dir, threshold)
      .select(col("doc_id"), col("kept"))
    val quality = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"),
        (col("n_tokens") >= 40 && col("n_stopwords") >= 1 &&
          col("avg_token_len") < 12.0).as("is_quality"))
    docs.join(kept, Seq("doc_id")).join(quality, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept") === 0, 1L).otherwise(0L)).as("n_dup_dropped"),
        sum(when(col("kept") === 1 && !col("is_quality"), 1L).otherwise(0L))
          .as("n_quality_dropped"),
        sum(when(col("kept") === 1 && col("is_quality"), 1L).otherwise(0L))
          .as("n_final"))
      .orderBy(col("source"))
  }

  /** The CROSS-MODALITY capstone: a doc ships only if every modality's
    * dedup lane keeps it — text (near-dup cluster survivor,
    * longest-member-wins), image (dHash), audio (aHash), and video
    * (vHash) perceptual lanes (a doc is dropped by a media lane when it
    * is the larger id of a verified near-dup pair, the same
    * greater-id-loses rule as [[MinHash.minhashSurvivors]]). Per-source
    * report: per-lane drop counts (independent — one doc can trip
    * several lanes) and the docs surviving all four.
    *
    * Scale: all four lane frames are session-staged intermediates (the
    * cluster labels and the three fingerprint-pair graphs memoize per
    * (session, dir) — this row adds three joins, not three pipelines);
    * the drop sets are near-dup-output-sized, so the joins broadcast
    * under AQE; output is source-cardinality.
    */
  def crossModalCuration(spark: SparkSession, dir: String,
                         threshold: Double = 0.5,
                         maxHamming: Int = 12): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val text = MinHash.clusterSurvivors(spark, dir, threshold)
      .select(col("doc_id"), col("kept").as("kept_text"))
    def dropsOf(pairs: DataFrame, flag: String): DataFrame =
      pairs.select(col("doc_b").as("doc_id")).distinct()
        .withColumn(flag, lit(1L))
    val img = dropsOf(Multimodal.mediaPhashPairs(spark, dir, maxHamming), "d_img")
    val aud = dropsOf(Multimodal.mediaAhashPairs(spark, dir, maxHamming), "d_aud")
    val vid = dropsOf(Multimodal.mediaVhashPairs(spark, dir, maxHamming), "d_vid")
    docs.join(text, Seq("doc_id"))
      .join(img, Seq("doc_id"), "left")
      .join(aud, Seq("doc_id"), "left")
      .join(vid, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept_text") === 0, 1L).otherwise(0L)).as("n_text_drop"),
        sum(coalesce(col("d_img"), lit(0L))).as("n_image_drop"),
        sum(coalesce(col("d_aud"), lit(0L))).as("n_audio_drop"),
        sum(coalesce(col("d_vid"), lit(0L))).as("n_video_drop"),
        sum(when(col("kept_text") === 1 && col("d_img").isNull &&
          col("d_aud").isNull && col("d_vid").isNull, 1L).otherwise(0L))
          .as("n_final"))
      .orderBy(col("source"))
  }
}
