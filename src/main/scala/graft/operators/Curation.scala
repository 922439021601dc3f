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
}
