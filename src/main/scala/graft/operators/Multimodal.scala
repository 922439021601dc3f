package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (the training-data-pipeline pattern).
  *
  * The container has no media codecs, so DECODE IS A DETERMINISTIC FAKE
  * (clearly marked below): it derives "features" from the payload bytes.
  * Everything around it — schema, batch iteration via mapPartitions
  * (the Scala analog of mapInPandas' batch shape), frame sampling,
  * partition-friendly layout — is real and tested.
  *
  * Scale: payloads stay opaque binary end-to-end (no row explosion until
  * frame sampling); per-partition batch processing keeps the decode
  * vectorizable; metadata columns allow pushdown-based pruning before any
  * payload is touched.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),     // image | audio | video
    StructField("payload", BinaryType),      // opaque encoded bytes
    StructField("media_meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Synthesize a media table from `documents`: payload = utf8 bytes of
    * the text (a stand-in for encoded media), modality round-robins, and
    * metadata derives deterministically from doc stats.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (col("n_chars") % 30 + 1).cast("int").as("n_frames"),
        lit(16000).as("sample_rate")).as("media_meta"))

  /** Byte-level stats on the opaque payload — pure column expressions,
    * fully pushdown/codegen friendly.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast("bigint").as("n_bytes"),
      col("media_meta.width").cast("bigint").as("width"),
      col("media_meta.height").cast("bigint").as("height"),
      col("media_meta.n_frames").cast("bigint").as("n_frames"))

  /** Frame sampling: one row per sampled frame index (every `stride`-th
    * frame) — row explosion happens AFTER metadata filtering, so only
    * selected media pay it.
    */
  def frameSample(media: DataFrame, stride: Int = 5): DataFrame =
    media
      .filter(col("modality") === "video")
      .select(col("doc_id"), col("media_meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("media_meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))

  /** Batch "decode" + feature extraction over partitions — the Scala
    * analog of a Pandas `mapInPandas` UDF: iterate a partition's rows as
    * one batch, emit fixed-width feature vectors.
    *
    * ─── STUB: deterministic fake decoder ───
    * A real deployment would decode `payload` with an image/audio codec
    * here; this container has none, so features are derived from payload
    * bytes (mean/min/max per quarter-chunk). The signature, schema and
    * batch shape are the real thing.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("modality", StringType),
      StructField("feature", ArrayType(DoubleType))))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    media.select(col("doc_id"), col("modality"), col("payload"))
      .mapPartitions { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]]("payload")
          val feat = fakeDecode(bytes)
          Row(row.getAs[Long]("doc_id"), row.getAs[String]("modality"), feat)
        }
      }
  }

  /** STUB (`???`-equivalent with a deterministic fake so tests can run):
    * 8 doubles from byte-chunk statistics.
    */
  private[operators] def fakeDecode(bytes: Array[Byte]): Seq[Double] = {
    if (bytes.isEmpty) Seq.fill(8)(0.0)
    else {
      val chunks = bytes.grouped(math.max(1, bytes.length / 4)).take(4).toSeq
      chunks.flatMap { c =>
        Seq(c.map(b => (b & 0xff).toDouble).sum / c.length,
            c.map(b => (b & 0xff).toDouble).max)
      }.padTo(8, 0.0)
    }
  }
}
