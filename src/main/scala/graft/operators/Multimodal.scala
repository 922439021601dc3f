package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (the training-data-pipeline pattern).
  *
  * Payloads are REAL containers built and parsed by [[MediaCodec]]
  * (24-bit BMP, 16-bit PCM WAV, raw gray8 frames) — byte-level
  * encode/decode in pure JVM, no codec libraries. The decode step
  * genuinely parses the bytes; `multimodal_decode`'s oracle recomputes
  * the expected geometry independently from doc stats, so a green row
  * proves the parser round-trips the container.
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
    StructField("payload", BinaryType),      // real encoded container bytes
    StructField("media_meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Deterministic media geometry from doc stats — the single source of
    * truth shared by the encoder, the metadata column, and the oracle SQL
    * (SparkEntry `multimodal_stats` / `multimodal_decode`).
    */
  private[operators] def geometry(docId: Long, nChars: Long): (String, Int, Int, Int, Int) =
    (docId % 3) match {
      case 0 => ("image", (nChars % 64 + 4).toInt, (nChars % 48 + 4).toInt, 1, 0)
      case 1 => ("audio", 0, 0, 0, (8000 + (nChars % 8) * 1000).toInt)
      case _ => ("video", (nChars % 32 + 4).toInt, (nChars % 24 + 4).toInt,
                 (nChars % 30 + 1).toInt, 0)
    }

  /** Audio sample count, also formula-derived (oracle-expressible). */
  private[operators] def audioSamples(nChars: Long): Int = (nChars % 256 + 16).toInt

  /** Synthesize the media table from `documents`: payload is a genuinely
    * encoded container (BMP / WAV / raw frames) whose content bytes cycle
    * the document's utf8 text; metadata mirrors the encoded geometry.
    * (In production this table IS the input — parquet with a binary
    * column; the synth step stands in for ingestion.)
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(mediaSchema)
    docs.mapPartitions { it =>
      it.map { r =>
        val docId = r.getLong(0)
        val text = r.getString(1)
        val nChars = r.getLong(2)
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def pix(i: Int): Byte =
          if (content.isEmpty) 0 else content(i % content.length)
        val (modality, w, h, f, rate) = geometry(docId, nChars)
        val payload = modality match {
          case "image" => MediaCodec.encodeBmp(w, h, pix)
          case "audio" =>
            val n = audioSamples(nChars)
            MediaCodec.encodeWav(rate,
              Array.tabulate(n)(i => (((pix(i) & 0xff) - 128) << 8).toShort))
          case _ => MediaCodec.encodeRawVideo(w, h, f, pix)
        }
        Row(docId, modality, payload, Row(w, h, f, rate))
      }
    }
  }

  /** Every document rendered as its canonical 24-bit BMP thumbnail
    * (same geometry formula and content-byte cycling as the image
    * modality of [[mediaTable]], applied to ALL docs) — the corpus's
    * image column for the perceptual-dedup lane. In production this
    * column arrives from ingestion; the deterministic render stands in
    * so the decode → fingerprint plumbing is exercised on real
    * container bytes.
    */
  def renderedImages(spark: SparkSession, dir: String): DataFrame =
    renderedPayload(spark, dir) { (pix, nChars) =>
      MediaCodec.encodeBmp((nChars % 64 + 4).toInt, (nChars % 48 + 4).toInt, pix)
    }

  /** Shared render plumbing for the three fingerprint lanes: every
    * doc's text cycled through `pix` into an encoded container payload
    * — the geometry formulas live with each modality's caller.
    */
  private def renderedPayload(spark: SparkSession, dir: String)
      (encode: (Int => Byte, Long) => Array[Byte]): DataFrame = {
    // non-empty ASCII docs only, mirrored in the oracle SQL: the oracle
    // indexes code points with a byte-length modulus, so a multi-byte
    // character (or the empty doc's % 0) diverges from these raw UTF-8
    // payload bytes — both sides restrict to the domain where the two
    // decompositions agree
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "n_chars")
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    docs.mapPartitions { it =>
      it.map { r =>
        val content = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def pix(i: Int): Byte =
          if (content.isEmpty) 0 else content(i % content.length)
        Row(r.getLong(0), encode(pix, r.getLong(2)))
      }
    }
  }

  /** One fingerprint row per payload, into the shared band/verify tail. */
  private def fingerprintPairs(rendered: DataFrame,
                               hash: Array[Byte] => Long,
                               maxHamming: Int): DataFrame = {
    val phSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("phash", LongType)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(phSchema)
    hammingLshPairs(rendered.mapPartitions { it =>
      it.map(r => Row(r.getLong(0), hash(r.getAs[Array[Byte]](1))))
    }, maxHamming)
  }

  /** Perceptual-hash near-dup pairs over the rendered image column —
    * the multimodal counterpart of MinHash near-dedup: decode each BMP
    * and dHash it ([[MediaCodec.dHash]], one container parse per row,
    * no shuffle), band the 64-bit hash into 4×16-bit LSH bands (two
    * hashes within Hamming distance ≤ 12 of each other agree on some
    * whole band unless all 12 flips straddle all 4 bands — same
    * banding argument as MinHash), equi-join on (band_id, band_key),
    * then verify candidates by EXACT Hamming distance. Never all-pairs:
    * the shuffle carries bands and candidate pairs only.
    */
  def mediaPhashPairs(spark: SparkSession, dir: String,
                      maxHamming: Int = 12): DataFrame =
    memoized(spark, s"phash_pairs_$maxHamming", dir)(
      fingerprintPairs(renderedImages(spark, dir), MediaCodec.dHash _, maxHamming))

  /** Session-scoped memo for the three fingerprint-pair frames — the
    * cross-modal capstone consumes all three on top of their own
    * registry rows, and each is a full render + codec + LSH pipeline
    * that a curation DAG would stage exactly once ([[StageMemo]]).
    */
  private def memoized(spark: SparkSession, stage: String, dir: String)
                      (build: => DataFrame): DataFrame =
    StageMemo.memoized(spark, stage, dir)(build)

  /** Shared 64-bit-fingerprint near-dup tail (images dHash / audio
    * aHash): band the hash into 4×16-bit LSH bands (two hashes within
    * Hamming distance ≤ maxHamming agree on some whole band unless
    * every flip straddles all 4 bands), equi-join on (band_id,
    * band_key), verify candidates by EXACT Hamming distance. Never
    * all-pairs: the shuffle carries bands and candidate pairs only.
    * `ph` must be (doc_id, phash); one persisted row per doc feeds the
    * band subtree and both verify lookups.
    */
  private[operators] def hammingLshPairs(phUnpersisted: DataFrame,
                                         maxHamming: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Hot-band hardening (mirrors MinHash.dupClasses): docs with the
    // SAME 64-bit fingerprint share every band, so a large identical-
    // media class would make its band buckets quadratic. Hamming
    // distance depends only on the fingerprints, so each distinct phash
    // bands ONCE via its min-doc_id representative and members fan back
    // out post-verify — intra-class pairs at distance 0, cross-class
    // pairs inheriting the rep pair's distance verbatim.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("phash"))
    val members = phUnpersisted
      .withColumn("rep", min(col("doc_id")).over(w))
      .persist(MEMORY_AND_DISK)
    val reps = members.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("phash"))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band_id"),
        shiftrightunsigned(col("phash"), b * 16)
          .bitwiseAND(lit(65535L)).as("band_key"))
    }
    // The fingerprints RIDE WITH the band rows (8 extra bytes on a
    // rep-cardinality frame), so the exact-Hamming verify is an inline
    // codegen filter in the band self-join stage itself. The previous
    // shape — candidate pairs → distinct → two hash-lookup joins →
    // verify — shuffled the FULL candidate product: low-entropy
    // fingerprints (the measured sf10 audio corpus has alternating-bit
    // aHashes whose 0x5555/0xAAAA band keys collect 4 200-rep buckets)
    // made that 342 M candidate rows through a distinct, 1 361 s of the
    // media stage build. Verifying inside the join leaves only the
    // SURVIVING pairs for the distinct (candidates stream through
    // whole-stage codegen and die at the filter), which took the same
    // build to ~80 s. A band-key df cap is the production knob if even
    // the in-join product grows hostile — not applied here because the
    // pair set is oracle-compared exactly.
    val bands = reps
      .select(col("doc_id"), col("phash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("phash"), col("bk.band_id").as("band_id"),
        col("bk.band_key").as("band_key"))
    val repPairs = bands.select(col("band_id"), col("band_key"),
        col("doc_id").as("doc_a"), col("phash").as("ph_a"))
      .join(bands.select(col("band_id"), col("band_key"),
          col("doc_id").as("doc_b"), col("phash").as("ph_b")),
        Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
    val cross = repPairs
      .select(col("doc_a").as("__ra"), col("doc_b").as("__rb"), col("hamming"))
      .join(members.select(col("rep").as("__ra"), col("doc_id").as("__ma")), Seq("__ra"))
      .join(members.select(col("rep").as("__rb"), col("doc_id").as("__mb")), Seq("__rb"))
      .select(least(col("__ma"), col("__mb")).as("doc_a"),
        greatest(col("__ma"), col("__mb")).as("doc_b"), col("hamming"))
    val intra = members.select(col("rep"), col("doc_id").as("__ma"))
      .join(members.select(col("rep"), col("doc_id").as("__mb")), Seq("rep"))
      .filter(col("__ma") < col("__mb"))
      .select(col("__ma").as("doc_a"), col("__mb").as("doc_b"),
        lit(0L).as("hamming"))
    // no presentation sort here: the gate compares sorted rows itself
    // and every consumer joins or aggregates — a global order-by on the
    // pair-cardinality frame was pure build cost at scale
    val out = cross.unionByName(intra)
      .persist(MEMORY_AND_DISK)
    // materialize the (pair-cardinality) result so the per-doc member
    // frame can be released instead of staying pinned for the session;
    // the callers' StageMemo persist is then a same-level no-op
    out.count()
    members.unpersist()
    out
  }

  /** Every document rendered as its canonical 16-bit mono WAV (the
    * audio-modality formulas of [[mediaTable]] applied to ALL docs) —
    * the corpus's audio column for the acoustic-dedup lane.
    */
  def renderedAudio(spark: SparkSession, dir: String): DataFrame =
    renderedPayload(spark, dir) { (pix, nChars) =>
      val n = audioSamples(nChars)
      MediaCodec.encodeWav(
        (8000 + (nChars % 8) * 1000).toInt,
        Array.tabulate(n)(i => (((pix(i) & 0xff) - 128) << 8).toShort))
    }

  /** Acoustic-fingerprint near-dup pairs over the rendered audio column
    * — [[MediaCodec.aHash]] per row (one WAV parse, no shuffle), then
    * the same 4×16-bit Hamming-LSH band → exact-Hamming-verify tail as
    * the image lane ([[hammingLshPairs]]).
    */
  def mediaAhashPairs(spark: SparkSession, dir: String,
                      maxHamming: Int = 12): DataFrame =
    memoized(spark, s"ahash_pairs_$maxHamming", dir)(
      fingerprintPairs(renderedAudio(spark, dir), MediaCodec.aHash _, maxHamming))

  /** Every document rendered as its canonical GRV0 clip (the
    * video-modality formulas of [[mediaTable]] applied to ALL docs) —
    * the corpus's video column for the temporal-dedup lane.
    */
  def renderedVideo(spark: SparkSession, dir: String): DataFrame =
    renderedPayload(spark, dir) { (pix, nChars) =>
      MediaCodec.encodeRawVideo(
        (nChars % 32 + 4).toInt, (nChars % 24 + 4).toInt,
        (nChars % 30 + 1).toInt, pix)
    }

  /** Temporal-fingerprint near-dup pairs over the rendered video column
    * — [[MediaCodec.vHash]] per row (one container parse, no shuffle),
    * then the same Hamming-LSH band → exact-verify tail as the image
    * and audio lanes ([[hammingLshPairs]]): the full multimodal dedup
    * TRIAD shares one scale shape.
    */
  def mediaVhashPairs(spark: SparkSession, dir: String,
                      maxHamming: Int = 12): DataFrame =
    memoized(spark, s"vhash_pairs_$maxHamming", dir)(
      fingerprintPairs(renderedVideo(spark, dir), MediaCodec.vHash _, maxHamming))

  /** SHOT-BOUNDARY / KEYFRAME detection (`multimodal_keyframes`) over
    * the video column — the frame-selection step every video-text
    * training pipeline runs before captioning/embedding (sample at
    * shot boundaries, not uniformly: a 30-frame clip of one static
    * shot contributes one frame, a cut-heavy clip contributes each
    * cut). The detector is the classic pixel-domain one: per
    * consecutive frame pair, the EXACT L1 pixel distance; a frame
    * starts a new shot when its distance is strictly above the
    * per-video mean — compared as the integer cross-multiply
    * `l1·(f−1) > Σl1` (never a division; the mean never materializes).
    * Frame 0 is implicitly a keyframe; emitted rows are frames 1..f−1
    * with their distance and the boundary flag.
    *
    * Scale: one linear decode pass per payload (the ingest shape every
    * codec lane shares — the real decoder swaps in behind the same
    * row-to-frames seam), then one per-video aggregation over (f−1)-row
    * groups — frame counts, never pixels, cross the shuffle.
    */
  def videoKeyframes(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, "video_keyframes", dir) {
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("frame_idx", LongType),
        StructField("l1", LongType)))
      implicit val enc: org.apache.spark.sql.Encoder[Row] =
        org.apache.spark.sql.Encoders.row(schema)
      val l1s = renderedVideo(spark, dir).mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, f) = MediaCodec.decodeRawVideoHeader(bytes)
          val fl = w * h
          (1 until f).iterator.map { t =>
            val cur = 16 + t * fl
            val prev = cur - fl
            var s = 0L
            var j = 0
            while (j < fl) {
              s += math.abs((bytes(cur + j) & 0xff) - (bytes(prev + j) & 0xff))
              j += 1
            }
            Row(id, t.toLong, s)
          }
        }
      }
      val tot = l1s.groupBy(col("doc_id"))
        .agg(sum(col("l1")).as("tot"), count(lit(1)).as("m"))
      l1s.join(tot, Seq("doc_id"))
        .select(col("doc_id"), col("frame_idx"), col("l1"),
          (col("l1") * col("m") > col("tot")).as("is_key"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }

  /** Warm the three fingerprint-pair session stages (render + codec +
    * LSH per modality) — the ingest half of the media dedup triad,
    * bench build/probe seam (see [[MinHash.ensureNearDupStages]]).
    */
  def ensureMediaStages(spark: SparkSession, dir: String): Unit = {
    mediaPhashPairs(spark, dir).count()
    mediaAhashPairs(spark, dir).count()
    mediaVhashPairs(spark, dir).count()
  }

  /** Metadata-only stats — no payload bytes touched (the pruning path). */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast("bigint").as("n_bytes"),
      col("media_meta.width").cast("bigint").as("width"),
      col("media_meta.height").cast("bigint").as("height"),
      col("media_meta.n_frames").cast("bigint").as("n_frames"),
      col("media_meta.sample_rate").cast("bigint").as("sample_rate"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("sample_rate", LongType)))

  /** REAL decode: parse each payload's container header and emit the
    * geometry read from the BYTES (not from media_meta). The oracle
    * recomputes the same values from doc stats — agreement proves the
    * encode→decode round trip.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("doc_id"), col("modality"), col("payload"))
      .mapPartitions { batch =>
        batch.map { row =>
          val docId = row.getAs[Long]("doc_id")
          val modality = row.getAs[String]("modality")
          val bytes = row.getAs[Array[Byte]]("payload")
          val (w, h, f, rate) = modality match {
            case "image" =>
              val (bw, bh, _) = MediaCodec.decodeBmpHeader(bytes)
              (bw.toLong, bh.toLong, 1L, 0L)
            case "audio" =>
              val (sr, _, _, _) = MediaCodec.decodeWavHeader(bytes)
              (0L, 0L, 0L, sr.toLong)
            case _ =>
              val (vw, vh, vf) = MediaCodec.decodeRawVideoHeader(bytes)
              (vw.toLong, vh.toLong, vf.toLong, 0L)
          }
          Row(docId, modality, bytes.length.toLong, w, h, f, rate)
        }
      }
  }

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

  private val frameBytesSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame", BinaryType)))

  /** Byte-level frame sampling: the metadata pass picks the frame
    * indexes, then ONLY the selected (doc, frame) pairs slice their
    * payloads — the container is decoded once per doc on the executor
    * and the emitted rows carry real gray8 frame bytes.
    */
  def frameSampleBytes(media: DataFrame, stride: Int = 5): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(frameBytesSchema)
    media.filter(col("modality") === "video")
      .select(col("doc_id"), col("payload"))
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val docId = row.getAs[Long]("doc_id")
          val bytes = row.getAs[Array[Byte]]("payload")
          val (w, h, n) = MediaCodec.decodeRawVideoHeader(bytes)
          (0 until n by stride).iterator.map { fi =>
            Row(docId, fi, w, h, MediaCodec.rawVideoFrame(bytes, fi))
          }
        }
      }
  }

  /** Nearest-neighbor image resize: decode the BMP, sample pixels, re-
    * encode — real raster work in pure JVM (the training-pipeline
    * "resize to model input size" step). Deterministic: the sampling
    * grid is integer arithmetic, the output is a well-formed BMP whose
    * header parses back to (targetW, targetH).
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("width", LongType),
        StructField("height", LongType),
        StructField("payload", BinaryType))))
    media.filter(col("modality") === "image")
      .select(col("doc_id"), col("payload"))
      .mapPartitions { batch =>
        batch.map { row =>
          val docId = row.getAs[Long]("doc_id")
          val resized = MediaCodec.resizeBmpNearest(
            row.getAs[Array[Byte]]("payload"), targetW, targetH)
          val (w, h, _) = MediaCodec.decodeBmpHeader(resized)
          Row(docId, w.toLong, h.toLong, resized)
        }
      }
  }

  /** Batch decode + feature extraction over partitions — the Scala analog
    * of a Pandas `mapInPandas` UDF: iterate a partition's rows as one
    * batch, emit a fixed-width feature vector per row computed from the
    * DECODED samples (BMP pixel bytes, WAV PCM amplitudes, video frame
    * pixels — all parsed from the container, not from raw payload bytes).
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
          val feat = row.getAs[String]("modality") match {
            case "image" => imageFeatures(bytes)
            case "audio" => audioFeatures(bytes)
            case _       => videoFeatures(bytes)
          }
          Row(row.getAs[Long]("doc_id"), row.getAs[String]("modality"), feat)
        }
      }
  }

  private def stats(values: Iterator[Double]): (Double, Double, Double, Double, Long) = {
    var n = 0L; var sum = 0.0; var sumSq = 0.0
    var mn = Double.MaxValue; var mx = Double.MinValue
    values.foreach { v =>
      n += 1; sum += v; sumSq += v * v
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    if (n == 0) (0.0, 0.0, 0.0, 0.0, 0L)
    else (sum / n, mn, mx, math.sqrt(sumSq / n), n)
  }

  /** [width, height, bpp, nPixelBytes, mean, min, max, rms] of pixel bytes. */
  private[operators] def imageFeatures(bytes: Array[Byte]): Seq[Double] = {
    val (w, h, bpp) = MediaCodec.decodeBmpHeader(bytes)
    val (mean, mn, mx, rms, n) =
      stats(MediaCodec.bmpPixelBytes(bytes).map(b => (b & 0xff).toDouble))
    Seq(w, h, bpp, n.toDouble, mean, mn, mx, rms)
  }

  /** [sampleRate, channels, bits, nSamples, mean, min, max, rms] of PCM. */
  private[operators] def audioFeatures(bytes: Array[Byte]): Seq[Double] = {
    val (rate, channels, bits, _) = MediaCodec.decodeWavHeader(bytes)
    val samples = MediaCodec.wavSamples(bytes)
    val (mean, mn, mx, rms, n) = stats(samples.iterator.map(_.toDouble))
    Seq(rate, channels, bits, n.toDouble, mean, mn, mx, rms)
  }

  /** [width, height, nFrames, nPixels, mean, min, max, rms] of gray8. */
  private[operators] def videoFeatures(bytes: Array[Byte]): Seq[Double] = {
    val (w, h, f) = MediaCodec.decodeRawVideoHeader(bytes)
    val frameLen = w * h
    val pixels = Iterator.range(0, f).flatMap { fi =>
      MediaCodec.rawVideoFrame(bytes, fi).iterator.map(b => (b & 0xff).toDouble)
    }
    val (mean, mn, mx, rms, n) = stats(pixels)
    require(n == frameLen.toLong * f)
    Seq(w, h, f, n.toDouble, mean, mn, mx, rms)
  }
}
