package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal specs: container codecs, schema, frame sampling, real
  * decode round trips.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("BMP codec round trip: header fields and pixel bytes survive") {
    val bytes = MediaCodec.encodeBmp(5, 3, i => (i % 251).toByte)
    assert(bytes.length === MediaCodec.bmpSize(5, 3))
    assert(MediaCodec.decodeBmpHeader(bytes) === ((5, 3, 24)))
    val pix = MediaCodec.bmpPixelBytes(bytes).toSeq
    assert(pix.length === 5 * 3 * 3)
    assert(pix.take(15) === (0 until 15).map(i => (i % 251).toByte))
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmpHeader("not a bitmap at all".getBytes)
    }
  }

  test("WAV codec round trip: rate, geometry, samples") {
    val samples = Array.tabulate(100)(i => (i * 17 - 800).toShort)
    val bytes = MediaCodec.encodeWav(12000, samples)
    assert(bytes.length === MediaCodec.wavSize(100))
    assert(MediaCodec.decodeWavHeader(bytes) === ((12000, 1, 16, 100)))
    assert(MediaCodec.wavSamples(bytes).toSeq === samples.toSeq)
  }

  test("raw video codec: header and frame slicing") {
    val bytes = MediaCodec.encodeRawVideo(4, 3, 5, i => i.toByte)
    assert(MediaCodec.decodeRawVideoHeader(bytes) === ((4, 3, 5)))
    val frame2 = MediaCodec.rawVideoFrame(bytes, 2)
    assert(frame2.toSeq === (24 until 36).map(_.toByte))
    intercept[IllegalArgumentException] { MediaCodec.rawVideoFrame(bytes, 5) }
  }

  test("dHash: bit semantics, brightness-shift invariance, resize robustness") {
    // 9x8 image whose luma strictly increases left to right: every
    // comparison bit fires -> all 64 bits set
    val ramp = MediaCodec.encodeBmp(9, 8, i => {
      val row = MediaCodec.bmpRowSize(9); (((i % row) / 3) * 20).toByte
    })
    assert(MediaCodec.dHash(ramp) === -1L)
    // constant image: no comparison fires
    val flat = MediaCodec.encodeBmp(9, 8, _ => 50.toByte)
    assert(MediaCodec.dHash(flat) === 0L)
    // uniform brightness shift preserves every gradient sign (the
    // perceptual property byte-hashes lack); bytes stay below wraparound
    val base = MediaCodec.encodeBmp(20, 16, i => ((i * 7) % 180).toByte)
    val brighter = MediaCodec.encodeBmp(20, 16, i => (((i * 7) % 180) + 40).toByte)
    assert(MediaCodec.dHash(base) === MediaCodec.dHash(brighter))
    // 2x nearest-neighbor upscale samples the same grid points
    val up = MediaCodec.resizeBmpNearest(base, 40, 32)
    val dist = java.lang.Long.bitCount(MediaCodec.dHash(base) ^ MediaCodec.dHash(up))
    assert(dist <= 8, s"resize moved dHash by $dist bits")
  }

  test("mediaPhashPairs: pairs verify against a local recomputation, non-vacuous") {
    val pairs = Multimodal.mediaPhashPairs(spark, sfDir).collect()
    assert(pairs.length >= 5, s"near-vacuous: ${pairs.length} pairs")
    // local ground truth: dHash every rendered image on the driver,
    // check every emitted pair's Hamming distance and ordering — and
    // that NO pair sharing a band at distance <= 12 was missed
    val hashes = Multimodal.renderedImages(spark, sfDir).collect()
      .map(r => r.getLong(0) -> MediaCodec.dHash(r.getAs[Array[Byte]](1))).toMap
    pairs.foreach { r =>
      val (a, b, hm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong === hm)
      assert(hm <= 12)
    }
    def bandKeys(h: Long): Set[(Int, Long)] =
      (0 until 4).map(b => b -> ((h >>> (b * 16)) & 0xffffL)).toSet
    val expected = for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq
      if a < b && bandKeys(ha).intersect(bandKeys(hb)).nonEmpty &&
        java.lang.Long.bitCount(ha ^ hb) <= 12
    } yield (a, b)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected.toSet)
  }

  test("aHash: bit semantics, gain invariance") {
    // strictly rising envelope: every frame-energy comparison fires
    val rising = MediaCodec.encodeWav(8000,
      Array.tabulate(130)(i => (i * 100).toShort))
    assert(MediaCodec.aHash(rising) === -1L)
    // constant amplitude: no comparison fires
    val flat = MediaCodec.encodeWav(8000, Array.fill(130)(500.toShort))
    assert(MediaCodec.aHash(flat) === 0L)
    // uniform gain preserves every envelope-gradient sign (the acoustic
    // property raw byte hashes lack)
    val base = Array.tabulate(200)(i => ((i * 37) % 3000).toShort)
    val louder = base.map(s => (s * 3).toShort)
    assert(MediaCodec.aHash(MediaCodec.encodeWav(8000, base)) ===
      MediaCodec.aHash(MediaCodec.encodeWav(8000, louder)))
    // fewer samples than frames: defined (empty frames compare as 0/1)
    val tiny = MediaCodec.encodeWav(8000, Array.tabulate(16)(i => (i * 50).toShort))
    MediaCodec.aHash(tiny) // must not throw
  }

  test("mediaAhashPairs: pairs verify against a local recomputation, non-vacuous") {
    val pairs = Multimodal.mediaAhashPairs(spark, sfDir).collect()
    assert(pairs.length >= 5, s"near-vacuous: ${pairs.length} pairs")
    val hashes = Multimodal.renderedAudio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> MediaCodec.aHash(r.getAs[Array[Byte]](1))).toMap
    pairs.foreach { r =>
      val (a, b, hm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong === hm)
      assert(hm <= 12)
    }
    def bandKeys(h: Long): Set[(Int, Long)] =
      (0 until 4).map(b => b -> ((h >>> (b * 16)) & 0xffffL)).toSet
    val expected = for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq
      if a < b && bandKeys(ha).intersect(bandKeys(hb)).nonEmpty &&
        java.lang.Long.bitCount(ha ^ hb) <= 12
    } yield (a, b)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected.toSet)
  }

  test("vHash: bit semantics, brightness invariance") {
    // strictly rising volume energy: every chunk gradient fires
    val rising = MediaCodec.encodeRawVideo(4, 4, 13, i => i.toByte)
    assert(MediaCodec.vHash(rising) === -1L)
    // constant clip: nothing fires
    val flat = MediaCodec.encodeRawVideo(6, 8, 18, _ => 80.toByte)
    assert(MediaCodec.vHash(flat) === 0L)
    // uniform brightness shift cancels in the count-normalized compare
    val base = MediaCodec.encodeRawVideo(8, 10, 20, i => ((i * 13) % 170).toByte)
    val brighter = MediaCodec.encodeRawVideo(8, 10, 20,
      i => (((i * 13) % 170) + 60).toByte)
    assert(MediaCodec.vHash(base) === MediaCodec.vHash(brighter))
    // single-frame clips keep content-driven bits — the old frame/row
    // grid hashed EVERY short clip toward 0 (t·f/9 resamples the same
    // frame below f=9), which at sf10 welded all still clips into one
    // near-dup class of 2.08 B pair rows
    val stillA = MediaCodec.encodeRawVideo(16, 16, 1, i => (i % 97).toByte)
    val stillB = MediaCodec.encodeRawVideo(16, 16, 1, i => ((i * 31) % 97).toByte)
    assert(MediaCodec.vHash(stillA) !== 0L)
    assert(MediaCodec.vHash(stillA) !== MediaCodec.vHash(stillB))
  }

  test("mediaVhashPairs: pairs verify against a local recomputation, non-vacuous") {
    val pairs = Multimodal.mediaVhashPairs(spark, sfDir).collect()
    assert(pairs.length >= 5, s"near-vacuous: ${pairs.length} pairs")
    val hashes = Multimodal.renderedVideo(spark, sfDir).collect()
      .map(r => r.getLong(0) -> MediaCodec.vHash(r.getAs[Array[Byte]](1))).toMap
    pairs.foreach { r =>
      val (a, b, hm) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)).toLong === hm)
      assert(hm <= 12)
    }
    def bandKeys(h: Long): Set[(Int, Long)] =
      (0 until 4).map(b => b -> ((h >>> (b * 16)) & 0xffffL)).toSet
    val expected = for {
      (a, ha) <- hashes.toSeq; (b, hb) <- hashes.toSeq
      if a < b && bandKeys(ha).intersect(bandKeys(hb)).nonEmpty &&
        java.lang.Long.bitCount(ha ^ hb) <= 12
    } yield (a, b)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected.toSet)
  }

  test("videoKeyframes: L1 distances match a local decode; boundary = strictly above mean") {
    val rows = Multimodal.videoKeyframes(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("l1"), r.getAs[Boolean]("is_key")))
    assert(rows.nonEmpty)
    // local recomputation from the rendered payloads
    val payloads = Multimodal.renderedVideo(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val expected = payloads.toSeq.flatMap { case (id, bytes) =>
      val (w, h, f) = MediaCodec.decodeRawVideoHeader(bytes)
      val fl = w * h
      val l1s = (1 until f).map { t =>
        (0 until fl).map(j => math.abs(
          (bytes(16 + t * fl + j) & 0xff) - (bytes(16 + (t - 1) * fl + j) & 0xff)
        ).toLong).sum
      }
      val tot = l1s.sum
      l1s.zipWithIndex.map { case (l1, i) =>
        (id, (i + 1).toLong, l1, l1 * l1s.length > tot)
      }
    }.toSet
    assert(rows.toSet === expected)
    // per video, the flag can never be all-true (something must sit at
    // or below the mean), and single-shot statics read all-false
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.exists(!_._4), s"video $id flagged every frame a boundary")
    }
    assert(rows.exists(_._4), "vacuous: no shot boundary anywhere in the corpus")
  }

  test("resize: nearest-neighbor BMP scaling preserves content structure") {
    // source: 4x2 image with pixel bytes = linear ramp
    val src = MediaCodec.encodeBmp(4, 2, i => {
      val row = MediaCodec.bmpRowSize(4); ((i / row) * 100 + (i % row)).toByte
    })
    val up = MediaCodec.resizeBmpNearest(src, 8, 4)
    assert(MediaCodec.decodeBmpHeader(up) === ((8, 4, 24)))
    val down = MediaCodec.resizeBmpNearest(src, 2, 1)
    assert(MediaCodec.decodeBmpHeader(down) === ((2, 1, 24)))
    // downsample picks source pixels (0,0) and (2,0): bytes 0,1,2 / 6,7,8
    assert(MediaCodec.bmpPixelBytes(down).toSeq === Seq[Byte](0, 1, 2, 6, 7, 8))
    // identity resize reproduces the original pixel bytes
    val same = MediaCodec.resizeBmpNearest(src, 4, 2)
    assert(MediaCodec.bmpPixelBytes(same).toSeq === MediaCodec.bmpPixelBytes(src).toSeq)
  }

  test("resizeImages + frameSampleBytes: distributed resize and real frame slices") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val resized = Multimodal.resizeImages(media, 16, 16).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.getAs[Long]("width") === 16L && r.getAs[Long]("height") === 16L)
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length === MediaCodec.bmpSize(16, 16))
    }
    val frames = Multimodal.frameSampleBytes(media, stride = 7).collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      val w = f.getAs[Int]("width"); val h = f.getAs[Int]("height")
      assert(f.getAs[Array[Byte]]("frame").length === w * h)
      assert(f.getAs[Int]("frame_idx") % 7 === 0)
    }
  }

  test("mediaTable: binary payload + typed metadata, all docs covered") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.count() === graft.Tables.documents(spark, sfDir).count())
    assert(m.select("modality").distinct().as[String].collect().toSet
      === Set("image", "audio", "video"))
  }

  test("decodeMeta parses payload bytes back to the encoded geometry") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val decoded = Multimodal.decodeMeta(media)
    val meta = Multimodal.mediaStats(spark, sfDir)
    // bytes-parsed geometry must equal the metadata the encoder wrote
    assert(decoded.except(meta).isEmpty && meta.except(decoded).isEmpty)
  }

  test("frameSample explodes only videos, stride-spaced frame indexes") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.frameSample(media, stride = 5)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val idx = rs.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.head === 0)
      assert(idx.zip(idx.tail).forall { case (a, b) => b - a === 5 })
      assert(idx.last < rs.head.getAs[Int]("n_frames"))
    }
  }

  test("decodeFeatures: fixed-width vectors from genuinely decoded samples") {
    val media = Multimodal.mediaTable(spark, sfDir).limit(30).cache()
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === 30)
    val byId = feats.map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Double](r.fieldIndex("feature"))).toMap
    val metas = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    byId.foreach { case (id, f) =>
      assert(f.length === 8)
      val m = metas(id)
      m.getAs[String]("modality") match {
        case "image" => // [w, h, bpp, ...]
          assert(f(0) === m.getAs[Long]("width").toDouble)
          assert(f(1) === m.getAs[Long]("height").toDouble)
          assert(f(2) === 24.0)
        case "audio" => // [rate, channels, bits, ...]
          assert(f(0) === m.getAs[Long]("sample_rate").toDouble)
          assert(f(1) === 1.0 && f(2) === 16.0)
        case "video" => // [w, h, frames, ...]
          assert(f(0) === m.getAs[Long]("width").toDouble)
          assert(f(2) === m.getAs[Long]("n_frames").toDouble)
      }
      // pixel/sample stats are within byte/short range and consistent
      assert(f(5) <= f(4) && f(4) <= f(6)) // min <= mean <= max
    }
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](r.fieldIndex("feature"))).toMap
    assert(again === byId)
  }
}
