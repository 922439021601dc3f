package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Multimodal plumbing specs: schema, frame sampling, batch decode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mediaTable: binary payload + typed metadata, all docs covered") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.count() === graft.Tables.documents(spark, sfDir).count())
    assert(m.select("modality").distinct().as[String].collect().toSet
      === Set("image", "audio", "video"))
  }

  test("mediaStats: byte length equals n_chars for ascii corpus") {
    val joined = Multimodal.mediaStats(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir), "doc_id")
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).isEmpty)
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

  test("decodeFeatures: fixed-width deterministic feature vectors") {
    val media = Multimodal.mediaTable(spark, sfDir).limit(20)
    val f1 = Multimodal.decodeFeatures(media).collect()
    val f2 = Multimodal.decodeFeatures(media).collect()
    assert(f1.length === 20)
    f1.foreach(r => assert(r.getAs[Seq[Double]]("feature").length === 8))
    assert(f1.map(_.toString).sorted.toSeq === f2.map(_.toString).sorted.toSeq)
  }

  test("fakeDecode is total: empty payload yields zero vector") {
    assert(Multimodal.fakeDecode(Array.emptyByteArray) === Seq.fill(8)(0.0))
  }
}
