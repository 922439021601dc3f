package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming linkage ≡ batch linkage: after the full name stream has
  * flowed (split across micro-batches so pairs must span the split),
  * the emitted pair SET equals the batch lane's verified pairs; state
  * is vocabulary-bounded; re-sent duplicates emit nothing new.
  */
class StreamingLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("emitted pairs across micro-batches equal the batch lane's verified set") {
    implicit val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("linkage-stream").toString
    val names = graft.Tables.part(spark, sfDir).select(col("p_name").as("name")).distinct()
    // split by md5 parity of the name: cross-split pairs are the point
    val half1 = names.filter(abs(hash(col("name"))) % 2 === 0)
    val half2 = names.filter(abs(hash(col("name"))) % 2 =!= 0)
    half1.write.parquet(s"$tmp/in")

    val incoming = spark.readStream.schema(names.schema).parquet(s"$tmp/in")
      .as[StreamingLinkage.Name]
    val q = StreamingLinkage.linkedPairs(StreamingLinkage.tokenized(incoming))
      .writeStream.format("memory").queryName("linked_pairs")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      half2.write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      // duplicate re-send: nothing new may be emitted
      val before = spark.table("linked_pairs").count()
      half1.limit(5).write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      assert(spark.table("linked_pairs").count() === before,
        "re-sent known names emitted new pairs")
      // state is the vocabulary fan-out, not the row count
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty)
      val tokenGroups = names.select(explode(split(col("name"), " "))).distinct().count()
      assert(st.map(_.numRowsTotal).max <= tokenGroups)
    } finally q.stop()

    val streamed = spark.table("linked_pairs")
      .select("name_a", "name_b", "dist").as[(String, String, Long)]
      .collect().toSet
    val batch = graft.operators.Linkage.fuzzyNamePairs(spark, sfDir)
      .select(col("name_a"), col("name_b"), col("dist"))
      .as[(String, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }
}
