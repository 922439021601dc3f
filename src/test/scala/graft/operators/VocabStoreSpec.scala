package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the persisted tokenizer artifact (TextOps.ensureBpeVocabStore):
  * train-once / load-everywhere — a "fresh JVM" (cleared per-JVM cache)
  * loads the 8-row store instead of retraining and gets value-identical
  * merges; a second ensure rewrites nothing (mtime identity); a
  * REGENERATED corpus moves the fingerprint and forces a rebuild
  * instead of serving the stale vocabulary.
  */
class VocabStoreSpec extends SparkSpec {

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_").toString
    graft.Tables.documents(spark, sfDir).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def storeFiles(dir: String, merges: Int = 8) = {
    val p = graft.sources.FsPaths.warehouseTablePath(spark,
      s"graft_bpe_vocab_${merges}_" + Search.dirHash(dir))
    val f = new java.io.File(p.toUri.getPath)
    f.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(x => x.getName -> x.lastModified()).toMap
  }

  test("train-once, load-everywhere: fresh-JVM load ≡ trained merges, no rewrite") {
    val dir = freshCorpus()
    val trained = TextOps.ensureBpeVocabStore(spark, dir)
    assert(trained.size === 8)
    val mt1 = storeFiles(dir)
    assert(mt1.nonEmpty, "artifact files on disk")
    // fresh JVM's view: forget the in-process cache, ensure again —
    // must LOAD (value-identical merges) and must not rewrite the store
    TextOps.clearBpeCacheFor(dir)
    val loaded = TextOps.ensureBpeVocabStore(spark, dir)
    assert(loaded === trained, "loaded artifact diverges from training")
    assert(storeFiles(dir) === mt1, "load path rewrote the artifact")
  }

  test("a regenerated corpus moves the fingerprint and forces a rebuild") {
    val dir = freshCorpus()
    TextOps.ensureBpeVocabStore(spark, dir)
    val mt1 = storeFiles(dir)
    // regenerate: rewrite the corpus with an extra doc (new sizes/mtimes)
    val docs = graft.Tables.documents(spark, dir).localCheckpoint(true)
    val extra = docs.limit(1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat(col("text"), lit(" zq zq zq zq zq zq zq zq")))
    docs.unionByName(extra).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.clearBpeCacheFor(dir)
    val rebuilt = TextOps.ensureBpeVocabStore(spark, dir)
    assert(rebuilt.size === 8)
    assert(storeFiles(dir) !== mt1, "stale artifact served after corpus regeneration")
  }
}
