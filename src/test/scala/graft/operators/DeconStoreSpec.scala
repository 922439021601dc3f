package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the persisted decontamination artifacts
  * (TextOps.ensureDeconStores): build-once / load-everywhere — the
  * stored covered-position and eval-gram tables are value-identical to
  * the session computation; a second ensure rewrites nothing (mtime
  * identity); a REGENERATED corpus moves the fingerprint and forces a
  * rebuild instead of serving stale positions.
  */
class DeconStoreSpec extends SparkSpec {

  private def freshCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_").toString
    graft.Tables.documents(spark, sfDir).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def storeFiles(table: String, dir: String) = {
    val p = graft.sources.FsPaths.warehouseTablePath(spark,
      s"${table}_13_" + Search.dirHash(dir))
    val f = new java.io.File(p.toUri.getPath)
    f.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(x => x.getName -> x.lastModified()).toMap
  }

  test("store parity: loaded artifacts equal the session computation, no rewrite") {
    val dir = freshCorpus()
    val (evalPath, covPath) = TextOps.ensureDeconStores(spark, dir)
    val mtE = storeFiles("graft_decon_evalgrams", dir)
    val mtC = storeFiles("graft_decon_covered", dir)
    assert(mtE.nonEmpty && mtC.nonEmpty, "artifact files on disk")
    // value parity against the unstaged computation (the fresh-JVM view
    // is exactly this read — nothing but the parquet bytes)
    val covStored = spark.read.parquet(covPath)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val covFresh = TextOps.deconCutCoveredCompute(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(covStored === covFresh, "stored covered positions diverge")
    val evalStored = spark.read.parquet(evalPath)
      .collect().map(_.getString(0)).toSet
    val evalFresh = TextOps.deconGrams(spark, dir)
      .filter(col("split") =!= "train").select(col("gh")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(evalStored === evalFresh, "stored eval gram set diverges")
    // second ensure: marker hit, zero writes
    TextOps.ensureDeconStores(spark, dir)
    assert(storeFiles("graft_decon_evalgrams", dir) === mtE, "eval store rewritten")
    assert(storeFiles("graft_decon_covered", dir) === mtC, "covered store rewritten")
  }

  test("a regenerated corpus moves the fingerprint and forces a rebuild") {
    val dir = freshCorpus()
    TextOps.ensureDeconStores(spark, dir)
    val mtC = storeFiles("graft_decon_covered", dir)
    val docs = graft.Tables.documents(spark, dir).localCheckpoint(true)
    val extra = docs.limit(1)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat(col("text"), lit(" zq zq zq zq zq zq zq zq")))
    docs.unionByName(extra).repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.ensureDeconStores(spark, dir)
    assert(storeFiles("graft_decon_covered", dir) !== mtC,
      "stale covered store served after corpus regeneration")
  }
}
