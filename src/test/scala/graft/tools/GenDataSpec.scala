package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The synthetic-corpus generator behind the sf1 scale drill and the
  * second-seed oracle fuzz (BASELINE.md scale notes). Pins: schema
  * parity with the driver tables, hash-determinism (same seed ⇒ same
  * bytes, new seed ⇒ new corpus), the measured dup structure, unit
  * embedding norms, and the fuzz knobs' hostile domains.
  */
class GenDataSpec extends SparkSpec {

  private lazy val dir = {
    val d = graft.sources.Scratch.tempDir("gendata-spec")
    GenData.genAll(spark, d, 0.001)
    d
  }

  test("generated tables load through Tables with driver-identical schemas") {
    val driverDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$driverDir/lineitem.parquet").exists(), s"$driverDir absent")
    for (t <- graft.Tables.names) {
      val gen = graft.Tables.load(spark, dir, t).schema
      val drv =
        if (t == "events") graft.Tables.events(spark, driverDir).schema
        else graft.Tables.load(spark, driverDir, t).schema
      val genRead =
        if (t == "events") graft.Tables.events(spark, dir).schema else gen
      assert(genRead.map(f => (f.name, f.dataType)) === drv.map(f => (f.name, f.dataType)),
        s"schema mismatch for $t")
    }
  }

  test("same seed is bit-deterministic; a different seed moves the corpus") {
    def corpusHash(seed: Long): Long = GenData.documents(spark, 100, GenOpts(seed = seed))
      .agg(expr("bit_xor(xxhash64(doc_id, text, lang, source))")).head.getLong(0)
    val a = corpusHash(42L)
    val b = corpusHash(42L)
    val c = corpusHash(1337L)
    assert(a === b)
    assert(a !== c)
  }

  test("documents carry the measured dup structure and invariants") {
    val docs = graft.Tables.documents(spark, dir).cache()
    try {
      val n = docs.count()
      val nearDups = docs.filter(col("text").endsWith(" dup")).count()
      // 5% near-dup rate; tolerate binomial noise at n=50
      assert(nearDups >= 0 && nearDups <= n / 4, s"near-dup count $nearDups of $n")
      assert(docs.filter(length(col("text")) =!= col("n_chars")).count() === 0)
      assert(docs.filter(col("lang").isin("en", "de", "es", "fr", "zh")).count() === n)
      // base text never contains the reserved mutation marker mid-string
      assert(docs.filter(col("text").contains("dup ")).count() === 0)
    } finally docs.unpersist()
  }

  test("embeddings are 64-dim unit vectors with labels 0..9") {
    val em = graft.Tables.embeddings(spark, dir)
    val bad = em.filter(size(col("embedding")) =!= 64 ||
      abs(sqrt(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x)) - 1.0) > 1e-5 ||
      col("label") < 0 || col("label") > 9).count()
    assert(bad === 0)
  }

  test("lineitem rows reference valid orders/parts/suppliers; Poisson mean ~4") {
    val li = graft.Tables.lineitem(spark, dir)
    val orders = graft.Tables.orders(spark, dir)
    val nOrders = orders.count()
    val nLines = li.count()
    val mean = nLines.toDouble / nOrders
    assert(mean > 3.5 && mean < 4.5, s"lines/order $mean")
    assert(li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti").count() === 0)
  }

  test("events ids are the ts-order ranks") {
    val ev = graft.Tables.events(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val out = ev.withColumn("prev", lag(col("ts"), 1).over(Window.orderBy("event_id")))
      .filter(col("prev") > col("ts")).count()
    assert(out === 0)
  }

  test("fuzz knobs leave the ASCII domain: non-ASCII vocab and empty docs") {
    val fuzz = GenData.documents(spark, 400,
      GenOpts(seed = 7L, nearDupRate = 0.2, nonAsciiRate = 0.5, emptyDocRate = 0.05)).cache()
    try {
      assert(fuzz.filter(length(col("text")) === 0).count() > 0, "no empty docs")
      assert(fuzz.filter(col("text").rlike("[^\\x00-\\x7F]")).count() > 0, "no non-ASCII docs")
      assert(fuzz.filter(col("text").endsWith(" dup")).count() > 20, "dup-heavy knob inert")
    } finally fuzz.unpersist()
  }
}
