package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-dedup → FirstByOrder aggregate rewrite, through the shared
  * session built with GraftExtensions (SparkSpec).
  */
class FirstWinsRewriteSpec extends graft.SparkSpec {

  private def windowDedup = {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  test("rewrite fires: plan has no Window, uses ObjectHashAggregate") {
    val plan = windowDedup.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
  }

  test("rewritten result equals the window-dedup semantics") {
    val got = windowDedup
    val expected = graft.operators.Dedup.firstWins(
      graft.Tables.events(spark, "/root/testdata/sf0.001"),
      Seq("user_id", "event_type"), Seq("ts", "event_id"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    assert(got.count() === expected.count())
  }

  test("rewrite does NOT fire when rn is kept, descending, or rank-based") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    // rn kept in output → window must remain
    val kept = events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    // descending order → not the first-wins shape
    val desc = events.withColumn("rn",
        row_number().over(Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id"))))
      .filter(col("rn") === 1).drop("rn")
    assert(desc.queryExecution.executedPlan.toString.contains("Window"))
    // rank() → ties semantics differ, must remain a window
    val rk = events.withColumn("rn", rank().over(w)).filter(col("rn") === 1).drop("rn")
    assert(rk.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("kernel expressions are callable from the SQL front-end") {
    graft.operators.SqlQueries.registerViews(spark, "/root/testdata/sf0.001")
    val row = spark.sql(
      """SELECT doc_id,
        |  simhash60(split(text, ' ')) AS sh,
        |  size(word_shingles(text, 3)) AS n_shingles,
        |  token_stats(text).n_tokens AS n_tokens,
        |  size(winnow_fingerprints(text, 3, 4)) AS n_fps
        |FROM documents ORDER BY doc_id LIMIT 1""".stripMargin).head()
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Int]("n_shingles") > 0)
    assert(row.getAs[Long]("n_tokens") > 0L)
    assert(row.getAs[Int]("n_fps") > 0)
    val cos = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 1").head()
    assert(math.abs(cos.getAs[Double]("c") - 1.0) < 1e-9)
  }

  test("rn = 2 (not first) is untouched") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val second = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2).drop("rn")
    assert(second.queryExecution.executedPlan.toString.contains("Window"))
  }
}
