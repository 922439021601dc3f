package graft.operators

import graft.SparkSpec

/** Relational surface spot checks. The authoritative gate is the DuckDB
  * oracle (tools/check_oracle.py) over every query at sf0.01; these pin
  * properties the oracle compare cannot express — in particular that
  * "green" rows are non-vacuous.
  */
class RelationalSpec extends SparkSpec {

  test("qCustomersNoOrders is non-vacuous (anti join actually excludes someone)") {
    val churned = Relational.qCustomersNoOrders(spark, sfDir)
    val n = churned.count()
    assert(n > 0) // 0 rows would make the oracle's green row attest nothing
    val total = graft.Tables.customer(spark, sfDir).count()
    assert(n < total) // and it must not degenerate to all customers
  }

  test("heap-aggregate top parts per brand ≡ window formulation") {
    val agg = Relational.qTopPartsPerBrand(spark, sfDir)
    val win = Relational.qTopPartsPerBrandWindow(spark, sfDir)
    assert(agg.columns.toSeq === win.columns.toSeq)
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
  }

  test("q21 double-correlated subqueries decorrelate to semi/anti joins") {
    val df = SqlQueries.qSupplierWait(spark, sfDir)
    assert(df.count() > 0) // non-vacuous
    // both EXISTS and NOT EXISTS must become set-oriented joins — a plan
    // that kept per-row subquery execution would be O(rows × subquery)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS did not decorrelate to a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not decorrelate to an anti join")
  }

  test("q1 money columns are int64 fixed-point (hash-stable), not decimal/double") {
    val schema = Relational.q1PricingSummary(spark, sfDir).schema
    Seq("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge").foreach { c =>
      assert(schema(c).dataType === org.apache.spark.sql.types.LongType, c)
    }
  }

  test("qEventsHopping: every event in exactly 2 windows; groups recompute from raw events") {
    val got = Relational.qEventsHopping(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("value_micros"))).toMap
    assert(got.nonEmpty)
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("unix_micros(cast(ts as timestamp)) AS us", "event_type", "value")
      .collect()
    // driver-side reference: each event covered by the hop it starts in
    // and the previous one (1h width, 30min slide)
    val slide = 1800000000L
    val expected = events.flatMap { r =>
      val us = r.getAs[Long]("us"); val h0 = us - java.lang.Math.floorMod(us, slide)
      Seq(h0, h0 - slide).map(w => (w, r.getAs[String]("event_type")) ->
        (1L, math.floor(r.getAs[Double]("value") * 1000000.0).toLong))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }
    assert(got === expected)
    assert(got.values.map(_._1).sum === 2L * events.length)
    // window starts sit on the 30-minute grid
    got.keys.foreach { case (w, _) => assert(w % slide === 0L) }
  }
}
