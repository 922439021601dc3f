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
}
