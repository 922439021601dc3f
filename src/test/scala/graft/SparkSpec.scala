package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, SURVEY.md §5).
  * Built WITH GraftExtensions — the production sessions (Verify, Bench)
  * register them too, and `getOrCreate` silently drops extensions when an
  * earlier suite already built the session, so every suite must agree.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}
