package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the JL sign-projection lane (oracle row `q_embedding_project`):
  * the md5-derived sign matrix cell-for-cell on basis vectors, the
  * Johnson–Lindenstrauss norm-preservation property the projection
  * exists for, and determinism.
  */
class JlProjectSpec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private def sign(i: Int, j: Int): Long =
    if (h60(s"jl|$i|$j") % 2 == 0) 1L else -1L

  private def sketch(v: Seq[Float]): (Long, Long) = {
    val r = Seq(Tuple1(v)).toDF("embedding")
      .select(graft.functions.functions.jl_sketch(col("embedding"), 16).as("s"))
      .select(col("s.proj_checksum"), col("s.proj_norm2")).collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("basis vectors expose the sign matrix cell-for-cell") {
    for (i <- Seq(0, 7, 63)) {
      val v = Array.fill(64)(0.0f); v(i) = 1.0f
      val (checksum, norm2) = sketch(v.toSeq)
      // p_j = sign(i,j)·1e6 ⇒ checksum = 1e6·Σ_j sign(i,j)(j+1), norm2 = 16·1e12
      val want = (0 until 16).map(j => sign(i, j) * (j + 1) * 1000000L).sum
      assert(checksum === want, s"sign row mismatch at i=$i")
      assert(norm2 === 16L * 1000000L * 1000000L)
    }
  }

  test("JL property: projected norm/dPrime tracks the quantized input norm for every vector") {
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.functions.jl_sketch(col("embedding"), 16).as("s"),
        aggregate(transform(col("embedding"),
            x => pow(floor(x.cast("double") * lit(1e6)), 2)),
          lit(0.0), (acc, x) => acc + x).as("qnorm2"))
      .select(col("s.proj_norm2").cast("double").as("pn"), col("qnorm2"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val ratio = r.getDouble(0) / 16.0 / r.getDouble(1)
      assert(ratio > 0.2 && ratio < 5.0,
        s"projection norm drifted outside the JL band: $ratio")
    }
  }

  test("deterministic across invocations") {
    val a = Similarity.jlProjectSummary(spark, sfDir).collect().map(_.toString).sorted
    val b = Similarity.jlProjectSummary(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }
}
