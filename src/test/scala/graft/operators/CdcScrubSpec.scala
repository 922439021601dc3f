package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the content-defined chunk scrub (TextOps.cdcScrub, oracle row
  * `dedup_cdc_scrub`): the CDC boundary rule, shift-robust segmentation
  * (the property motivating CDC over fixed windows), the ≥ minDf ban
  * threshold, and in-order reassembly of the surviving chunks.
  */
class CdcScrubSpec extends SparkSpec {
  import spark.implicits._

  /** Same 60-bit md5-prefix hash the engine and oracle compute. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // word pools discovered against the real boundary rule (mod 8)
  private val all = (1 to 400).map(i => s"w$i")
  private val boundary = all.filter(h60(_) % 8 == 0)
  private val plain = all.filter(h60(_) % 8 != 0)

  private def scrub(minDf: Int, texts: String*) =
    TextOps.cdcScrubOf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      mask = 8, minDf = minDf)
      .orderBy(col("doc_id")).collect()

  test("word pools are non-vacuous for the mod-8 rule") {
    assert(boundary.size >= 20 && plain.size >= 100)
  }

  test("a chunk repeated in >= minDf docs is scrubbed; unique chunks survive") {
    // chunk = <plain plain boundary>: the boundary token ends it
    val shared = s"${plain(0)} ${plain(1)} ${boundary(0)}"
    val r = scrub(3,
      s"$shared ${plain(2)} ${plain(3)}",
      s"$shared ${plain(4)} ${plain(5)}",
      s"$shared ${plain(6)} ${plain(7)}")
    r.foreach { row =>
      assert(row.getLong(2) === 1L, "one chunk removed per doc")
      assert(!row.getString(3).split(" ").contains(plain(0)), "shared chunk gone")
    }
    assert(r(0).getString(3) === s"${plain(2)} ${plain(3)}")
  }

  test("CDC shift robustness: the shared passage scrubs at ANY offset") {
    // each doc has a different-length unique prefix ENDED BY A BOUNDARY
    // token, so the shared suffix starts at different token offsets yet
    // segments into the identical chunk in every doc
    val shared = s"${plain(10)} ${plain(11)} ${plain(12)} ${boundary(1)}"
    val r = scrub(3,
      s"${plain(20)} ${boundary(2)} $shared",
      s"${plain(21)} ${plain(22)} ${boundary(2)} $shared",
      s"${plain(23)} ${plain(24)} ${plain(25)} ${boundary(2)} $shared")
    r.foreach { row =>
      assert(!row.getString(3).split(" ").contains(plain(10)), "shifted shared chunk scrubbed")
      assert(row.getString(3).nonEmpty, "unique prefix survives")
    }
  }

  test("df below minDf keeps the chunk; a fully-banned doc empties") {
    val shared = s"${plain(30)} ${boundary(3)}"
    val twice = scrub(3, s"$shared ${plain(31)}", s"$shared ${plain(32)}")
    assert(twice.forall(_.getLong(2) === 0L), "df=2 < minDf=3 -> kept")

    val only = scrub(3, shared, shared, shared)
    only.foreach { row =>
      assert(row.getLong(1) === row.getLong(2), "all chunks removed")
      assert(row.getString(3) === "", "clean_text empty, row still present")
    }
  }

  test("scrub from the grown persisted chunk store equals the one-shot scrub") {
    val stored = TextOps.cdcScrubStored(spark, sfDir).collect().map(_.toString)
    val oneShot = TextOps.cdcScrub(spark, sfDir).collect().map(_.toString)
    assert(stored.nonEmpty)
    assert(stored.sorted.toSeq === oneShot.sorted.toSeq)
    // second ensure is a no-op memo hit (same table, nothing rebuilt)
    val t1 = TextOps.ensureGrownChunkIndex(spark, sfDir)
    val t2 = TextOps.ensureGrownChunkIndex(spark, sfDir)
    assert(t1 === t2)
  }

  test("reassembly preserves original chunk order") {
    // doc = A(banned) B A(banned) C with distinct unique chunks B, C
    val banned = s"${plain(40)} ${boundary(4)}"
    val b = s"${plain(41)} ${boundary(5)}"
    val c = s"${plain(42)} ${plain(43)}"
    val r = scrub(3,
      s"$banned $b $banned $c",
      s"$banned ${plain(44)} $banned",
      s"$banned ${plain(45)} $banned")
    assert(r(0).getString(3) === s"$b $c")
  }
}
