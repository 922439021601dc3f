package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming fuzzy record linkage — entity resolution AT INGEST: as
  * names arrive, each blocking-token group keeps the distinct names
  * seen so far and emits a verified pair the moment its second member
  * lands (Levenshtein 1..maxDist, ordered `a < b` — the batch lane's
  * exact verify, [[graft.operators.Linkage.fuzzyNamePairs]]).
  *
  * State per token group is the group's distinct-NAME list — the
  * vocabulary projection of the stream, bounded by catalog size, never
  * row count (the same distinct-value reduction that makes the batch
  * lane linear). Re-sent duplicates of a known name change nothing and
  * emit nothing. A pair sharing two blocking tokens is emitted by both
  * groups; consumers (and the parity spec) read pairs as a SET, exactly
  * like the batch lane's DISTINCT.
  */
object StreamingLinkage {

  case class Name(name: String)
  case class Pair(name_a: String, name_b: String, dist: Long)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
        j += 1
      }
      i += 1
    }
    d(a.length)(b.length)
  }

  /** Incremental verified pairs from a stream of names. Names fan out
    * to one group per blocking token before this operator (see
    * [[tokenized]]).
    */
  def linkedPairs(names: Dataset[(String, String)], maxDist: Int = 2)
                 (implicit spark: SparkSession): Dataset[Pair] = {
    import spark.implicits._
    names.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[(String, String)], st: GroupState[Seq[String]]) =>
          var known = st.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
          it.map(_._2).toSeq.distinct.foreach { n =>
            if (!known.contains(n)) {
              known.foreach { k =>
                val d = lev(n, k)
                if (d >= 1 && d <= maxDist) {
                  val (a, b) = if (n < k) (n, k) else (k, n)
                  out += Pair(a, b, d.toLong)
                }
              }
              known = known :+ n
            }
          }
          st.update(known)
          out.iterator
      }
  }

  /** Blocking fan-out: one (token, name) row per word token. */
  def tokenized(names: Dataset[Name])
               (implicit spark: SparkSession): Dataset[(String, String)] = {
    import spark.implicits._
    names.flatMap(n => n.name.split(' ').toSeq.distinct.map(t => (t, n.name)))
  }
}
