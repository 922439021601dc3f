package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the MinHash+LSH pipeline
  * (operators.MinHash) with the band join replaced by band STATE — the
  * shape a training-data ingest pipeline needs when the corpus arrives
  * continuously and each new document must be checked against everything
  * already admitted.
  *
  *  - Signature + banding are per-row codegen'd expression work
  *    (WordShingles / MinHashSig kernels), stateless in the stream.
  *  - Each (band_id, band_key) group keeps the doc ids seen so far in
  *    `GroupState`; a new arrival emits one candidate pair per stored
  *    doc. Hash-partitioned by band key across executors, exactly like
  *    the batch band shuffle.
  *  - `maxDocsPerBand` caps state (the streaming twin of the batch df
  *    cap): a degenerate band (e.g. empty-ish docs) would otherwise
  *    accumulate unbounded state AND emit quadratic pairs.
  *
  * Candidates are LSH candidates, not verified pairs — the verify join
  * (exact Jaccard on shingle arrays) runs downstream on the candidate
  * stream, e.g. in foreachBatch against the document store, same as the
  * batch `MinHash.exactJaccard`.
  */
object StreamingNearDup {

  case class Doc(doc_id: Long, text: String, event_time: Timestamp)
  case class CandPair(doc_a: Long, doc_b: Long, band_id: Int)

  def candidates(docs: Dataset[Doc], maxDocsPerBand: Int = 256)
                (implicit spark: SparkSession): Dataset[CandPair] = {
    import spark.implicits._
    import graft.functions.functions._
    val nBands = graft.operators.MinHash.NumHashes / graft.operators.MinHash.BandRows
    val banded = graft.operators.MinHash.bands(
        docs.toDF()
          .withColumn("sig", minhash_sig(
            word_shingles(col("text"), graft.operators.MinHash.ShingleSize),
            graft.operators.MinHash.NumHashes)))
      .as[(Long, Int, String)]
    banded
      .groupByKey { case (_, bandId, bandKey) => s"$bandId|$bandKey" }
      .flatMapGroupsWithState[List[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(Long, Int, String)], state: GroupState[List[Long]]) =>
          val bandId = key.takeWhile(_ != '|').toInt
          val seen = state.getOption.getOrElse(Nil)
          // deterministic intra-batch order
          val arrivals = rows.map(_._1).toSeq.distinct.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
          var acc = seen
          arrivals.foreach { id =>
            if (!acc.contains(id)) {
              acc.take(maxDocsPerBand).foreach { prev =>
                val (a, b) = if (prev < id) (prev, id) else (id, prev)
                out += CandPair(a, b, bandId)
              }
              acc = id :: acc
            }
          }
          // cap the stored list — overflow docs beyond the cap still got
          // compared against the first maxDocsPerBand (bounded work),
          // mirroring the batch df cap's "hot shingle carries no signal"
          state.update(acc.take(maxDocsPerBand))
          out.iterator
      }
  }
}
