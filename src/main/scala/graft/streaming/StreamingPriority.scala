package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming WEIGHTED priority reservoir — the continuous form of
  * [[graft.operators.TextOps.prioritySample]], and the reason priority
  * sampling (Duffield/Lund/Thorup 2007) is the weighted reservoir of
  * choice in pipelines: the k-sample is a pure function of the
  * per-item priorities seen so far, and priorities are
  * content-addressed (w from the doc, u from the shared md5 hash), so
  * merging reservoirs = keep the top-k of the union. The kept set
  * after ANY prefix of the stream therefore equals the batch sample
  * over that prefix, regardless of micro-batching — the same
  * convergence contract as [[StreamingQuota]], now weight-aware.
  *
  * State per source is the kept (priority, doc_id, weight) triple
  * list — AT MOST k entries, so total state is `sources × k`,
  * catalog-sized on an unbounded stream. The priority double is the
  * SAME single IEEE division the batch lane computes, on the same
  * int64 operands, so stream and batch rank identically.
  */
object StreamingPriority {

  case class Doc(source: String, doc_id: Long, n_tokens: Long)
  case class Kept(source: String, doc_ids: Seq[Long], n_tokens: Seq[Long])
  /** parallel vectors sorted by (priority desc, id), length ≤ k */
  case class PState(pris: Seq[Double], ids: Seq[Long], ws: Seq[Long])

  private def priority(id: Long, w: Long): Double = {
    val h = graft.functions.ExpressionKernels.md5Prefix60(s"prio|$id")
    w.toDouble / (h + 1L).toDouble
  }

  def priorityKept(docs: Dataset[Doc], k: Int = 15)
                  (implicit spark: SparkSession): Dataset[Kept] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[Doc], st: GroupState[PState]) =>
          val cur = st.getOption
            .map(s => s.pris.indices.map(i => (s.pris(i), s.ids(i), s.ws(i))))
            .getOrElse(Seq.empty)
          val inc = it.map(d => (priority(d.doc_id, d.n_tokens),
            d.doc_id, d.n_tokens)).toSeq
          // dedupe by doc_id, latest delivery wins: a doc re-delivered
          // with a corrected weight replaces its old entry rather than
          // holding two kept slots — batch prioritySample sees exactly
          // one row per doc, so the reservoir must too
          val byId = scala.collection.mutable.LinkedHashMap[Long, (Double, Long, Long)]()
          (cur.iterator ++ inc.iterator).foreach { t => byId(t._2) = t }
          val merged = byId.values.toSeq
            .sortBy { case (p, id, _) => (-p, id) }.take(k)
          st.update(PState(merged.map(_._1), merged.map(_._2), merged.map(_._3)))
          Iterator(Kept(src, merged.map(_._2), merged.map(_._3)))
      }
  }
}
