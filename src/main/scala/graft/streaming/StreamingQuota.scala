package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source quota cap — the continuous form of
  * [[graft.operators.TextOps.quotaSample]]: as documents arrive, each
  * source keeps the `cap` lowest md5-priority docs seen SO FAR. Because
  * a doc's priority is content-addressed and never changes, the kept
  * set after any prefix of the stream equals the batch quota over that
  * prefix — the streaming and batch lanes converge exactly once the
  * same docs have flowed through, regardless of batching.
  *
  * State per source is the kept (priority, doc_id) list — AT MOST `cap`
  * entries, so total state is `sources × cap`, a catalog-sized bound
  * that never grows with corpus size (the property that makes the
  * operator deployable on an unbounded stream). Each batch emits the
  * group's current kept list in rank order.
  */
object StreamingQuota {

  case class Doc(source: String, doc_id: Long)
  case class Kept(source: String, doc_ids: Seq[Long])
  /** parallel sorted-by-(h, id) vectors, length ≤ cap */
  case class QState(hs: Seq[Long], ids: Seq[Long])

  private def priority(id: Long): Long =
    graft.functions.ExpressionKernels.md5Prefix60(s"quota|$id")

  def quotaKept(docs: Dataset[Doc], cap: Int = 15)
               (implicit spark: SparkSession): Dataset[Kept] = {
    import spark.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[Doc], st: GroupState[QState]) =>
          val cur = st.getOption.map(s => s.hs.zip(s.ids)).getOrElse(Seq.empty)
          val inc = it.map(d => (priority(d.doc_id), d.doc_id)).toSeq
          val merged = (cur ++ inc).distinct.sorted.take(cap)
          st.update(QState(merged.map(_._1), merged.map(_._2)))
          Iterator(Kept(src, merged.map(_._2)))
      }
  }
}
