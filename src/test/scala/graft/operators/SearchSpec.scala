package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval: ranking invariants plus a from-scratch Scala
  * recomputation of every returned score (same rational→double→floor
  * pipeline, independent of any Spark expression machinery).
  */
class SearchSpec extends SparkSpec {

  test("phraseTopK: counts recompute from sliding windows over raw text") {
    val out = Search.phraseTopK(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def tf(phrase: Seq[String], toks: Seq[String]): Long =
      toks.sliding(phrase.length).count(_ == phrase).toLong
    val phrases = Search.Phrases.toMap
    // every emitted (query, doc, tf) matches the sliding-window count,
    // and per query the emitted set is exactly the top-k of the full
    // recomputed ranking
    out.foreach { r =>
      val p = phrases(r.getLong(0)).split(" ").toSeq
      assert(r.getLong(2) === tf(p, docs(r.getLong(1))))
    }
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val p = phrases(qid).split(" ").toSeq
      val full = docs.toSeq.map { case (d, t) => (d, tf(p, t)) }
        .filter(_._2 > 0).sortBy { case (d, n) => (-n, d) }.take(10)
      assert(rows.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getLong(2))).toSeq === full)
    }
  }

  test("bm25TopK: exactly one FileScan of the documents parquet") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    // tf (postings) is the single corpus materialization; df, dl and the
    // scoring join all read the cache — a second documents scan would be
    // a wasted full corpus pass at 100 TB. The counter descends into AQE
    // wrappers and cached plans (where naive collect() stops), but each
    // distinct cache materializes ONCE however many consumers read it,
    // so cached subtrees are deduped by cache-builder identity.
    val caches = scala.collection.mutable.Map[Int, SparkPlan]()
    def direct(p: SparkPlan): Int = {
      val here = p match {
        case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) => 1
        case _ => 0
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => direct(a.inputPlan)
        case s: InMemoryTableScanExec =>
          caches(System.identityHashCode(s.relation.cacheBuilder)) = s.relation.cachedPlan
          0
        case _ => 0
      }
      here + nested + p.children.map(direct).sum
    }
    val df = Search.bm25TopK(spark, sfDir)
    try {
      var total = direct(df.queryExecution.executedPlan)
      var done = Set.empty[Int]
      while (done.size < caches.size) {
        val (id, plan) = caches.find { case (k, _) => !done.contains(k) }.get
        done += id
        total += direct(plan)
      }
      assert(total === 1)
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("bm25TopK: ranked, tie-broken, and scores recompute from raw text") {
    val out = Search.bm25TopK(spark, sfDir).collect()
    assert(out.nonEmpty)
    // per query: rnk = 1..m (m ≤ 10), ordered by (score desc, doc_id)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rows.length))
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getLong(2) > lo.getLong(2) ||
            (hi.getLong(2) == lo.getLong(2) && hi.getLong(1) < lo.getLong(1)))
        case _ => ()
      }
    }
    // independent recomputation from the raw text column
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toLong
    val ltot = docs.values.map(_.length.toLong).sum
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    def score(qterms: Seq[String], d: Long): Long = {
      val toks = docs(d)
      val dl = toks.length.toLong
      qterms.distinct.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val df = dfMap(t)
          val idf = (2.0 * n - 2 * df + 1) / (2 * df + 1)
          val tfpart = (44.0 * tf * ltot) /
            (20.0 * tf * ltot + 6.0 * ltot + 18.0 * dl * n)
          Some(math.floor(1000000.0 * idf * tfpart).toLong)
        }
      }.sum
    }
    val queries = Search.Queries.toMap
    out.foreach { r =>
      val expected = score(queries(r.getLong(0)).split(" ").toSeq, r.getLong(1))
      assert(r.getLong(2) === expected,
        s"score mismatch for query ${r.getLong(0)} doc ${r.getLong(1)}")
    }
  }

  test("tfidfTopK: scores recompute from raw text (int idf/weights/norms, one float step)") {
    val out = Search.tfidfTopK(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toLong
    val dfMap = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, occ) => t -> occ.size.toLong }
    def idfs(t: String): Long = {
      val df = dfMap(t)
      (2 * n - 2 * df + 1) * 100 / (2 * df + 1)
    }
    def score(qterms: Seq[String], docId: Long): Long = {
      val toks = docs(docId)
      val tf = toks.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val norm2d = tf.map { case (t, f) => val w = f * idfs(t); w * w }.sum
      val qs = qterms.distinct.filter(dfMap.contains)
      val norm2q = qs.map(t => idfs(t) * idfs(t)).sum
      val dot = qs.flatMap(t => tf.get(t).map(f => f * idfs(t) * idfs(t))).sum
      math.floor(1000000.0 * dot /
        (math.sqrt(norm2d.toDouble) * math.sqrt(norm2q.toDouble))).toLong
    }
    val queries = Search.Queries.toMap
    out.foreach { r =>
      val expected = score(queries(r.getLong(0)).split(" ").toSeq, r.getLong(1))
      assert(r.getLong(2) === expected,
        s"tfidf mismatch for query ${r.getLong(0)} doc ${r.getLong(1)}")
    }
  }

  test("hybridRrfTopK: fusion equals integer RRF recomputed from the two rank lists") {
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val b = ranks(Search.bm25TopK(spark, sfDir))
    val t = ranks(Search.tfidfTopK(spark, sfDir))
    val fused = (b.keySet ++ t.keySet).map { key =>
      key -> (b.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        t.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L))
    }.toMap
    val expected = fused.groupBy(_._1._1).flatMap { case (qid, m) =>
      m.toSeq.map { case ((_, did), s) => (did, s) }
        .sortBy { case (did, s) => (-s, did) }.take(10).zipWithIndex
        .map { case ((did, s), i) => (qid, did) -> (s, i + 1L) }
    }
    val got = Search.hybridRrfTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("evalRankers: every metric recomputes from raw docs + the rank lists") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def qrels(qtext: String): Set[Long] = {
      val terms = qtext.split(" ").distinct.toSeq
      docs.filter { case (_, text) =>
        val tf = text.split(" ").groupBy(identity).map { case (t, v) => t -> v.length }
        terms.forall(t => tf.getOrElse(t, 0) >= Search.RelevanceTf)
      }.keySet
    }
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      }
    val lists = Map(
      "bm25" -> ranks(Search.bm25TopK(spark, sfDir)),
      "tfidf" -> ranks(Search.tfidfTopK(spark, sfDir)),
      "rrf" -> ranks(Search.hybridRrfTopK(spark, sfDir)))
    val queries = Search.Queries.toMap
    val out = Search.evalRankers(spark, sfDir).collect()
    assert(out.length === 3 * Search.Queries.size)
    out.foreach { r =>
      val (ranker, qid) = (r.getString(0), r.getLong(1))
      val rel = qrels(queries(qid))
      val list = lists(ranker)(qid)
      val firstIdx = list.indexWhere(rel.contains)
      val hitRank = if (firstIdx < 0) 0L else firstIdx + 1L
      assert(r.getLong(2) === rel.size, s"$ranker q$qid n_rel")
      assert(r.getLong(3) === hitRank, s"$ranker q$qid hit_rank")
      assert(r.getLong(4) === (if (hitRank == 0) 0L else 1000000L / hitRank),
        s"$ranker q$qid rr_micro")
      assert(r.getLong(5) === list.count(rel.contains).toLong, s"$ranker q$qid p10_hits")
    }
    // the qrel floor keeps the eval non-vacuous AND non-saturated here:
    // every query has relevant docs, and not every ranker is perfect
    assert(out.forall(_.getLong(2) > 0))
  }

  test("evalNdcg: DCG/IDCG recompute from raw docs + the rank lists") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def qrels(qtext: String): Set[Long] = {
      val terms = qtext.split(" ").distinct.toSeq
      docs.filter { case (_, text) =>
        val tf = text.split(" ").groupBy(identity).map { case (t, v) => t -> v.length }
        terms.forall(t => tf.getOrElse(t, 0) >= Search.RelevanceTf)
      }.keySet
    }
    def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      }
    val lists = Map(
      "bm25" -> ranks(Search.bm25TopK(spark, sfDir)),
      "tfidf" -> ranks(Search.tfidfTopK(spark, sfDir)),
      "rrf" -> ranks(Search.hybridRrfTopK(spark, sfDir)))
    val disc = Search.ndcgDiscountsMicro(10)
    val queries = Search.Queries.toMap
    val out = Search.evalNdcg(spark, sfDir).collect()
    assert(out.length === 3 * Search.Queries.size)
    out.foreach { r =>
      val (ranker, qid) = (r.getString(0), r.getLong(1))
      val rel = qrels(queries(qid))
      val list = lists(ranker)(qid)
      val dcg = list.zipWithIndex
        .collect { case (d, i) if rel.contains(d) => disc(i) }.sum
      val idcg = disc.take(math.min(rel.size, 10)).sum
      assert(r.getLong(2) === rel.size, s"$ranker q$qid n_rel")
      assert(r.getLong(3) === dcg, s"$ranker q$qid dcg_micro")
      assert(r.getLong(4) === idcg, s"$ranker q$qid idcg_micro")
      assert(r.getLong(5) === (if (idcg == 0) 0L else 1000L * dcg / idcg),
        s"$ranker q$qid ndcg_permille")
      assert(r.getLong(5) <= 1000L, "nDCG cannot exceed 1")
    }
    // non-vacuous: the metric separates — somewhere strictly between
    // a miss and a perfect list
    assert(out.exists(r => r.getLong(5) > 0 && r.getLong(5) < 1000))
  }

  test("relatedHybridTopK: fusion recomputes from the cosine and jaccard rank lists") {
    val k = 5
    val sem = Similarity.cosineTopK(spark, sfDir, k, 50).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("rnk"))
      .toMap
    val probes = graft.Tables.embeddings(spark, sfDir).select("vec_id").collect()
      .map(_.getLong(0)).filter(_ % 50 == 0).toSet
    // lexical ranks recomputed in plain Scala from the shared pair frame:
    // both orientations, integer jacc_micro, (-score, doc) order
    val oriented = MinHash.corpusSized(spark, sfDir).collect().flatMap { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val inter = r.getAs[Long]("inter")
      val un = r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - inter
      Seq((a, b, 1000000L * inter / un), (b, a, 1000000L * inter / un))
    }.filter(t => probes.contains(t._1))
    val lex: Map[(Long, Long), Long] = oriented.groupBy(_._1).flatMap { case (q, rows) =>
      rows.toSeq.map { case (_, d, j) => (d, j) }
        .sortBy { case (d, j) => (-j, d) }.take(k).zipWithIndex
        .map { case ((d, _), i) => (q, d) -> (i + 1L) }
    }
    val fusedExp = (sem.keySet ++ lex.keySet).map { key =>
      key -> (sem.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L) +
        lex.get(key).map(rk => 1000000L / (60 + rk)).getOrElse(0L))
    }.toMap
    val expected = fusedExp.groupBy(_._1._1).flatMap { case (q, m) =>
      m.toSeq.map { case ((_, d), s) => (d, s) }
        .sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
        .map { case ((d, s), i) => (q, d) -> (s, i + 1L) }
    }
    val got = Search.relatedHybridTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("rrf_score"), r.getAs[Long]("rnk"))).toMap
    assert(got.nonEmpty)
    assert(got === expected)
    // the semantic side alone guarantees full depth: exactly k rows per probe
    assert(got.size === probes.size * k)
    // the asymmetric-universe contract is real here, not vacuous: at
    // least one surfaced doc came from only one retriever's list
    assert(got.keySet.exists(key => sem.contains(key) ^ lex.contains(key)))
  }

  test("rm3: expansion pool excludes original terms, fbTerms per query, integer weights") {
    val qTerms = Search.Queries.map { case (q, t) => q -> t.split(" ").toSet }.toMap
    val exp = Search.rm3ExpansionTerms(spark, sfDir, fbDocs = 3, fbTerms = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("term"), r.getAs[Long]("w")))
    assert(exp.nonEmpty)
    val byQ = exp.groupBy(_._1)
    assert(byQ.keySet === qTerms.keySet)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q expansion count")
      rows.foreach { case (_, term, w) =>
        assert(!qTerms(q).contains(term), s"original term '$term' re-entered query $q")
        assert(w > 0L)
      }
      // weights descend under the (w desc, term asc) selection order
      val ws = rows.sortBy { case (_, t, w) => (-w, t) }.map(_._3)
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rm3: feedback actually moves the ranking; zero expansion weight degenerates to plain BM25") {
    val bm = Search.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) -> r.getAs[Long]("doc_id")).toMap
    val rm3 = Search.bm25Rm3TopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) -> r.getAs[Long]("doc_id")).toMap
    assert(rm3.keySet === bm.keySet)
    // the expansion terms must actually change at least one ranked slot
    assert(rm3 !== bm, "RM3 ranking identical to plain BM25 — expansion had no effect")
    // expW=0: expansion terms contribute nothing; every slot plain BM25
    // ranks is reproduced exactly (queries have >> k positive docs at
    // this sf, so zero-score expansion-only docs can never surface)
    val degenerate = Search.bm25Rm3TopK(spark, sfDir, origW = 1, expW = 0).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk")) -> r.getAs[Long]("doc_id")).toMap
    assert(degenerate === bm)
  }
}
