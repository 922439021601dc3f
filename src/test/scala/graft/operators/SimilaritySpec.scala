package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Embedding similarity specs: brute-force correctness, LSH recall. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of a vector with itself is 1") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val sim = df.select(round(Similarity.cosine(col("a"), col("b")), 9).as("s"))
      .as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-9)
  }

  test("cosineTopK: k neighbors per query, ranked desc, self excluded") {
    val topk = Similarity.cosineTopK(spark, sfDir, k = 5).collect()
    assert(topk.nonEmpty)
    val byQ = topk.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 5)
      assert(rows.map(_.getAs[Long]("rnk").toInt).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      val sims = rows.sortBy(_.getAs[Long]("rnk").toInt).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
    }
  }

  test("lshBuckets: deterministic, all vectors bucketed") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val b1 = Similarity.lshBuckets(emb).select("vec_id", "bucket")
    val b2 = Similarity.lshBuckets(emb).select("vec_id", "bucket")
    assert(b1.except(b2).isEmpty)
    assert(b1.count() === emb.count())
  }

  test("LSH top-1 matches brute-force top-1 for most queries (recall)") {
    val brute = Similarity.cosineTopK(spark, sfDir, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshBucketTopK(spark, sfDir, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val hits = brute.count { case (q, v) => lsh.get(q).contains(v) }
    // 8 hyperplanes over random 64-d vectors: same-bucket recall for the
    // true NN is limited; we only require the plumbing to find real
    // neighbors, not high recall at this tiny sf
    assert(lsh.nonEmpty)
    info(s"LSH top-1 recall: $hits/${brute.size}")
  }

  test("lshRecall: one row per truth query; hits re-derived from the two top-k sets") {
    val truth = Similarity.cosineTopK(spark, sfDir)
      .select("q_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val apx = Similarity.lshBucketTopK(spark, sfDir)
      .select("q_id", "vec_id").as[(Long, Long)].collect().groupBy(_._1)
    val got = Similarity.lshRecall(spark, sfDir)
      .select("q_id", "hits", "k").as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet === truth.keySet, "one row per truth query, incl. hits=0")
    got.foreach { case (q, hits, k) =>
      assert(k === 5L)
      val expected = truth(q).map(_._2).toSet
        .intersect(apx.getOrElse(q, Array.empty).map(_._2).toSet).size.toLong
      assert(hits === expected, s"q=$q")
      assert(hits >= 0L && hits <= k)
    }
  }

  test("ivfTopKPruned ≡ ivfTopK; scan reads ONLY the probed list directories") {
    val idx = java.nio.file.Files.createTempDirectory("ivf-idx-spec").toString
    val pruned = Similarity.ivfTopKPruned(spark, sfDir, idx)
    val plain = Similarity.ivfTopK(spark, sfDir)
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
    // partition pruning is physically real: the filtered index scan
    // touches fewer list directories than exist on disk
    val allLists = new java.io.File(idx).listFiles()
      .count(_.getName.startsWith("list_id="))
    val probed = Similarity.ivfProbes(spark, sfDir)
      .select("list_id").distinct().collect().map(_.getLong(0)).toSet
    assert(probed.size < allLists,
      s"fixture must leave unprobed lists (probed ${probed.size} of $allLists)")
    // (inputFiles ignores pruning — read the scan's own numFiles metric)
    val scanned = spark.read.parquet(idx)
      .filter(col("list_id").isin(probed.toSeq: _*))
    scanned.collect()
    val scan = scanned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.toString.contains("PartitionFilters"), "filter must reach partitions")
    val totalFiles = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(idx))
    }
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"pruned scan read $readFiles of $totalFiles files — no pruning happened")
  }

  test("ivfTopK: every vector lands in exactly one list; results ranked") {
    val topk = Similarity.ivfTopK(spark, sfDir, k = 5).collect()
    assert(topk.nonEmpty)
    topk.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rnk").toInt).sorted.toSeq === (1 to rows.length))
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
      val sims = rows.sortBy(_.getAs[Long]("rnk").toInt).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF recall vs brute force (informational)") {
    val brute = Similarity.cosineTopK(spark, sfDir, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(spark, sfDir, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val hits = brute.count { case (q, v) => ivf.get(q).contains(v) }
    info(s"IVF top-1 recall: $hits/${brute.size}")
    assert(ivf.nonEmpty)
  }

  test("pqTopK: k ranked code-scan neighbors per query, self excluded") {
    val topk = Similarity.pqTopK(spark, sfDir, k = 5).collect()
    assert(topk.nonEmpty)
    topk.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rnk").toInt).sorted.toSeq === (1 to rows.length))
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
      val dists = rows.sortBy(_.getAs[Long]("rnk").toInt).map(_.getAs[Long]("adc_dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b }) // ascending distance
    }
  }

  test("PQ recall vs brute force (informational)") {
    val brute = Similarity.cosineTopK(spark, sfDir, k = 5)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val pq = Similarity.pqTopK(spark, sfDir, k = 5)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val overlap = brute.keys.map(q => (pq.getOrElse(q, Set.empty) & brute(q)).size).sum
    info(s"PQ top-5 overlap with brute force: $overlap/${brute.size * 5}")
    assert(pq.nonEmpty)
  }

  test("cosineNearDupPairs is non-vacuous at the default threshold") {
    val pairs = Similarity.cosineNearDupPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty) // a green oracle row must attest actual pairs
    pairs.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("sim") >= 0.35)
    }
  }

  test("semDedup: labels every vector; drops equal declarative within-list pairs") {
    val out = Similarity.semDedup(spark, sfDir).collect()
    val emb = graft.Tables.embeddings(spark, sfDir)
    assert(out.length.toLong === emb.count()) // one verdict per vector
    // recompute the drop set declaratively from the same assignment
    val assigned = Similarity.ivfAssigned(spark, sfDir)
    val a = assigned.select(col("list_id"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = assigned.select(col("list_id"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    val expectDropped = a.join(b, Seq("list_id"))
      .filter(col("va") < col("vb"))
      .filter(round(Similarity.cosineDeclarative(col("ea"), col("eb")), 6) >= 0.35)
      .select("vb").distinct().collect().map(_.getLong(0)).toSet
    assert(out.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet === expectDropped)
    assert(expectDropped.nonEmpty) // the gate must attest actual drops
  }

  test("codebook size is a constant, independent of corpus rows") {
    // the scale contract: IVF/PQ centroid count must NOT grow with the
    // corpus — same K from a 500-row and a 2000-row embeddings table
    val k = Similarity.CodebookK
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1").foreach { d =>
      val emb = graft.Tables.embeddings(spark, d)
      val cent = Similarity.hashSampleCentroids(emb, k)
      assert(cent.count() === k.toLong, s"codebook size != $k for $d")
    }
    // and the sample is deterministic: same ids on repeated evaluation
    val emb = graft.Tables.embeddings(spark, sfDir)
    val a = Similarity.hashSampleCentroids(emb, k).select("cent_id").as[Long].collect().toSeq
    val b = Similarity.hashSampleCentroids(emb, k).select("cent_id").as[Long].collect().toSeq
    assert(a === b)
  }

  test("more planes strictly refine buckets: 16-plane candidates ⊆ 8-plane, recall ≤") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    // plane p's weights depend only on p ⇒ the low 8 bits of the 16-plane
    // bucket ARE the 8-plane bucket
    val b8 = Similarity.lshBuckets(emb, 8).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    val b16 = Similarity.lshBuckets(emb, 16).select("vec_id", "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b8.keySet === b16.keySet)
    b16.foreach { case (v, bk) => assert((bk & 0xffL) === b8(v)) }

    // consequence: the 16-plane candidate set per query is a subset, so
    // top-1 recall vs brute force can only drop — and must, structurally
    def top1(planes: Int) = Similarity.lshBucketTopK(spark, sfDir, k = 1, planes = planes)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val brute = Similarity.cosineTopK(spark, sfDir, k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val t8 = top1(8)
    val t16 = top1(16)
    val r8 = brute.count { case (q, v) => t8.get(q).contains(v) }
    val r16 = brute.count { case (q, v) => t16.get(q).contains(v) }
    info(s"top-1 recall vs brute: 8 planes $r8/${brute.size}, 16 planes $r16/${brute.size}")
    assert(r16 <= r8)
  }

  test("planesFor grows with corpus size and caps at MaxPlanes") {
    assert(Similarity.planesFor(2000L) === 8)           // test SFs stay at 8
    assert(Similarity.planesFor(1L << 20) >= 16)        // ~1M vectors
    assert(Similarity.planesFor(1L << 40) === graft.functions.ExpressionKernels.MaxPlanes)
    assert(Similarity.planesFor(0L) === 8)
  }

  test("IVFADC with every list probed degenerates to the pure PQ ranking") {
    // nProbe = K removes the coarse pruning entirely, so the ADC ranking
    // must equal pqTopK's — pins that the list confinement is the ONLY
    // thing IVFADC changes
    val full = Similarity.ivfadcTopK(spark, sfDir, nProbe = Similarity.CodebookK)
      .collect().map(_.toString).sorted.toSeq
    val pq = Similarity.pqTopK(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(full === pq)
    // and with the default nProbe the candidates stay list-confined:
    // every reported neighbor shares a probed list with its query
    val probed = Similarity.ivfProbes(spark, sfDir)
      .select("q_id", "list_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val assigned = Similarity.ivfAssigned(spark, sfDir)
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Similarity.ivfadcTopK(spark, sfDir).collect().foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(assigned(v)), s"neighbor $v outside $q's probed lists")
    }
  }

  test("IVF append touches only the batch's lists; probe equals full rebuild") {
    import scala.jdk.CollectionConverters._
    def fileState(root: String): Map[String, Long] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.startsWith("part-"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    val idx = graft.sources.Scratch.tempDir("ivf_append_spec_")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cent = Similarity.hashSampleCentroids(emb, Similarity.CodebookK)
    Similarity.assignWith(emb.filter(col("vec_id") % 7 =!= 0), cent)
      .write.mode("overwrite").partitionBy("list_id").parquet(idx)
    val before = fileState(idx)
    // a tiny batch landing in a strict subset of lists
    val batch = emb.filter(col("vec_id") % 7 === 0).limit(3)
      .localCheckpoint(true)
    val batchLists = Similarity.assignWith(batch, cent)
      .select("list_id").distinct().as[Long].collect().toSet
    assert(batchLists.size < Similarity.CodebookK)
    Similarity.appendIvfIndex(spark, sfDir, idx, batch)
    val after = fileState(idx)
    // append-only: every pre-existing file survives byte-untouched
    before.foreach { case (f, m) =>
      assert(after.contains(f) && after(f) === m, s"rewrote $f")
    }
    // and new files appear ONLY under the batch's list directories
    val newFiles = after.keySet -- before.keySet
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val list = "list_id=(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong
      assert(batchLists.contains(list), s"file in untouched list: $f")
    }
    // the fully-grown registry index probes identically to a rebuild
    val grown = Similarity.ivfAppendTopK(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val full = Similarity.ivfTopK(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(grown === full)
  }

  test("multi-probe LSH: recall dominates single-probe per query (candidate superset)") {
    def recallMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = recallMap(Similarity.lshRecall(spark, sfDir))
    val multi = recallMap(Similarity.lshMultiProbeRecall(spark, sfDir))
    assert(single.keySet === multi.keySet)
    single.foreach { case (q, h) =>
      assert(multi(q) >= h, s"multi-probe lost recall at query $q")
    }
    // the extra probes must BUY something at this SF, or the lane is
    // attesting a no-op
    assert(multi.values.sum > single.values.sum,
      s"multi-probe recall did not improve: ${multi.values.sum} vs ${single.values.sum}")
  }

  test("planeWeight matches the md5 formula the oracle SQL uses") {
    // spot value computed independently: md5('0_0') prefix
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("0_0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L
    assert(Similarity.planeWeight(0, 0) === expected)
    assert(Similarity.planeWeight(0, 0) >= -1000 && Similarity.planeWeight(0, 0) <= 1000)
  }

  test("clusterBalancedSample: per-list cap, dense ranks, membership = md5 priorities") {
    val cap = 5
    val sample = Similarity.clusterBalancedSample(spark, sfDir, cap).collect()
    assert(sample.nonEmpty)
    val byList = sample.groupBy(_.getAs[Long]("list_id"))
    byList.foreach { case (lid, rows) =>
      assert(rows.length <= cap, s"list $lid over cap")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1 to rows.length).map(_.toLong), s"list $lid ranks not dense")
    }
    // recompute membership from scratch: per list, the cap lowest
    // (md5('cquota|'||vec_id) 60-bit prefix, vec_id) pairs win
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(v: Long): Long = {
      val hex = md.digest(s"cquota|$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val assigned = Similarity.ivfAssigned(spark, sfDir)
      .select("list_id", "vec_id").collect()
      .map(r => (r.getAs[Long]("list_id"), r.getAs[Long]("vec_id")))
    val expected = assigned.groupBy(_._1).toSeq.flatMap { case (lid, vs) =>
      vs.map(_._2).sortBy(v => (h(v), v)).take(cap).map(v => (lid, v))
    }.toSet
    val got = sample.map(r =>
      (r.getAs[Long]("list_id"), r.getAs[Long]("vec_id"))).toSet
    assert(got === expected)
    // balance is the point: more than one list contributes
    assert(byList.size > 1)
  }

  test("filtered search: pre-filter dominates post-filter against the filtered truth") {
    val k = 5
    val labelMod = 3
    // filtered ground truth, recomputed from raw vectors in plain Scala
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray, r.getAs[Int]("label")))
    // EXACTLY the engine's operation tree (left-to-right double dot,
    // norms over raw values, one division, round-6) — a pre-normalized
    // recomputation can differ in the last ulp at a rounding boundary
    def dotLR(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def simOf(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(dotLR(a, b) / (math.sqrt(dotLR(a, a)) * math.sqrt(dotLR(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val us = vecs
    val truth: Map[Long, Set[Long]] = us.filter(_._1 % 50 == 0).map { case (q, qv, _) =>
      q -> us.filter { case (v, _, l) => v != q && l % labelMod == 0 }
        .map { case (v, vv, _) => (v, simOf(qv, vv)) }
        .sortBy { case (v, s) => (-s, v) }.take(k).map(_._1).toSet
    }.toMap
    def hitsOf(lists: Map[Long, Seq[Long]]): Map[Long, Int] =
      truth.map { case (q, t) => q -> lists.getOrElse(q, Seq.empty).count(t) }
    val pre = hitsOf(Similarity.ivfFilteredTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSeq })
    // post-filter: the UNFILTERED top-k, with non-matching rows dropped
    // after ranking — the naive composition this lane exists to beat
    val labels = vecs.map { case (id, _, l) => id -> l }.toMap
    val post = hitsOf(Similarity.ivfTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSeq
        .filter(v => labels(v) % labelMod == 0) })
    truth.keys.foreach { q =>
      assert(pre(q) >= post(q), s"q$q: pre ${pre(q)} < post ${post(q)}")
    }
    // non-vacuous: post-filtering actually lost results somewhere
    assert(pre.values.sum > post.values.sum,
      s"dominance vacuous: pre=${pre.values.sum} post=${post.values.sum}")
  }

  test("ivfadc rerank: stays in the ADC pool, exact-cosine order, recall dominates raw ADC") {
    def setsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val truth = setsOf(Similarity.cosineTopK(spark, sfDir))
    val pool = setsOf(Similarity.ivfadcTopK(spark, sfDir, k = 25))
    val raw = setsOf(Similarity.ivfadcTopK(spark, sfDir))
    val rr = Similarity.ivfadcRerankTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
    rr.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("vec_id")).toSet.subsetOf(pool(q)),
        s"q$q: rerank surfaced a vector the ADC pool never nominated")
      val sims = rows.sortBy(_.getAs[Long]("rnk").toInt).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"q$q: final ranking not ordered by exact cosine")
    }
    // per query: refined recall >= raw ADC recall — guaranteed, because
    // every truth member inside the pool outranks (by the shared exact
    // cosine + tie-break) every non-truth pool member, so the refine
    // pass repairs ALL quantization mis-rankings within the pool
    truth.keys.foreach { q =>
      val rrHits = rr.get(q)
        .map(_.map(_.getAs[Long]("vec_id")).toSet.intersect(truth(q)).size).getOrElse(0)
      val rawHits = raw.get(q).map(_.intersect(truth(q)).size).getOrElse(0)
      assert(rrHits >= rawHits, s"q$q: refined $rrHits < raw ADC $rawHits")
    }
  }

  test("matryoshkaRecall: full-width anchor exact, aggregate recall non-decreasing in dims") {
    val rows = Similarity.matryoshkaRecall(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("dims"), r.getAs[Long]("q_id"),
        r.getAs[Long]("hits"), r.getAs[Long]("k")))
    assert(rows.nonEmpty)
    val dims = rows.map(_._1).distinct.sorted
    assert(dims === Array(16L, 32L, 64L))
    // one row per (dims, truth query)
    val nQ = rows.map(_._2).distinct.length
    assert(rows.length === dims.length * nQ)
    // d = 64 is prefix ≡ full: recall must be exactly k/k per query
    rows.filter(_._1 == 64L).foreach { case (_, q, h, k) =>
      assert(h === k, s"full-width anchor drifted at query $q")
    }
    // aggregate recall can only improve with more dimensions here
    val agg = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(agg(16L) <= agg(32L) && agg(32L) <= agg(64L),
      s"aggregate recall not monotone: $agg")
  }

  test("rangeSearch: exactly the in-radius pairs; bucketed variant is a subset; recall recomputes") {
    val tau = 0.25
    val exact = Similarity.rangeSearch(spark, sfDir, tau).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("sim"))
    assert(exact.nonEmpty)
    assert(exact.forall { case ((q, v), s) => s >= tau && q != v })
    // completeness: re-derive the full in-radius set from raw vectors
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      q <- vecs.keys if q % 50 == 0
      v <- vecs.keys if v != q
      s = BigDecimal(cos(vecs(q), vecs(v)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if s >= tau
    } yield (q, v) -> s).toMap
    assert(exact.toMap === expected)
    // the bucketed scale path returns a strict subset of the exact set
    val lsh = Similarity.rangeSearchLsh(spark, sfDir, tau).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    assert(lsh.subsetOf(exact.map(_._1).toSet))
    // recall row: hits/total recompute from the two frames, every
    // stride query present even with zero in-radius neighbors
    val rec = Similarity.rangeRecall(spark, sfDir, tau).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("total"))).toMap
    val exactByQ = exact.map(_._1).groupBy(_._1)
    assert(rec.keySet === vecs.keys.filter(_ % 50 == 0).toSet)
    rec.foreach { case (q, (h, t)) =>
      assert(t === exactByQ.get(q).map(_.length.toLong).getOrElse(0L))
      assert(h === exactByQ.get(q).map(_.count(lsh).toLong).getOrElse(0L))
      assert(h <= t)
    }
  }

  test("hardNegativesTopK: never the query's own label, ranked desc, k per query") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = Similarity.hardNegativesTopK(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id"); val v = r.getAs[Long]("vec_id")
      assert(v != q)
      assert(emb(v) != emb(q), s"neighbor $v shares query $q's label")
    }
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (_, rs) =>
      assert(rs.length === 5)
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // the mined negatives are exactly the label-filtered brute ranking:
    // any same-label vector more similar than a mined negative must be
    // absent, and dropping the label filter recovers cosineTopK's rows
    // where the truth neighbor already crosses labels
    val truth = Similarity.cosineTopK(spark, sfDir).collect()
    val minedByQ = byQ.map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    truth.filter(r => emb(r.getAs[Long]("vec_id")) != emb(r.getAs[Long]("q_id")))
      .groupBy(_.getAs[Long]("q_id"))
      .foreach { case (q, rs) =>
        // cross-label truth neighbors rank at least as high in the mined
        // list: the top cross-label truth neighbor must be mined
        val top = rs.minBy(_.getAs[Long]("rnk"))
        assert(minedByQ(q).contains(top.getAs[Long]("vec_id")))
      }
  }

  test("knnLabelAccuracy: per-class counts recompute from truth votes") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label").toLong).toMap
    val truth = Similarity.cosineTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
    val predicted = truth.map { case (q, rs) =>
      val votes = rs.map(r => emb(r.getAs[Long]("vec_id")))
        .groupBy(identity).map { case (l, xs) => (l, xs.length) }
      q -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
    }
    val expected = predicted.toSeq
      .groupBy { case (q, _) => emb(q) }
      .map { case (l, qs) =>
        l -> (qs.length.toLong, qs.count { case (q, p) => p == emb(q) }.toLong) }
    val got = Similarity.knnLabelAccuracy(spark, sfDir).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_correct"))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === truth.size.toLong)
    got.values.foreach { case (n, c) => assert(c <= n) }
    assert(got.values.map(_._2).sum > 0L, "vacuous: kNN never correct")
  }

  test("ivfTradeoff: nested candidate sets, monotone hits, nProbe=4 row ≡ ivfRecall") {
    val curve = Similarity.ivfTradeoff(spark, sfDir).collect()
      .map(r => r.getAs[Long]("n_probe") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("n_truth"))).toMap
    assert(curve.keySet === Set(1L, 2L, 4L, 8L))
    val truthTotals = curve.values.map(_._3).toSet
    assert(truthTotals.size === 1 && truthTotals.head > 0)
    // candidate sets are nested by construction ⇒ counts and hits are
    // monotone non-decreasing in the probe budget; hits never exceed truth
    val ordered = Seq(1L, 2L, 4L, 8L).map(curve)
    ordered.zip(ordered.tail).foreach { case ((c1, h1, _), (c2, h2, _)) =>
      assert(c1 <= c2); assert(h1 <= h2)
    }
    ordered.foreach { case (c, h, t) => assert(h <= t); assert(h <= c) }
    // the sweep's nProbe=4 point is exactly the standing ivfRecall lane
    // (same codebook, same lists, same truth): hits must sum identically
    val recallSum = Similarity.ivfRecall(spark, sfDir).agg(sum(col("hits")))
      .collect().head.getLong(0)
    assert(curve(4L)._2 === recallSum)
    // non-vacuous: the widest budget finds at least one true neighbor
    assert(curve(8L)._2 > 0)
  }
}
