package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Text-analysis + near-dup operator specs over sf0.001. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("qualityScore: consistent counts and ratios") {
    val rows = TextOps.qualityScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nStop = r.getAs[Long]("n_stopwords")
      assert(nTok > 0 && nStop >= 0 && nStop <= nTok)
      assert(math.abs(r.getAs[Double]("stopword_ratio") - nStop.toDouble / nTok) < 1e-12)
      assert(r.getAs[Long]("n_types") <= nTok)
    }
  }

  test("repetitionRules: hand-computed coverage numerators, emoji code points, rule ladder") {
    val docs = Seq(
      (1L, "a a a a a a"),                           // pathological repeat
      (2L, "🍕 🍕 🍕 🍕 🍕"),                        // astral chars: den is CODE POINTS
      (3L, "one two three four"),                    // all grams unique
      (4L, "")                                       // empty: den 0, everything passes
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionRulesOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap

    // doc 1: den 11; "a a"×5 → top2 = 15; "a a a"×4 → top3 = 20;
    // top4 = 3·7 = 21; dup5 = 2·9 = 18; dup6..10 = 0 (≤1 occurrence).
    // fails: top2 (1500>220), top3 (2000>198), top4 (2100>176),
    // dup5 (1800>165) → n_fail 4
    val d1 = r(1L)
    assert(d1.getAs[Long]("den") === 11L)
    assert(d1.getAs[Long]("top2_chars") === 15L)
    assert(d1.getAs[Long]("top3_chars") === 20L)
    assert(d1.getAs[Long]("top4_chars") === 21L)
    assert(d1.getAs[Long]("dup5_chars") === 18L)
    assert(d1.getAs[Long]("dup6_chars") === 0L)
    assert(d1.getAs[Long]("n_fail") === 4L && d1.getAs[Long]("passes") === 0L)

    // doc 2: 5 emoji + 4 spaces = 9 code points (Java String.length
    // would read 14); "🍕 🍕"×4 → top2 = 4·3 = 12
    val d2 = r(2L)
    assert(d2.getAs[Long]("den") === 9L)
    assert(d2.getAs[Long]("top2_chars") === 12L)
    assert(d2.getAs[Long]("top4_chars") === 2L * 7L) // "🍕 🍕 🍕 🍕" ×2
    assert(d2.getAs[Long]("dup5_chars") === 0L)      // single 5-gram, count 1

    // doc 3: unique grams → dup* all 0; top2 = the widest 2-gram
    // ("three four" = 10 chars ×1)
    val d3 = r(3L)
    assert(d3.getAs[Long]("top2_chars") === 10L)
    assert((5 to 10).forall(n => d3.getAs[Long](s"dup${n}_chars") === 0L))

    // doc 4: no grams, den 0 → every rule 0·100 ≤ 0·pct passes
    val d4 = r(4L)
    assert(d4.getAs[Long]("den") === 0L && d4.getAs[Long]("n_fail") === 0L
      && d4.getAs[Long]("passes") === 1L)
  }

  test("repetitionRules on the corpus: numerators monotone down the top ladder") {
    val rows = TextOps.repetitionRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      // a (n+1)-gram's coverage can exceed an n-gram's only via chars,
      // never count — but top2 ≥ top3's COUNT share means nothing
      // cross-n; the invariants that DO hold: numerators are bounded by
      // total repeated mass ≤ den · maxCount and dup ladders shrink
      assert(x.getAs[Long]("den") >= 0L)
      val dups = (5 to 10).map(n => x.getAs[Long](s"dup${n}_chars"))
      assert(dups.forall(_ >= 0L))
      assert(x.getAs[Long]("passes") === (if (x.getAs[Long]("n_fail") == 0L) 1L else 0L))
    }
  }

  test("langId covers every doc with a prediction from the marker set") {
    val preds = TextOps.langId(spark, sfDir).select("predicted_lang").as[String].collect()
    assert(preds.length > 0)
    assert(preds.toSet.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("fingerprint is deterministic and unique per distinct text") {
    val fp = TextOps.fingerprint(spark, sfDir)
    val n = fp.count()
    assert(fp.select("fp_md5").distinct().count() === n) // corpus has no exact dups
    val again = TextOps.fingerprint(spark, sfDir)
    assert(fp.except(again).isEmpty)
  }

  test("exactDedup keeps one winner per content hash") {
    val d = TextOps.exactDedup(spark, sfDir)
    assert(d.groupBy("fp").count().filter(col("count") > 1).isEmpty)
  }

  test("shingles: count = n_tokens - k + 1 before dedup, all k words long") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val sh = MinHash.shingles(docs).as[(Long, String)].collect()
    assert(sh.length === 3)
    assert(sh.forall(_._2.split(" ").length === 3))
  }

  test("signatures have NumHashes elements, stable across runs") {
    val sig = MinHash.signatures(graft.Tables.documents(spark, sfDir))
    val row = sig.limit(1).collect()(0)
    assert(row.getAs[Seq[String]]("sig").length === MinHash.NumHashes)
  }

  test("MinHashSig expression ≡ groupBy-min-md5 declarative formulation") {
    val docs = graft.Tables.documents(spark, sfDir)
    val fast = MinHash.signatures(docs)
      .select(col("doc_id"), explode(col("sig")).as("h"))
    val sh = MinHash.shingles(docs)
    val slow = sh.groupBy(col("doc_id"))
      .agg((0 until MinHash.NumHashes).map(j =>
        min(md5(concat(lit(s"$j|"), col("shingle")))).as(s"h$j")).head,
        (1 until MinHash.NumHashes).map(j =>
          min(md5(concat(lit(s"$j|"), col("shingle")))).as(s"h$j")): _*)
      .select(col("doc_id"),
        explode(array((0 until MinHash.NumHashes).map(j => col(s"h$j")): _*)).as("h"))
    assert(fast.except(slow).isEmpty && slow.except(fast).isEmpty)
  }

  test("SimHash60 expression ≡ declarative bit-vote pipeline") {
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val fast = MinHash.simhash(spark, sfDir).limit(0) // plan compiles
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).distinct()
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("bigint"))
    val slow = toks
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(59))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(expr("(shiftright(h, b) & 1) * 2 - 1")).as("vote"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, b)")).otherwise(0L)).as("simhash"))
    val fastMap = docs.select(col("doc_id"),
        graft.functions.functions.simhash60(split(col("text"), " ")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val slowMap = slow.as[(Long, Long)].collect().toMap
    assert(fastMap === slowMap)
  }

  test("minhash-LSH finds the planted near-dups and they verify ≥ threshold") {
    val pairs = MinHash.minhashDedup(spark, sfDir).collect()
    assert(pairs.nonEmpty, "corpus has planted near-dups; LSH must find some")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("minhash candidates ⊇ exact jaccard pairs at high similarity (LSH recall)") {
    val exact = MinHash.ngramJaccardPairs(spark, sfDir, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = MinHash.minhashDedup(spark, sfDir, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // j≥0.9 collides in some band with prob ≈ 1 - (1-0.9^4)^3 ≈ 0.97;
    // with the small corpus the planted pairs all collide in practice
    val missed = exact -- lsh
    assert(missed.size <= math.max(1, exact.size / 10),
      s"LSH missed too many high-sim pairs: $missed")
  }

  test("lshTradeoff: verified+missed=truth per config, aligned configs nest, S-curve non-vacuous") {
    val rows = MinHash.lshTradeoff(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_bands"),
        r.getAs[Long]("n_candidates"), r.getAs[Long]("n_verified"),
        r.getAs[Long]("n_missed")))
    assert(rows.map(_._1).toSeq === Seq(2L, 3L, 4L, 6L))
    rows.foreach { case (r, b, nc, nv, nm) =>
      assert(b === 12L / r)
      assert(nv <= nc, s"r=$r: verified exceeds candidates")
      assert(nv >= 0L && nm >= 0L)
    }
    // verified + missed = the banding-independent truth, same for all rows
    val truths = rows.map { case (_, _, _, nv, nm) => nv + nm }.distinct
    assert(truths.length === 1, s"truth count not banding-independent: $truths")
    assert(truths.head > 0L, "vacuous sweep: no true pairs at this sf")
    // aligned nesting: a 4-row band contains whole 2-row bands, a 6-row
    // band whole 2- and 3-row bands → candidate sets shrink
    val byR = rows.map(t => t._1 -> t._3).toMap
    assert(byR(4L) <= byR(2L))
    assert(byR(6L) <= byR(2L) && byR(6L) <= byR(3L))
    // recall side can only degrade as bands coarsen along a nested chain
    val vByR = rows.map(t => t._1 -> t._4).toMap
    assert(vByR(4L) <= vByR(2L) && vByR(6L) <= vByR(3L))
  }

  test("df cap bounds the jaccard self-join: hot-shingle pairs vanish, real dupes stay") {
    // 50 docs all opening with the same viral sentence (one shingle with
    // df=50 → 1225 join pairs uncapped), plus one genuine near-dup pair
    // built from selective shingles
    val viral = (1 to 50).map { i =>
      (i.toLong, s"common viral sentence w${i}a w${i}b w${i}c w${i}d")
    }
    val dupes = Seq(
      (900L, "alpha beta gamma delta epsilon zeta"),
      (901L, "alpha beta gamma delta epsilon zeta"))
    val docs = (viral ++ dupes).toDF("doc_id", "text")
    // capped: the viral shingle (df=50 > 10) leaves the universe — pairs
    // related ONLY through it never form; the planted dupe pair survives
    val capped = MinHash.ngramJaccardPairsOf(docs, threshold = 0.01, dfCap = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((900L, 901L)))
    // uncapped: every viral pair forms — the d² blowup the cap prevents
    val uncapped = MinHash.ngramJaccardPairsOf(docs, threshold = 0.01, dfCap = 1000000)
      .count()
    assert(uncapped === 50L * 49 / 2 + 1)
    // and on the real corpus (max df 25 ≪ 128) the cap changes nothing
    val default = MinHash.ngramJaccardPairs(spark, sfDir)
    val unbounded = MinHash.ngramJaccardPairs(spark, sfDir, dfCap = 1000000)
    assert(default.except(unbounded).isEmpty && unbounded.except(default).isEmpty)
  }

  test("nfc_casefold collapses composed/decomposed and case variants to one class") {
    import graft.functions.functions.nfc_casefold
    val docs = Seq(
      (1L, "café menu"),        // é composed (U+00E9)
      (2L, "café menu"),       // e + combining acute (NFC → U+00E9)
      (3L, "CAFÉ MENU"),        // uppercase composed
      (4L, "coffee list"))           // genuinely different
    .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"), md5(nfc_casefold(trim(col("text")))).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L) && fps(1L) === fps(3L))
    assert(fps(4L) !== fps(1L))
    // SIMPLE case mapping only, matching DuckDB's utf8proc lower: a
    // Greek capital final sigma lowercases to σ (U+03C3), never the
    // context-sensitive final form ς (U+03C2); U+0130 maps to plain i
    val simple = Seq((10L, "ΟΔΟΣ"), (11L, "İ")).toDF("doc_id", "text")
      .select(col("doc_id"), nfc_casefold(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(simple(10L) === "οδοσ", s"got ${simple(10L).map(_.toInt.toHexString)}")
    assert(simple(11L) === "i")
    // byte-level hashing splits the same fixtures three ways — the gap
    // the pre-pass closes
    val raw = docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(Set(raw(1L), raw(2L), raw(3L)).size === 2)
    // and on documents (ASCII corpus) the unicode lane reproduces the
    // byte-level lane exactly
    val a = TextOps.exactDedup(spark, sfDir).collect().map(_.toString).sorted
    val b = TextOps.exactDedupUnicode(spark, sfDir).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("exact-dup pre-collapse bounds band-bucket cardinality on a large identical-doc class") {
    // 300 copies of one boilerplate doc: uncollapsed they share ALL
    // bands, so the band self-join would emit 300·299/2 candidate rows;
    // collapsed, the class bands once. Plus one genuine near-dup pair
    // and a handful of distinct docs to keep the verify path honest.
    val boiler = (1L to 300L).map(i => (i, "terms of service boilerplate common to every page"))
    val extras = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta"),
      (901L, "alpha beta gamma delta epsilon zeta eta iota"),
      (950L, "completely unrelated text about spark partitioning"),
      // an exact-dup class with EMPTY shingle sets (< 3 words): its 0/0
      // jaccard is NaN, which Spark's NaN-is-greatest comparison would
      // pass through a >= threshold filter — these docs must never pair
      (960L, "too short"),
      (961L, "too short"))
    val docs = (boiler ++ extras).toDF("doc_id", "text")
    val shArr = MinHash.shingleArray(docs)
    val members = MinHash.dupClasses(shArr)
    val repSh = shArr.join(
      members.filter(col("doc_id") === col("rep")).select(col("doc_id")),
      Seq("doc_id"))
    // the banded candidate set is CLASS-level: 4 classes → at most 6
    // pairs, vs 44850+ intra-boilerplate candidates uncollapsed
    val repCand = MinHash.candidatePairs(MinHash.bands(repSh.select(col("doc_id"),
      graft.functions.functions.minhash_sig(col("shingles"), MinHash.NumHashes).as("sig"))))
    assert(repCand.count() <= 6, "rep-level candidates must be class-bounded")
    // and the fanned-out verified pairs equal the uncollapsed pipeline
    // verbatim — the exactness invariant of the collapse (the
    // comparator bands only non-empty docs, the oracle-faithful
    // semantics both pipelines implement)
    val got = MinHash.collapsedVerifiedPairs(members, repSh, shArr, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!got.exists { case (a, b) => a >= 960L || b >= 960L },
      "empty-shingle docs must never pair")
    val uncollapsed = MinHash.exactJaccard(
        MinHash.candidatePairs(MinHash.bands(
          shArr.filter(size(col("shingles")) > 0).select(col("doc_id"),
            graft.functions.functions.minhash_sig(col("shingles"),
              MinHash.NumHashes).as("sig")))), shArr)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === uncollapsed,
      s"missing=${(uncollapsed -- got).take(5)} extra=${(got -- uncollapsed).take(5)}")
    // every intra-boilerplate pair is present with jaccard exactly 1.0
    val j1 = MinHash.collapsedVerifiedPairs(members, repSh, shArr, 0.5)
      .filter(col("doc_b") <= 300).select("jaccard").as[Double].collect()
    assert(j1.length === 300 * 299 / 2 && j1.forall(_ == 1.0))
  }

  test("hamming LSH pre-collapse: identical-fingerprint class expands exactly") {
    // 200 identical fingerprints + two near fingerprints (hamming 2
    // from the class, 0 from each other... distinct values) + one far
    val base = 0x0123456789abcdefL
    val near = base ^ 3L            // 2 bit flips, same top bands
    val far  = ~base                // hamming 64
    val ph = ((1L to 200L).map(i => (i, base)) ++
      Seq((500L, near), (600L, far))).toDF("doc_id", "phash")
    val got = Multimodal.hammingLshPairs(ph, maxHamming = 12)
      .as[(Long, Long, Long)].collect()
    val intra = got.filter { case (a, b, _) => a <= 200 && b <= 200 }
    assert(intra.length === 200 * 199 / 2 && intra.forall(_._3 == 0L))
    // cross-class: every base member pairs with 500 at hamming 2
    val cross = got.filter { case (_, b, _) => b == 500L }
    assert(cross.length === 200 && cross.forall(_._3 == 2L))
    assert(!got.exists { case (a, b, _) => a == 600L || b == 600L })
  }

  test("property: collapse ≡ uncollapsed on random dup-heavy corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random corpora BUILT to stress the collapse: a few distinct texts
    // (some under the 3-word shingle floor → empty shingle classes),
    // each duplicated a random number of times, plus near-dup variants
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "omega",
      "kappa", "sigma", "tau", "phi", "zeta")
    val textGen = for {
      n <- Gen.chooseNum(1, 9) // 1-2 words → empty shingle set
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val corpusGen = for {
      texts <- Gen.nonEmptyListOf(textGen)
      copies <- Gen.sequence[List[Int], Int](texts.map(_ => Gen.chooseNum(1, 6)))
    } yield texts.zip(copies).flatMap { case (t, c) => Seq.fill(c)(t) }
    (1 to 6).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(1000L + i)).get
      val docs = corpus.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val shArr = MinHash.shingleArray(docs)
      val members = MinHash.dupClasses(shArr)
      val repSh = shArr.join(
        members.filter(col("doc_id") === col("rep")).select(col("doc_id")),
        Seq("doc_id"))
      val got = MinHash.collapsedVerifiedPairs(members, repSh, shArr, 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val uncollapsed = MinHash.exactJaccard(
          MinHash.candidatePairs(MinHash.bands(
            shArr.filter(size(col("shingles")) > 0).select(col("doc_id"),
              graft.functions.functions.minhash_sig(col("shingles"),
                MinHash.NumHashes).as("sig")))), shArr)
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got === uncollapsed,
        s"seed ${1000 + i}: missing=${(uncollapsed -- got).take(5)} " +
          s"extra=${(got -- uncollapsed).take(5)}")
    }
  }

  test("containment catches a wholesale quote that Jaccard misses") {
    // a 6-shingle notice quoted inside a 48-shingle article: jaccard
    // ≈ 6/48 (tiny), but containment(notice in article) = 1.0
    val notice = "all rights reserved by the original author here"
    val filler = (1 to 44).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$filler $notice"),
      (2L, notice),
      (3L, "entirely unrelated content about query planning")).toDF("doc_id", "text")
    val cont = MinHash.ngramContainmentPairsOf(docs, threshold = 0.8, dfCap = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((2L, 1L, 1.0)),
      s"expected exactly the quote orientation, got ${cont.toSeq}")
    val jac = MinHash.ngramJaccardPairsOf(docs, threshold = 0.5, dfCap = 128).count()
    assert(jac === 0L, "jaccard should miss the asymmetric quote pair")
  }

  test("incrementalDedup is consistent with the batch self-join pipeline") {
    val batchMod = 5
    val admitted = MinHash.incrementalDedup(spark, sfDir, batchMod = batchMod)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every batch doc gets exactly one verdict
    val batchDocs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % batchMod === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.keySet === batchDocs)
    // rejected == batch docs with a verified CORPUS match in the batch
    // self-join pipeline's pairs (pairs whose other member is corpus)
    val rejected = MinHash.minhashDedup(spark, sfDir).collect().flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      Seq(a -> b, b -> a)
    }.collect { case (d, other)
        if d % batchMod == 0 && other % batchMod != 0 => d
    }.toSet
    assert(admitted.filter(_._2 == 0L).keySet === rejected)
  }

  test("clusterSurvivors: exactly one longest-doc winner per cluster") {
    val rows = MinHash.clusterSurvivors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong === nDocs) // one verdict per corpus doc
    val lens = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (cid, members) =>
      val kept = members.filter(_._3 == 1L)
      assert(kept.length === 1, s"cluster $cid kept ${kept.length}")
      // winner = max n_chars, doc_id tie-break
      val expected = members.map(_._1).minBy(d => (-lens(d), d))
      assert(kept.head._1 === expected)
    }
    // singletons keep themselves; real clusters drop someone
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty)
  }

  test("stratifiedSample: checksum pins the hash-selected doc set") {
    val rows = TextOps.stratifiedSample(spark, sfDir).collect()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val expected = docs.groupBy(d => (d._2, d._3)).map { case (k, ds) =>
      val sampled = ds.filter(d => bucket(d._1) < 25)
      k -> (ds.length.toLong, sampled.length.toLong, sampled.map(_._1).sum)
    }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === expected(k))
    }
  }

  test("packAssign: packs are contiguous, budget-bounded, per language") {
    val packs = TextOps.packAssign(spark, sfDir, budget = 500).collect()
    assert(packs.nonEmpty)
    packs.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      // pack ids are non-decreasing in doc order and start at 0
      val ids = ordered.map(_.getAs[Long]("pack_id"))
      assert(ids.head === 0L)
      assert(ids.zip(ids.tail).forall { case (a, b) => b >= a })
      // each pack's token total stays under budget + one overflowing doc
      ordered.groupBy(_.getAs[Long]("pack_id")).foreach { case (_, members) =>
        val total = members.map(_.getAs[Long]("n_tokens")).sum
        val maxDoc = members.map(_.getAs[Long]("n_tokens")).max
        assert(total < 500 + maxDoc)
      }
    }
  }

  test("splitAssign is content-addressed: byte-identical docs share a split") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en"), // exact copy, different id
      (3L, "something else entirely here", "en")
    ).toDF("doc_id", "text", "lang")
    val splits = TextOps.splitAssign(docs)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(splits(1L) === splits(2L)) // same content → same split, always
    // and on the corpus: ratios are roughly 90/5/5
    val dist = TextOps.datasetSplit(spark, sfDir)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val total = dist.values.sum.toDouble
    assert(dist("train") / total > 0.8 && dist("train") / total < 0.97)
  }

  test("trainTestContamination finds straddling near-dups, never exact copies") {
    val pairs = TextOps.trainTestContamination(spark, sfDir).collect()
    assert(pairs.nonEmpty) // planted near-dups straddle the split
    val splits = TextOps.splitAssign(graft.Tables.documents(spark, sfDir))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    pairs.foreach { r =>
      assert(splits(r.getAs[Long]("train_doc")) === "train")
      assert(splits(r.getAs[Long]("eval_doc")) !== "train")
      assert(r.getAs[Long]("n_shared") >= 2L)
    }
  }

  test("survivors = docs minus greedy-dominated dupes") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val dropped = MinHash.minhashDedup(spark, sfDir)
      .select("doc_b").distinct().count()
    assert(MinHash.minhashSurvivors(spark, sfDir).count() === total - dropped)
  }

  test("repetition: planted loop doc reads high, varied doc reads zero-repeat") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),          // 7 gram positions, 3 distinct
      (2L, "one two three four five six"), // 4 positions, all distinct
      (3L, "x y")                          // under shingle size: 0 / 0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionOf(docs)
      .select("doc_id", "n_grams", "n_distinct").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 7L, 3L), (2L, 4L, 4L), (3L, 0L, 0L)))
    // invariant on the real corpus: distinct never exceeds positions
    TextOps.repetition(spark, sfDir).as[(Long, Long, Long)].collect()
      .foreach { case (id, g, d) => assert(d <= g, s"doc $id") }
  }

  test("vocab: token_id is the (n desc, token) rank of the row values") {
    // independent driver-side re-derivation: ids must be a pure function
    // of the (token, n) values, not of any physical partition order
    val rows = TextOps.vocab(spark, sfDir, k = 100)
      .select("token", "n", "token_id").collect().toSeq
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = got.map { case (t, n, _) => (t, n) }
      .sortBy { case (t, n) => (-n, t) }
      .zipWithIndex.map { case ((t, n), i) => (t, n, i + 1L) }
    assert(got.toSet === expected.toSet)
    assert(got.map(_._3).sorted === (1L to got.length))
  }

  test("simhash: near-dup docs have small hamming distance, random pairs large") {
    val sh = MinHash.simhash(spark, sfDir).as[(Long, Long)].collect().toMap
    val near = MinHash.minhashDedup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(near.nonEmpty)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val nearDist = near.map { case (a, b) => ham(sh(a), sh(b)) }
    val ids = sh.keys.toSeq.sorted
    val farDist = ids.take(40).sliding(2, 2).collect {
      case Seq(a, b) if !near.contains((a, b)) => ham(sh(a), sh(b))
    }.toSeq
    assert(nearDist.sum.toDouble / nearDist.length <
           farDist.sum.toDouble / farDist.length,
      s"near avg ${nearDist.sum / nearDist.length} !< far avg ${farDist.sum / farDist.length}")
  }

  test("asciiLower is engine-neutral: folds A-Z only, Unicode untouched") {
    // The round-8 second-seed fuzz (non-ASCII corpus) surfaced lower()
    // divergence between Spark (full Unicode case mapping) and DuckDB
    // (utf8proc) on U+0130 / final sigma / sharp s. The oracle-compared
    // ASCII-fold lanes (exact dedup fingerprint, bloom prefilter key,
    // BPE token count) must therefore fold ASCII case ONLY — full
    // canonicalization is nfc_casefold's lane (dedup_exact_unicode).
    import spark.implicits._
    val rows = Seq("MiXeD ASCII 123", "İstanbul", "STRASSE straße", "ΟΔΟΣ οδός", "café")
      .toDF("t")
      .select(TextOps.asciiLower(org.apache.spark.sql.functions.col("t")).as("f"))
      .collect().map(_.getString(0))
    assert(rows(0) === "mixed ascii 123")
    assert(rows(1) === "İstanbul")         // U+0130 NOT folded
    assert(rows(2) === "strasse straße")   // ASCII folded, ß untouched
    assert(rows(3) === "ΟΔΟΣ οδός")        // Greek untouched (no final-sigma trap)
    assert(rows(4) === "café")
  }

  test("gopherRules: every rule attributable, corpus docs mostly pass, hostile docs fail") {
    import spark.implicits._
    val out = TextOps.gopherRules(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // rules are strict 0/1 and passes is their conjunction
      val bad = out.filter(
        !col("r_word_count").isin(0L, 1L) || !col("r_mean_word_len").isin(0L, 1L) ||
        !col("r_alpha_words").isin(0L, 1L) || !col("r_stopwords").isin(0L, 1L) ||
        col("passes") =!= col("r_word_count") * col("r_mean_word_len") *
          col("r_alpha_words") * col("r_stopwords")).count()
      assert(bad === 0)
      // the synthetic corpus is fluent by construction: most docs pass
      assert(out.filter(col("passes") === 1).count() * 2 > n)
    } finally out.unpersist()
  }

  test("c4Rules: hand-computed line gates, page killers, kept-line reassembly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon.\nshort one.\nno terminal punct here\n" +
        "enable javascript to view now.\nsecond good line with six words!"),
      (2L, "lorem ipsum dolor sit amet today.\ngood line with five words."),
      (3L, "config { brace } here now.\nbadword1 inside this line too."),
      (4L, ""),
      (5L, "first fine line with five words.\nsecond fine line has six words?\n" +
        "third fine line with periods.")
    ).toDF("doc_id", "text")
    val r = TextOps.c4RulesOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap

    // doc 1: 5 lines; kept = line 1 (5 words, '.') + line 5 (6 words,
    // '!'); short / unterminated / javascript lines drop
    assert(r(1L).getAs[Long]("n_lines") === 5L)
    assert(r(1L).getAs[Long]("n_kept") === 2L)
    assert(r(1L).getAs[Long]("r_min_lines") === 0L)
    assert(r(1L).getAs[Long]("passes") === 0L)
    assert(r(1L).getAs[String]("cleaned") ===
      "alpha beta gamma delta epsilon.\nsecond good line with six words!")
    // doc 2: lines both survive the LINE gates but the page dies on
    // lorem ipsum
    assert(r(2L).getAs[Long]("n_kept") === 2L)
    assert(r(2L).getAs[Long]("r_no_lorem") === 0L)
    assert(r(2L).getAs[Long]("passes") === 0L)
    // doc 3: brace AND blocklist page killers, independently attributed
    assert(r(3L).getAs[Long]("r_no_brace") === 0L)
    assert(r(3L).getAs[Long]("r_no_blocklist") === 0L)
    assert(r(3L).getAs[Long]("r_no_lorem") === 1L)
    // doc 4: empty text = one empty line, nothing kept, page rules pass
    assert(r(4L).getAs[Long]("n_lines") === 1L)
    assert(r(4L).getAs[Long]("n_kept") === 0L)
    assert(r(4L).getAs[String]("cleaned") === "")
    // doc 5: three kept lines, no killers — the page C4 keeps
    assert(r(5L).getAs[Long]("n_kept") === 3L)
    assert(r(5L).getAs[Long]("passes") === 1L)
  }

  test("c4Rules over the seeded corpus: bits are 0/1 conjunctions, seeding attested") {
    val out = TextOps.c4Rules(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      val bad = out.filter(
        !col("r_min_lines").isin(0L, 1L) || !col("r_no_lorem").isin(0L, 1L) ||
        !col("r_no_brace").isin(0L, 1L) || !col("r_no_blocklist").isin(0L, 1L) ||
        col("passes") =!= col("r_min_lines") * col("r_no_lorem") *
          col("r_no_brace") * col("r_no_blocklist") ||
        col("n_kept") > col("n_lines")).count()
      assert(bad === 0)
      // the doc_id-keyed seeding makes every rule non-vacuous: each bit
      // fires 0 somewhere and 1 somewhere
      Seq("r_min_lines", "r_no_lorem", "r_no_brace", "r_no_blocklist")
        .foreach { b =>
          assert(out.filter(col(b) === 0).count() > 0, s"$b never fails")
          assert(out.filter(col(b) === 1).count() > 0, s"$b never passes")
        }
      // lorem pages are exactly the doc_id % 7 == 0 rows
      val loremIds = out.filter(col("r_no_lorem") === 0)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(loremIds.nonEmpty && loremIds.forall(_ % 7 == 0))
      // and a genuine subset of pages passes ALL rules (the closing-line
      // seed guarantees the 3-kept floor is reachable without a killer)
      assert(out.filter(col("passes") === 1).count() > 0, "no page ever passes")
    } finally out.unpersist()
  }

  test("c4Report: per-source counters re-derivable from the per-doc gate frame") {
    val gated = TextOps.c4RulesOf(TextOps.c4Seeded(
      graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text")))).cache()
    try {
      val rep = TextOps.c4Report(spark, sfDir).collect()
        .map(r => r.getAs[String]("source") -> r).toMap
      assert(rep.nonEmpty)
      val bySource = gated.collect().groupBy(_.getAs[String]("source"))
      assert(rep.keySet === bySource.keySet)
      bySource.foreach { case (src, rows) =>
        val r = rep(src)
        assert(r.getAs[Long]("n_docs") === rows.length.toLong)
        assert(r.getAs[Long]("n_pages_kept") ===
          rows.map(_.getAs[Long]("passes")).sum)
        assert(r.getAs[Long]("n_lines_kept") ===
          rows.map(_.getAs[Long]("n_kept")).sum)
        assert(r.getAs[Long]("n_drop_lorem") ===
          rows.map(x => 1L - x.getAs[Long]("r_no_lorem")).sum)
      }
    } finally gated.unpersist()
  }
}
