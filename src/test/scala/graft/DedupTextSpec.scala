package graft

import graft.operators.{CorpusPipeline, Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Semantics of the dedup + text-analysis operators on constructed docs
  * with known duplicates/near-duplicates. */
class DedupTextSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 0
    (2L, "the quick brown fox jumps over the sleepy dog"),        // near dup of 0
    (3L, "completely different words altogether here now friends"),
    (4L, "el el la la los y y y es es")                           // spanish-ish
  ).toDF("doc_id", "text")

  test("clusters: adaptive escalation decision table; chain and blocky outputs unchanged") {
    // the stall test (integer form): round 1 is always paid — its changed
    // count is the baseline; geometric decay keeps propagating; a round
    // retiring <30% of the previous round's labels escalates
    assert(!Dedup.ccStalled(1, 100, Long.MaxValue))
    assert(!Dedup.ccStalled(2, 69, 100), "decay below the floor must keep propagating")
    assert(Dedup.ccStalled(2, 71, 100), "stalled decay must escalate")
    assert(!Dedup.ccStalled(2, 0, 100))
    // tiny stalled residuals finish cheaper by propagating (a stalled
    // changed of C bounds remaining light rounds by ~C): below the
    // changed floor the stall test never fires — the r17 A/B caught the
    // floorless rule contracting a 2-label residual
    assert(!Dedup.ccStalled(5, 2, 2))
    assert(!Dedup.ccStalled(2, 7, 7))
    assert(Dedup.ccStalled(2, 8, 8))
    // chain graph (path of 60): changed stays ~constant per round, so the
    // adaptive trigger escalates at round 2 — and min-id labels must be
    // EXACTLY the fixed-budget hybrid's (escalation time moves cost only)
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.clusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 60 && (0L to 59L).forall(i => got(i) === 0L))
    // blocky graph (4 disjoint 5-cliques): converges inside the light
    // rounds, never escalates, per-clique min ids
    val cliques = (for (c <- 0L until 4L; i <- 0L until 5L; j <- (i + 1) until 5L)
      yield (c * 10 + i, c * 10 + j)).toDF("a", "b")
    val gotB = Dedup.clusters(cliques).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotB.length === 20)
    assert(gotB.forall { case (id, cl) => cl === (id / 10) * 10 })
  }

  test("dedupStore: a stamp-read FAULT fails hard (shared StoreStamp contract, no stale serve)") {
    // unhandled filesystem scheme → non-FileNotFound Throwable: the
    // transient-fault shape that must error instead of degrading the
    // store key to path-only (which would serve a stale artifact for a
    // corpus regenerated in place)
    val e = intercept[IllegalStateException] {
      Dedup.dedupStore(docs, 3, 0.8, "graft-nofs://nohost/drop")
    }
    assert(e.getMessage.contains("stamp"))
  }

  test("exact dedup groups identical texts, keeps min id") {
    val d = Dedup.exact(docs).collect()
    assert(d.length === 4)
    val dup = d.find(_.getAs[Long]("n") == 2).get
    assert(dup.getAs[Long]("keep_id") === 0L)
  }

  test("clustersStore: stored assignment ≡ one-shot; a second call NEVER recomputes") {
    val corpus = docs.withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val key = s"storespec-${java.util.UUID.randomUUID()}"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val oneShot = rows(Dedup.clusters(
      Dedup.corpusDedup(corpus, 3, 0.8).select(col("a"), col("b"))))
    assert(oneShot.nonEmpty)
    // first call builds + persists; content is the one-shot assignment
    assert(rows(Dedup.clustersStore(corpus, 3, 0.8, key)) === oneShot)
    // second call with a POISONED corpus (any scan raises): it must be
    // served purely from the store — success IS the no-recompute proof
    val poisoned = corpus.withColumn("text",
      when(length(col("text")) >= 0,
        raise_error(lit("clustersStore recomputed instead of reading the store")))
        .otherwise(lit("")).cast("string"))
    assert(rows(Dedup.clustersStore(poisoned, 3, 0.8, key)) === oneShot)
    // a different corpus key is a different drop: new store, fresh build
    val key2 = s"storespec-${java.util.UUID.randomUUID()}"
    assert(rows(Dedup.clustersStore(corpus, 3, 0.8, key2)) === oneShot)
  }

  test("dedupStore maintenance: stored-index incremental ≡ full recompute, ZERO old-text reads") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val oldDocs = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    // the batch arrives as an IN-MEMORY frame (collected once here), so
    // any file scan in the maintenance plan can only be the store
    val newRows = docs.where(pmod(col("doc_id"), lit(10)) === 0)
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))
    val newDocs = newRows.toDF("doc_id", "text")
    val key = s"incspec-${java.util.UUID.randomUUID()}"
    val store = Dedup.dedupStore(oldDocs, 3, 0.8, key)
    // all four companion artifacts are persisted by the ONE build
    def norm(p: String) = p.stripPrefix("file:")
    for (a <- Seq("clusters", "digests", "signatures", "bands"))
      assert(new java.io.File(norm(store.dir), s"$a.parquet").exists(), a)
    val touching = Dedup.incrementalCorpusDedupStored(newDocs, store, 3, 0.8)
    // the zero-old-text-read pin: every file scan in the maintenance plan
    // reads from UNDER THE STORE (the old corpus' documents.parquet never
    // appears — the old side is served purely by the persisted index)
    val scanned = touching.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty)
    assert(scanned.forall(p => norm(p).startsWith(norm(store.dir))),
      s"maintenance plan scans outside the store: $scanned")
    // maintenance result: components(stored star edges ∪ touching pairs)
    // equals the full-corpus recompute exactly
    val starEdges = store.clusters
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("a"), col("cluster_id").as("b"))
    val got = Dedup.clusters(starEdges.unionByName(touching.select(col("a"), col("b"))))
      .as[(Long, Long)].collect().toMap
    val full = Dedup.clusters(Dedup.corpusDedup(docs, 3, 0.8).select(col("a"), col("b")))
      .as[(Long, Long)].collect().toMap
    assert(got === full)
    assert(got.nonEmpty)
  }

  test("dedupStoreAdvance: rolls the store forward — merged index, assignment ≡ full recompute, no rebuild on re-read") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val oldDocs = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val newDocs = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val tag = java.util.UUID.randomUUID().toString
    val store = Dedup.dedupStore(oldDocs, 3, 0.8, s"advspec-$tag#old")
    val adv = Dedup.dedupStoreAdvance(store, newDocs, 3, 0.8, s"advspec-$tag#all")
    def norm(p: String) = p.stripPrefix("file:")
    // all four artifacts republished under the new key
    for (a <- Seq("clusters", "digests", "signatures", "bands"))
      assert(new java.io.File(norm(adv.dir), s"$a.parquet").exists(), a)
    // the merged companion index carries old + batch exactly
    val newOnly = Dedup.dedupStore(newDocs, 3, 0.8, s"advspec-$tag#newonly")
    assert(adv.digests.count() ===
      store.digests.count() + newOnly.digests.count())
    assert(adv.signatures.count() ===
      store.signatures.count() + newOnly.signatures.count())
    assert(adv.bands.count() ===
      store.bands.count() + newOnly.bands.count())
    // advanced assignment equals the full-corpus recompute
    val full = Dedup.clusters(Dedup.corpusDedup(docs, 3, 0.8)
      .select(col("a"), col("b"))).as[(Long, Long)].collect().toMap
    assert(adv.clusters.as[(Long, Long)].collect().toMap === full)
    assert(full.nonEmpty)
    // a second advance under the same key serves the published store —
    // the poisoned batch proves nothing recomputes
    val poisoned = newDocs.withColumn("text",
      when(length(col("text")) >= 0,
        raise_error(lit("dedupStoreAdvance recomputed instead of serving")))
        .otherwise(lit("")).cast("string"))
    assert(Dedup.dedupStoreAdvance(store, poisoned, 3, 0.8, s"advspec-$tag#all")
      .clusters.as[(Long, Long)].collect().toMap === full)
  }

  test("store maintenance occupancy is O(batch): the stored band index is broadcast-semi-join-bounded") {
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
    val key = s"occspec-${java.util.UUID.randomUUID()}"
    val store = Dedup.dedupStore(corpus, 3, 0.8, key)
    val storedBands = store.bands.count()
    assert(storedBands > 1000, "fixture store must be much larger than the batch")
    // a tiny batch: 4 brand-new docs + 1 near-copy of a stored doc (so at
    // least one touched bucket actually matches the store)
    val copied = corpus.orderBy(col("doc_id")).select(col("text"))
      .as[String].head()
    val newDocs = ((0 until 4).map(i =>
      (900000L + i, s"unseen token$i alpha$i beta$i gamma$i delta$i eps$i zeta$i")) :+
      (900099L, copied)).toDF("doc_id", "text")
    val touching = Dedup.incrementalCorpusDedupStored(newDocs, store, 3, 0.8)
    touching.collect()
    // executed-plan pin: the stored bands reach the occupancy window
    // through a BROADCAST LEFT-SEMI join on the batch's bucket set, and
    // the rows it lets through are batch-bounded — a tiny fraction of the
    // stored index (the round-11 window shuffled ALL of it, every batch)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val semis = nodes(touching.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty,
      "maintenance must restrict stored bands via a broadcast semi-join")
    val semiOut = semis.map(_.metrics("numOutputRows").value).sum
    val batchBands = 5L * Dedup.Bands
    assert(semiOut <= 4 * batchBands,
      s"semi-join passed $semiOut stored band rows for a $batchBands-row batch")
    assert(semiOut < storedBands / 10,
      s"window input must be batch-bounded: $semiOut vs $storedBands stored")
  }

  test("capCrossings flags exactly the buckets that cross the cap only once the batch lands") {
    // 4 identical 'tmpl' docs in the store, 3 more in the batch: every
    // tmpl band bucket has occ_old=4 ≤ cap=5 < occ_all=7 → crossing.
    // The 6-strong 'other' cohort is already past the cap before the
    // batch (occ_old=6) → NOT a crossing (its old-old pairs were already
    // cap-excluded at build time, so stored state is consistent).
    val tmpl = "zulu yankee xray whiskey victor uniform tango sierra"
    val other = "alpha bravo charlie delta echo foxtrot golf hotel"
    val oldDocs = ((0L until 4L).map((_, tmpl)) ++ (10L until 16L).map((_, other)))
      .toDF("doc_id", "text")
    val newDocs = (100L until 103L).map((_, tmpl)).toDF("doc_id", "text")
    val store = Dedup.dedupStore(oldDocs, 3, 0.8,
      s"capspec-${java.util.UUID.randomUUID()}")
    val crossings = Dedup.capCrossings(newDocs, store, 3, cap = 5)
      .as[(Int, String, Long, Long)].collect()
    assert(crossings.nonEmpty)
    assert(crossings.forall { case (_, _, occOld, occAll) =>
      occOld === 4L && occAll === 7L })
    assert(crossings.length === Dedup.Bands) // identical docs collide in every band
    // no batch → nothing can cross
    assert(Dedup.capCrossings(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      store, 3, cap = 5).isEmpty)
  }

  test("lshRecallCurve sampling: deterministic md5 doc subset, sample size in the output") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val full = Dedup.lshRecallCurve(docs, 3, 0.05).collect()
    val sampled = Dedup.lshRecallCurve(docs, 3, 0.05, samplePermille = 500).collect()
    // the sample column reports the subset size; the full run reports n
    val n = docs.count()
    assert(full.forall(_.getAs[Long]("n_docs_sampled") === n))
    val nSampled = sampled.head.getAs[Long]("n_docs_sampled")
    assert(nSampled > 0 && nSampled < n)
    // deterministic: identical second run
    val again = Dedup.lshRecallCurve(docs, 3, 0.05, samplePermille = 500).collect()
    assert(sampled.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
    // truth within the sample is a subset of full truth: per-band counts bounded
    val fullTrue = full.map(r => r.getAs[Int]("sim_band") -> r.getAs[Long]("n_true")).toMap
    sampled.foreach { r =>
      assert(r.getAs[Long]("n_true") <= fullTrue.getOrElse(r.getAs[Int]("sim_band"), 0L))
    }
  }

  test("minHashCandidates bucket cap: oversized cohort excluded, small buckets survive") {
    // 30 IDENTICAL docs — every band bucket they occupy has occ=30, the
    // template-cohort shape the cap exists for — plus one near-dup pair
    // in its own small buckets
    val cohort = (100L until 130L)
      .map(i => (i, "zebra yankee xray whiskey victor uniform tango sierra romeo quebec"))
    val pairDocs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india kilo"))
    val corpus = (cohort ++ pairDocs).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(corpus, 3)
    val capped = Dedup.minHashCandidates(sigs, maxBucket = 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "small-bucket near-dup pair must survive")
    assert(capped.forall { case (a, b) => a < 100L && b < 100L },
      "cohort pairs must be excluded at cap=10")
    // the default cap (10,000) is far above this corpus: cohort intact
    val full = Dedup.minHashCandidates(sigs)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(full.size === capped.size + 30 * 29 / 2)
  }

  test("minHashCandidates cap observation: binding metered, pure-cohort collapse warns loudly") {
    import graft.operators.CapMetrics
    def declaredNames(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.analyzed.collect {
        case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
            if c.name.startsWith(CapMetrics.MetricPrefix) => c.name
      }
    // binding regime: cohort buckets dropped, small buckets kept
    val cohort = (100L until 130L)
      .map(i => (i, "zebra yankee xray whiskey victor uniform tango sierra romeo quebec"))
    val pairDocs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india kilo"))
    val mixed = Dedup.minHashCandidates(
      Dedup.minHashSignatures((cohort ++ pairDocs).toDF("doc_id", "text"), 3),
      maxBucket = 10)
    mixed.collect()
    val bindMsgs = CapMetrics.warnings(
      mixed.queryExecution.observedMetrics, declaredNames(mixed))
    assert(bindMsgs.nonEmpty && bindMsgs.forall(!_._1), s"binding only: $bindMsgs")
    // collapse regime: a PURE cohort floods every band bucket past the
    // cap — zero candidates, which must warn (through AQE's
    // empty-relation pruning of the metric node)
    val pure = Dedup.minHashCandidates(
      Dedup.minHashSignatures(cohort.toDF("doc_id", "text"), 3), maxBucket = 10)
    assert(pure.count() === 0)
    pure.collect()
    val msgs = CapMetrics.warnings(
      pure.queryExecution.observedMetrics, declaredNames(pure))
    assert(msgs.exists(_._1), s"expected a collapse warning, got: $msgs")
    // the opt-OUT path is metric-free (for metric-averse callers; the
    // default meters — measured ~+30 ms per candidate pipeline in an
    // alternating single-JVM A/B)
    val optOut = Dedup.minHashCandidates(
      Dedup.minHashSignatures(cohort.toDF("doc_id", "text"), 3),
      maxBucket = 10, observeCap = false)
    assert(declaredNames(optOut).isEmpty, "opt-out path must not carry the metric")
  }

  test("ngram jaccard finds the near-dup pair and the exact pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment catches an excerpt Jaccard misses; ratios are exact") {
    // doc 11 is a verbatim excerpt of doc 10: every one of its 3-gram
    // shingles appears in 10, but it has 4 shingles vs 10's 18 —
    // jaccard = 4/18 ≈ 0.22 (missed at 0.5), containment from the short
    // side = 4/4 = 1.0
    val long = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango")
    val excerpt = "echo foxtrot golf hotel india juliett"
    val corpus = Seq((10L, long), (11L, excerpt), (12L, "unrelated words entirely distinct tokens"))
      .toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(corpus, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((10L, 11L)), "jaccard should miss the excerpt")
    val cont = Dedup.containmentPairs(corpus, 3, 0.5)
      .as[(Long, Long, Double, Double)].collect()
    assert(cont.map(r => (r._1, r._2)).toSet === Set((10L, 11L)))
    val (_, _, contA, contB) = cont.head
    assert(contA === 4.0 / 18.0 && contB === 1.0) // 4 shared of 18 vs 4 shingles
  }

  test("dupNgramStats: cross-doc grams counted positionally, within-doc repeats alone don't count") {
    import graft.operators.TextOps
    val corpus = Seq(
      // shares "a b c" and "b c d" with doc 2 → 2 of its 3 trigrams dup
      (1L, "a b c d x"),
      (2L, "a b c d y"),
      // repeats its own trigram twice but shares nothing → 0 dup (cross-
      // doc evidence requires >= 2 DISTINCT docs, not >= 2 occurrences)
      (3L, "p q r p q r p q"),
      // too short for a trigram → excluded entirely
      (4L, "s t")).toDF("doc_id", "text")
    val got = TextOps.dupNgramStats(corpus, 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 1: trigrams {a b c, b c d, c d x}; first two occur in doc 2
    // doc 3: 6 positional trigrams, none shared with another doc
    assert(got === Seq(
      (1L, 3L, 2L, 0.666667),
      (2L, 3L, 2L, 0.666667),
      (3L, 6L, 0L, 0.0)))
  }

  test("weightedSample: heavy docs dominate the sample; selection is deterministic") {
    // 10 docs at weight 10000 vs 90 at weight 10 — A-ES inclusion odds
    // track the weight, so the top-10 should be nearly all heavies
    val corpus = ((0 until 10).map(i => (i.toLong, "s", 10000L)) ++
      (10 until 100).map(i => (i.toLong, "s", 10L)))
      .toDF("doc_id", "source", "n_chars")
    val got = CorpusPipeline.weightedSample(corpus, 10, col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(got.size === 10)
    val heavies = got.count(_ < 10)
    assert(heavies >= 8, s"only $heavies/10 heavy docs sampled: $got")
    // reproducible: an identical second run selects the identical set
    val again = CorpusPipeline.weightedSample(corpus, 10, col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(again === got)
    // zero/negative weights are excluded, not divide-by-zero crashes
    val withZero = corpus.unionAll(Seq((100L, "s", 0L)).toDF("doc_id", "source", "n_chars"))
    assert(!CorpusPipeline.weightedSample(withZero, 200, col("n_chars"))
      .select("doc_id").as[Long].collect().contains(100L))
  }

  test("bm25Scores: hand-computed scores, absent-term docs excluded") {
    val corpus = Seq(
      (1L, "cat dog"),
      (2L, "dog bird"),
      (3L, "cat cat mouse horse")
    ).toDF("doc_id", "text")
    val got = TextOps.bm25Scores(corpus, Seq("cat"))
      .as[(Long, Double)].collect().toMap
    // n=3, df=2, avgdl=8/3; idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    def expected(tf: Double, dl: Double): Double = {
      val raw = math.log(1.6) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet === Set(1L, 3L)) // doc 2 has no query term
    assert(math.abs(got(1L) - expected(1, 2)) < 1e-9)
    assert(math.abs(got(3L) - expected(2, 4)) < 1e-9)
    assert(got(3L) > got(1L)) // higher tf on a comparable length wins
  }

  test("ngram jaccard maxDf cap keeps a boilerplate-heavy corpus sub-quadratic") {
    // 40 docs sharing ONE boilerplate 3-gram, otherwise pairwise-distinct:
    // uncapped, that single shingle alone feeds 40·39/2 = 780 rows through
    // the inverted-index self-join; capped at df <= 5 it leaves the index
    // before the join, so the join emits NOTHING for this corpus
    val boiler = (0 until 40).map { i =>
      (i.toLong, s"common boiler plate u${i}a u${i}b u${i}c u${i}d u${i}e")
    }.toDF("doc_id", "text")

    def joinOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        p match {
          case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
          case _ => p +: p.children.flatMap(nodes)
        }
      nodes(df.queryExecution.executedPlan)
        .filter(_.nodeName.toLowerCase.contains("join"))
        .flatMap(_.metrics.get("numOutputRows").map(_.value))
        .sum
    }

    val uncapped = Dedup.ngramJaccardPairs(boiler, 3, 0.01)
    val capped = Dedup.ngramJaccardPairs(boiler, 3, 0.01, maxDf = Some(5L))
    // semantics: uncapped sees every boilerplate pair; capped drops them
    assert(uncapped.count() === 780L)
    assert(capped.count() === 0L)
    // plan-level: the capped self-join never materializes the 780
    // boilerplate candidate rows (jaccard-filter pruning happens AFTER the
    // join, so output-count equality alone would not prove this)
    assert(joinOutputRows(capped.select(col("a"), col("b"))) === 0L)
  }

  test("minhash LSH candidates match exact jaccard pairs on this corpus") {
    val mh = Dedup.minHashPairs(docs, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(mh.contains((0L, 1L)))
    val est = Dedup.minHashPairs(docs, 3, 0.5)
      .where(col("a") === 0 && col("b") === 1)
      .select("est_jaccard").as[Double].head()
    assert(est === 1.0) // identical docs ⇒ identical signatures
  }

  test("simhash: identical docs equal; near-dups close in hamming distance") {
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sh(0L) === sh(1L))
    val hammingNear = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hammingFar = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hammingNear < hammingFar)
  }

  test("clusters: ReliableCheckpoint storage lands fixpoint state on disk, same labels") {
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = Dedup.clusters(pairs, Dedup.ReliableCheckpoint(ckptRoot))
      .as[(Long, Long)].collect().toMap
    val default = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(reliable === default)
    assert(reliable === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
    // the durable path actually wrote RDD checkpoints under the root
    def rddFiles(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) rddFiles(f) else Seq(f))
    assert(rddFiles(new java.io.File(ckptRoot)).nonEmpty,
      "reliable checkpoint must materialize files on durable storage")
  }

  test("simhashSigs widens to the full 64-bit signature the scaladoc advertises") {
    // md5Prefix64(w, 16) — the widening the pair-search scaladoc points to
    val sigs = Dedup.simhashSigs(docs, 64).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(0L) === sigs(1L)) // identical docs, identical signature
    assert(sigs(0L) !== sigs(3L)) // unrelated docs diverge somewhere
  }

  test("clusters: hash-min label propagation = connected components, canonical min rep") {
    // path 1-5-3 (needs 2 propagation hops for 3 to learn about 1),
    // disjoint pair 8-9, pair ids deliberately unordered
    val pairs = Seq((5L, 1L), (5L, 3L), (9L, 8L)).toDF("a", "b")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("simhashPairs: banded join is EXACT for hamming <= bands-1 (vs brute force)") {
    val sigs = Dedup.simhashSigs(docs, Dedup.SimHashPairBits).as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val banded = Dedup.simhashPairs(docs, 3)
      .as[(Long, Long, Int)].collect().map { case (a, b, h) => (a, b, h.toLong) }.toSet
    assert(banded.map(x => (x._1, x._2, x._3.toInt)) ===
      brute.map(x => (x._1, x._2, x._3)))
    // the exact dup pair is found at distance 0
    assert(banded.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0L))
  }

  test("winnowing fingerprints: local-match guarantee and hand-checked minima") {
    // shared run of w+k-1 = 6 tokens between docs 10 and 11 ⇒ at least one
    // shared fingerprint; doc 12 shares nothing
    val run = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (10L, s"one two $run three four five six seven"),
      (11L, s"nine ten $run eleven twelve thirteen fourteen"),
      (12L, "entirely different tokens everywhere in this document body here")
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(d, 3, 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(10L) intersect fps(11L)).nonEmpty)
    assert((fps(10L) intersect fps(12L)).isEmpty)

    // hand-computed: 5 tokens, k=3 ⇒ 3 positional hashes; w=4 clamps, so
    // windows are {h0..h2},{h1,h2},{h2} ⇒ fingerprints = distinct minima
    val tiny = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    def h(s: String) = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString.take(7), 16)
    val hs = Seq(h("a b c"), h("b c d"), h("c d e"))
    val expect = Set(hs.min, hs.drop(1).min, hs(2))
    assert(TextOps.winnowFingerprints(tiny, 3, 4)
      .as[(Long, Long)].collect().map(_._2).toSet === expect)
  }

  test("codegen shingleStructs ≡ interpreted positionalShingles (incl. short/empty docs)") {
    // the struct form (arrays_zip of shifted token arrays) must produce the
    // exact positional n-gram strings of the HOF reference form for every
    // length class — including len < n (empty) and len == n (one shingle);
    // guards the slice remaining-length arithmetic (an overflowing length
    // yields NULL-padded structs that concat_ws silently collapses)
    val cases = Seq(
      (1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c"), (5L, "a b c d"),
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "x x x x x"), (8L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 4)) {
      val ref = cases.select(col("doc_id"),
          posexplode(TextOps.positionalShingles(col("text"), n)))
        .select(col("doc_id"), col("pos"), col("col").as("s"))
        .as[(Long, Int, String)].collect().sorted.toSeq
      val got = cases.select(col("doc_id"),
          posexplode(TextOps.shingleStructs(col("text"), n)))
        .select(col("doc_id"), col("pos"),
          TextOps.shingleString(col("col"), n).as("s"))
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(got === ref, s"n=$n")
    }
  }

  test("redactPii replaces emails, IPs and long digit runs; short numbers survive") {
    val out = Seq((1L, "mail a.b+c@ex-ample.co.uk ip 192.168.0.1 ref 0123456789 keep 123"))
      .toDF("doc_id", "text")
      .select(TextOps.redactPii(col("text"))).as[String].head()
    assert(out === "mail <EMAIL> ip <IP> ref <NUM> keep 123")
  }

  test("repetitionScores: top bigram share on a constructed repetitive doc") {
    val d = Seq((1L, "a b a b a b"), (2L, "w x y z")).toDF("doc_id", "text")
    val m = TextOps.repetitionScores(d).as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) === ((5L, 3.0 / 5.0))) // "a b" ×3 of 5 positional bigrams
    assert(m(2L) === ((3L, 1.0 / 3.0))) // all distinct
  }

  test("token count is whitespace-run based; bpe estimate is ceil(len/4) sum") {
    val r = Seq((1L, "aa  bbbb cccccc")).toDF("doc_id", "text")
      .select(TextOps.tokenCount(col("text")), TextOps.bpeEstimate(col("text")))
      .head()
    assert(r.getInt(0) === 3)
    assert(r.getLong(1) === 1 + 1 + 2) // ceil(2/4)+ceil(4/4)+ceil(6/4) ... note split(" ") sees empty token
  }

  test("linearQualityProbe: exactly-linear labels recovered; degenerate design yields NULLs") {
    // all-English docs → y = 1 everywhere; with a non-degenerate design
    // the unique least-squares solution is exactly (b0, b1, b2) = (1, 0, 0)
    val en = Seq(
      (1L, "the cat"),                              // x1=2, x2=1
      (2L, "the dog is big"),                       // x1=4, x2=2
      (3L, "a bird of prey is here"),               // x1=6, x2=3
      (4L, "the quick brown fox jumps over a dog")  // x1=8, x2=3
    ).toDF("doc_id", "text")
    val b = TextOps.linearQualityProbe(en).head()
    assert(b.getAs[Long]("n_docs") === 4L)
    assert(b.getAs[Double]("b0") === 1.0)
    assert(b.getAs[Double]("b1") === 0.0)
    assert(b.getAs[Double]("b2") === 0.0)
    // degenerate design (every doc has identical features): det = 0 →
    // NULL coefficients, never a divide-by-zero or a throw
    val const = (0L until 5L).map(i => (i, "the cat sat")).toDF("doc_id", "text")
    val c = TextOps.linearQualityProbe(const).head()
    assert(c.getAs[Long]("n_docs") === 5L)
    assert(c.isNullAt(c.fieldIndex("b0")) && c.isNullAt(c.fieldIndex("b1")) &&
      c.isNullAt(c.fieldIndex("b2")))
    // mixed labels (Spanish-marker docs label y=0, and carry ZERO
    // English stopwords): the fitted scores must separate the groups —
    // mean ŷ over the y=1 docs above mean ŷ over the y=0 docs
    val es = Seq(
      (10L, "el la y"), (11L, "el la los y"), (12L, "la los es el y la")
    ).toDF("doc_id", "text")
    val mixed = en.unionAll(es)
    val mb = TextOps.linearQualityProbe(mixed).head()
    assert(mb.getAs[Long]("n_docs") === 7L)
    val (b0, b1, b2) = (mb.getAs[Double]("b0"),
      mb.getAs[Double]("b1"), mb.getAs[Double]("b2"))
    def yhat(x1: Int, x2: Int) = b0 + b1 * x1 + b2 * x2
    val enHat = Seq((2, 1), (4, 2), (6, 3), (8, 3)).map((yhat _).tupled)
    val esHat = Seq((3, 0), (4, 0), (6, 0)).map((yhat _).tupled)
    assert(enHat.sum / 4 > esHat.sum / 3,
      s"probe failed to separate: en=$enHat es=$esHat coef=($b0,$b1,$b2)")
  }

  test("langId picks marker-majority language with fixed tiebreak") {
    val preds = docs.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(preds(0L) === "en")
    assert(preds(4L) === "es")
    assert(preds(3L) === "en") // zero scores everywhere → tiebreak priority
  }

  test("cleanCorpus: quality gate, first-copy exact dedup, cross-source fp decontamination") {
    // "a b c a b c a" and "b c a b c a b" differ as text but have the SAME
    // distinct 3-gram set {a b c, b c a, c a b} — same shingle-min
    // fingerprint, so the later one from a different source is contaminated
    val corpus = Seq(
      (10L, "web",   "a b c a b c a"),   // survives (canonical everywhere)
      (11L, "books", "b c a b c a b"),   // fp-collides with 10 across sources → dropped
      (12L, "web",   "x y"),             // 2 tokens < 5 → quality-gated
      (13L, "web",   "a b c a b c a"),   // exact dup of 10 → dropped
      (14L, "books", "p q r s t u v")    // survives
    ).toDF("doc_id", "source", "text")
    val out = CorpusPipeline.cleanCorpus(corpus)
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    assert(out.keySet === Set(10L, 14L))
    assert(out(10L) === 7 && out(14L) === 7)
  }

  test("ksDrift: identical distributions score ~0, disjoint supports score 1") {
    import graft.operators.Profile
    val mk = (n: Int) => Seq.tabulate(n)(_ => "w").mkString(" ")
    // same: two sources with the SAME 10/20-token halves → F_g == F_rest
    val same = ((0 until 50).map(i => ("a", mk(if (i % 2 == 0) 10 else 20))) ++
      (0 until 50).map(i => ("b", mk(if (i % 2 == 0) 10 else 20))))
      .toDF("source", "text")
    val ks0 = Profile.ksDrift(same, col("source"), TextOps.tokenCount(col("text")))
      .select("ks").as[Double].collect()
    assert(ks0.forall(_ === 0.0), ks0.mkString(","))
    // disjoint: source a all 5 tokens, source b all 50 → sup gap is 1 at x=5
    val disjoint = ((0 until 30).map(_ => ("a", mk(5))) ++
      (0 until 30).map(_ => ("b", mk(50)))).toDF("source", "text")
    val got = Profile.ksDrift(disjoint, col("source"), TextOps.tokenCount(col("text")))
      .select("g", "ks", "drifted").as[(String, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a")._2 === 1.0 && got("a")._3)
    assert(got("b")._2 === 1.0 && got("b")._3)
    // one source owning the whole corpus: n_rest = 0 → NULL ks, no crash
    val solo = (0 until 10).map(_ => ("only", mk(7))).toDF("source", "text")
    val soloRow = Profile.ksDrift(solo, col("source"), TextOps.tokenCount(col("text")))
      .select("ks").collect()
    assert(soloRow.length === 1 && soloRow.head.isNullAt(0))
  }

  test("stratifiedNeyman: spread-heavy strata win the budget; zero-variance strata get zero") {
    // stratum "wild": 100 docs alternating 1-token / 21-token texts
    // (std ≈ 10); stratum "flat": 100 docs all 11 tokens (std = 0).
    // Neyman allocation sends the WHOLE budget to the spread, none to
    // the constant stratum — proportional allocation would split 50/50
    val mk = (n: Int) => Seq.tabulate(n)(_ => "w").mkString(" ")
    val docs = ((0 until 100).map(i =>
        (i.toLong, "wild", if (i % 2 == 0) mk(1) else mk(21))) ++
      (100 until 200).map(i => (i.toLong, "flat", mk(11))))
      .toDF("doc_id", "source", "text")
    val got = CorpusPipeline.stratifiedNeyman(docs, budget = 60)
      .select("source", "n_docs", "std_tokens", "alloc", "n_sampled")
      .as[(String, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("flat")._3 === 0.0 && got("flat")._4 === 0L && got("flat")._5 === 0L)
    // sample std of the 1/21 alternation: sqrt(100·10100/(100·99)) = 10.0504…
    assert(math.abs(got("wild")._3 - 10.050378) < 1e-6)
    assert(got("wild")._4 === 60L) // the whole budget
    // realized draw is rate-based (floor(60/100·10⁴) = 6000 bp) — binomial
    // around 60, deterministic: the same md5 buckets select every run
    val again = CorpusPipeline.stratifiedNeyman(docs, budget = 60)
      .select("n_sampled").as[Long].collect().toSet
    assert(again === got.values.map(_._5).toSet)
    assert(got("wild")._5 > 30L && got("wild")._5 < 90L)
    // a budget above the stratum size caps at n (alloc = least(n, ...))
    val capped = CorpusPipeline.stratifiedNeyman(docs, budget = 500)
      .where(col("source") === "wild")
      .select("alloc", "n_sampled").as[(Long, Long)].head()
    assert(capped._1 === 100L && capped._2 === 100L)
  }

  test("sampleMix: deterministic, rate-accurate, and nested (higher rate ⊇ lower rate)") {
    val corpus = (0L until 2000L).map(i => (i, s"src${i % 2}", "en"))
      .toDF("doc_id", "source", "lang")
    def ids(rates: Map[String, Double], d: Double) =
      CorpusPipeline.sampleMix(corpus, rates, d)
        .select("doc_id").as[Long].collect().toSet
    val half = ids(Map("src0" -> 0.5), 0.1)
    val quarter = ids(Map("src0" -> 0.25), 0.1)
    // nested: raising a stratum's rate only ADDS documents
    assert(quarter.subsetOf(half))
    // deterministic: same call, same set
    assert(ids(Map("src0" -> 0.5), 0.1) === half)
    // rate-accurate within hash-bucket tolerance (1000 docs/stratum)
    val src0Half = half.count(_ % 2 == 0)
    assert(src0Half > 400 && src0Half < 600, s"src0 kept $src0Half of 1000 at rate 0.5")
    val src1Tenth = half.count(_ % 2 == 1)
    assert(src1Tenth > 50 && src1Tenth < 150, s"src1 kept $src1Tenth of 1000 at rate 0.1")
  }

  test("sourceDivergence: zero for blend-identical sources, ln-exact for disjoint vocab") {
    val corpus = Seq(
      (1L, "A", "a b"), (2L, "B", "a b"), (3L, "C", "c c")
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.TextOps.sourceDivergence(corpus)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // A and B each: 2×(1/2)·ln(1·6/(2·2)) = ln 1.5; C: ln(2·6/(2·2)) = ln 3
    assert(got("A") === ((2L, math.rint(math.log(1.5) * 1e6) / 1e6)))
    assert(got("B") === got("A"))
    assert(got("C") === ((2L, math.rint(math.log(3.0) * 1e6) / 1e6)))
  }

  test("epochMix: whole copies + deterministic fractional slice, nested in epoch target") {
    val corpus = (0L until 2000L).map(i => (i, s"src${i % 2}", "en"))
      .toDF("doc_id", "source", "lang")
    def copies(epochs: Map[String, Double], d: Double) =
      CorpusPipeline.epochMix(corpus, epochs, d)
        .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    val mixed = copies(Map("src0" -> 2.5), 1.0)
    // every doc appears: src1 exactly once, src0 2 or 3 times with
    // copy indices contiguous from 1
    assert(mixed.keySet === (0L until 2000L).toSet)
    assert(mixed.filter(_._1 % 2 == 1).values.forall(_ === 1L))
    val src0 = mixed.filter(_._1 % 2 == 0).values
    assert(src0.forall(c => c === 2L || c === 3L))
    // fractional slice ≈ half of src0 (md5-bucket tolerance on 1000 docs)
    val extra = src0.count(_ === 3L)
    assert(extra > 400 && extra < 600, s"src0 got $extra third copies at e=2.5")
    // nested: the e=2.25 extra-copy set is a subset of the e=2.5 one
    val lower = copies(Map("src0" -> 2.25), 1.0)
    val extraIds25 = mixed.filter { case (id, c) => id % 2 == 0 && c === 3L }.keySet
    val extraIds225 = lower.filter { case (id, c) => id % 2 == 0 && c === 3L }.keySet
    assert(extraIds225.subsetOf(extraIds25))
    // epoch 0 drops the stratum entirely
    val zeroed = copies(Map("src0" -> 0.0), 1.0)
    assert(zeroed.keySet.forall(_ % 2 == 1))
  }

  test("packShards/writeShards: start-offset blocks, partitioned layout, lossless roundtrip") {
    val corpus = (0L until 40L).map(i => (i, s"src${i % 2}", ("tok " * 30).trim))
      .toDF("doc_id", "source", "text") // 30 tokens per doc, 20 docs/source
    val packed = CorpusPipeline.packShards(corpus, 100L)
      .as[(Long, String, Int, Long)].collect()
    // doc k (0-based within its source) starts at offset 30k → shard 30k/100
    packed.foreach { case (id, _, n, shard) =>
      assert(n === 30)
      assert(shard === (id / 2) * 30 / 100, s"doc $id")
    }
    val out = java.nio.file.Files.createTempDirectory("graft_shards").toString
    CorpusPipeline.writeShards(corpus, 100L, out)
    // hive-style partition dirs carry the assignment
    assert(new java.io.File(s"$out/source=src0/shard_id=0").isDirectory)
    assert(new java.io.File(s"$out/source=src1/shard_id=5").isDirectory)
    val back = spark.read.parquet(out)
    assert(back.count() === 40)
    // partition pruning serves shard selection: one shard reads 4 docs
    assert(back.where(col("source") === "src0" && col("shard_id") === 0).count() === 4)
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split boundary") {
    // 0,1,2 form one near-dup cluster; 3 and 4 are singletons
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5).select(col("a"), col("b"))
    val split = CorpusPipeline.leakageSafeSplit(docs, pairs, 0.6, 0.2)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("rep"), r.getAs[String]("split")))
    assert(split.length === 5)
    // the cluster {0,1,2} shares rep 0 and thus ONE split label
    val cluster = split.filter(s => Set(0L, 1L, 2L).contains(s._1))
    assert(cluster.map(_._2).toSet === Set(0L))
    assert(cluster.map(_._3).toSet.size === 1)
    // singletons represent themselves
    assert(split.find(_._1 == 3L).get._2 === 3L)
    assert(split.map(_._3).toSet.subsetOf(Set("train", "validation", "test")))
    // rates must be sane
    intercept[IllegalArgumentException](
      CorpusPipeline.leakageSafeSplit(docs, pairs, 0.9, 0.3))
  }

  test("globalShuffle: a deterministic permutation — dense per-shard positions, seed-dependent order") {
    val corpus = (0L until 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = CorpusPipeline.globalShuffle(corpus, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.length === 1000)
    // every doc appears once; (shard, pos) is a bijection
    assert(a.map(_._1).toSet.size === 1000)
    assert(a.map(t => (t._2, t._3)).toSet.size === 1000)
    // positions are dense 0..n-1 within each shard
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // all shards populated and roughly balanced (md5 buckets, 125 expected)
    val sizes = a.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.keys.toSet === (0L until 8L).toSet)
    assert(sizes.values.forall(n => n > 60 && n < 190), sizes.toMap.toString)
    // deterministic across invocations; a different seed permutes
    val b = CorpusPipeline.globalShuffle(corpus, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    val c = CorpusPipeline.globalShuffle(corpus, 8, seed = "epoch1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.sortBy(_._1).toSeq !== a.sortBy(_._1).toSeq)
  }

  test("incrementalMinHashPairs: batch-vs-index equals full LSH restricted to new-side pairs") {
    val sf001docs = spark.read.parquet(s"$sf001/documents.parquet")
    val existing = sf001docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val batch = sf001docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val index = Dedup.minHashSignatures(existing, 3)
    val inc = Dedup.incrementalMinHashPairs(batch, index, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val full = Dedup.minHashPairs(sf001docs, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
      .filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    assert(inc === full)
    assert(inc.nonEmpty, "testdata plants near-dups across the batch boundary")
    // feeding the batch in two halves against the SAME index finds the
    // same new-vs-old pairs (index reuse is sound batch over batch)
    val h1 = Dedup.incrementalMinHashPairs(
      batch.where(col("doc_id") % 20 === 0), index, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val h2 = Dedup.incrementalMinHashPairs(
      batch.where(col("doc_id") % 20 =!= 0), index, 3, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val crossBatch = inc.filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
    assert(crossBatch.subsetOf(h1 ++ h2))
  }

  test("evalNgramDecontaminate: any shared n-gram disqualifies; clean docs survive") {
    // doc 2 is the "benchmark"; docs 0/1 share 3-grams with it, 3/4 don't
    val evalSet = docs.where(col("doc_id") === 2)
    val train = docs.where(col("doc_id") =!= 2)
    val kept = CorpusPipeline.evalNgramDecontaminate(train, evalSet, 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))
    // the contamination scan must be a BROADCAST semi-join (one corpus
    // pass, no corpus-wide exchange for candidate generation)
    val p = CorpusPipeline.evalNgramDecontaminate(train, evalSet, 3)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("evalNgramOverlap: fractions agree with the any-hit filter; bounds are exact") {
    val evalSet = docs.where(col("doc_id") === 2)
    val train = docs.where(col("doc_id") =!= 2)
    val scores = CorpusPipeline.evalNgramOverlap(train, evalSet, 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
         r.getAs[Double]("overlap_frac"))).toMap
    // graded score ⊃ binary filter: exactly the docs the any-hit filter
    // drops have overlap_frac > 0
    val dropped = train.select("doc_id").as[Long].collect().toSet --
      CorpusPipeline.evalNgramDecontaminate(train, evalSet, 3)
        .select("doc_id").as[Long].collect().toSet
    assert(scores.filter(_._2._3 > 0).keySet === dropped)
    // fraction arithmetic: shared/total, within [0, 1], shared <= total
    scores.values.foreach { case (n, sh, f) =>
      assert(sh >= 0 && sh <= n)
      val expect = BigDecimal(sh.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f === expect)
    }
  }

  test("tfidfTopTerms: distinctive words outrank corpus-wide ones; rank bounded by k") {
    val tf = TextOps.tfidfTopTerms(docs, 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Double]("tfidf"), r.getAs[Int]("rank")))
    assert(tf.groupBy(_._1).forall(_._2.length <= 3))
    assert(tf.forall(t => t._4 >= 1 && t._4 <= 3))
    // doc 3's vocabulary is unique to it — its top term must be one of its
    // own words, with strictly positive weight
    val d3 = tf.filter(_._1 == 3L).minBy(_._4)
    assert("completely different words altogether here now friends".split(" ")
      .contains(d3._2))
    assert(d3._3 > 0.0)
    // "the" appears in 3 of 5 docs — lower idf than doc-3-only words
    val theScore = tf.find(t => t._1 == 0L && t._2 == "the").map(_._3)
    assert(theScore.forall(_ < d3._3))
  }

  test("lmBigramScores: in-distribution repeats outscore one-off word sequences") {
    val lm = TextOps.lmBigramScores(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_logp"))).sortBy(_._1)
    assert(lm.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val byId = lm.map(t => t._1 -> t).toMap
    // identical docs score identically
    assert(byId(0L)._3 === byId(1L)._3)
    assert(byId(0L)._2 === 8L) // 9 tokens -> 8 positional bigrams
    // doc 0/1's bigrams occur 2-3x in the corpus; doc 3's exactly once —
    // the corpus LM must prefer the repeated text
    assert(byId(0L)._3 > byId(3L)._3)
    // scores are log-probabilities: strictly negative
    assert(lm.forall(_._3 < 0.0))
  }

  test("invertedIndex: sorted postings, df kept but postings NULL above the cap") {
    val corpus = Seq(
      (10L, "alpha beta"), (7L, "beta gamma alpha"), (3L, "beta beta delta")
    ).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(corpus, maxDf = 2).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), Option(r.getAs[String]("postings")))).toMap
    // numeric sort (7 before 10), within-doc repeats collapse to one posting
    assert(idx("alpha") === (2L, Some("7,10")))
    assert(idx("gamma") === (1L, Some("7")))
    assert(idx("delta") === (1L, Some("3")))
    // "beta" is in all 3 docs > cap: df stays, posting list is never built
    assert(idx("beta") === (3L, None))
  }

  test("editDistancePairs: rarest-token blocking, exact levenshtein verify") {
    // quantum/iron/steel are each string's rarest token (bolt/gear have
    // df 3); pairs share a block iff they share that token
    val catalog = Seq(
      (1L, "quantum bolt"), (2L, "quantum gear"), (3L, "iron bolt"),
      (4L, "steel bolt"), (5L, "iron gear"), (6L, "steel gear")
    ).toDF("id", "name")
    val got = Dedup.editDistancePairs(catalog, maxDist = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 4), (3L, 5L, 4), (4L, 6L, 4)))
  }

  test("shingle-min fingerprint is edit-local: near-dups often collide, distinct docs don't") {
    val fp = docs.select(col("doc_id"), TextOps.fingerprintShingleMin(col("text"), 3).as("f"))
      .as[(Long, String)].collect().toMap
    assert(fp(0L) === fp(1L))
    assert(fp(0L) !== fp(3L))
  }

  test("ngramJaccardPrefixPairs: rows equal the full inverted-index join (100% recall)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val full = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val pref = Dedup.ngramJaccardPrefixPairs(docs, 3, 4, 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pref === full, "prefix filtering changed the answer")
    assert(full.nonEmpty)
  }

  test("removeBoilerplateBlocks: shared blocks cut, order kept, full-boilerplate doc empties") {
    // block = 4 tokens; "ad ad ad ad" is the boilerplate shared by all
    val fx = Seq(
      (1L, "ad ad ad ad alpha beta gamma delta one two"), // boiler + 2 own blocks
      (2L, "epsilon zeta eta theta ad ad ad ad"),         // own block + boiler
      (3L, "ad ad ad ad")                                 // only boilerplate
    ).toDF("doc_id", "text")
    val got = TextOps.removeBoilerplateBlocks(fx, blockTokens = 4, dfCap = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: boiler block dropped, the two remaining blocks re-join in order
    assert(got(1L) === ((1L, "alpha beta gamma delta one two", 2L, 1L)))
    // doc 2: boilerplate at the END is dropped, own block survives
    assert(got(2L) === ((2L, "epsilon zeta eta theta", 1L, 1L)))
    // doc 3: everything was boilerplate -> empty rewrite, nothing kept
    assert(got(3L) === ((3L, "", 0L, 1L)))
  }

  test("dedupParagraphs: repeated block keeps only its FIRST occurrence, order kept") {
    val A = "a1 a2 a3 a4"
    val C = "c1 c2 c3 c4"
    val fx = Seq(
      (0L, s"$A b1 b2 b3 b4"), // blocks A, B — both first occurrences
      (1L, s"$A $C"),          // A repeats (dropped), C first (kept)
      (2L, C)                  // C repeats -> dropped, doc empties
    ).toDF("doc_id", "text")
    val got = TextOps.dedupParagraphs(fx, blockTokens = 4)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, s"$A b1 b2 b3 b4", 2L, 0L)))
    assert(got(1L) === ((1L, C, 1L, 1L)))
    assert(got(2L) === ((2L, "", 0L, 1L)))
    // corpus-level invariant: every distinct block survives exactly once
    val n = got.values.map(_._3).sum
    assert(n === 3L) // A, B, C
  }

  test("cmsHeavyHitters: estimate never undercounts; true top token ranks first") {
    val r = TextOps.cmsHeavyHitters(docs, d = 4, w = 512, k = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (tok, est, exact, over) =>
      assert(est >= exact, s"CMS undercounted $tok")
      assert(over === est - exact)
    }
    // 'the' appears 4x across the fixture, strictly more than any other token
    val theEst = r.find(_._1 == "the").map(_._2)
    assert(r.head._1 === "the" || theEst.contains(r.head._2),
      s"'the' not at/tied with the top: head=${r.head}, theEst=$theEst")
  }

  test("vocabGrowth: cumulative vocab equals the running sum and ends at the bigram vocab size") {
    val r = TextOps.vocabGrowth(docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._2).sum === r.last._3) // sum of new_tokens = final vocab
    val running = r.map(_._2).scanLeft(0L)(_ + _).drop(1)
    assert(r.map(_._3).toSeq === running.toSeq)
    val trueVocab = docs.select(explode(TextOps.shingleStructs(col("text"), 2)).as("s"))
      .select(TextOps.shingleString(col("s"), 2)).distinct().count()
    assert(r.last._3 === trueVocab)
  }

  test("mmrRerank: rank 2 prefers the diverse relevant doc over a near-duplicate") {
    // equal BM25 mass (same tf/dl) -> rel ties at 1.0; diversity decides
    val fx = Seq(
      (0L, "spark join a b c d"),
      (1L, "spark join a b c e"), // near-dup of 0 (Jaccard 5/7)
      (2L, "spark join v w x y")  // diverse (Jaccard 2/10 vs 0)
    ).toDF("doc_id", "text")
    val r = TextOps.mmrRerank(fx, Seq("spark", "join"), k = 3, pool = 3)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(r(0)._2 === 0L) // ties break on doc_id
    assert(r(1)._2 === 2L) // diversity beats the near-dup
    assert(r(2)._2 === 1L)
  }

  test("chunkWindows: stride starts, short tail windows, one chunk minimum") {
    // 7 tokens, width 5, stride 3 → starts 0,3,6 with 5,4,1 tokens
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextOps.chunkWindows(d, 5, 3)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      (1L, 0, 0, 5, "t0 t1 t2 t3 t4"),
      (1L, 1, 3, 4, "t3 t4 t5 t6"),
      (1L, 2, 6, 1, "t6"),
      (2L, 0, 0, 1, "solo")))
    // overlap invariant: consecutive windows share width - stride tokens
    assert(got(0)._5.split(" ").drop(3).toSeq === got(1)._5.split(" ").take(2).toSeq)
  }

  test("repeatedSpanStats: cross-doc spans flagged positionally, within-doc repeats are not") {
    val shared = "one two three four five six seven eight" // one 8-token window
    val d = Seq(
      (1L, s"$shared tail1 tail2"),          // 3 windows, 1 shared
      (2L, s"lead1 lead2 $shared"),          // 3 windows, 1 shared
      (3L, "a b c d e f g h a b c d e f g h"), // self-repeat only: 9 windows, window(a..h) ×2
      (4L, "too short")                      // < 8 tokens → no rows
    ).toDF("doc_id", "text")
    val r = Dedup.repeatedSpanStats(d, 8)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(r(0) === ((1L, 3L, 1L, 0.333333)))
    assert(r(1) === ((2L, 3L, 1L, 0.333333)))
    // doc 3's duplicated window lives in ONE doc — df counts docs, not positions
    assert(r(2) === ((3L, 9L, 0L, 0.0)))
  }

  test("removeRepeatedSpans: non-keeper occurrences removed positionally; keeper, self-repeats, short docs intact") {
    val shared = "one two three four five six seven eight" // one 8-token window
    val d = Seq(
      (1L, s"$shared tail1 tail2"),            // min doc_id holding the span → keeper
      (2L, s"lead1 lead2 $shared"),            // covered positions 2..9 removed
      (3L, "a b c d e f g h a b c d e f g h"), // self-repeat only: df = 1, untouched
      (4L, "too short"),                       // < 8 tokens → no windows, untouched
      (5L, shared)                             // fully duplicated doc
    ).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedSpans(d, 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 5) // every input doc survives as a row
    assert(r(0) === ((1L, s"$shared tail1 tail2", 10L, 0L)))
    assert(r(1) === ((2L, "lead1 lead2", 10L, 8L)))
    assert(r(2) === ((3L, "a b c d e f g h a b c d e f g h", 16L, 0L)))
    assert(r(3) === ((4L, "too short", 2L, 0L)))
    assert(r(4) === ((5L, "", 8L, 8L)))
  }

  test("spanStore: incremental rewrite ≡ full-corpus removal on batch ids; advance ≡ rebuild; reopen never recomputes") {
    val shared = "one two three four five six seven eight"
    val old = Seq(
      (1L, s"$shared old tail"),
      (3L, "completely different old words going here right now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (0L, shared),                                            // batch id BELOW the old keeper: becomes global keeper
      (10L, s"lead1 lead2 $shared"),                           // dup vs store → positions 2..9 removed
      (20L, "alpha beta gamma delta epsilon zeta eta theta"),  // batch-internal dup, keeper
      (30L, "alpha beta gamma delta epsilon zeta eta theta")   // batch-internal dup, removed
    ).toDF("doc_id", "text")
    val key = s"spanspec-${java.util.UUID.randomUUID()}"
    val store = Dedup.spanStore(old, 8, key)
    val inc = Dedup.removeRepeatedSpansStored(batch, store, 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val full = Dedup.removeRepeatedSpans(old.unionByName(batch), 8)
      .where(col("doc_id").isin(0L, 10L, 20L, 30L))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(inc === full)
    assert(inc(0) === ((0L, shared, 8L, 0L)))
    assert(inc(1) === ((10L, "lead1 lead2", 10L, 8L)))
    assert(inc(2)._4 === 0L) // doc 20 is the batch-internal keeper
    assert(inc(3) === ((30L, "", 8L, 8L)))
    // advance ≡ a fresh full-corpus rebuild, registry content equal
    def rows(st: Dedup.SpanStore) =
      st.spans.select(lower(hex(col("s"))), col("keeper"), col("ndocs"))
        .collect().map(_.toString).sorted.toSeq
    val adv = Dedup.spanStoreAdvance(store, batch, 8, s"$key-adv")
    val rebuilt = Dedup.spanStore(old.unionByName(batch), 8, s"$key-rebuild")
    assert(rows(adv) === rows(rebuilt))
    // build-once: reopening under the same key with a POISONED corpus is
    // served from the published registry — success IS the no-recompute proof
    val poisoned = old.withColumn("text",
      when(length(col("text")) >= 0,
        raise_error(lit("spanStore recomputed instead of reading the store")))
        .otherwise(col("text")))
    assert(rows(Dedup.spanStore(poisoned, 8, key)) === rows(store))
  }

  test("span store: digest-bucketed registry — zero store-side exchange in the incremental probe and the advance fold") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val helper = new AdaptiveSparkPlanHelper {}
    val shared = "one two three four five six seven eight"
    val old = (1L to 40L).map(i =>
        (i, s"$shared filler$i words$i going here right now end$i"))
      .toDF("doc_id", "text")
    val key = s"spanbkt-${java.util.UUID.randomUUID()}"
    val store = Dedup.spanStore(old, 8, key)
    val batch = Seq((100L, shared), (101L, s"extra lead $shared")).toDF("doc_id", "text")
    // a STORE-SIDE exchange = a ShuffleExchange that re-partitions the
    // registry's rows BEFORE their first join — i.e. a shuffle whose
    // subtree holds the bucketed registry scan but no join below it
    // (shuffles above the join carry join output, which is sized by the
    // batch's duplication, not the registry; the batch side still
    // shuffles — that is the O(batch) cost an incremental pass pays).
    // The digest-bucketed layout must eliminate every such node.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def storeScans(plan: org.apache.spark.sql.execution.SparkPlan) =
      helper.collectWithSubqueries(plan) {
        case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
      }
    def pinned(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = storeScans(plan)
      assert(scans.nonEmpty, s"$what: registry scan is not bucketed\n$plan")
      assert(scans.forall(_.outputPartitioning.isInstanceOf[HashPartitioning]),
        s"$what: bucketed scan does not report hash partitioning\n$plan")
      val storeSideShuffles = helper.collectWithSubqueries(plan) {
        case e: ShuffleExchangeLike
          if storeScans(e).nonEmpty &&
            helper.collectWithSubqueries(e) { case j: BaseJoinExec => j }.isEmpty => e
      }
      assert(storeSideShuffles.isEmpty, s"$what: store-side exchange\n$plan")
    }
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      pinned(Dedup.removeRepeatedSpansStored(batch, store, 8), "incremental probe")
      pinned(Dedup.spanRegistryMerge(store.spans, batch, 8), "advance fold")
    }
    // and the capped rewrite result still matches the full recompute
    val inc = Dedup.removeRepeatedSpansStored(batch, store, 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val full = Dedup.removeRepeatedSpans(old.unionByName(batch), 8)
      .where(col("doc_id") >= 100L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(inc === full)
  }

  test("span store: a pre-bucketing registry (no SPAN_BUCKETS sidecar) is served through the plain-scan fallback") {
    // layouts published by pre-r15 code: plain parquet, no sidecar — the
    // open path must degrade to an ordinary scan, and the incremental
    // rewrite against it must still match the full recompute
    val shared = "one two three four five six seven eight"
    val old = Seq((1L, s"$shared legacy tail")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-legacy-span")
      .toString + "/legacy-spanstore"
    Dedup.spanRegistryMerge(Dedup.emptySpanRegistry(spark), old, 8)
      .write.parquet(s"$dir/spans.parquet")
    val store = Dedup.SpanStore(spark, dir)
    assert(store.spans.count() > 0)
    val batch = Seq((10L, s"lead $shared")).toDF("doc_id", "text")
    val inc = Dedup.removeRepeatedSpansStored(batch, store, 8)
      .as[(Long, String, Long, Long)].collect().toSeq
    val full = Dedup.removeRepeatedSpans(old.unionByName(batch), 8)
      .where(col("doc_id") === 10L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(inc === full)
    assert(inc.head._4 === 8L, "the shared span must be removed from the batch doc")
  }

  test("knBigramProbs: hand-computed KN probabilities; per-context mass ≤ 1") {
    val d = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val p = TextOps.knBigramProbs(d, minCount = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // c(a,b)=2, c(b,a)=2, c(a,c)=1; c1(a)=3, c1(b)=2; N1+(a,·)=2, N1+(b,·)=1
    // cont: a,b,c each 1 predecessor; B=3 bigram types; d=0.75
    assert(p(("a", "b")) === ((2L, 0.583333))) // 1.25/3 + .75·2/3·(1/3)
    assert(p(("a", "c")) === ((1L, 0.25)))     // 0.25/3 + .75·2/3·(1/3)
    assert(p(("b", "a")) === ((2L, 0.75)))     // 1.25/2 + .75·1/2·(1/3)
    // discounted mass + backoff over OBSERVED followers never exceeds 1
    assert(p(("a", "b"))._2 + p(("a", "c"))._2 <= 1.0 + 1e-9)
  }

  test("tokenIds: frequency-rank ids, alphabetical ties, OOV below the count floor encodes 0") {
    // counts: b=3, a=2, c=2, z=1 → floor(minCount=2) drops z;
    // ranks: b=1, then a=2 before c=3 (tie at 2, alphabetical)
    val d = Seq((1L, "a b z b"), (2L, "c b c a")).toDF("doc_id", "text")
    val got = CorpusPipeline.tokenIds(d, vocabSize = 1000)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "2 1 0 1", 4L, 1L)))
    assert(got(1) === ((2L, "3 1 3 2", 4L, 0L)))
    // vocabSize cap: V=1 keeps only "b"; everything else OOV
    val capped = CorpusPipeline.tokenIds(d, vocabSize = 1)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(capped(0)._2 === "0 1 0 1" && capped(0)._4 === 2L)
  }

  test("tokenEntropy: 0 bits for a constant stream, log2(n) for all-distinct, exact mid case") {
    val d = Seq(
      (1L, "a a a a"),          // H = 0
      (2L, "a b c d"),          // uniform over 4 → H = 2 bits
      (3L, "a a b b b c c c")   // H = -(2/8)lg(2/8) - 2·(3/8)lg(3/8)
    ).toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 1L, 0.0)))
    assert(got(2L) === ((2L, 4L, 4L, 2.0)))
    val h3 = 0.25 * 2.0 + 2 * 0.375 * (math.log(8.0 / 3.0) / math.log(2.0))
    assert(math.abs(got(3L)._4 - h3) < 1e-6, s"got ${got(3L)._4}, want $h3")
  }

  test("zipfSlope: exact 1/rank frequencies fit slope -1, intercept ln(C)") {
    // freqs 12,6,4,3 = 12/rank for ranks 1..4 -> y = ln 12 - 1·ln rank
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val got = TextOps.zipfSlope(Seq(("s", text)).toDF("source", "text"))
      .select("source", "n_terms", "zipf_slope", "intercept")
      .as[(String, Long, Double, Double)].head()
    assert(got._1 === "s" && got._2 === 4L)
    assert(math.abs(got._3 - -1.0) < 1e-5, s"slope ${got._3}")
    assert(math.abs(got._4 - math.log(12.0)) < 1e-5, s"intercept ${got._4}")
    // below minFreq the tail is excluded: a hapax never enters the fit
    val withTail = TextOps.zipfSlope(
      Seq(("s", text + " zz")).toDF("source", "text"))
      .select("n_terms").as[Long].head()
    assert(withTail === 4L)
  }

  test("hapaxRatio: exact once-token fraction per source") {
    val d = Seq(("s1", "a a b c"), ("s2", "x x y y")).toDF("source", "text")
    val got = TextOps.hapaxRatio(d)
      .select("source", "vocab", "hapax", "hapax_ratio")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("s1") === (("s1", 3L, 2L, 0.666667)))
    assert(got("s2") === (("s2", 2L, 0L, 0.0)))
  }

  test("canonicalUrl: case variants of scheme/www/host collapse, path case survives") {
    val variants = Seq(
      "HTTP://WWW.Site.com/Articles/A?utm=1#frag",
      "https://site.com/Articles/A/",
      "hTTpS://wWw.SITE.COM/Articles/A",
      "site.com/Articles/A" // already canonical (no scheme)
    ).toDF("u")
    val got = variants.select(TextOps.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSet
    assert(got === Set("site.com/Articles/A"))
    // path case is NOT folded: /articles and /Articles stay distinct keys
    val paths = Seq("https://site.com/a/B", "https://site.com/a/b").toDF("u")
      .select(TextOps.canonicalUrl(col("u")).as("c")).as[String].collect().toSet
    assert(paths.size === 2)
  }

  test("ngramNovelty: first occurrence owns the shingle; exact dup of an earlier doc scores 0") {
    val got = TextOps.ngramNovelty(docs, 3)
      .select("doc_id", "n_shingles", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 0: 7 distinct 3-gram shingles, all first-seen → ppm 1,000,000
    assert(got(0L)._2 === 7L && got(0L)._4 === 1000000L)
    // doc 1 is an exact dup of doc 0 → nothing novel
    assert(got(1L) === ((1L, 7L, 0L, 0L)))
    // doc 2 shares its first 5 shingles with doc 0 ("…jumps over the" is
    // common); only "over the sleepy" and "the sleepy dog" are new
    assert(got(2L)._2 === 7L && got(2L)._3 === 2L)
    assert(got(2L)._4 === 2L * 1000000L / 7L) // integer ppm, floor
    // doc 3 is all-new
    assert(got(3L)._4 === 1000000L)
  }

  test("rankAuc: quantization bounds the census; pre-rounded scores are unchanged by it") {
    import graft.operators.Profile
    // continuous scores: 0.0, 0.001, ..., 0.999 with label = score >= 0.5
    val rows = (0 until 1000).map(i => (i / 1000.0, i >= 500)).toDF("s", "y")
    val auc = Profile.rankAuc(rows, col("s"), col("y"))
      .select("auc").as[Double].head()
    assert(auc === 1.0) // perfectly separable
    // quantize=3 is the identity on 3-decimal scores — AUC unchanged
    val aucQ = Profile.rankAuc(rows, col("s"), col("y"), quantize = 3)
      .select("auc").as[Double].head()
    assert(aucQ === 1.0)
    // quantize=1 merges the 100 scores around the boundary into the 0.5
    // block (50 pos + 50 neg tied) — Mann-Whitney midrank credits the
    // 2500 tied pairs 0.5 each: 1 − 0.5·2500/250000 = 0.995 exactly
    val aucTied = Profile.rankAuc(rows, col("s"), col("y"), quantize = 1)
      .select("auc").as[Double].head()
    assert(aucTied === 0.995, aucTied.toString)
  }
}
