package graft

import java.sql.Timestamp

import graft.operators.{EventAnalytics, Layout}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Event-analytics semantics (funnel ordering, cohort offsets, CDC
  * latest-wins/tombstones) and z-order layout locality. */
class AnalyticsLayoutSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stage order enforced, same-instant progression counts, first event wins") {
    // u1 full path; u2's click precedes its view (stage 2 not reached);
    // u3 view+click at the same instant (>= keeps it); u4 purchase only
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10"), "view"),
      (2L, 1L, ts("2024-01-01 00:00:20"), "click"),
      (3L, 1L, ts("2024-01-01 00:00:30"), "purchase"),
      (4L, 2L, ts("2024-01-01 00:00:05"), "click"),
      (5L, 2L, ts("2024-01-01 00:00:10"), "view"),
      (6L, 3L, ts("2024-01-01 00:00:10"), "view"),
      (7L, 3L, ts("2024-01-01 00:00:10"), "click"),
      (8L, 4L, ts("2024-01-01 00:00:05"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("stage").as[(Int, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1, "view", 3L, 1.0), (2, "click", 2L, 0.666667), (3, "purchase", 1L, 0.333333)))
  }

  test("funnel conversion window: a stage past the horizon stops counting") {
    // u1 clicks 90 min after the view: converts in the unwindowed funnel,
    // not in the 60-min one; u2 clicks 10 min after the view: both count
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 01:30:00"), "click"),
      (3L, 2L, ts("2024-01-01 00:00:00"), "view"),
      (4L, 2L, ts("2024-01-01 00:10:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    def users(w: Option[Int]) =
      EventAnalytics.funnel(events, Seq("view", "click"), w)
        .orderBy("stage").select("users").as[Long].collect().toSeq
    assert(users(None) === Seq(2L, 2L))
    assert(users(Some(60)) === Seq(2L, 1L))
  }

  test("cohortRetention: first-seen week cohorts, week offsets, distinct actives") {
    // 2024-01-01 is a Monday; u1 active weeks 0 and 2, u2 week 0 only
    // (twice — distinct must collapse it)
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-01-17 09:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-04 11:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(events)
      .select(col("cohort_week").cast("string"), col("week_no"), col("active_users"))
      .orderBy("week_no").as[(String, Int, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01 00:00:00", 0, 2L), ("2024-01-01 00:00:00", 2, 1L)))
  }

  test("latestSnapshot: latest-wins on (ts, seq), tombstone removes the key") {
    // u1's latest op is the tombstone → absent; u2 has a same-ts tie the
    // higher event_id (log sequence) must win; u3 is a plain upsert
    val log = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10"), "view", 1.0),
      (2L, 1L, ts("2024-01-01 00:00:20"), "error", 2.0),
      (3L, 2L, ts("2024-01-01 00:00:10"), "error", 3.0),
      (4L, 2L, ts("2024-01-01 00:00:10"), "purchase", 4.0),
      (5L, 3L, ts("2024-01-01 00:00:10"), "view", 5.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventAnalytics.latestSnapshot(log, "error")
      .select(col("user_id"), col("last_type"), col("last_value"))
      .orderBy("user_id").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "purchase", 4.0), (3L, "view", 5.0)))
    // scale shape: two-phase hash aggregate, no per-key window sort
    val p = EventAnalytics.latestSnapshot(log, "error")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
    assert(p.linesIterator.count(_.matches("""\(\d+\) (Hash|Sort)Aggregate.*""")) >= 2, p)
  }

  test("activeUsers: DAU exact, WAU covers the trailing window, repeats collapse") {
    // u1 active day 1 and day 3 (twice); u2 active day 1 only
    val events = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.activeUsers(events, window = 7)
      .select(col("day").cast("string"), col("dau"), col("wau"))
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    // day 1: both active; day 3: only u1 that day, both within trailing 7
    assert(got === Seq(
      ("2024-01-01 00:00:00", 2L, 2L), ("2024-01-03 00:00:00", 1L, 2L)))
  }

  test("itemPairs: support counts baskets, the size cap drops mega-baskets before the join") {
    val baskets = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L),       // dup within basket collapses
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 30L),
      (4L, 10L), (4L, 20L), (4L, 30L), (4L, 40L) // over cap → ignored
    ).toDF("basket", "item")
    val got = graft.operators.Affinity
      .itemPairs(baskets, minSupport = 2, maxBasketSize = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 3L)))
  }

  test("associationRules: confidence is directional, lift is symmetric and exact") {
    // 4 kept baskets: {10,20}×3, {10,30}. support(10,20)=3, n(10)=4, n(20)=3
    val baskets = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (4L, 10L), (4L, 30L)
    ).toDF("basket", "item")
    val got = graft.operators.Affinity
      .associationRules(baskets, minSupport = 2, maxBasketSize = 3)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // 10→20: conf 3/4, lift 4·3/(4·3) = 1.0; 20→10: conf 3/3 = 1
    assert(got((10L, 20L)) === ((3L, 0.75, 1.0)))
    assert(got((20L, 10L)) === ((3L, 1.0, 1.0)))
    assert(!got.contains((10L, 30L))) // support 1 < minSupport
  }

  test("kCore: a K4 survives 3-core peeling, its pendant tail does not") {
    // K4 on 1..4 + path 4–5–6: peeling removes 6 then 5; K4 stays, deg 3
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("a", "b")
    val got = graft.operators.GraphOps.kCore(edges, k = 3, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: the path tail still dies (endpoints have degree 1)
    val two = graft.operators.GraphOps.kCore(edges, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(two.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("bfsDistances: exact hop counts on a path, hop bound truncates, min over sources") {
    // path 0–1–2–3–4–5, sources {0, 5}: dist = min(hops to 0, hops to 5)
    val edges = (0L to 4L).map(i => (i, i + 1)).toDF("a", "b")
    val got = graft.operators.GraphOps
      .bfsDistances(edges, col("id").isin(0L, 5L), maxHops = 4)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 0))
    // hop bound 1: only sources and their direct neighbors appear
    val capped = graft.operators.GraphOps
      .bfsDistances(edges, col("id").isin(0L), maxHops = 1)
      .as[(Long, Int)].collect().toMap
    assert(capped === Map(0L -> 0, 1L -> 1))
  }

  test("profile: null/distinct counts and portable min/max rendering") {
    val df = Seq(
      (Some(1L), Some(1.5), "b"), (Some(2L), None, "a"), (None, Some(2.0), "a")
    ).toDF("k", "v", "s")
    val got = graft.operators.Profile.profile(df, Seq("k", "v", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(got("k") === (3L, 1L, 2L, "1", "2"))
    // doubles render via DECIMAL(18,2): "1.50", not double formatting
    assert(got("v") === (3L, 1L, 2L, "1.50", "2.00"))
    assert(got("s") === (3L, 0L, 2L, "a", "b"))
  }

  test("planLint: flags cartesian/NLJ/single-partition shapes, silent on clean plans") {
    val a = (1L to 10L).toDF("x")
    val b = (1L to 10L).toDF("y")
    val cross = graft.operators.Profile.planLint(a.crossJoin(b))
      .select("issue").as[String].collect().toSet
    assert(cross.contains("nested-loop-join") || cross.contains("cartesian-product"), cross)
    // a multi-partition frame, so the global agg really plans the
    // SinglePartition exchange (a 1-partition local frame skips it)
    val wide = spark.range(0, 100, 1, 8).select(col("id").as("x"))
    val single = graft.operators.Profile.planLint(wide.agg(sum(col("x"))))
      .select("issue").as[String].collect().toSet
    assert(single.contains("single-partition-exchange"), single)
    val clean = graft.operators.Profile.planLint(
      a.join(b, col("x") === col("y")).groupBy(col("x")).count())
    assert(clean.isEmpty)
  }

  test("connectedComponentsStar: equals hash-min CC on chains, cycles, and isolated pairs") {
    // a 7-node chain (worst case for hash-min: diameter rounds), a
    // 4-cycle, and an isolated pair
    val pairs = (Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
        (14L, 15L), (15L, 16L)) ++
      Seq((20L, 21L), (21L, 22L), (22L, 23L), (23L, 20L)) ++
      Seq((30L, 31L))).toDF("a", "b")
    val star = graft.operators.GraphOps.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val hashMin = graft.operators.Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === hashMin)
    assert(star.filter(_._1 >= 10L).filter(_._1 < 17L).values.toSet === Set(10L))
    assert(star(23L) === 20L && star(31L) === 30L)
  }

  test("clusters escalation: a chain past the light-round budget finishes via star contraction, same min-id output") {
    // a 40-node chain (diameter 39 > CcEscalateAfterRounds): the hybrid
    // must escalate — and still label every node with the chain head —
    // alongside a blocky 3-clique and an isolated pair that would have
    // converged in the light rounds
    val chain = (100L until 139L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((1L, 2L), (1L, 3L), (2L, 3L), (50L, 51L)))
      .toDF("a", "b")
    val got = graft.operators.Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert((100L to 139L).forall(got(_) === 100L))
    assert(Seq(1L, 2L, 3L).forall(got(_) === 1L))
    assert(got(51L) === 50L && got(50L) === 50L)
    // and equals the pure star algorithm on the same input
    val star = graft.operators.GraphOps.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === star)
  }

  test("anomalyMad: planted spike flags, MAD=0 degenerate case, quiet series stays quiet") {
    // type a: 7 flat days then a 50-count spike → med 5, MAD 0, spike flags
    // type b: counts 1..7 → med 4, MAD 2, threshold 6 → nothing flags
    val rows =
      (1 to 7).flatMap(d => Seq.fill(5)(("a", ts(f"2024-01-0$d%d 01:00:00")))) ++
      Seq.fill(50)(("a", ts("2024-01-08 01:00:00"))) ++
      (1 to 7).flatMap(d => Seq.fill(d)(("b", ts(f"2024-01-0$d%d 01:00:00"))))
    val ev = rows.toDF("event_type", "ts")
    val got = graft.operators.TimeSeries.anomalyMad(ev)
      .select("event_type", "n", "med", "mad", "anomaly")
      .as[(String, Long, Long, Long, Boolean)].collect()
    val a = got.filter(_._1 == "a")
    assert(a.forall(r => r._3 === 5L && r._4 === 0L))
    assert(a.filter(_._5).map(_._2).toSeq === Seq(50L))
    val b = got.filter(_._1 == "b")
    assert(b.forall(r => r._3 === 4L && r._4 === 2L && !r._5))
  }

  test("keySkew: exact counts, integer ppm shares, cumulative walk, tie-break on key") {
    // key 7 owns half the rows, 3 and 5 tie — ranked 3 before 5
    val rows = Seq.fill(10)(7L) ++ Seq.fill(4)(3L) ++ Seq.fill(4)(5L) ++ Seq(1L, 2L)
    val got = graft.operators.Profile.keySkew(rows.toDF("k"), col("k"), 3)
      .as[(Int, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1, "7", 10L, 500000L, 500000L)))
    assert(got(1) === ((2, "3", 4L, 200000L, 700000L)))
    assert(got(2) === ((3, "5", 4L, 200000L, 900000L)))
  }

  test("kAnonymity: class sizes, sensitive diversity, k/l flags") {
    val df = Seq(
      ("US", "A", 1), ("US", "A", 2), ("US", "A", 1),   // k=3, l=2
      ("DE", "B", 1), ("DE", "B", 1),                   // k=2 < 3 → fails k
      ("FR", "C", 5), ("FR", "C", 5), ("FR", "C", 5)    // k=3, l=1 → fails l
    ).toDF("country", "seg", "sensitive")
    val got = graft.operators.Profile
      .kAnonymity(df, Seq("country", "seg"), col("sensitive"), minK = 3, minL = 2)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, (r._3, r._4, r._5))).toMap
    assert(got === Map(
      "US" -> ((3L, 2L, true)),
      "DE" -> ((2L, 1L, false)),
      "FR" -> ((3L, 1L, false))))
  }

  test("lastTouchAttribution: latest in-window touch wins, outside-window → none") {
    val e = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00"), "view", 0.0),
      (2L, 10L, ts("2024-01-10 13:00:00"), "click", 0.0),   // last touch
      (3L, 10L, ts("2024-01-10 14:00:00"), "purchase", 50.0),
      (4L, 20L, ts("2024-01-01 00:00:00"), "view", 0.0),    // 9 days before
      (5L, 20L, ts("2024-01-10 00:00:00"), "purchase", 30.0) // → none
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = graft.operators.EventAnalytics
      .lastTouchAttribution(e, Seq("view", "click"), "purchase", 7)
      .select("pid", "last_touch_type").as[(Long, String)].collect().toMap
    assert(got === Map(3L -> "click", 5L -> "none"))
  }

  test("tableChecksum: invariant to row order and partitioning, sensitive to one cell") {
    val base = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)).toDF("k", "s", "v")
    val cols = Seq("k", "s", "v")
    def sum(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Profile.tableChecksum(df, cols, "t")
        .as[(String, Long, String)].head()
    val a = sum(base)
    assert(a._2 === 3L)
    assert(a === sum(base.orderBy(col("v").desc).repartition(7)))
    val mutated = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.51)).toDF("k", "s", "v")
    assert(sum(mutated)._3 !== a._3) // 3.51 renders "3.51" ≠ "3.50"
  }

  test("rfmSegments: exact quartile scores, recency inverted, ties share a bucket") {
    // 4 users with strictly increasing frequency/monetary and decreasing
    // recency — every score axis should spread 1..4 and agree
    val rows = for {
      u <- 1 to 4
      i <- 1 to u // user u has u events
    } yield (u.toLong, ts(s"2024-01-0$u 0$i:00:00"), 10.0 * u)
    val ev = rows.toDF("user_id", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
    val got = graft.operators.EventAnalytics.rfmSegments(ev)
      .select("user_id", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Int, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    // user 4: most recent (recency 0 → r=4), most frequent, top spend
    assert(got(4L) === ((4L, 4, 4, 4, 444)))
    assert(got(1L) === ((1L, 1, 1, 1, 111)))
    assert(got(2L)._2 === 2 && got(3L)._3 === 3)
  }

  test("pageRank: symmetric nodes tie, hubs dominate, mass is conserved") {
    // path graph a–b–c: b is the hub; a and c are interchangeable
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    val r = graft.operators.GraphOps.pageRank(edges, iters = 3)
      .as[(String, Double)].collect().toMap
    assert(r.keySet === Set("a", "b", "c"))
    assert(r("a") === r("c"))
    assert(r("b") > r("a"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("personalizedPageRank: mass concentrates at the seed; unreached components are absent") {
    // two components: a–b–c (seed a) and x–y (no seed) — the walk can
    // never reach x/y, so they hold exactly 0 units and drop out
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("a", "b")
    val seeds = Seq("a").toDF("id")
    val r = graft.operators.GraphOps.personalizedPageRank(edges, seeds, iters = 3)
      .as[(String, Double)].collect().toMap
    assert(r.keySet === Set("a", "b", "c")) // x, y unreached → absent
    // locality: the far end gets the least mass (a/b alternate under the
    // odd-path oscillation of a fixed-horizon power walk — c never leads)
    assert(r("a") > r("c") && r("b") > r("c"))
    // with restart mass pinned to the seed, total mass stays ~1 (floor-div shed only)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: seeds absent from the graph yield the EMPTY frame, not NULLs") {
    // n_seeds = 0 after the node-universe semi-join: the walk has no mass
    // source, so the well-defined answer is no ranked nodes — previously
    // `units div 0` = NULL propagated NULL ranks through every iteration
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    val ghost = Seq("zz", "qq").toDF("id") // none present in the edge list
    val r = graft.operators.GraphOps.personalizedPageRank(edges, ghost, iters = 3)
    assert(r.count() === 0L)
    assert(r.schema.fieldNames.toSeq === Seq("id", "rank"))
  }

  test("personalizedPageRank: uniform seed set over the whole graph equals global pageRank") {
    // when EVERY node is a seed, the restart term is pageRank's teleport —
    // the two walks are the same fixed-point integer recursion
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val all = Seq("a", "b", "c", "d").toDF("id")
    val ppr = graft.operators.GraphOps.personalizedPageRank(edges, all, iters = 3)
      .as[(String, Double)].collect().toMap
    val pr = graft.operators.GraphOps.pageRank(edges, iters = 3)
      .as[(String, Double)].collect().toMap
    assert(ppr === pr)
  }

  test("zorder2: exact bit interleave, x on odd bits, y on even bits") {
    val got = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (7L, 7L))
      .toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSeq
    // x=0b011→bits 1,3 = 10; y=0b101→bits 0,4 = 17
    assert(got === Seq(27L, 0L, 2L, 1L, 63L))
  }

  test("clusterZ: range-disjoint z partitions, BOTH dimensions stay narrow per partition") {
    // full 32×32 grid; 16 z-clustered partitions ≈ 8×8 blocks
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val clustered = Layout.clusterZ(grid, col("x"), col("y"), 16, bits = 5)
    assert(clustered.rdd.getNumPartitions === 16)
    // no rows lost or duplicated by the exchange
    assert(clustered.count() === 1024)
    val boxes = clustered
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
      .map(r => (r.getAs[Long]("x1") - r.getAs[Long]("x0"),
                 r.getAs[Long]("y1") - r.getAs[Long]("y0")))
    // a single-dimension sort leaves the other dimension's span at 31 in
    // every partition; z-order keeps the average worst-dimension span small
    val avgWorst = boxes.map { case (xs, ys) => math.max(xs, ys).toDouble }.sum / boxes.length
    assert(avgWorst <= 20.0, s"avg worst-dim span $avgWorst; boxes=${boxes.toSeq}")
    // the data-skipping claim: a y-range filter prunes most partitions from
    // min/max stats alone (x-sorted layout would intersect all 16)
    val hit = boxes.count { case _ => true }
    val yHit = clustered
      .select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg(min("y").as("y0"), max("y").as("y1"))
      .collect().count(r => r.getAs[Long]("y0") <= 7 && r.getAs[Long]("y1") >= 0)
    assert(yHit < hit, s"y∈[0,7] should prune some of the $hit partitions, hit $yHit")
  }

  test("intervalOverlapJoin: equals the quadratic join; multi-bucket pairs collapse to one row") {
    val a = Seq(
      ("a1", ts("2024-01-01 00:10:00"), ts("2024-01-01 03:50:00")), // spans 4 buckets
      ("a2", ts("2024-01-01 05:00:00"), ts("2024-01-01 05:30:00"))
    ).toDF("id", "start", "end")
    val b = Seq(
      ("b1", ts("2024-01-01 01:30:00"), ts("2024-01-01 02:30:00")), // shares 2 buckets with a1
      ("b2", ts("2024-01-01 03:50:00"), ts("2024-01-01 04:10:00")), // touches a1's end instant
      ("b3", ts("2024-01-01 04:20:00"), ts("2024-01-01 04:40:00"))  // overlaps nothing
    ).toDF("id", "start", "end")
    val got = graft.operators.TimeSeries.intervalOverlapJoin(a, b)
    val pairs = got.select("a_id", "b_id").as[(String, String)].collect().toSeq
    // one row per pair even though (a1, b1) met in two buckets
    assert(pairs.sorted === Seq(("a1", "b1"), ("a1", "b2")))
    // cross-check against the naive quadratic formulation
    val naive = a.as("x").crossJoin(b.as("y"))
      .where(col("x.start") <= col("y.end") && col("y.start") <= col("x.end"))
      .select(col("x.id"), col("y.id")).as[(String, String)].collect().toSeq
    assert(pairs.sorted === naive.sorted)
  }

  test("scd2History: no-op runs collapse, intervals chain, live state stays open") {
    // u1: view → view (no-op, extends the run) → click → view again (a NEW
    // run of a previously-seen state); u2: single state; same-ts tie on u1's
    // click breaks by event_id
    val log = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10"), "view"),
      (2L, 1L, ts("2024-01-01 00:00:20"), "view"),
      (3L, 1L, ts("2024-01-01 00:00:30"), "click"),
      (4L, 1L, ts("2024-01-01 00:00:40"), "view"),
      (5L, 2L, ts("2024-01-01 00:00:15"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.scd2History(log)
      .select(col("user_id"), col("state"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .orderBy("user_id", "valid_from")
      .as[(Long, String, String, String)].collect().toSeq
    assert(got === Seq(
      (1L, "view", "2024-01-01 00:00:10", "2024-01-01 00:00:30"),
      (1L, "click", "2024-01-01 00:00:30", "2024-01-01 00:00:40"),
      (1L, "view", "2024-01-01 00:00:40", null),
      (2L, "purchase", "2024-01-01 00:00:15", null)))
    // intervals tile the timeline: each valid_to equals the next valid_from
  }

  test("triangleCount: K4 has 4 triangles; a square has none until a diagonal closes 2") {
    def tri(edges: Seq[(String, String)]): Long =
      graft.operators.GraphOps.triangleCount(edges.toDF("a", "b"))
        .as[Long].collect().head
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    assert(tri(k4) === 4L)
    val square = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    assert(tri(square) === 0L)
    assert(tri(square :+ ("a" -> "c")) === 2L)
    // duplicate / reversed / self-loop edges must not inflate the count
    assert(tri(k4 ++ Seq("b" -> "a", "c" -> "c", "a" -> "b")) === 4L)
  }

  test("date-partitioned layout: static filters and dim joins both prune partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp_test").toString
    val events = graft.queries.Tables.events(spark, sf001)
      .withColumn("event_date", to_date(col("ts")))
    graft.operators.Layout.writeDatePartitioned(events, tmp, "event_date")
    val fact = spark.read.parquet(tmp)

    // STATIC tier: a literal date predicate must land in PartitionFilters
    // (directory pruning at planning), not PushedFilters (row skipping)
    val oneDate = fact.select(col("event_date")).distinct().limit(1)
      .collect().head.getDate(0)
    val static = fact.where(col("event_date") === lit(oneDate))
    val staticPlan = static.queryExecution.executedPlan.toString
    assert(staticPlan.contains("PartitionFilters") &&
      staticPlan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_date"),
      s"static date predicate did not become a partition filter:\n$staticPlan")

    // DYNAMIC tier (DPP): joining on the partition column against a dim
    // filtered on a NON-key attribute must plan a runtime pruning
    // subquery (a key-column dim filter would be propagated statically
    // by constraint inference and prove nothing)
    val allDates = fact.select(col("event_date")).distinct()
      .orderBy(col("event_date")).as[java.sql.Date].collect()
    // the dim must be a real scan with a real Filter: a local Seq would be
    // constant-folded into a filterless LocalRelation and DPP needs a
    // selective predicate on the dim side
    val dimPath = s"$tmp-dim"
    allDates.zipWithIndex.toSeq.toDF("event_date", "idx")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .where(col("idx") === allDates.indexOf(oneDate))
      .select(col("event_date"))
    val joined = fact.join(dim, "event_date").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val dppPlan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(dppPlan.contains("dynamicpruning"),
      s"dim join on the partition key planned no dynamic partition pruning:\n$dppPlan")
    // and the pruned result equals the statically filtered aggregate
    val expect = static.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(joined.as[(String, Long)].collect().toMap === expect)
  }

  test("labelPropagation: two cliques converge to their min-id labels; bridge node joins one") {
    // cliques {1,2,3} and {10,11,12}, plus bridge 3-10 (each endpoint has
    // 2 in-clique neighbors vs 1 cross neighbor, so the cliques hold)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)
    ).toDF("a", "b")
    val got = graft.operators.GraphOps.labelPropagation(edges, 4)
      .as[(Long, Long)].collect().toMap
    // round 1 from self-labels: node 1 sees {2,3}→2; node 2 sees {1,3}→1;
    // node 3 sees {1,2,10}→1 … repeated rounds settle each clique on its
    // min reachable label; the deterministic tie-break keeps it stable
    assert(got.size === 6)
    assert(got(10L) === got(11L) && got(11L) === got(12L),
      s"right clique split: $got")
    assert(Set(got(1L), got(2L), got(3L)).size <= 2, s"left clique scattered: $got")
    assert(got(1L) <= 3L && got(10L) <= 10L, s"labels escaped their cliques: $got")
  }

  test("bucketed tables: sort-merge join runs with ZERO exchanges, result equals the plain join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val helper = new AdaptiveSparkPlanHelper {}
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt_test").toFile
    val facts = (1 to 1000).map(i => (i.toLong % 100, i.toLong)).toDF("k", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val fb = Layout.bucketedTable(spark, "t_facts_bkt",
      new java.io.File(tmp, "facts").getPath, "k", 4)(facts)
    val db = Layout.bucketedTable(spark, "t_dims_bkt",
      new java.io.File(tmp, "dims").getPath, "k", 4)(dims)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fb.join(db, "k")
      assert(joined.count() === 1000)
      val shuffles = helper.collectWithSubqueries(
        joined.queryExecution.executedPlan) { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, joined.queryExecution.executedPlan.toString)
      // same rows as the un-bucketed join
      val plain = facts.join(dims, "k").select("k", "v", "name")
      assert(joined.select("k", "v", "name").except(plain).isEmpty &&
        plain.except(joined.select("k", "v", "name")).isEmpty)
    }
  }

  test("changepoint: planted level shift found at the boundary with exact segment means") {
    import spark.implicits._
    // type "shift": 5/day for days 1-10, then 15/day for days 11-20;
    // type "flat": constant 4/day — its best split is noise-level
    val rows = for {
      day <- 1 to 20
      tpe <- Seq("shift", "flat")
      n = if (tpe == "shift") { if (day <= 10) 5 else 15 } else 4
      i <- 1 to n
    } yield (tpe, Timestamp.valueOf(f"2024-03-$day%02d 12:00:0${i % 10}"))
    val events = rows.toDF("event_type", "ts")
    val got = graft.operators.TimeSeries.changepoint(events)
      .as[(String, Timestamp, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val s = got("shift")
    assert(s._2 === Timestamp.valueOf("2024-03-10 00:00:00")) // last day of the low regime
    assert(s._4 === 5.0 && s._5 === 15.0)
    assert(s._3 === 22.36068) // |5-15|·sqrt(10·10/20) = 10·sqrt(5)
    // the planted shift dominates the flat series' noise statistic
    assert(got("flat")._3 < 1e-9)
  }

  test("peakConcurrency: end-inclusive overlap, midnight-spanning session counts in both days") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: one session 10:00–10:10
      (1L, 1L, ts("2024-03-05 10:00:00")), (2L, 1L, ts("2024-03-05 10:10:00")),
      // user 2: point session AT user 1's end instant — end-inclusive ⇒ overlap
      (3L, 2L, ts("2024-03-05 10:10:00")),
      // user 3: disjoint later session the same day
      (4L, 3L, ts("2024-03-05 15:00:00")),
      // user 4: 15-min gap across midnight ⇒ ONE session touching both days
      (5L, 4L, ts("2024-03-06 23:50:00")), (6L, 4L, ts("2024-03-07 00:05:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.peakConcurrency(events, gapMinutes = 30)
      .as[(Timestamp, Int)].collect().toMap
    assert(got === Map(
      ts("2024-03-05 00:00:00") -> 2, // users 1+2 meet at 10:10
      ts("2024-03-06 00:00:00") -> 1, // user 4's session, clipped to the day
      ts("2024-03-07 00:00:00") -> 1)) // …and its carry-over
  }

  test("survivalKm: life-table accounting and the product-limit estimate") {
    // window ends 01-31 (u1's last event); horizon 3d → churn cutoff 01-28.
    // u2 dies at t=9, u3 at t=5; u1 (last = window end) and u4 (last 01-29,
    // inside the horizon) are censored at t = 30
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-31 00:00:00")),
      (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-10 00:00:00")),
      (3L, ts("2024-01-05 00:00:00")), (3L, ts("2024-01-10 00:00:00")),
      (4L, ts("2024-01-01 00:00:00")), (4L, ts("2024-01-29 00:00:00"))
    ).map { case (u, t) => (u, t, "t") }.toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.survivalKm(events, horizonDays = 3)
      .orderBy("t_days")
      .select("t_days", "n_risk", "d_events", "c_censored", "survival")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (5, 4L, 1L, 0L, 0.75),  // 1 - 1/4
      (9, 3L, 1L, 0L, 0.5),   // 0.75 · (1 - 1/3)
      (30, 2L, 0L, 2L, 0.5))) // censoring leaves S unchanged
  }

  test("harmonicCentrality: all-seeds path graph gives exact 1/d sums") {
    // path 1-2-3, every node a seed: center collects 1+1, ends 1+1/2
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = graft.operators.GraphOps
      .harmonicCentrality(edges, seeds = 3, maxHops = 2)
      .select("id", "reached", "harmonic").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((2L, 1.5)))
    assert(got(2L) === ((2L, 2.0)))
    assert(got(3L) === ((2L, 1.5)))
  }

  test("dpCounts: exact counts, md5-deterministic Laplace noise, released = n + noise") {
    val df = (Seq.fill(3)("a") ++ Seq.fill(5)("b")).toDF("k")
    val got = graft.operators.Profile.dpCounts(df, col("k"), epsilon = 1.0)
      .select("g", "n", "noise", "released")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a")._2 === 3L && got("b")._2 === 5L)
    // reproduce the inverse-CDF draw independently of Spark
    def laplace(g: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex.take(15), 16).toDouble / math.pow(2, 60)
      val c = u - 0.5
      BigDecimal(-1.0 * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq("a", "b").foreach { g =>
      assert(math.abs(got(g)._3 - laplace(g)) < 1e-9, s"$g: ${got(g)._3} vs ${laplace(g)}")
      assert(math.abs(got(g)._4 - (got(g)._2 + got(g)._3)) < 1e-6)
    }
    // the two groups draw different noise (the md5 seed varies by group)
    assert(got("a")._3 !== got("b")._3)
  }
}
