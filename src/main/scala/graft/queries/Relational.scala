package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational query inventory — the query surface a user of the loaded table
  * gets from this engine (joins/aggregations/windows/set-ops; SURVEY.md
  * §2.5). All Catalyst built-ins: declarative plans so predicate pushdown,
  * column pruning, partial aggregation and broadcast-join selection are
  * automatic, and every operator stays inside whole-stage codegen.
  *
  * Scale notes per query are inline; the recurring ones: dimension tables
  * (region/nation/supplier) are explicitly `broadcast()` — at 100 TB the
  * fact tables shuffle on join keys only when both sides are large, and
  * map-side partial aggregation runs before every exchange.
  */
object Relational {
  import Tables._

  /** lineitem columns + types for the profiling census (kept static so the
    * oracle SQL is derivable without a Spark session). */
  private val profileCols: Seq[(String, DataType)] = Seq(
    "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
    "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
    "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
    "l_tax" -> DoubleType, "l_returnflag" -> StringType,
    "l_linestatus" -> StringType, "l_shipdate" -> TimestampType)

  val defs: Map[String, Q] = Map(
    // data-quality census: per-column row/null/distinct counts + min/max;
    // one single-column aggregate branch per column (columnar pruning makes
    // that the same scanned bytes as one wide pass, with no multi-distinct
    // Expand anywhere)
    "table_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(t(s, dir, "lineitem"), profileCols.map(_._1))),

    // order-independent table fingerprints (migration validation: "did the
    // new engine load the same bytes") — exact decimal SUM of per-row
    // 60-bit md5 hashes over a canonical column rendering; no row order,
    // partitioning or agg schedule can move it
    // tSpread (r18): the per-row md5+render pass is chained into the scan
    // stage, which a single-row-group file serializes onto one core —
    // measured −0.8 s with the adaptive spread, the single-consumer
    // CPU-bound shape where it wins (see Tables.tSpread)
    "table_checksum" -> ((s, dir) =>
      graft.operators.Profile.tableChecksum(
          tSpread(s, dir, "lineitem"), profileCols.map(_._1), "lineitem")
        .unionAll(graft.operators.Profile.tableChecksum(
          tSpread(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"), "orders"))),

    // re-identification audit: k-anonymity class sizes + l-diversity of
    // the sensitive attribute over the (nation, segment) quasi-identifier
    // — one exchange on the QI key, classes flagged against k≥5 / l≥2
    "privacy_k_anonymity" -> ((s, dir) =>
      graft.operators.Profile.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"),
        when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg")),
        minK = 5, minL = 2)),

    // PSEUDONYMIZATION audit — the GDPR-pipeline identity swap with its
    // joinability proof: user_id → keyed md5 pseudonym (stable across
    // tables, so joins survive), then per event_type the distinct-entity
    // count BEFORE vs AFTER must match exactly (lossless = no collisions
    // collapsed two users, no split duplicated one). One exchange; the
    // pseudonym is a codegen md5 projection
    "privacy_pseudonymize" -> ((s, dir) => {
      val pseudo = substring(md5(concat(lit("salt-2024:"),
        col("user_id").cast(StringType))), 1, 16)
      // distinct (type, user) FIRST: the pseudonym is a function of the
      // user, so after the dedup n_users is a plain count and only ONE
      // distinct aggregate remains — two-phase partial agg, no Expand
      // (the double-countDistinct form multiplies every row by 2)
      t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"), pseudo.as("pid"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          countDistinct(col("pid")).as("n_pseudonyms"))
        .select(col("event_type"), col("n_users"), col("n_pseudonyms"),
          (col("n_users") === col("n_pseudonyms")).as("lossless"))
    }),

    // the k-anonymity REPAIR mechanism: coarsen the quasi-identifier
    // (nation→region→segment-only) and re-measure class sizes /
    // l-diversity per ladder level — the release decision table
    "privacy_generalization_ladder" -> ((s, dir) => {
      val cust = t(s, dir, "customer").join(
        broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey"))),
        "c_nationkey")
      graft.operators.Profile.generalizationLadder(cust,
        Seq("nation_segment" -> Seq("c_nationkey", "c_mktsegment"),
          "region_segment" -> Seq("n_regionkey", "c_mktsegment"),
          "segment" -> Seq("c_mktsegment")),
        when(col("c_acctbal") >= 0, lit("pos")).otherwise(lit("neg")),
        minK = 5, minL = 2)
    }),

    // ε-DP released counts (Laplace mechanism, sensitivity 1) with the
    // noise draw md5-derived — retry-reproducible release, no fresh
    // privacy budget on re-run; one count aggregate + per-group projection
    "privacy_dp_count" -> ((s, dir) =>
      graft.operators.Profile.dpCounts(t(s, dir, "events"),
        col("event_type"), epsilon = 1.0)),

    // shuffle-planning skew census: the top-25 heaviest join keys with
    // exact counts and ppm shares — the number that decides salting /
    // AQE skew handling BEFORE the big shuffle runs; one count aggregate
    // + a bounded top-k, windows only over the 25 survivors
    "profile_key_skew" -> ((s, dir) =>
      graft.operators.Profile.keySkew(t(s, dir, "orders"), col("o_custkey"), 25)),

    // optimizer-statistics join sizing: |R ⋈ S| ≈ n_R·n_S / max(d_R, d_S)
    // with the distinct counts taken from the SAME durable HLL register
    // tables a warehouse keeps per partition (Sketches) — the estimate a
    // planner reads without scanning either side, next to the true join
    // count as the oracle-checked error reference
    "q_join_cardinality_est" -> ((s, dir) => {
      import graft.operators.Sketches
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val dl = Sketches.hllEstimate(
        Sketches.hllRegisters(o, lit("l"), col("o_custkey")))
        .select(col("est").as("d_left_est"))
      val dr = Sketches.hllEstimate(
        Sketches.hllRegisters(c, lit("r"), col("c_custkey")))
        .select(col("est").as("d_right_est"))
      val actual = o.join(c, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("actual_rows"))
      o.agg(count(lit(1)).as("n_left"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_right"))))
        .crossJoin(broadcast(dl)).crossJoin(broadcast(dr))
        .crossJoin(broadcast(actual))
        .select(col("n_left"), col("n_right"), col("d_left_est"),
          col("d_right_est"),
          round(col("n_left").cast(DoubleType) * col("n_right").cast(DoubleType) /
            greatest(col("d_left_est"), col("d_right_est")), 4).as("est_rows"),
          col("actual_rows"))
    }),

    // declarative CONSTRAINT report (the Deequ-style quality gate a
    // nightly load publishes before downstream jobs trust the data):
    // uniqueness, referential integrity, range and null-rate checks, one
    // row per constraint. Per-table checks fold into ONE aggregate per
    // scan (explode of a 1-row struct array); the two FK checks are
    // broadcast anti-join counts against the parent key sets — nothing
    // here exceeds one exchange per constraint family
    "quality_constraint_report" -> ((s, dir) => {
      def rows(branch: org.apache.spark.sql.DataFrame) = branch.select(
        explode(col("cs")).as("c")).select(
        col("c.check_name").as("check_name"), col("c.n_checked").as("n_checked"),
        col("c.n_violations").as("n_violations"),
        (col("c.n_violations") === 0L).as("pass"))
      def c(name: String, checked: org.apache.spark.sql.Column,
            viol: org.apache.spark.sql.Column) =
        struct(lit(name).as("check_name"), checked.as("n_checked"),
          viol.cast(LongType).as("n_violations"))
      val li = t(s, dir, "lineitem")
      val od = t(s, dir, "orders")
      val cu = t(s, dir, "customer")
      val liAgg = li.agg(array(
        c("lineitem.quantity_in_1_50", count(lit(1)),
          count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))),
        c("lineitem.discount_in_0_0.1", count(lit(1)),
          count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)))).as("cs"))
      val odAgg = od.agg(array(
        c("orders.orderkey_unique", count(lit(1)),
          count(lit(1)) - countDistinct(col("o_orderkey"))),
        c("orders.totalprice_positive", count(lit(1)),
          count(when(col("o_totalprice") <= 0, 1)))).as("cs"))
      val cuAgg = cu.agg(array(
        c("customer.acctbal_not_null", count(lit(1)),
          count(lit(1)) - count(col("c_acctbal")))).as("cs"))
      val fkLi = li.select(col("l_orderkey"))
        .join(broadcast(od.select(col("o_orderkey"))),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(array(c("lineitem.orderkey_fk_orders",
          lit(null).cast(LongType), count(lit(1)))).as("cs"))
      val fkCu = cu.select(col("c_nationkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"), "left_anti")
        .agg(array(c("customer.nationkey_fk_nation",
          lit(null).cast(LongType), count(lit(1)))).as("cs"))
      rows(liAgg).unionAll(rows(odAgg)).unionAll(rows(cuAgg))
        .unionAll(rows(fkLi)).unionAll(rows(fkCu))
    }),

    // exact equi-depth histogram without a global sort OR a full-table
    // percentile aggregate: the table first reduces to per-VALUE counts
    // (map-side partial, one hash exchange on the value), the octile
    // boundaries fall out of the integer cumulative distribution over the
    // distinct values (b_i = smallest x with 8·cum ≥ i·n — exactly
    // percentile_disc's cume_dist ≥ p, in overflow-free integer math), and
    // the bounded-domain boundary row broadcasts into a shuffle-free
    // assignment pass. percentile_disc as a direct aggregate buffers and
    // sorts every ROW (17 s at sf0.1 vs 1 s for this plan); a global ntile
    // would funnel the table through one partition. The only single-
    // partition step here is the cumsum over DISTINCT prices — a bounded
    // value domain (~90× smaller than rows at sf0.1, and scale-invariant
    // for fixed-precision money), not the data
    "q_histogram_equidepth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val v = t(s, dir, "lineitem")
        .select(col("l_extendedprice").cast(DecimalType(12, 2)).as("x"))
      val vc = v.groupBy(col("x")).agg(count(lit(1)).as("c"))
      val cum = vc.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val cuts = (1 to 7).map(i =>
        min(when(col("cum") * 8 >= col("n") * i, col("x"))).as(s"b$i"))
      val b = cum.crossJoin(broadcast(vc.agg(sum(col("c")).as("n"))))
        .agg(cuts.head, cuts.tail: _*)
      v.crossJoin(broadcast(b))
        .select(col("x"), (lit(1) + (1 to 7).map(i =>
          (col("x") > col(s"b$i")).cast(IntegerType)).reduce(_ + _)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).cast(DoubleType).as("lo"),
          max(col("x")).cast(DoubleType).as("hi"))
    }),

    // incremental JOIN-VIEW maintenance (the delta algebra Δ(O⋈L) =
    // ΔO⋈L_old ∪ O_old⋈ΔL ∪ ΔO⋈ΔL): the standing per-customer revenue
    // view is refreshed from the three delta joins merged into the old
    // aggregate — at 100 TB the full O⋈L is never recomputed; each delta
    // term joins a (small) changed slice against the other side, and the
    // final merge is aggregate-sized. Counts add; revenue adds exactly in
    // decimal. The oracle's one-shot join+agg over everything proves the
    // tiling law (the four O×L quadrants partition the join exactly)
    "q_ivm_join_view" -> ((s, dir) => {
      val cutO = lit("1996-01-01").cast(TimestampType)
      val cutL = lit("1996-06-01").cast(TimestampType)
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"),
        col("l_extendedprice"))
      def part(os: org.apache.spark.sql.DataFrame,
               ls: org.apache.spark.sql.DataFrame) =
        os.join(ls, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("v"))
      val (oOld, oNew) = (o.where(col("o_orderdate") < cutO),
        o.where(col("o_orderdate") >= cutO))
      val (lOld, lNew) = (l.where(col("l_shipdate") < cutL),
        l.where(col("l_shipdate") >= cutL))
      part(oOld, lOld) // the standing view
        .unionAll(part(oNew, lOld)) // ΔO ⋈ L_old
        .unionAll(part(oOld, lNew)) // O_old ⋈ ΔL
        .unionAll(part(oNew, lNew)) // ΔO ⋈ ΔL
        .groupBy(col("o_custkey"))
        .agg(sum(col("n")).as("n_items"),
          sum(col("v")).cast(DoubleType).as("revenue"))
    }),

    // TPC-H Q1 shape: scan-heavy agg; partial agg map-side, 6k→4 groups.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revSum(money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          revSum(money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount")) * factor(lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // Projection+filter pushed into the parquet scan (PushedFilters +
    // 2-column ReadSchema — verified in PlanSpec).
    "q6_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
               col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
               col("l_quantity") < 25)
        .agg(revSum(money(col("l_extendedprice")) * factor(col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
    }),

    // Star-schema join: both dims broadcast (no shuffle of customer at all).
    "q_join_broadcast_dims" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
    }),

    // TPC-H Q3 shape: two big-side joins on keys + deterministic top-k.
    // At scale: orders/lineitem shuffle on orderkey once; top-k is a
    // TakeOrderedAndProject (no global sort materialization).
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revSum(money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way join, dims broadcast, facts shuffle once each.
    "q5_local_supplier_volume" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
                             c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revSum(money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))).as("revenue"))
    }),

    // Window: dense per-partition rank with a total (deterministic) order.
    "q_window_topn_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // Same result as q_window_topn_per_cust via the custom bounded top-k
    // aggregate: map-side combine ships k pairs per key through the
    // exchange instead of sorting every row of every key (see
    // graft.functions.TopKPairs).
    "q_topk_custom_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(graft.functions.TopKPairs.topK(
          struct(col("o_totalprice"), col("o_orderkey")), 3).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("o_custkey"),
          col("t.payload").as("o_orderkey"),
          col("t.ord").as("o_totalprice"),
          (col("pos") + 1).cast(IntegerType).as("rn"))),

    // Skew-safe two-phase aggregation: l_returnflag has 3 values over 600k
    // rows — the canonical hot-key shape. Salted partials spread each hot
    // group over 16 reducers; decimal sums make the two-phase result
    // EXACTLY equal to the direct groupBy (same oracle).
    "q_skew_salted_agg" -> ((s, dir) =>
      graft.operators.SkewOps.saltedAgg(
        t(s, dir, "lineitem"),
        groupCols = Seq("l_returnflag"),
        valueCol = col("l_quantity"),
        alias = "sum_qty",
        spreadOn = col("l_orderkey"),
        buckets = 16)),

    // Skew-safe salted JOIN: orders ⋈ a 5-row priority dim on a 5-value
    // hot key — the explicit spread for when AQE's skew split can't apply.
    // The salted join is exactly the plain join, so the oracle is the
    // unsalted form; the aggregate keeps the declared result small.
    "q_join_salted_skew" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val dim = o.select(col("o_orderpriority")).distinct()
        .withColumn("plen", length(col("o_orderpriority")))
      graft.operators.SkewOps.saltedJoin(o, dim, "o_orderpriority",
          spreadOn = col("o_orderkey"), buckets = 16)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          max(col("plen")).as("plen"))
    }),

    // Approximate distinct (HLL++ sketch): estimates are engine-specific,
    // so the DECLARED columns are the exact counts plus a deterministic
    // error-bound flag (HLL++ is hash-based and order-independent, so the
    // flag is reproducible) — the sketch runs and is oracle-GATED (the
    // oracle asserts within_bound = 1 from its own exact counts) without
    // comparing engine-specific estimate values.
    "q_approx_distinct" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      // two countDistinct on DIFFERENT keys in one agg would plan an
      // Expand (input ×3 through the shuffle); three independent
      // single-purpose aggs + a 3-row join are far cheaper
      def exact(key: String, as: String) =
        l.select(col("l_returnflag"), col(key)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      val ap = l.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
      exact("l_partkey", "exact_parts")
        .join(exact("l_orderkey", "exact_orders"), "l_returnflag")
        .join(ap, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
          (abs(col("ap") - col("exact_parts")).cast(DoubleType) <=
             col("exact_parts") * 0.05 &&
           abs(col("ao") - col("exact_orders")).cast(DoubleType) <=
             col("exact_orders") * 0.05).cast(IntegerType).as("within_bound"))
    }),

    // Window: running frame (rows between unbounded preceding and current).
    "q_window_running_sum" -> ((s, dir) => {
      // l_quantity as the final tiebreak: (orderkey, linenumber) is NOT
      // unique in the synthetic data, and at sf0.1 two rows tie on all
      // other ordering columns — ordering by the summed value makes the
      // running prefix sums identical regardless of physical order.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc, col("l_quantity").asc)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DoubleType).as("running_qty"))
    }),

    // Window: time-RANGE frame (all rows within the trailing 10 minutes by
    // event time, not a fixed row count) — the frame ties-safe by
    // construction: peers at the same second are in or out together, so
    // no tiebreak column is needed.
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
        .rangeBetween(-600, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast(LongType).as("tsec"), col("value"))
        .select(col("event_id"), col("user_id"), col("tsec"),
          count(lit(1)).over(w).as("n_10m"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType).as("sum_10m"))
    }),

    // Window: trailing CALENDAR-interval range frame (the feature-store
    // staple "spend in the last 30 days" per customer) — Spark range
    // frames are numeric, so the idiom is ordering on epoch micros with
    // the interval as a micro count; one exchange + sort per customer
    // partition, frames resolved by binary search within the run
    "q_window_range_interval" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("tus"))
        .rangeBetween(-30L * 86400L * 1000000L, 0L)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast(TimestampType)).as("tus"),
          col("o_totalprice"))
        .select(col("o_orderkey"), col("o_custkey"), col("tus"),
          count(lit(1)).over(w).as("n_last_30d"),
          sum(money(col("o_totalprice"))).over(w)
            .cast(DoubleType).as("rev_last_30d"))
    }),

    // Window: distribution analytics — percent_rank / cume_dist / ntile
    // over a tie-free per-type ordering (value, event_id). The ratios are
    // exact integer-over-integer divisions done once in double, so both
    // engines produce bit-identical results with no rounding step.
    "q_window_percentiles" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).as("quartile"))
    }),

    // ROLLUP grouping sets (subtotals + grand total).
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    // CUBE grouping sets.
    "q_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))),

    // Existential joins: semi (EXISTS) / anti (NOT EXISTS). At scale these
    // shuffle only the keys of the probe side; no payload duplication.
    "q_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "orders").where(col("o_totalprice") > 400000)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      t(s, dir, "customer")
        .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Set operations.
    "q_set_ops" -> ((s, dir) => {
      val custNations = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val suppNations = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      custNations.intersect(suppNations)
        .union(custNations.except(suppNations))
        .distinct()
    }),

    // NULL-SAFE equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other instead of vanishing — the semantics dimension-key
    // joins with "unknown" buckets need; still a hash-joinable equi-key
    // (Catalyst plans a normal exchange on the null-safe key, not a
    // filter-join)
    "q_join_null_safe" -> ((s, dir) => {
      val l = t(s, dir, "customer")
        .select(expr("nullif(c_nationkey % 5, 4)").as("k"))
      val r = t(s, dir, "supplier")
        .select(expr("nullif(s_nationkey % 5, 4)").as("k2"))
      l.join(r, col("k") <=> col("k2"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_pairs"))
    }),

    // BAG-semantics set ops (intersectAll / exceptAll keep multiplicities
    // — min/difference of per-value counts, a different operator from the
    // distinct forms: Spark plans them as count-annotated joins, not
    // dedup + join); nation-key multisets of customers vs suppliers
    "q_set_ops_all" -> ((s, dir) => {
      val custNations = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val suppNations = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      custNations.intersectAll(suppNations)
        .groupBy(col("nk")).agg(count(lit(1)).as("n_inter"))
        .join(
          custNations.exceptAll(suppNations)
            .groupBy(col("nk")).agg(count(lit(1)).as("n_exc")),
          Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_exc"), lit(0L)).as("n_exc"))
    }),

    // Distinct aggregation (exact; the approx variants are benched, not
    // oracle-checked, since HLL is engine-specific).
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_orderkey")).as("n_orders"))),

    // The scale form of the same answer: two countDistinct on DIFFERENT
    // keys in one agg plan an Expand — every input row duplicated once per
    // distinct column before the exchange. One countDistinct per aggregate
    // plans the Expand-free partial-distinct form (map-side dedup on
    // (group, key), tiny second exchange), and the two single-distinct
    // aggregates join exchange-free on their shared output partitioning.
    // Shuffle volume is the deduped pairs instead of 2x the input rows —
    // the q21 / q_approx_distinct rewrite pattern, declared so the
    // inventory carries the naive AND the scale form (measured 1.7x at
    // sf0.1 where fixed scan cost dominates; the gap widens with scale as
    // the Expand exchange grows linearly in input rows).
    "q_distinct_agg_fast" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def level2(key: String, out: String) = li
        .groupBy(col("l_suppkey")).agg(count_distinct(col(key)).as(out))
      level2("l_partkey", "n_parts")
        .join(level2("l_orderkey", "n_orders"), "l_suppkey")
        .select(col("l_suppkey"), col("n_parts"), col("n_orders"))
    }),

    // GROUP BY + HAVING.
    "q_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .where(col("n_orders") >= 3)),

    // Scalar-function surface (string/math/conditional built-ins).
    "q_scalar_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 3).as("type3"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_retailprice").cast(DecimalType(18, 2)) * 2).cast(DoubleType).as("double_price"),
        when(col("p_size") > 25, lit("L")).when(col("p_size") > 10, lit("M"))
          .otherwise(lit("S")).as("size_class"))),

    // Correlated-scalar shape: per-customer max order vs account balance.
    "q_groupjoin" -> ((s, dir) => {
      val o = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(max(col("o_totalprice")).as("max_order"))
      t(s, dir, "customer")
        .join(o, col("c_custkey") === o("o_custkey"), "inner")
        .where(col("max_order") > col("c_acctbal"))
        .select(col("c_custkey"), col("max_order"))
    }),

    // 2-D skyline (Pareto frontier, minimize both dims) in two window
    // passes: bucket-LOCAL skylines first (partitioned window — removing
    // locally dominated points is globally sound since dominance is
    // transitive), then the exact frontier over the few survivors; the
    // naive formulation is a quadratic NOT EXISTS self-join (which is
    // exactly the independent oracle). For sorted-by-x points, dominated ⟺
    // min(y) over all earlier rows <= y — a running-min window, no join
    "q_skyline_pareto" -> ((s, dir) => {
      val pts = t(s, dir, "part")
        .select(col("p_retailprice").cast(DecimalType(12, 2)).as("x"),
          col("p_size").cast(IntegerType).as("y"))
        .distinct()
      def frontier(df: org.apache.spark.sql.DataFrame,
                   part: Seq[org.apache.spark.sql.Column]) = {
        val w = Window.partitionBy(part: _*).orderBy(col("x"), col("y"))
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("pm", min(col("y")).over(w))
          .where(col("pm").isNull || col("y") < col("pm"))
          .drop("pm")
      }
      val local = frontier(pts.withColumn("bx", floor(col("x") / 100)),
        Seq(col("bx"))).drop("bx")
      frontier(local, Seq.empty)
        .select(col("x").cast(DoubleType).as("x"), col("y"))
    }),

    // MERGE INTO semantics, relationally: target upserted from a source
    // (matched → update, matched + condition → delete, source-only →
    // insert, target-only → keep) in ONE full-outer join pass — no
    // row-at-a-time mutation; at scale this is the nightly dimension
    // merge, shuffling each side once on the key
    "q_merge_upsert" -> ((s, dir) => {
      val target = t(s, dir, "customer").where(col("c_custkey") <= 1000)
        .select(col("c_custkey").as("mkey"), money(col("c_acctbal")).as("bal"))
      val source = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice"))).as("spend"))
        .select(col("o_custkey").as("mkey"), col("spend"))
      target.as("tg").join(source.as("sr"), Seq("mkey"), "full_outer")
        .where(!(col("tg.bal").isNotNull && col("sr.spend").isNotNull &&
          col("sr.spend") > lit(500000)))
        .select(col("mkey"),
          when(col("tg.bal").isNull, col("sr.spend"))
            .when(col("sr.spend").isNull, col("tg.bal"))
            .otherwise(col("tg.bal") + col("sr.spend"))
            .cast(DoubleType).as("bal"),
          when(col("tg.bal").isNull, lit("insert"))
            .when(col("sr.spend").isNull, lit("keep"))
            .otherwise(lit("update")).as("action"))
    }),
  )

  private val q1Sql = {
    val disc = s"${moneySql("l_extendedprice")} * ${factorSql("1.0 - l_discount")}"
    val charge = s"$disc * ${factorSql("1.0 + l_tax")}"
    s"""SELECT l_returnflag, l_linestatus,
       ${dsumSql("l_quantity")} AS sum_qty,
       ${dsumSql("l_extendedprice")} AS sum_base_price,
       CAST(SUM($disc) AS DOUBLE) AS sum_disc_price,
       CAST(SUM($charge) AS DOUBLE) AS sum_charge,
       ${davgSql("l_quantity")} AS avg_qty,
       ${davgSql("l_extendedprice")} AS avg_price,
       ${davgSql("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
     FROM lineitem
     WHERE l_shipdate <= TIMESTAMP '1998-09-02'
     GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  /** DuckDB mirror of one global [[graft.operators.Sketches]] HLL estimate
    * (p=6): low-60-bit md5 hash, register = low 6 bits, rho via bin()
    * length, Z scaled by 2^55 in integer arithmetic — same literal
    * algebra as the events_hll_distinct oracle, ungrouped. */
  private def hllEstSql(table: String, keyExpr: String): String =
    s"""(WITH h AS (SELECT CAST(('0x'||substr(md5(CAST($keyExpr AS VARCHAR)),1,15))
            AS BIGINT) AS hv FROM $table),
        r0 AS (SELECT hv & 63 AS reg,
                CASE WHEN (hv >> 6) = 0 THEN 55
                     ELSE 55 - length(bin(hv >> 6)) END AS rho FROM h),
        m AS (SELECT reg, max(rho) AS mx FROM r0 GROUP BY 1),
        z AS (SELECT count(*) AS n_regs,
               CAST(sum(1::BIGINT << (55 - mx)) AS BIGINT)
                 + (64 - count(*)) * (1::BIGINT << 55) AS zs FROM m)
        SELECT round(CASE WHEN CAST(0.709 AS DOUBLE) * 64 * 64
                 * CAST(1::BIGINT << 55 AS DOUBLE) / CAST(zs AS DOUBLE) <= 160.0
                 AND n_regs < 64
               THEN 64.0 * ln(64.0 / (64 - n_regs))
               ELSE CAST(0.709 AS DOUBLE) * 64 * 64
                 * CAST(1::BIGINT << 55 AS DOUBLE) / CAST(zs AS DOUBLE)
               END, 4) AS est FROM z)"""

  val oracle: Map[String, String] = Map(
    "table_profile" -> profileCols.map { case (n, d) =>
      graft.operators.Profile.profileSql("lineitem", n, d)
    }.mkString(" UNION ALL "),
    "privacy_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS k_size,
           count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END)
             AS l_diversity,
           (count(*) >= 5 AND
            count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END) >= 2)
             AS anonymous
         FROM customer GROUP BY 1, 2""",
    "privacy_pseudonymize" ->
      """SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(DISTINCT substr(md5('salt-2024:' || CAST(user_id AS VARCHAR)),
             1, 16)) AS n_pseudonyms,
           count(DISTINCT user_id) = count(DISTINCT
             substr(md5('salt-2024:' || CAST(user_id AS VARCHAR)), 1, 16))
             AS lossless
         FROM events GROUP BY 1""",
    "privacy_generalization_ladder" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment, n_regionkey,
             CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END sv
           FROM customer JOIN nation ON c_nationkey = n_nationkey),
         l0 AS (SELECT count(*) k, count(DISTINCT sv) l FROM c
                GROUP BY c_nationkey, c_mktsegment),
         l1 AS (SELECT count(*) k, count(DISTINCT sv) l FROM c
                GROUP BY n_regionkey, c_mktsegment),
         l2 AS (SELECT count(*) k, count(DISTINCT sv) l FROM c
                GROUP BY c_mktsegment)
         SELECT 'nation_segment' AS level, count(*) n_classes,
           CAST(min(k) AS BIGINT) min_k,
           round(CAST(SUM(CASE WHEN k >= 5 AND l >= 2 THEN k ELSE 0 END)
             AS DOUBLE) / SUM(k), 6) anon_share FROM l0
         UNION ALL
         SELECT 'region_segment', count(*), CAST(min(k) AS BIGINT),
           round(CAST(SUM(CASE WHEN k >= 5 AND l >= 2 THEN k ELSE 0 END)
             AS DOUBLE) / SUM(k), 6) FROM l1
         UNION ALL
         SELECT 'segment', count(*), CAST(min(k) AS BIGINT),
           round(CAST(SUM(CASE WHEN k >= 5 AND l >= 2 THEN k ELSE 0 END)
             AS DOUBLE) / SUM(k), 6) FROM l2""",
    "privacy_dp_count" ->
      graft.operators.Profile.dpCountsSql("event_type", 1.0, "events"),
    "profile_key_skew" ->
      """WITH c AS (SELECT CAST(o_custkey AS VARCHAR) k, count(*) cnt
              FROM orders GROUP BY 1),
         t AS (SELECT CAST(SUM(cnt) AS BIGINT) total FROM c),
         top AS (SELECT k, cnt FROM c ORDER BY cnt DESC, k ASC LIMIT 25),
         r AS (SELECT k, cnt,
                CAST(row_number() OVER (ORDER BY cnt DESC, k ASC) AS INT) rnk,
                CAST(SUM(cnt) OVER (ORDER BY cnt DESC, k ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
               FROM top)
         SELECT rnk, k AS "key", cnt, (cnt * 1000000) // total AS share_ppm,
           (cum * 1000000) // total AS cum_ppm FROM r, t""",
    "q_join_cardinality_est" ->
      s"""WITH el AS ${hllEstSql("orders", "o_custkey")},
         er AS ${hllEstSql("customer", "c_custkey")},
         nl AS (SELECT count(*) n_left FROM orders),
         nr AS (SELECT count(*) n_right FROM customer),
         ar AS (SELECT count(*) actual_rows FROM orders
                JOIN customer ON o_custkey = c_custkey)
         SELECT n_left, n_right, el.est AS d_left_est, er.est AS d_right_est,
           round(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE) /
             greatest(el.est, er.est), 4) AS est_rows,
           actual_rows
         FROM nl, nr, el, er, ar""",
    "q_ivm_join_view" ->
      s"""SELECT o_custkey, count(*) AS n_items,
          ${dsumSql("l_extendedprice")} AS revenue
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1""",
    "table_checksum" ->
      (graft.operators.Profile.tableChecksumSql(
        "lineitem", profileCols.map(_._1), profileCols.toMap) + " UNION ALL " +
        graft.operators.Profile.tableChecksumSql(
          "orders", Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
          Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
            "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType))),
    "quality_constraint_report" ->
      """SELECT 'lineitem.quantity_in_1_50' AS check_name, COUNT(*) AS n_checked,
           CAST(COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT)
             AS n_violations,
           COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) = 0 AS pass
         FROM lineitem
         UNION ALL
         SELECT 'lineitem.discount_in_0_0.1', COUNT(*),
           CAST(COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END) = 0
         FROM lineitem
         UNION ALL
         SELECT 'orders.orderkey_unique', COUNT(*),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
         FROM orders
         UNION ALL
         SELECT 'orders.totalprice_positive', COUNT(*),
           CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT),
           COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0
         FROM orders
         UNION ALL
         SELECT 'customer.acctbal_not_null', COUNT(*),
           CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
           COUNT(*) = COUNT(c_acctbal)
         FROM customer
         UNION ALL
         SELECT 'lineitem.orderkey_fk_orders', CAST(NULL AS BIGINT),
           CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderkey IS NULL
         UNION ALL
         SELECT 'customer.nationkey_fk_nation', CAST(NULL AS BIGINT),
           CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
         FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE n.n_nationkey IS NULL""",
    "q_skyline_pareto" ->
      """WITH p AS (SELECT DISTINCT CAST(p_retailprice AS DECIMAL(12,2)) x,
             CAST(p_size AS INT) y FROM part)
         SELECT CAST(x AS DOUBLE) AS x, y FROM p a
         WHERE NOT EXISTS (SELECT 1 FROM p b
           WHERE b.x <= a.x AND b.y <= a.y AND (b.x < a.x OR b.y < a.y))""",
    "q_merge_upsert" ->
      """WITH tgt AS (SELECT c_custkey mkey, CAST(c_acctbal AS DECIMAL(12,2)) bal
           FROM customer WHERE c_custkey <= 1000),
         src AS (SELECT o_custkey mkey,
                  SUM(CAST(o_totalprice AS DECIMAL(12,2))) spend
                 FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
         SELECT mkey,
           CAST(CASE WHEN bal IS NULL THEN spend
                     WHEN spend IS NULL THEN bal
                     ELSE bal + spend END AS DOUBLE) AS bal,
           CASE WHEN bal IS NULL THEN 'insert'
                WHEN spend IS NULL THEN 'keep'
                ELSE 'update' END AS action
         FROM tgt FULL OUTER JOIN src USING (mkey)
         WHERE NOT (bal IS NOT NULL AND spend IS NOT NULL AND spend > 500000)""",
    "q_histogram_equidepth" -> {
      val bs = (1 to 7).map(i => s"quantile_disc(x, 0.${125 * i}) b$i").mkString(", ")
      val cmp = (1 to 7).map(i => s"CAST(x > b$i AS INT)").mkString(" + ")
      s"""WITH v AS (SELECT CAST(l_extendedprice AS DECIMAL(12,2)) x FROM lineitem),
          b AS (SELECT $bs FROM v)
          SELECT 1 + $cmp AS bucket, count(*) AS n,
            CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
          FROM v, b GROUP BY 1"""
    },
    "q1_pricing_summary" -> q1Sql,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           1 AS within_bound
         FROM lineitem GROUP BY l_returnflag""",
    "q6_filter_pushdown" ->
      s"""SELECT CAST(SUM(${moneySql("l_extendedprice")} * ${factorSql("l_discount")}) AS DOUBLE) AS revenue, COUNT(*) AS n
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_discount >= 0.02 AND l_discount <= 0.09 AND l_quantity < 25""",
    "q_join_broadcast_dims" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${dsumSql("c_acctbal")} AS sum_bal
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name""",
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate,
            CAST(SUM(${moneySql("l_extendedprice")} * ${factorSql("1.0 - l_discount")}) AS DOUBLE) AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY revenue DESC, l_orderkey ASC
          LIMIT 10""",
    "q5_local_supplier_volume" ->
      s"""SELECT n_name, CAST(SUM(${moneySql("l_extendedprice")} * ${factorSql("1.0 - l_discount")}) AS DOUBLE) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY n_name""",
    "q_topk_custom_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q_window_topn_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q_skew_salted_agg" ->
      s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
          FROM lineitem GROUP BY l_returnflag""",
    "q_join_salted_skew" ->
      s"""WITH dim AS (SELECT DISTINCT o_orderpriority,
              CAST(length(o_orderpriority) AS INTEGER) AS plen FROM orders)
          SELECT o_orderpriority, COUNT(*) AS n,
            ${dsumSql("o_totalprice")} AS sum_price, MAX(plen) AS plen
          FROM orders JOIN dim USING (o_orderpriority)
          GROUP BY o_orderpriority""",
    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem""",
    "q_window_range_interval" ->
      """SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS tus,
           CAST(count(*) OVER w AS BIGINT) AS n_last_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
             AS rev_last_30d
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
                      RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)""",
    "q_window_range_frame" ->
      """WITH e AS (SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS tsec, value
           FROM events)
         SELECT event_id, user_id, tsec,
           COUNT(*) OVER w AS n_10m,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_10m
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY tsec
                      RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""",
    "q_window_percentiles" ->
      """SELECT event_id, event_type, value,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""",
    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
          FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_join_null_safe" ->
      """WITH l AS (SELECT nullif(c_nationkey % 5, 4) k FROM customer),
         r AS (SELECT nullif(s_nationkey % 5, 4) k2 FROM supplier)
         SELECT k, count(*) AS n_pairs
         FROM l JOIN r ON k IS NOT DISTINCT FROM k2
         GROUP BY 1""",
    "q_set_ops_all" ->
      """WITH c AS (SELECT c_nationkey AS nk FROM customer),
         s AS (SELECT s_nationkey AS nk FROM supplier),
         i AS (SELECT nk, count(*) n_inter FROM (
                 SELECT nk FROM c INTERSECT ALL SELECT nk FROM s)
               GROUP BY 1),
         x AS (SELECT nk, count(*) n_exc FROM (
                 SELECT nk FROM c EXCEPT ALL SELECT nk FROM s)
               GROUP BY 1)
         SELECT nk, coalesce(n_inter, 0) AS n_inter, coalesce(n_exc, 0) AS n_exc
         FROM i FULL OUTER JOIN x USING (nk)""",
    "q_set_ops" ->
      """SELECT DISTINCT nk FROM (
           SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier
           UNION
           (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier))""",
    "q_distinct_agg" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_suppkey""",
    "q_distinct_agg_fast" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_suppkey""",
    "q_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
          FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""",
    "q_scalar_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, CAST(length(p_name) AS INT) AS name_len,
               substr(p_type, 1, 3) AS type3,
               concat_ws('|', p_brand, p_type) AS brand_type,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
               CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M' ELSE 'S' END AS size_class
         FROM part""",
    "q_groupjoin" ->
      """SELECT c_custkey, max_order FROM customer
         JOIN (SELECT o_custkey, MAX(o_totalprice) AS max_order
               FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
         WHERE max_order > c_acctbal""",
  )
}
