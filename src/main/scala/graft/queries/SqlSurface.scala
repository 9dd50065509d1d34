package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extended relational surface: outer joins, date/string/JSON scalar
  * functions, exact percentiles, conditional aggregation, pivot, range
  * joins, and queries expressed through the SQL layer (temp views +
  * `spark.sql`) — GROUPING SETS and IN-subqueries, which the DataFrame API
  * doesn't expose directly. */
object SqlSurface {
  import Tables._

  /** Register the star schema as temp views for the SQL-layer queries. */
  private def registerViews(s: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  val defs: Map[String, Q] = Map(
    // LEFT OUTER: customers keep their row at zero orders (count skips null)
    "q_left_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // FULL OUTER with presence flags on both sides
    "q_full_outer_join" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nk2")).distinct()
      cn.join(sn, col("nk") === col("nk2"), "full")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          col("nk").isNotNull.as("has_customer"),
          col("nk2").isNotNull.as("has_supplier"))
    }),

    // date part extraction + truncation
    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          min(date_trunc("month", col("o_orderdate"))).as("month_start"))),

    // exact interpolated percentiles per group
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"))),

    // outlier winsorization: per-type exact p01/p99 bounds (3 groups —
    // always broadcast back), then a clip pass over the raw stream. The
    // training-data form of robust scaling: two aggregate rows per type
    // cross the exchange, the clip itself is a shuffle-free projection.
    "events_clip_outliers" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val bounds = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.01)"), 6).as("p01"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
      e.join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("p01")), col("p99")).as("clipped"))
    }),

    // robust anomaly detection: per-type median/IQR (outlier-immune, unlike
    // mean/stddev) broadcast into a shuffle-free scoring pass; rows with
    // |robust z| > 1.5 surface as anomalies
    "events_anomaly_robust" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val st = e.groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("med"),
          round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6).as("iqr"))
      // try_divide: a degenerate type (iqr = 0) scores NULL and filters
      // out — matching DuckDB's divide-by-zero-is-NULL, instead of the
      // ANSI DIVIDE_BY_ZERO error
      e.join(broadcast(st), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          round(try_divide(col("value") - col("med"), col("iqr")), 6).as("rz"))
        .where(abs(col("rz")) > lit(1.5))
    }),

    // deterministic A/B test report: assignment is the md5 parity of
    // user_id (no RNG — the same user lands in the same arm on every
    // engine and every rerun), metric = purchase value. One conditional
    // aggregation pass yields both arms' count/mean/variance and the
    // two-sample z-score — no pivot, no second scan, no shuffle beyond
    // the single 1-row aggregate
    "events_ab_test" -> ((s, dir) => {
      val e = t(s, dir, "events").where(col("event_type") === "purchase")
      val arm = pmod(graft.functions.keys.md5Prefix64(
        col("user_id").cast(StringType).cast(BinaryType), 7), lit(2L))
      val vdec = col("value").cast(DecimalType(18, 4))
      val a = e.select(arm.as("arm"), vdec.as("v"), (vdec * vdec).as("v2"))
        .agg(
          count(when(col("arm") === 0, 1)).as("n_c"),
          count(when(col("arm") === 1, 1)).as("n_t"),
          sum(when(col("arm") === 0, col("v"))).as("sv_c"),
          sum(when(col("arm") === 1, col("v"))).as("sv_t"),
          sum(when(col("arm") === 0, col("v2"))).as("sv2_c"),
          sum(when(col("arm") === 1, col("v2"))).as("sv2_t"))
      val meanC = col("sv_c").cast(DoubleType) / col("n_c")
      val meanT = col("sv_t").cast(DoubleType) / col("n_t")
      val varC = (col("sv2_c").cast(DoubleType) -
        col("sv_c").cast(DoubleType) * col("sv_c").cast(DoubleType) / col("n_c")) /
        (col("n_c") - 1)
      val varT = (col("sv2_t").cast(DoubleType) -
        col("sv_t").cast(DoubleType) * col("sv_t").cast(DoubleType) / col("n_t")) /
        (col("n_t") - 1)
      a.select(
        col("n_c").as("n_control"), col("n_t").as("n_treatment"),
        round(meanC, 6).as("mean_control"), round(meanT, 6).as("mean_treatment"),
        round(meanT - meanC, 6).as("lift"),
        round((meanT - meanC) / sqrt(varC / col("n_c") + varT / col("n_t")), 6)
          .as("z_score"))
    }),

    // SAMPLE-RATIO-MISMATCH guard for the same md5 arm assignment — the
    // chi-square check every experimentation platform runs BEFORE reading
    // the ab_test result (a biased split invalidates it): for a 50/50
    // design, chi2 collapses to (n_c−n_t)²/(n_c+n_t); df=1 critical value
    // 3.841. Assignment-level (distinct users), exact integers, one
    // division. One user-keyed distinct + a 1-row aggregate.
    "events_ab_srm" -> ((s, dir) => {
      val arm = pmod(graft.functions.keys.md5Prefix64(
        col("user_id").cast(StringType).cast(BinaryType), 7), lit(2L))
      t(s, dir, "events").select(col("user_id")).distinct()
        .select(arm.as("arm"))
        .agg(count(when(col("arm") === 0, 1)).as("n_c"),
          count(when(col("arm") === 1, 1)).as("n_t"))
        .select(col("n_c").as("n_control"), col("n_t").as("n_treatment"),
          // try_divide: an EMPTY events table gives n_c=n_t=0 and ANSI `/`
          // would throw DIVIDE_BY_ZERO (same class as events_funnel r3,
          // graph_assortativity r8); NULL chi2/flag is the correct read
          // of "no assignments to test"
          round(try_divide(((col("n_c") - col("n_t")) * (col("n_c") - col("n_t")))
            .cast(DoubleType), (col("n_c") + col("n_t"))), 6).as("chi2"),
          (try_divide(((col("n_c") - col("n_t")) * (col("n_c") - col("n_t")))
            .cast(DoubleType), (col("n_c") + col("n_t"))) > 3.841).as("srm_flag"))
    }),

    // CUPED variance-reduced A/B readout (Deng et al., WSDM'13) — the
    // adjustment every mature experimentation platform applies before
    // calling a result: per-user PRE-period purchase spend X (before the
    // fixed 2024-01-16 cutoff; md5-parity arm as events_ab_test) predicts
    // the post-period metric Y, and Y_adj = Y − θ(X − X̄) with
    // θ = cov(X,Y)/var(X) strips the predictable between-user variance.
    // Everything derives from SIX exact DECIMAL(38,0) moments over
    // per-user integer-cent sums (one user-keyed exchange + a 1-row
    // aggregate): θ, per-arm adjusted means via the algebraic identity
    // mean(Y_adj | arm) = Ȳ_arm − θ(X̄_arm − X̄), and the variance-
    // reduction ratio 1 − var(Y−θX)/var(Y) = ρ² — each output is a fixed
    // shape of double ops on exact integers, round-6, engine-identical.
    // try_divide: zero pre-period variance (or an empty table) reads NULL.
    "events_ab_cuped" -> ((s, dir) => {
      val cutoff = to_date(lit("2024-01-16"))
      val e = t(s, dir, "events").where(col("event_type") === "purchase")
      val arm = pmod(graft.functions.keys.md5Prefix64(
        col("user_id").cast(StringType).cast(BinaryType), 7), lit(2L))
      val cents = round(col("value") * 100).cast("bigint")
      val u = e.select(col("user_id"), cents.as("c"),
          (col("ts").cast("date") < cutoff).as("pre"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
          sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
      val dec = DecimalType(38, 0)
      val m = u.select(arm.as("arm"), col("x"), col("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sx2"),
          sum((col("y") * col("y")).cast(dec)).as("sy2"),
          count(when(col("arm") === 0, 1)).as("n_c"),
          count(when(col("arm") === 1, 1)).as("n_t"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L).cast(dec)).as("sx_c"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L).cast(dec)).as("sx_t"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L).cast(dec)).as("sy_c"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L).cast(dec)).as("sy_t"))
      val covN = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
      val varXN = (col("n") * col("sx2") - col("sx") * col("sx")).cast(DoubleType)
      val varYN = (col("n") * col("sy2") - col("sy") * col("sy")).cast(DoubleType)
      val theta = try_divide(covN, varXN)
      val xbar = col("sx").cast(DoubleType) / col("n") / 100
      def armMeanAdj(sy: Column, sx: Column, nArm: Column): Column =
        try_divide(sy.cast(DoubleType), nArm) / 100 -
          theta * (try_divide(sx.cast(DoubleType), nArm) / 100 - xbar)
      val meanC = armMeanAdj(col("sy_c"), col("sx_c"), col("n_c"))
      val meanT = armMeanAdj(col("sy_t"), col("sx_t"), col("n_t"))
      m.select(col("n_c").as("n_control"), col("n_t").as("n_treatment"),
        round(theta, 6).as("theta"),
        round(meanC, 6).as("mean_adj_control"),
        round(meanT, 6).as("mean_adj_treatment"),
        round(meanT - meanC, 6).as("lift_adj"),
        round(try_divide(covN * covN, varXN * varYN), 6).as("var_reduction"))
    }),

    // HETEROGENEOUS TREATMENT EFFECT readout — the per-segment lift table
    // (Qini-style) read AFTER the pooled ab_test: users decile-ranked by
    // PRE-period spend (the same X as events_ab_cuped), per decile the
    // arms' post-period means and lift. Whales and dormant users react
    // differently; the pooled lift hides that. The decile is the CENSUS
    // pattern — one (X value) count aggregate + a cumulative walk over
    // DISTINCT values, never a global per-user ntile sort; tied X values
    // share a decile by construction (exact integers end-to-end).
    "events_uplift_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cutoff = to_date(lit("2024-01-16"))
      val e = t(s, dir, "events").where(col("event_type") === "purchase")
      val arm = pmod(graft.functions.keys.md5Prefix64(
        col("user_id").cast(StringType).cast(BinaryType), 7), lit(2L))
      val cents = round(col("value") * 100).cast("bigint")
      val u = e.select(col("user_id"), cents.as("c"),
          (col("ts").cast("date") < cutoff).as("pre"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
          sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
      val cnt = u.groupBy(col("x")).agg(count(lit(1)).as("cx"))
      val cumW = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // census-bounded unpartitioned cum (distinct pre-spend values)
      val cum = cnt.withColumn("cum", sum(col("cx")).over(cumW))
      val n = u.agg(count(lit(1)).as("n"))
      val dec = cum.crossJoin(broadcast(n)) // 1-row scalar, documented pattern
        .select(col("x"),
          least(expr("(cum * 10 - 1) div n") + 1, lit(10L)).as("decile"))
      u.select(arm.as("arm"), col("x"), col("y"))
        .join(dec, "x")
        .groupBy(col("decile"))
        .agg(count(when(col("arm") === 0, 1)).as("n_control"),
          count(when(col("arm") === 1, 1)).as("n_treatment"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy_c"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy_t"))
        .select(col("decile"), col("n_control"), col("n_treatment"),
          round(try_divide(col("sy_c").cast(DoubleType), col("n_control")) / 100, 6)
            .as("mean_control"),
          round(try_divide(col("sy_t").cast(DoubleType), col("n_treatment")) / 100, 6)
            .as("mean_treatment"),
          round(try_divide(col("sy_t").cast(DoubleType), col("n_treatment")) / 100 -
            try_divide(col("sy_c").cast(DoubleType), col("n_control")) / 100, 6)
            .as("lift"))
    }),

    // POWER ANALYSIS — the sample-size calculation run BEFORE launching
    // the experiment the two queries above read out: per-arm n to detect
    // a 5%-of-mean lift at alpha=0.05 / power 0.80, n = 2(z_a+z_b)^2
    // sigma^2 / delta^2 with (1.959964 + 0.841621) folded to one literal
    // so both engines square the identical double. Moments are the same
    // exact DECIMAL(18,4) sums as events_ab_test; every output is a
    // fixed-shape double expression on them — ceil included, since
    // bit-identical inputs ceil identically. One scan, one 1-row agg.
    // Degenerate inputs yield NULL, never a throw: n <= 1 (variance
    // undefined) and mde = 0 (an all-zero purchase set) both route
    // through try_divide — mirrored in the oracle as NULLIF denominators.
    "events_power_analysis" -> ((s, dir) => {
      val e = t(s, dir, "events").where(col("event_type") === "purchase")
      val vdec = col("value").cast(DecimalType(18, 4))
      val a = e.select(vdec.as("v"), (vdec * vdec).as("v2"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"), sum(col("v2")).as("sv2"))
      val mean = try_divide(col("sv").cast(DoubleType), col("n"))
      val variance = try_divide(
        col("sv2").cast(DoubleType) -
          try_divide(col("sv").cast(DoubleType) * col("sv").cast(DoubleType), col("n")),
        col("n") - 1)
      val mde = mean * lit(0.05)
      a.select(col("n").as("n_obs"),
        round(mean, 6).as("mean"),
        round(variance, 6).as("variance"),
        round(mde, 6).as("mde_abs"),
        ceil(try_divide(
          lit(2.0) * (lit(2.801585) * lit(2.801585)) * variance, mde * mde))
          .cast(LongType).as("n_per_arm"))
    }),

    // approximate quantiles (Greenwald-Khanna sketch): estimates are
    // engine-specific, so — like q_approx_distinct — the DECLARED columns
    // are the exact percentiles plus an error-bound flag; the sketch runs
    // and is oracle-GATED (rank accuracy 1/1000 sits far inside the 5%
    // value band) without comparing engine-specific estimates
    "q_approx_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("aq"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("ap"))
        .select(col("l_returnflag"), col("median_qty"), col("p90_price"),
          (abs(col("aq") - col("median_qty")) <= col("median_qty") * 0.05 &&
           abs(col("ap") - col("p90_price")) <= col("p90_price") * 0.05)
            .cast(IntegerType).as("within_bound"))),

    // JSON column extraction (events.props is a JSON string)
    "q_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))),

    // string-function surface
    "q_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("padded"),
        translate(col("p_brand"), "#", "-").as("brand_t"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"))),

    // conditional aggregation
    "q_conditional_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
          sum(when(col("o_totalprice") > 200000,
            col("o_totalprice").cast(DecimalType(18, 4))).otherwise(lit(0)))
            .cast(DoubleType).as("big_total"),
          count(lit(1)).as("n"))),

    // composite equi + range join predicate
    "q_join_range" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate"))
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n_shipped_after"))
    }),

    // pivot: explicit value list ⇒ deterministic output columns
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))),

    // the inverse reshape: wide→long melt of the four lineitem measures.
    // Dataset.unpivot plans ONE Expand over a single scan (no
    // union-of-selects re-reading the table per measure — the union form
    // evaluates the upstream subtree once per branch); the rollup after it
    // keeps the declared output at 4 rows regardless of scale
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "mval")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), dsum(col("mval")).as("total"))),

    // time-decay smoothing (EWMA, alpha = 0.5) of each user's value
    // stream: the truncated 10-term form Σ_{j<10} α(1-α)^j·x_{t-j} is a
    // pure lag-chain projection over one per-user window — no iteration,
    // no state. Cross-engine determinism comes from integer fixed-point:
    // the 2-decimal value scales to cents (exact — double error on v·100
    // is ~1e-13, never near a rounding midpoint), the decay weights are
    // the integers 2^(9-j), and the single final division by 2^10·100
    // is one identical double op on identical integers, so no round()
    // is needed at all. Missing history zero-fills (the sum's early
    // terms), matching the oracle exactly.
    "events_ewma" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val cents = round(col("value") * 100).cast(LongType)
      val terms = (0 until 10).map(j =>
        lit(1L << (9 - j)) * coalesce(lag(cents, j).over(w), lit(0L)))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          (terms.reduceLeft(_ + _) / lit(102400.0)).as("ewma"))
    }),

    // window-function breadth: lag/lead offsets, dense_rank, ntile
    "q_window_lag_lead" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        dense_rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority").asc)).as("prio_rank"),
        ntile(4).over(w).as("quartile"))
    }),

    // SQL layer: GROUPING SETS (not expressible via the DataFrame API)
    "q_sql_grouping_sets" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    }),

    // SQL layer: GROUPING() disambiguation — the bit that tells a rollup
    // consumer whether a NULL cell means "aggregated over" or "was NULL
    // in the data"; same one-Expand plan as the grouping-sets query
    "q_sql_grouping_id" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    }),

    // SQL layer: IN / NOT IN subqueries
    "q_sql_in_subquery" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT c_custkey, c_name FROM customer
           WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
             AND c_acctbal > 5000""")
    }),

    // correlated EXISTS / NOT EXISTS — Catalyst rewrites the pair into a
    // semi-join plus an anti-join on o_custkey (two hash joins, no
    // per-row subquery execution), the plan shape that survives any scale
    "q_sql_exists_correlated" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT c_custkey, c_acctbal FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 200000)
             AND NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                               AND o_orderstatus = 'F')""")
    }),

    // SQL layer: scalar subquery in the projection
    "q_sql_scalar_subquery" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT r_name,
             (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS n_nations
           FROM region""")
    }),

    // SQL layer: the engine's native expressions callable from SQL
    "q_sql_custom_funcs" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      registerViews(s, dir)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      s.sql(
        """SELECT p_partkey, lower(hex(be_int4(p_size))) AS size_be FROM part
           WHERE p_size >= 0""")
    }),
    "q_sql_md5_prefix" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(
        """SELECT doc_id, md5_prefix64(CAST(text AS BINARY), 7) AS h
           FROM documents""")
    }),
    "q_sql_array_dot" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      s.sql(
        """SELECT vec_id,
             round(array_dot(CAST(embedding AS ARRAY<DOUBLE>),
                             CAST(embedding AS ARRAY<DOUBLE>)), 6) AS norm_sq
           FROM embeddings""")
    }),

    // SQL layer: NOT IN three-valued-logic semantics — one NULL in the
    // subquery empties the NOT IN result (x <> NULL is UNKNOWN for every
    // x), while the null-free variant anti-joins normally; both engines
    // must agree on the ANSI behavior, not just the happy path
    "q_sql_not_in_nulls" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT
             (SELECT count(*) FROM customer WHERE c_custkey NOT IN
               (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                            ELSE o_custkey END FROM orders)) AS n_with_null_semantics,
             (SELECT count(*) FROM customer WHERE c_custkey NOT IN
               (SELECT o_custkey FROM orders)) AS n_null_free""")
    }),

    // SQL layer: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — ancestor walk
    // over the implicit binary tree parent(n) = n div 2, a bounded
    // hierarchy traversal neither engine can express non-recursively
    // without unrolling
    "q_sql_recursive_cte" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """WITH RECURSIVE anc AS (
             SELECT CAST(n_nationkey AS BIGINT) AS node,
                    CAST(n_nationkey AS BIGINT) AS anc, 0 AS depth
             FROM nation
             UNION ALL
             SELECT node, anc div 2, CAST(depth + 1 AS INT) FROM anc WHERE anc > 0)
           SELECT node, max(depth) AS depth_to_root, count(*) AS chain_len
           FROM anc GROUP BY node""")
    }),

    // SQL layer: IGNORE NULLS window — forward-fill the last purchase
    // value across a user's event stream (LOCF over sparse observations),
    // the standard gap-fill idiom; one exchange + sort per user partition
    "q_window_ignore_nulls" -> ((s, dir) => {
      events(s, dir).createOrReplaceTempView("events")
      s.sql(
        """SELECT event_id, user_id,
             CASE WHEN event_type = 'purchase' THEN value END AS v,
             last_value(CASE WHEN event_type = 'purchase' THEN value END)
               IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
           FROM events""")
    }),

    // SQL layer: PIVOT — order status rotated into columns per priority
    // (count + exact decimal revenue per status); coalesce pins absent
    // (priority, status) cells to 0 so the shape is total at every SF.
    // Catalyst rewrites PIVOT into one conditional aggregate pass — the
    // same single exchange as the GROUP BY it replaces
    "q_sql_pivot" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT o_orderpriority,
             coalesce(o_n, 0) AS o_n, round(coalesce(o_rev, 0), 4) AS o_rev,
             coalesce(f_n, 0) AS f_n, round(coalesce(f_rev, 0), 4) AS f_rev,
             coalesce(p_n, 0) AS p_n, round(coalesce(p_rev, 0), 4) AS p_rev
           FROM (SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)
           PIVOT (count(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
                  FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))""")
    }),

    // SQL layer: UNPIVOT — the melt complement of PIVOT (three metric
    // columns rotated into (metric, val) rows); Catalyst plans Expand ×3,
    // which IS the operator here (the Expand guard whitelists it)
    "q_sql_unpivot" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT l_orderkey, l_linenumber, metric, val
           FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                        l_extendedprice, l_discount FROM lineitem)
           UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount))""")
    }),

    // SQL layer: correlated LATERAL subquery — per-customer top-2 orders
    // by price, the "top-n per key via lateral" idiom; inner lateral
    // drops order-less customers in both engines
    "q_sql_lateral" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
           FROM customer,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_custkey = c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
           WHERE c_custkey < 100""")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_sql_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q_sql_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
         FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
         FROM lineitem""",
    "q_sql_pivot" ->
      """SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_n,
           round(coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'O'
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0), 4) AS o_rev,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_n,
           round(coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'F'
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0), 4) AS f_rev,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_n,
           round(coalesce(CAST(SUM(CASE WHEN o_orderstatus = 'P'
             THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0), 4) AS p_rev
         FROM orders GROUP BY 1""",
    "q_left_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q_full_outer_join" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS nk2 FROM supplier)
         SELECT coalesce(nk, nk2) AS nationkey,
                nk IS NOT NULL AS has_customer,
                nk2 IS NOT NULL AS has_supplier
         FROM cn FULL OUTER JOIN sn ON nk = nk2""",
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
           COUNT(*) AS n, CAST(min(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS month_start
         FROM orders GROUP BY 1, 2""",
    "q_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",
    "q_approx_percentile" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price, 1 AS within_bound
         FROM lineitem GROUP BY l_returnflag""",
    "events_clip_outliers" ->
      """WITH b AS (SELECT event_type,
             round(quantile_cont(value, 0.01), 6) p01,
             round(quantile_cont(value, 0.99), 6) p99
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type, value,
           least(greatest(value, p01), p99) AS clipped
         FROM events e JOIN b USING (event_type)""",
    "events_anomaly_robust" ->
      """WITH st AS (SELECT event_type,
             round(quantile_cont(value, 0.5), 6) med,
             round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6) iqr
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type, value,
           round((value - med) / iqr, 6) AS rz
         FROM events e JOIN st USING (event_type)
         WHERE abs(round((value - med) / iqr, 6)) > 1.5""",
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         p AS (SELECT
             CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7)) AS BIGINT) % 2 arm
           FROM u),
         a AS (SELECT count(CASE WHEN arm = 0 THEN 1 END) n_c,
                      count(CASE WHEN arm = 1 THEN 1 END) n_t FROM p)
         SELECT n_c AS n_control, n_t AS n_treatment,
           round(CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t), 6)
             AS chi2,
           CAST((n_c - n_t) * (n_c - n_t) AS DOUBLE) / (n_c + n_t) > 3.841
             AS srm_flag
         FROM a""",
    "events_ab_cuped" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) c,
             CAST(ts AS DATE) < DATE '2024-01-16' pre
           FROM events WHERE event_type = 'purchase'),
         u AS (SELECT user_id,
                 SUM(CASE WHEN pre THEN c ELSE 0 END) x,
                 SUM(CASE WHEN NOT pre THEN c ELSE 0 END) y
               FROM e GROUP BY 1),
         p AS (SELECT
             CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7)) AS BIGINT) % 2 arm,
             x, y FROM u),
         m AS (SELECT count(*) n,
                 SUM(CAST(x AS HUGEINT)) sx,
                 SUM(CAST(y AS HUGEINT)) sy,
                 SUM(CAST(x * y AS HUGEINT)) sxy,
                 SUM(CAST(x * x AS HUGEINT)) sx2,
                 SUM(CAST(y * y AS HUGEINT)) sy2,
                 count(CASE WHEN arm = 0 THEN 1 END) n_c,
                 count(CASE WHEN arm = 1 THEN 1 END) n_t,
                 SUM(CASE WHEN arm = 0 THEN CAST(x AS HUGEINT) ELSE 0 END) sx_c,
                 SUM(CASE WHEN arm = 1 THEN CAST(x AS HUGEINT) ELSE 0 END) sx_t,
                 SUM(CASE WHEN arm = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) sy_c,
                 SUM(CASE WHEN arm = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) sy_t
               FROM p),
         d AS (SELECT *,
                 CAST(n * sxy - sx * sy AS DOUBLE) covn,
                 CAST(n * sx2 - sx * sx AS DOUBLE) varxn,
                 CAST(n * sy2 - sy * sy AS DOUBLE) varyn
               FROM m)
         SELECT n_c AS n_control, n_t AS n_treatment,
           round(covn / varxn, 6) AS theta,
           round(CAST(sy_c AS DOUBLE) / n_c / 100 - (covn / varxn) *
             (CAST(sx_c AS DOUBLE) / n_c / 100 - CAST(sx AS DOUBLE) / n / 100), 6)
             AS mean_adj_control,
           round(CAST(sy_t AS DOUBLE) / n_t / 100 - (covn / varxn) *
             (CAST(sx_t AS DOUBLE) / n_t / 100 - CAST(sx AS DOUBLE) / n / 100), 6)
             AS mean_adj_treatment,
           round((CAST(sy_t AS DOUBLE) / n_t / 100 - (covn / varxn) *
             (CAST(sx_t AS DOUBLE) / n_t / 100 - CAST(sx AS DOUBLE) / n / 100)) -
                 (CAST(sy_c AS DOUBLE) / n_c / 100 - (covn / varxn) *
             (CAST(sx_c AS DOUBLE) / n_c / 100 - CAST(sx AS DOUBLE) / n / 100)), 6)
             AS lift_adj,
           round(covn * covn / (varxn * varyn), 6) AS var_reduction
         FROM d""",
    "events_uplift_deciles" ->
      """WITH e AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) c,
             CAST(ts AS DATE) < DATE '2024-01-16' pre
           FROM events WHERE event_type = 'purchase'),
         u AS (SELECT user_id,
                 SUM(CASE WHEN pre THEN c ELSE 0 END) x,
                 SUM(CASE WHEN NOT pre THEN c ELSE 0 END) y
               FROM e GROUP BY 1),
         cnt AS (SELECT x, count(*) cx FROM u GROUP BY 1),
         cum AS (SELECT x, SUM(cx) OVER (ORDER BY x
                   ROWS UNBOUNDED PRECEDING) cum FROM cnt),
         n AS (SELECT count(*) n FROM u),
         dec AS (SELECT x, least((cum * 10 - 1) // n + 1, 10) decile
                 FROM cum, n),
         p AS (SELECT
             CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7)) AS BIGINT) % 2 arm,
             u.x, u.y, decile
           FROM u JOIN dec ON u.x = dec.x),
         a AS (SELECT decile,
                 count(CASE WHEN arm = 0 THEN 1 END) n_control,
                 count(CASE WHEN arm = 1 THEN 1 END) n_treatment,
                 SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) sy_c,
                 SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) sy_t
               FROM p GROUP BY 1)
         SELECT CAST(decile AS BIGINT) AS decile, n_control, n_treatment,
           round(CAST(sy_c AS DOUBLE) / n_control / 100, 6) AS mean_control,
           round(CAST(sy_t AS DOUBLE) / n_treatment / 100, 6) AS mean_treatment,
           round(CAST(sy_t AS DOUBLE) / n_treatment / 100
             - CAST(sy_c AS DOUBLE) / n_control / 100, 6) AS lift
         FROM a""",
    "events_power_analysis" ->
      """WITH p AS (SELECT CAST(value AS DECIMAL(18,4)) v,
             CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) v2
           FROM events WHERE event_type = 'purchase'),
         a AS (SELECT count(*) n, SUM(v) sv, SUM(v2) sv2 FROM p)
         SELECT n AS n_obs,
           round(CAST(sv AS DOUBLE) / NULLIF(n, 0), 6) AS mean,
           round((CAST(sv2 AS DOUBLE)
              - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / NULLIF(n, 0))
             / NULLIF(n - 1, 0), 6)
             AS variance,
           round(CAST(sv AS DOUBLE) / NULLIF(n, 0) * 0.05, 6) AS mde_abs,
           CAST(ceil(2.0 * (2.801585 * 2.801585)
             * ((CAST(sv2 AS DOUBLE)
                - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / NULLIF(n, 0))
               / NULLIF(n - 1, 0))
             / NULLIF((CAST(sv AS DOUBLE) / NULLIF(n, 0) * 0.05)
              * (CAST(sv AS DOUBLE) / NULLIF(n, 0) * 0.05), 0)) AS BIGINT)
             AS n_per_arm
         FROM a""",
    "events_ab_test" ->
      """WITH p AS (SELECT
             CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,7)) AS BIGINT) % 2 arm,
             CAST(value AS DECIMAL(18,4)) v,
             CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)) v2
           FROM events WHERE event_type = 'purchase'),
         a AS (SELECT
             count(CASE WHEN arm = 0 THEN 1 END) n_c,
             count(CASE WHEN arm = 1 THEN 1 END) n_t,
             SUM(CASE WHEN arm = 0 THEN v END) sv_c,
             SUM(CASE WHEN arm = 1 THEN v END) sv_t,
             SUM(CASE WHEN arm = 0 THEN v2 END) sv2_c,
             SUM(CASE WHEN arm = 1 THEN v2 END) sv2_t
           FROM p)
         SELECT n_c AS n_control, n_t AS n_treatment,
           round(CAST(sv_c AS DOUBLE)/n_c, 6) AS mean_control,
           round(CAST(sv_t AS DOUBLE)/n_t, 6) AS mean_treatment,
           round(CAST(sv_t AS DOUBLE)/n_t - CAST(sv_c AS DOUBLE)/n_c, 6) AS lift,
           round((CAST(sv_t AS DOUBLE)/n_t - CAST(sv_c AS DOUBLE)/n_c) /
             sqrt(((CAST(sv2_c AS DOUBLE)
                    - CAST(sv_c AS DOUBLE)*CAST(sv_c AS DOUBLE)/n_c)/(n_c - 1))/n_c
                + ((CAST(sv2_t AS DOUBLE)
                    - CAST(sv_t AS DOUBLE)*CAST(sv_t AS DOUBLE)/n_t)/(n_t - 1))/n_t),
             6) AS z_score
         FROM a""",
    "q_json_extract" ->
      """SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
         FROM events GROUP BY event_type""",
    "q_string_funcs" ->
      """SELECT p_partkey, split_part(p_name, ' ', 2) AS second_word,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
           translate(p_brand, '#', '-') AS brand_t,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           trim('  ' || p_type || ' ') AS trimmed
         FROM part""",
    "q_conditional_agg" ->
      """SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_totalprice > 200000
                    THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE) AS big_total,
           COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus""",
    "q_join_range" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, COUNT(*) AS n_shipped_after
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate
         GROUP BY 1""",
    "q_pivot" ->
      """SELECT o_orderpriority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS "F",
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS "O",
           CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS "P"
         FROM orders GROUP BY o_orderpriority""",
    "q_unpivot" ->
      s"""WITH m AS (
           SELECT 'l_quantity' AS measure, l_quantity AS mval FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT 'l_tax', l_tax FROM lineitem)
         SELECT measure, COUNT(*) AS n, ${dsumSql("mval")} AS total
         FROM m GROUP BY measure""",
    "events_ewma" -> {
      // the identical integer fixed-point chain: cents × 2^(9-j) weights,
      // one final double division — bit-exact without any round()
      val terms = (0 until 10).map { j =>
        s"${1L << (9 - j)} * COALESCE(lag(cents, $j) OVER w, 0)"
      }
      s"""WITH e AS (SELECT user_id, event_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events)
         SELECT user_id, event_id,
           (${terms.mkString(" + ")}) / 102400.0 AS ewma
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"""
    },
    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
           lag(o_totalprice, 1) OVER w AS prev_price,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority ASC) AS INT) AS prio_rank,
           CAST(ntile(4) OVER w AS INT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q_sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q_sql_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
           AND c_acctbal > 5000""",
    "q_sql_exists_correlated" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 200000)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderstatus = 'F')""",
    "q_sql_scalar_subquery" ->
      """SELECT r_name,
           (SELECT COUNT(*) FROM nation WHERE n_regionkey = r_regionkey) AS n_nations
         FROM region""",
    "q_sql_custom_funcs" ->
      """SELECT p_partkey, lower(lpad(to_hex(p_size), 8, '0')) AS size_be
         FROM part WHERE p_size >= 0""",
    "q_sql_md5_prefix" ->
      """SELECT doc_id, CAST(('0x'||substr(md5(text),1,7)) AS BIGINT) AS h
         FROM documents""",
    "q_sql_array_dot" ->
      """SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])), 6) AS norm_sq
         FROM embeddings""",
    "q_sql_not_in_nulls" ->
      """SELECT
           (SELECT count(*) FROM customer WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                          ELSE o_custkey END FROM orders)) AS n_with_null_semantics,
           (SELECT count(*) FROM customer WHERE c_custkey NOT IN
             (SELECT o_custkey FROM orders)) AS n_null_free""",
    "q_sql_recursive_cte" ->
      """WITH RECURSIVE anc AS (
           SELECT CAST(n_nationkey AS BIGINT) AS node,
                  CAST(n_nationkey AS BIGINT) AS anc, 0 AS depth
           FROM nation
           UNION ALL
           SELECT node, anc // 2, CAST(depth + 1 AS INT) FROM anc WHERE anc > 0)
         SELECT node, CAST(max(depth) AS INT) AS depth_to_root,
           count(*) AS chain_len
         FROM anc GROUP BY node""",
    "q_window_ignore_nulls" ->
      """SELECT event_id, user_id,
           CASE WHEN event_type = 'purchase' THEN value END AS v,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM events""",
    "q_sql_lateral" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
         FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
         WHERE c_custkey < 100""",
  )
}
