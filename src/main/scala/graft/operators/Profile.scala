package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the data-quality census a pipeline runs before it
  * trusts a new 100 TB drop: per column, row/null/distinct counts and a
  * normalized min/max rendering.
  */
object Profile {

  /** Engine-portable string rendering for min/max: integers and strings
    * verbatim, floating point via DECIMAL(18,2) (both engines render
    * decimals identically; raw double→string formatting differs), and
    * timestamps via an explicit pattern. */
  private def render(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.cast(DecimalType(18, 2)).cast(StringType)
    case _: TimestampType       => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _                      => c.cast(StringType)
  }

  /** One profile row per requested column: (column, n_rows, n_null,
    * n_distinct, min_v, max_v).
    *
    * Scale shape: one aggregate branch per column, each reading ONLY its
    * own column (columnar pruning makes C single-column passes the same
    * scanned bytes as one C-column pass), so the exact per-column distinct
    * is a plain two-phase aggregate — never the Expand-multiplied
    * multi-distinct a single combined aggregate would plan, whose blowup
    * is C× the corpus. Each branch's partial aggregate collapses
    * partitions to one row before the exchange; the union is
    * profile-sized. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.map { name =>
      val dt = byName(name)
      df.agg(
          count(lit(1)).as("n_rows"),
          count(when(col(name).isNull, lit(1))).as("n_null"),
          countDistinct(col(name)).as("n_distinct"),
          render(min(col(name)), dt).as("min_v"),
          render(max(col(name)), dt).as("max_v"))
        .select(lit(name).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionAll _)
  }

  /** Join/partition-key skew census — the pre-shuffle planning primitive
    * that decides whether a key needs salting or an AQE skew join: the
    * top-N heaviest keys with exact counts, integer parts-per-million
    * share, and the running cumulative share down the ranked list (a
    * cum_ppm that flattens early = a few keys own the shuffle).
    *
    * Scale shape: ONE map-side-combinable count aggregate (the exchange
    * carries one row per distinct key), then `orderBy.limit(topN)` plans
    * TakeOrderedAndProject — a map-side bounded top-k, never a global
    * sort — and the rank/cumulative window runs over those N rows only.
    * Share arithmetic is integer `DIV` (exact, engine-portable; no
    * floating division). Ties rank by key rendering ascending. */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key.cast(StringType).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("k").asc).limit(topN)
    // both windows sort the same N bounded rows (one partition by design)
    val order = Window.orderBy(col("cnt").desc, col("k").asc)
    top
      .withColumn("rnk", row_number().over(order))
      .withColumn("cum", sum(col("cnt")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rnk"), col("k").as("key"), col("cnt"),
        expr("cnt * 1000000L div total").as("share_ppm"),
        expr("cum * 1000000L div total").as("cum_ppm"))
  }

  /** Order-independent whole-table fingerprint — the migration-validation
    * primitive ("did the new engine load the same 100 TB the old one
    * had"): per row, the low 60 bits of md5 over a canonical `|`-joined
    * string rendering of the key columns; the table checksum is the exact
    * SUM of those row hashes (plus the row count), which no row order,
    * partitioning or partial-aggregation schedule can change. The sum
    * accumulates in DECIMAL(38,0) — 10^18-scale summands overflow an
    * int64 within ~10 rows' headroom at warehouse row counts, and ANSI
    * Spark would (correctly) refuse; 38 digits give 10^19 rows of margin.
    * Doubles enter via the [[profile]] DECIMAL(18,2) rendering so both
    * engines hash identical bytes. Output: (table_name, n_rows, checksum
    * STRING — decimal digits, engine-portable). */
  def tableChecksum(df: DataFrame, cols: Seq[String], label: String): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val rendered = cols.map(n => render(col(n), byName(n)))
    df.select(conv(substring(md5(concat_ws("|", rendered: _*)), 1, 15), 16, 10)
        .cast(DecimalType(38, 0)).as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).cast(StringType).as("checksum"))
      .select(lit(label).as("table_name"), col("n_rows"), col("checksum"))
  }

  /** POPULATION STABILITY INDEX drift audit — per group (source), the
    * PSI between the group's binned metric distribution and the REST of
    * the corpus: Σ_b (p_g − p_rest)·ln(p_g/p_rest). The industry-standard
    * scorecard drift monitor (PSI < 0.1 stable, 0.1–0.25 watch, > 0.25
    * drifted) — the binned, symmetrized-KL complement to [[ksDrift]]'s
    * sup-norm test: KS is sharpest on location shifts, PSI accumulates
    * mass re-allocation across ALL bins. Bins are fixed-width
    * (`floor(metric/width)`) and both distributions are Laplace-smoothed
    * with 0.5 pseudo-counts over the corpus's OCCUPIED bin universe, so
    * empty bins never produce ln(0) and the smoothing constant is shared
    * across engines exactly.
    *
    * Scale shape: ONE (group, bin) count aggregate bounds everything
    * after by |groups|·|bins| (bins are width-capped, never data-sized);
    * the dense grid is bins × group totals (a bounded census expansion),
    * the bin marginals reuse the same frame, and the corpus total is a
    * 1-row broadcast scalar. Determinism: counts are exact integers,
    * each bin's term is fixed-order IEEE on those integers (the
    * [[graft.operators.TextOps.sourceDivergence]] ln convention), one
    * final 6dp cut after the per-group sum.
    * Output: (g, n_g, psi, drifted = psi > 0.25). */
  def psiDrift(df: DataFrame, group: Column, metric: Column,
               binWidth: Int): DataFrame = {
    import graft.operators.Dedup.MaterializeSyntax
    val x = df.select(group.as("g"),
      floor(metric.cast(DoubleType) / binWidth).cast(LongType).as("b"))
    val cnt = x.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
      .materialized // feeds the grid, both marginals, and the bin universe
    val bins = cnt.groupBy(col("b")).agg(sum(col("c")).as("c_b"))
    val nb = bins.agg(count(lit(1)).cast(DoubleType).as("n_bins"),
      sum(col("c_b")).as("n_all"))
    val nSrc = cnt.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val dense = bins.crossJoin(nSrc)
      .join(cnt, Seq("g", "b"), "left")
      .select(col("g"), col("n_g"), col("c_b"),
        coalesce(col("c"), lit(0L)).as("c_gb"))
    val pg = (col("c_gb").cast(DoubleType) + lit(0.5)) /
      (col("n_g").cast(DoubleType) + lit(0.5) * col("n_bins"))
    val pr = ((col("c_b") - col("c_gb")).cast(DoubleType) + lit(0.5)) /
      ((col("n_all") - col("n_g")).cast(DoubleType) + lit(0.5) * col("n_bins"))
    dense.crossJoin(broadcast(nb)) // 1-row scalar, documented pattern
      .groupBy(col("g"), col("n_g"))
      // round-9 terms through DECIMAL(28,12) (the labelDiversity /
      // harmonicCentrality convention) so partition order can never flip
      // the final 6dp cut vs the DuckDB mirror
      .agg(round(sum(round((pg - pr) * log(pg / pr), 9)
          .cast(DecimalType(28, 12))).cast(DoubleType), 6).as("psi"))
      .select(col("g"), col("n_g"), col("psi"),
        (col("psi") > 0.25).as("drifted"))
  }

  /** DuckDB mirror of [[psiDrift]] (oracle builder); `groupExpr` and
    * `metricExpr` name the group / metric expressions over `table`. */
  def psiDriftSql(groupExpr: String, metricExpr: String, binWidth: Int,
                  table: String = "documents"): String =
    s"""WITH x AS (SELECT $groupExpr g,
            CAST(floor(CAST($metricExpr AS DOUBLE) / $binWidth) AS BIGINT) b
          FROM $table),
        cnt AS (SELECT g, b, count(*) c FROM x GROUP BY 1, 2),
        bins AS (SELECT b, CAST(SUM(c) AS BIGINT) c_b FROM cnt GROUP BY 1),
        nb AS (SELECT CAST(count(*) AS DOUBLE) n_bins,
                 CAST(SUM(c_b) AS BIGINT) n_all FROM bins),
        nsrc AS (SELECT g, CAST(SUM(c) AS BIGINT) n_g FROM cnt GROUP BY 1),
        dense AS (SELECT nsrc.g, nsrc.n_g, bins.c_b,
                    COALESCE(cnt.c, 0) c_gb
                  FROM bins CROSS JOIN nsrc
                  LEFT JOIN cnt ON cnt.g = nsrc.g AND cnt.b = bins.b),
        t AS (SELECT g, n_g,
               ((CAST(c_gb AS DOUBLE) + 0.5)
                  / (CAST(n_g AS DOUBLE) + 0.5 * n_bins)
                - (CAST(c_b - c_gb AS DOUBLE) + 0.5)
                  / (CAST(n_all - n_g AS DOUBLE) + 0.5 * n_bins))
               * ln(((CAST(c_gb AS DOUBLE) + 0.5)
                  / (CAST(n_g AS DOUBLE) + 0.5 * n_bins))
                / ((CAST(c_b - c_gb AS DOUBLE) + 0.5)
                  / (CAST(n_all - n_g AS DOUBLE) + 0.5 * n_bins))) term
              FROM dense, nb),
        s AS (SELECT g, n_g, round(CAST(SUM(CAST(round(term, 9)
                AS DECIMAL(28,12))) AS DOUBLE), 6) psi FROM t GROUP BY 1, 2)
        SELECT g, n_g, psi, psi > 0.25 AS drifted FROM s"""

  /** Two-sample KOLMOGOROV-SMIRNOV drift audit — per group (source),
    * the KS statistic between the group's metric distribution and the
    * REST of the corpus: sup_x |F_g(x) − F_rest(x)|. The
    * distribution-level drift test a curation pipeline runs on scalar
    * signals (token counts, quality scores) when mean/variance monitors
    * miss shape changes — a source whose docs bimodalize keeps its mean
    * while its KS against the rest jumps. `drifted` compares against
    * the α=0.05 large-sample critical value 1.358·√((n₁+n₂)/(n₁·n₂)).
    *
    * Scale shape: the census pattern — ONE (group, value) count
    * aggregate bounds everything after by DISTINCT metric values; both
    * step functions are cumulative windows over that census (the
    * global one unpartitioned but census-bounded), and the sup is
    * evaluated on the |groups|×|values| dense frame — grid × group
    * totals is a deliberate bounded expansion, never row-sized.
    * For CONTINUOUS metrics distinct-values ≈ corpus size and the
    * unpartitioned census window would become a global sort, so pass
    * `quantize = Some(q)`: the census key becomes the exact scaled
    * integer round(metric·10^q) — bounding the grid at 10^q·range rows
    * at ANY corpus size (the same mechanical bound [[rankAuc]] applies).
    * Quantization can only merge adjacent steps, perturbing the sup by
    * at most the mass within ±0.5·10^-q of each value. `None` (the
    * integer-metric path) keeps the raw cast — callers with integral
    * metrics pay no rounding at all.
    * Determinism: cums are exact integers; each row's F-difference is
    * fixed-order IEEE on those integers; max is order-independent;
    * one final 6dp cut. try_divide guards the group-is-the-whole-corpus
    * edge (n_rest = 0 → NULL ks, no crash).
    * Output: (g, n_g, ks, crit, drifted). */
  def ksDrift(df: DataFrame, group: Column, metric: Column,
              quantize: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val xKey = quantize match {
      // scaled-integer quantization (HALF_UP): both engines multiply the
      // SAME IEEE double by the same power of ten before rounding, so the
      // census keys match bit-for-bit across Spark and the oracle
      case Some(q) => round(metric.cast(DoubleType) *
        lit(math.pow(10, q).toLong)).cast(LongType)
      case None => metric.cast(LongType)
    }
    val x = df.select(group.as("g"), xKey.as("x"))
    val cnt = x.groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
    val gridW = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // census-bounded unpartitioned cum (distinct metric values)
    val grid = cnt.groupBy(col("x")).agg(sum(col("c")).as("c_all"))
      .withColumn("cum_all", sum(col("c_all")).over(gridW))
      .select(col("x"), col("cum_all"))
    val nSrc = cnt.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val nAll = x.agg(count(lit(1)).as("n_all"))
    val srcW = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // dense |groups|×|values| frame: every group's step function carried
    // across the FULL grid (the sup lives at either function's jumps)
    val dense = grid.crossJoin(nSrc)
      .join(cnt, Seq("g", "x"), "left")
      .withColumn("cum_g", sum(coalesce(col("c"), lit(0L))).over(srcW))
    dense.crossJoin(broadcast(nAll)) // 1-row scalar, documented pattern
      .select(col("g"), col("n_g"), (col("n_all") - col("n_g")).as("n_rest"),
        abs(col("cum_g").cast(DoubleType) / col("n_g").cast(DoubleType) -
          try_divide((col("cum_all") - col("cum_g")).cast(DoubleType),
            (col("n_all") - col("n_g")).cast(DoubleType))).as("d"))
      .groupBy(col("g"), col("n_g"), col("n_rest"))
      .agg(round(max(col("d")), 6).as("ks"))
      .select(col("g"), col("n_g"), col("ks"),
        round(lit(1.358) * sqrt((col("n_g") + col("n_rest")).cast(DoubleType) /
          (col("n_g") * col("n_rest")).cast(DoubleType)), 6).as("crit"))
      .withColumn("drifted", col("ks") > col("crit"))
  }

  /** DuckDB mirror of [[ksDrift]] (oracle builder); `groupExpr` and
    * `metricExpr` name the group / metric expressions over `table`;
    * `quantize` must match the Spark call. */
  def ksDriftSql(groupExpr: String, metricExpr: String,
                 table: String = "documents",
                 quantize: Option[Int] = None): String = {
    val xExpr = quantize match {
      case Some(q) =>
        s"CAST(round(CAST($metricExpr AS DOUBLE) * ${math.pow(10, q).toLong}) AS BIGINT)"
      case None => s"CAST($metricExpr AS BIGINT)"
    }
    s"""WITH x AS (SELECT $groupExpr g, $xExpr x FROM $table),
        cnt AS (SELECT g, x, count(*) c FROM x GROUP BY 1, 2),
        grid AS (SELECT x, SUM(SUM(c)) OVER (ORDER BY x
                   ROWS UNBOUNDED PRECEDING) cum_all
                 FROM cnt GROUP BY x),
        nsrc AS (SELECT g, CAST(SUM(c) AS BIGINT) n_g FROM cnt GROUP BY 1),
        nall AS (SELECT count(*) n_all FROM x),
        dense AS (SELECT nsrc.g, nsrc.n_g, grid.x, grid.cum_all,
                   SUM(COALESCE(cnt.c, 0)) OVER (PARTITION BY nsrc.g
                     ORDER BY grid.x ROWS UNBOUNDED PRECEDING) cum_g
                  FROM grid CROSS JOIN nsrc
                  LEFT JOIN cnt ON cnt.g = nsrc.g AND cnt.x = grid.x),
        d AS (SELECT g, n_g, n_all - n_g n_rest,
               abs(CAST(cum_g AS DOUBLE) / CAST(n_g AS DOUBLE) -
                 CASE WHEN n_all - n_g = 0 THEN NULL
                   ELSE CAST(cum_all - cum_g AS DOUBLE)
                     / CAST(n_all - n_g AS DOUBLE) END) d
              FROM dense, nall),
        ks AS (SELECT g, n_g, n_rest, round(max(d), 6) ks
               FROM d GROUP BY 1, 2, 3)
        SELECT g, n_g, ks,
          round(1.358 * sqrt(CAST(n_g + n_rest AS DOUBLE)
            / CAST(n_g * n_rest AS DOUBLE)), 6) crit,
          ks > round(1.358 * sqrt(CAST(n_g + n_rest AS DOUBLE)
            / CAST(n_g * n_rest AS DOUBLE)), 6) drifted
        FROM ks"""
  }

  /** k-anonymity / l-diversity audit — the re-identification gate a
    * compliance pass runs before a table (or a training corpus's
    * metadata) ships: group by the quasi-identifier columns, report each
    * class's size (k) and its count of distinct sensitive values (l);
    * a class is safe when k ≥ minK and l ≥ minL (small classes
    * re-identify individuals, sensitive-homogeneous classes disclose
    * attributes even at large k).
    *
    * Scale shape: one exchange on the quasi-identifier key; the distinct
    * count is the standard two-phase distinct aggregate (no Expand —
    * single distinct column). Output is one row per equivalence class,
    * |QI-classes|-sized. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], sensitive: Column,
                 minK: Int, minL: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("k_size"),
        countDistinct(sensitive).as("l_diversity"))
      .withColumn("anonymous",
        col("k_size") >= minK && col("l_diversity") >= minL)

  /** Plan LINT — the engine's own PlanSpec scale guards productized for
    * user plans: inspect a DataFrame's physical plan for the shapes that
    * kill 100 TB jobs and return one row per hit (empty = clean). Checks:
    * cartesian products, nested-loop joins (fine only for the documented
    * broadcast-scalar/-query patterns — the lint surfaces them for a
    * human to confirm), and single-partition exchanges (a global
    * bottleneck unless the frame is provably tiny). Driver-side plan
    * analysis by design — nothing here touches data. */
  def planLint(df: DataFrame): DataFrame = {
    // simple mode keeps each node's arguments on its line ("Exchange
    // SinglePartition …"); formatted mode splits them into a detail block
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val rules = Seq(
      "cartesian-product" -> "CartesianProduct",
      "nested-loop-join" -> "BroadcastNestedLoopJoin",
      "single-partition-exchange" -> "Exchange SinglePartition")
    val hits = for {
      (issue, marker) <- rules
      line <- plan.linesIterator if line.contains(marker)
    } yield (issue, line.trim.take(120))
    val spark = df.sparkSession
    import spark.implicits._
    hits.toDF("issue", "plan_node")
  }

  /** ROC AUC of a score against a binary label via the Mann-Whitney
    * rank-sum identity — the threshold-free eval for any quality /
    * filter score ("does the score actually rank positives above
    * negatives"; 0.5 = chance): AUC = (U − n₊(n₊+1)) / (2·n₊·n₋) with
    * U = Σ_blocks n₊(block)·(2·cum_before + cnt + 1), average ranks for
    * tied scores carried as 2×-scaled INTEGERS so everything up to the
    * single final division is exact.
    *
    * Scale shape: one (score → counts) aggregate bounds all later work
    * by DISTINCT score values (the census pattern); the rank walk is one
    * cumulative window over that block frame; no per-row ranking of the
    * corpus anywhere. For CONTINUOUS scores distinct-values ≈ corpus size
    * and the unpartitioned census window would become a global sort, so
    * the score is QUANTIZED to `quantize` decimals (HALF_UP) before the
    * census — bounding the block frame at 10^quantize·range rows at any
    * corpus size. Tie handling: scores equal after quantization form one
    * tied block and receive the Mann-Whitney average rank (the standard
    * tie treatment); quantization can only merge blocks, shifting AUC by
    * at most the mass within ±0.5·10^-quantize of each score — at the
    * default 6 decimals, statistically invisible. Pass a coarser value
    * for scores with a wide range. Output: one row (n, n_pos, auc). */
  def rankAuc(df: DataFrame, score: Column, label: Column,
              quantize: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = df.select(round(score, quantize).as("s"),
        label.cast(IntegerType).as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("np_b"))
    val w = Window.orderBy(col("s"))
    blocks
      .withColumn("cumb", coalesce(sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(
        sum(col("np_b") * (lit(2) * col("cumb") + col("c") + 1)).as("u2"),
        sum(col("np_b")).as("n_pos"), sum(col("c")).as("n"))
      .select(col("n"), col("n_pos"),
        round((col("u2") - col("n_pos") * (col("n_pos") + 1)).cast(DoubleType) /
          (lit(2) * col("n_pos") * (col("n") - col("n_pos"))).cast(DoubleType), 6)
          .as("auc"))
  }

  /** The DuckDB mirror of [[tableChecksum]] (oracle builder). */
  def tableChecksumSql(table: String, cols: Seq[String],
                       dts: Map[String, DataType]): String = {
    val rendered = cols.map { n =>
      dts(n) match {
        case DoubleType | FloatType => s"CAST(CAST($n AS DECIMAL(18,2)) AS VARCHAR)"
        case _: TimestampType       => s"strftime($n, '%Y-%m-%d %H:%M:%S')"
        case _                      => s"CAST($n AS VARCHAR)"
      }
    }.mkString(", ")
    s"""SELECT '$table' AS table_name, count(*) AS n_rows,
        CAST(CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|', $rendered)), 1, 15))
          AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
        FROM $table"""
  }

  /** The DuckDB rendering of one [[profile]] branch (oracle builder). */
  def profileSql(table: String, column: String, dt: DataType): String = {
    def r(e: String) = dt match {
      case DoubleType | FloatType =>
        s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
      case _: TimestampType => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
      case _                => s"CAST($e AS VARCHAR)"
    }
    s"""SELECT '$column' AS "column", count(*) AS n_rows,
        count(CASE WHEN $column IS NULL THEN 1 END) AS n_null,
        count(DISTINCT $column) AS n_distinct,
        ${r(s"min($column)")} AS min_v, ${r(s"max($column)")} AS max_v
        FROM $table"""
  }

  /** GENERALIZATION LADDER — the k-anonymity REPAIR mechanism, not just
    * the audit: when a quasi-identifier level fails [[kAnonymity]], the
    * release pipeline coarsens it (nation→region→drop) and re-measures.
    * One row per ladder level with the numbers the release decision needs:
    * class count, worst-case k, and the share of rows already inside
    * anonymous classes (k ≥ minK AND l-diversity ≥ minL). Monotone
    * anon_share up the ladder = generalization is working.
    *
    * Scale shape: one exchange per level on that level's QI key (the
    * levels are separate aggregates over one scan each — at 100 TB,
    * levels can share a cube/rollup pass; kept separate here so each
    * level's plan is the plain [[kAnonymity]] shape). Output:
    * (level, n_classes, min_k, anon_share). */
  def generalizationLadder(df: DataFrame, levels: Seq[(String, Seq[String])],
                           sensitive: Column, minK: Int, minL: Int): DataFrame =
    levels.map { case (name, quasi) =>
      kAnonymity(df, quasi, sensitive, minK, minL)
        .agg(count(lit(1)).as("n_classes"),
          min(col("k_size")).as("min_k"),
          sum(when(col("anonymous"), col("k_size")).otherwise(lit(0L)))
            .as("anon_rows"),
          sum(col("k_size")).as("total_rows"))
        .select(lit(name).as("level"), col("n_classes"), col("min_k"),
          round(col("anon_rows").cast(DoubleType) / col("total_rows"), 6)
            .as("anon_share"))
    }.reduce(_ unionAll _)

  /** ε-DIFFERENTIALLY-PRIVATE released counts per group — the Laplace
    * mechanism (sensitivity 1 for a count), with the noise draw made
    * RETRY-REPRODUCIBLE the same way every sampler here is: the uniform
    * comes from md5(salt ‖ group), not an RNG, inverted through the
    * Laplace CDF (noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|)). A deterministic
    * draw is what a distributed release pipeline actually wants —
    * re-running the job must not spend fresh privacy budget or publish a
    * different number.
    *
    * PRIVACY WARNING — the salt IS the privacy: with a known (or empty)
    * salt anyone can recompute md5(salt ‖ group), invert the noise, and
    * recover the exact count — ε-DP holds ONLY if `salt` is a secret
    * drawn once per release and stored like a key. The default "" makes
    * the mechanism a reproducible DEMO (what the declared
    * `privacy_dp_count` query runs, because the engine's contract is
    * oracle-checkability), NOT a privacy guarantee. The true count `n`
    * rides along for the same reason; a real release drops it.
    *
    * Scale shape: one map-side-combinable count aggregate; the noise is a
    * per-GROUP projection over the |groups|-sized result — nothing about
    * the mechanism touches row volume.
    * Output: (g, n, noise, released). */
  def dpCounts(df: DataFrame, group: Column, epsilon: Double,
               salt: String = ""): DataFrame = {
    val u = conv(substring(md5(concat(lit(salt), col("g").cast(StringType))),
        1, 15), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(math.pow(2, 60))
    val c = u - lit(0.5)
    val noise = round(lit(-1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c)), 6)
    df.groupBy(group.as("g")).agg(count(lit(1)).as("n"))
      .select(col("g"), col("n"), noise.as("noise"),
        round(col("n") + noise, 6).as("released"))
  }

  /** DuckDB mirror of [[dpCounts]] (oracle builder); `groupExpr` names the
    * grouping expression over `table`. `salt` must match the Spark call
    * (and must NOT be a production secret — oracle SQL is not a vault). */
  def dpCountsSql(groupExpr: String, epsilon: Double,
                  table: String = "events", salt: String = ""): String =
    s"""WITH cnt AS (SELECT $groupExpr g, count(*) n FROM $table GROUP BY 1),
        h AS (SELECT g, n,
               CAST(('0x'||substr(md5('$salt' || CAST(g AS VARCHAR)),1,15))
                 AS BIGINT) / CAST(1152921504606846976 AS DOUBLE) u
              FROM cnt),
        z AS (SELECT g, n,
               round(CAST(${-1.0 / epsilon} AS DOUBLE) * sign(u - 0.5) *
                 ln(CAST(1.0 AS DOUBLE) - 2 * abs(u - 0.5)), 6) noise
              FROM h)
        SELECT g, n, noise, round(n + noise, 6) AS released FROM z"""
}
