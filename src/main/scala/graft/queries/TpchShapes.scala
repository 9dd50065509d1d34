package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining classic TPC-H query shapes, adapted to the testdata star
  * schema: disjunctive multi-predicate scans (Q19), conditional-ratio aggs
  * (Q12/Q14), correlated aggregate subqueries (Q2/Q17/Q22 style),
  * having-over-join (Q18), EXISTS semi-joins (Q4), 5-way join with
  * nation-pair disjunction (Q7), national market share over a 7-way join
  * (Q8), LIKE-filtered product profit by nation and year (Q9), top-N
  * aggregates (Q10), outer-join count distribution (Q13),
  * scalar-max-with-ties (Q15), and double-correlated sole-late-supplier
  * (Q21). All Catalyst built-ins with the exact-decimal money arithmetic
  * from [[Tables]]. */
object TpchShapes {
  import Tables._

  val defs: Map[String, Q] = Map(
    // Q12 shape: conditional counts by priority class after a range join
    "q12_priority_class" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
                   col("o_orderpriority") === "2-HIGH", 1).otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
                   col("o_orderpriority") =!= "2-HIGH", 1).otherwise(0)).as("low_line_count"))
    }),

    // Q14 shape: promo revenue ratio (conditional numerator / total)
    "q14_promo_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg((sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).cast(DoubleType) * 100.0 /
          sum(rev).cast(DoubleType)).as("promo_revenue_pct"))
    }),

    // Q17 shape: correlated aggregate — lineitems below 20% of the part's
    // average quantity (decorrelates to a join against a per-part agg)
    "q17_small_quantity_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val avgQ = l.groupBy(col("l_partkey").as("p_key"))
        .agg((davg(col("l_quantity")) * 0.2).as("qty_threshold"))
      l.join(avgQ, col("l_partkey") === col("p_key"))
        .where(col("l_quantity") < col("qty_threshold"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).cast(DoubleType).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // Q18 shape: large-volume orders (HAVING over a join aggregation)
    "q18_large_orders" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val big = l.groupBy(col("l_orderkey").as("k"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 150)
      o.join(big, o("o_orderkey") === col("k"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
    }),

    // Q19 shape: disjunction of conjunctive predicates across two tables
    "q19_disjunctive_predicates" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .where(
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#19" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 40)) ||
          (col("p_type") === "PROMO" && col("p_size").between(20, 50)))
        .agg(revSum(rev).as("revenue"), count(lit(1)).as("n"))
    }),

    // Q4 shape: EXISTS decorrelated to a left-semi join with a cross-table
    // date predicate (no l_commitdate in this schema — "late" = shipped
    // more than 60 days after the order date)
    "q4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // Q7 shape: 5-way join (lineitem-supplier-orders-customer-nation×2)
    // with a nation-pair disjunction and per-year revenue
    // Q2 shape: min-cost supplier per part WITHIN a region, keeping ties —
    // per-group argmin via a min-join (the testdata has no partsupp, so
    // supplier cost = the supplier's average sale price from lineitem)
    "q2_min_cost_supplier" -> ((s, dir) => {
      val euro = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val cost = t(s, dir, "lineitem")
        .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(davg(money(col("l_extendedprice"))).as("cost"))
      val minCost = cost.groupBy(col("pk")).agg(min(col("cost")).as("mc"))
      cost.join(minCost, "pk").where(col("cost") === col("mc"))
        .join(broadcast(euro), col("sk") === col("s_suppkey"))
        .select(col("pk").as("p_partkey"), col("s_name"), col("n_name"), col("cost"))
    }),

    // Q11 shape: important share — parts whose total sale value exceeds
    // 0.01% of the corpus total; value stays DECIMAL until the final cast
    // so the scalar-threshold compare is exact (v·10⁴ > total)
    "q11_important_share" -> ((s, dir) => {
      val pv = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(money(col("l_extendedprice"))).as("v"))
      val tot = pv.agg(sum(col("v")).as("t"))
      pv.crossJoin(broadcast(tot))
        .where(col("v") * 10000 > col("t"))
        .select(col("l_partkey"), col("v").cast(DoubleType).as("part_value"))
    }),

    // Q16 shape: supplier variety per part attribute group, excluding a
    // supplier denylist (NOT IN → anti join) — single distinct agg, no
    // Expand
    "q16_supplier_variety" -> ((s, dir) => {
      val excl = t(s, dir, "supplier").where(col("s_name").like("%1%"))
        .select(col("s_suppkey").as("xk"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").where(col("p_type") =!= "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(excl), col("l_suppkey") === col("xk"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q20 shape: excess-share shipments — suppliers who shipped MORE THAN
    // HALF of a part's 1996 volume (correlated fraction-of-group,
    // decorrelated to a two-level aggregate; the share test runs in exact
    // decimal, q·2 > total, so no float order noise anywhere)
    "q20_excess_shipments" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      val perPS = l.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("q"))
      val perP = perPS.groupBy(col("l_partkey"))
        .agg(sum(col("q")).as("tq"), count(lit(1)).as("n_supp"))
      perPS.join(perP, "l_partkey")
        .where(col("n_supp") > 1 && col("q") * 2 > col("tq"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_dominated_parts"))
    }),

    // Q8 shape: national market share — one nation's fraction of a
    // region's revenue for one part type, by order year (conditional
    // ratio over a 7-way join; all dims broadcast, one fact shuffle)
    "q8_market_share" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val p = t(s, dir, "part")
      val custNations = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("c_nkey"))
      val suppNations = n.select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      l.join(broadcast(p.where(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNations), col("c_nationkey") === col("c_nkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNations), col("s_nationkey") === col("s_nkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_2", rev).otherwise(lit(0)))
          .cast(DoubleType) / sum(rev).cast(DoubleType)).as("mkt_share"))
    }),

    // Q9 shape: product-type profit by supplier nation and year — LIKE
    // part filter, 5-way join, profit = revenue − cost·quantity (the
    // testdata has no partsupp, so unit cost is 60% of p_retailprice:
    // same shape, decimal-exact arithmetic)
    "q9_product_profit" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val p = t(s, dir, "part")
      val amount = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount")) -
        money(col("p_retailprice")) * factor(lit(0.6)) * money(col("l_quantity"))
      l.join(broadcast(p.where(col("p_name").like("%gear%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(amount).cast(DoubleType).as("sum_profit"))
    }),

    "q7_volume_shipping" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val n1 = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .where((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
               (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revSum(rev).as("revenue"))
    }),

    // Q10 shape: returned-item revenue, top 20 customers (agg + global
    // top-N with a deterministic tiebreak — plans as TakeOrderedAndProject)
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revSum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Q13 shape: customer order-count distribution — outer join (so
    // zero-order customers count) then a second aggregation over the counts
    "q13_customer_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
    }),

    // Q15 shape: top supplier by windowed revenue, TIES kept via a scalar
    // max subquery (broadcast 1-row cross join) instead of LIMIT 1
    "q15_top_supplier" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val rev = money(col("l_extendedprice")) * factor(lit(1.0) - col("l_discount"))
      val revenue = l
        .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
               col("l_shipdate") < lit("1996-07-01").cast(TimestampType))
        .groupBy(col("l_suppkey")).agg(revSum(rev).as("total_revenue"))
      revenue
        .crossJoin(broadcast(revenue.agg(max(col("total_revenue")).as("mx"))))
        .where(col("total_revenue") === col("mx"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
    }),

    // Q21 shape: suppliers who were the SOLE late supplier of a
    // multi-supplier order (EXISTS another supplier's item + NOT EXISTS
    // another late supplier's item, decorrelated to per-order distinct
    // counts; "late" = shipped > 90 days after the order date)
    "q21_sole_late_supplier" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val sup = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem")
        .join(o.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .cast(IntegerType))
      // two-level aggregate instead of two countDistinct in one agg: a
      // multi-distinct aggregate plans an Expand (×distincts data through
      // the shuffle); per-(order, supplier) max(late) then per-order
      // count/sum computes both distinct counts Expand-free, and the
      // (order, supplier) grain IS the culprit set (no later distinct)
      val pairs = l.groupBy(col("l_orderkey").as("k"), col("l_suppkey").as("sk"))
        .agg(max(col("late")).as("late"))
      val perOrder = pairs.groupBy(col("k"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late_supp"))
        .where(col("n_supp") > 1 && col("n_late_supp") === 1)
      pairs.where(col("late") === 1)
        .join(perOrder, Seq("k"))
        .join(broadcast(sup), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // Q22 shape: customers above the global average balance with no LARGE
    // orders (correlated NOT EXISTS; scalar subquery for the average)
    "q22_idle_balances" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 300000)
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("ab"))
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("ab"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    }),
  )

  private val revSql = s"${moneySql("l_extendedprice")} * ${factorSql("1.0 - l_discount")}"

  val oracle: Map[String, String] = Map(
    "q12_priority_class" ->
      """SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_linestatus""",
    "q14_promo_revenue" ->
      s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0 END) AS DOUBLE) * 100.0 /
            CAST(SUM($revSql) AS DOUBLE) AS promo_revenue_pct
          FROM lineitem JOIN part ON l_partkey = p_partkey""",
    "q17_small_quantity_revenue" ->
      s"""WITH avgq AS (
            SELECT l_partkey p_key,
              ${davgSql("l_quantity")} * 0.2 AS qty_threshold
            FROM lineitem GROUP BY l_partkey)
          SELECT CAST(${dsumSql("l_extendedprice")} / 7.0 AS DOUBLE) AS avg_yearly, COUNT(*) AS n
          FROM lineitem JOIN avgq ON l_partkey = p_key
          WHERE l_quantity < qty_threshold""",
    "q18_large_orders" ->
      s"""WITH big AS (
            SELECT l_orderkey k, ${dsumSql("l_quantity")} AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ${dsumSql("l_quantity")} > 150)
          SELECT o_orderkey, o_custkey, o_totalprice, total_qty
          FROM orders JOIN big ON o_orderkey = k""",
    "q19_disjunctive_predicates" ->
      s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue, COUNT(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
             OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
             OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50)""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",
    "q2_min_cost_supplier" ->
      s"""WITH es AS (SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'),
          sc AS (SELECT l_partkey pk, l_suppkey sk,
              ${davgSql(moneySql("l_extendedprice"))} AS "cost"
            FROM lineitem JOIN es ON l_suppkey = s_suppkey GROUP BY 1, 2),
          mc AS (SELECT pk, min("cost") mc FROM sc GROUP BY 1)
          SELECT pk AS p_partkey, s_name, n_name, "cost"
          FROM sc JOIN mc USING (pk) JOIN es ON sk = s_suppkey
          WHERE "cost" = mc""",
    "q11_important_share" ->
      s"""WITH pv AS (SELECT l_partkey, SUM(${moneySql("l_extendedprice")}) v
            FROM lineitem GROUP BY 1),
          t AS (SELECT SUM(v) t FROM pv)
          SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
          FROM pv, t WHERE v * 10000 > t""",
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type <> 'PROMO'
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%1%')
         GROUP BY 1, 2, 3""",
    "q20_excess_shipments" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) q
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1, 2),
         p AS (SELECT l_partkey, SUM(q) tq, COUNT(*) n_supp FROM ps GROUP BY 1)
         SELECT s_suppkey, s_name, COUNT(*) AS n_dominated_parts
         FROM ps JOIN p USING (l_partkey)
           JOIN supplier ON l_suppkey = s_suppkey
         WHERE n_supp > 1 AND q * 2 > tq
         GROUP BY 1, 2""",
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
            CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN $revSql ELSE 0 END) AS DOUBLE)
              / CAST(SUM($revSql) AS DOUBLE) AS mkt_share
          FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
          GROUP BY 1""",
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
            CAST(SUM($revSql - ${moneySql("p_retailprice")} * ${factorSql("0.6")} * ${moneySql("l_quantity")}) AS DOUBLE) AS sum_profit
          FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%gear%'
          GROUP BY 1, 2""",
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS INTEGER) AS l_year,
            CAST(SUM($revSql) AS DOUBLE) AS revenue
          FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
             OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
          GROUP BY 1, 2, 3""",
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
            CAST(SUM($revSql) AS DOUBLE) AS revenue
          FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
          GROUP BY 1, 2, 3, 4
          ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",
    "q13_customer_distribution" ->
      """WITH c_orders AS (
           SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
           FROM customer c LEFT JOIN
             (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
             ON c.c_custkey = o.o_custkey
           GROUP BY c.c_custkey)
         SELECT c_count, COUNT(*) AS custdist FROM c_orders GROUP BY c_count""",
    "q15_top_supplier" ->
      s"""WITH revenue AS (
            SELECT l_suppkey, CAST(SUM($revSql) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-07-01'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, total_revenue
          FROM revenue JOIN supplier ON l_suppkey = s_suppkey
          WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""",
    "q21_sole_late_supplier" ->
      """WITH le AS (
           SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         po AS (
           SELECT l_orderkey k, COUNT(DISTINCT l_suppkey) n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) n_late_supp
           FROM le GROUP BY 1),
         culprit AS (
           SELECT DISTINCT le.l_orderkey, le.l_suppkey
           FROM le JOIN po ON le.l_orderkey = po.k
           WHERE le.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1)
         SELECT s_name, COUNT(*) AS numwait
         FROM culprit JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name""",
    "q22_idle_balances" ->
      s"""WITH ab AS (SELECT ${davgSql("c_acctbal")} AS ab
                      FROM customer WHERE c_acctbal > 0)
          SELECT c_nationkey, COUNT(*) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
          FROM customer, ab
          WHERE c_acctbal > ab
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 300000)
          GROUP BY c_nationkey""",
  )
}
