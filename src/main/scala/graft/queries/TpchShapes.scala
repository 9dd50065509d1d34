package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining classic TPC-H query shapes, adapted to the testdata star
  * schema: disjunctive multi-predicate scans (Q19), conditional-ratio aggs
  * (Q12/Q14), correlated aggregate subqueries (Q2/Q17/Q22 style), and
  * having-over-join (Q18). All Catalyst built-ins with the exact-decimal
  * money arithmetic from [[Tables]]. */
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

    // Q22 shape: customers above the global average balance with no LARGE
    // orders (correlated NOT EXISTS; scalar subquery for the average)
    "q22_idle_balances" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").where(col("o_totalprice") > 300000)
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("ab"))
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .crossJoin(avgBal)
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
