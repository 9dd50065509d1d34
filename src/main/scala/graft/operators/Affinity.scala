package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence mining over baskets — the market-basket / "items bought
  * together" primitive (the pairwise candidate step of A-priori).
  */
object Affinity {

  /** Item pairs co-occurring in at least `minSupport` baskets. Input is a
    * (basket, item) incidence list; duplicates within a basket collapse
    * first. Output: (item_a, item_b, support), item_a < item_b.
    *
    * Scale shape: ONE exchange on the basket key folds each basket into
    * its sorted distinct item array (dedup, the size census and the skew
    * guard all ride that same aggregate — `maxBasketSize` drops
    * bot/feed/aggregator baskets before any pair exists), then pair
    * expansion is a per-row ordered-combinations projection — candidate
    * volume is Σ |basket|², governed by basket SIZE (≤ cap², structural,
    * not a salting afterthought), never corpus size — and the support
    * count is the second, pair-keyed exchange with map-side partials.
    * The former within-basket self-JOIN form paid two extra incidence
    * exchanges (distinct + census join) to reach the same candidates. */
  def itemPairs(baskets: DataFrame, minSupport: Long,
                maxBasketSize: Long): DataFrame = {
    val grouped = basketsAsItemSets(baskets, maxBasketSize)
    pairSupports(grouped).where(col("support") >= minSupport)
  }

  /** One exchange on the basket key: basket → sorted distinct item array,
    * size-capped (skew guard) and ≥ 2 (a singleton basket has no pairs). */
  private def basketsAsItemSets(baskets: DataFrame, maxBasketSize: Long): DataFrame =
    baskets.groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .where(size(col("items")) <= maxBasketSize && size(col("items")) >= 2)

  /** Ordered-combinations pair expansion + support count (see itemPairs). */
  private def pairSupports(grouped: DataFrame): DataFrame =
    grouped
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + lit(2), size(col("items"))),
          y => struct(x.as("a"), y.as("b"))))))
        .as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("support"))

  /** A-priori ASSOCIATION RULES from the pairwise supports: both
    * directions of every pair with `support ≥ minSupport`, scored by
    * confidence P(consequent | antecedent) and lift
    * P(a,b) / (P(a)·P(b)) — the "customers who bought X also buy Y"
    * output a recommender consumes directly.
    *
    * All probabilities are over the KEPT basket universe (2 ≤ |basket| ≤
    * cap): item supports, pair supports and the basket total all derive
    * from the one grouped frame, so the three quantities can never
    * disagree about which baskets count. Scale shape: the grouped frame
    * is computed once (one basket-keyed exchange) and feeds pair
    * expansion, the item-support explode and the 1-row basket total; the
    * item-support join keys on the single item id and the total joins as
    * a broadcast scalar. Output:
    * (antecedent, consequent, support, confidence, lift). */
  def associationRules(baskets: DataFrame, minSupport: Long,
                       maxBasketSize: Long): DataFrame = {
    val grouped = basketsAsItemSets(baskets, maxBasketSize)
    val pairs = pairSupports(grouped).where(col("support") >= minSupport)
    val itemSupport = grouped.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val total = grouped.agg(count(lit(1)).as("n_baskets"))
    val directed = pairs.select(
        col("item_a").as("antecedent"), col("item_b").as("consequent"), col("support"))
      .unionAll(pairs.select(
        col("item_b").as("antecedent"), col("item_a").as("consequent"), col("support")))
    directed
      .join(itemSupport.select(col("item").as("antecedent"), col("n_item").as("n_ant")),
        "antecedent")
      .join(itemSupport.select(col("item").as("consequent"), col("n_item").as("n_con")),
        "consequent")
      .crossJoin(broadcast(total)) // 1-row scalar, documented pattern
      .select(col("antecedent"), col("consequent"), col("support"),
        round(col("support").cast("double") / col("n_ant"), 6).as("confidence"),
        round(col("support").cast("double") * col("n_baskets") /
          (col("n_ant") * col("n_con")), 6).as("lift"))
  }
}
