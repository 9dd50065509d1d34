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
    val grouped = baskets.groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .where(size(col("items")) <= maxBasketSize && size(col("items")) >= 2)
    grouped
      .select(explode(flatten(transform(col("items"), (x, i) =>
        transform(slice(col("items"), i + lit(2), size(col("items"))),
          y => struct(x.as("a"), y.as("b"))))))
        .as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
