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
    * Scale shape: the within-basket self-join is an equi-join on the
    * basket key, so candidate volume is Σ |basket|² — governed by basket
    * SIZE, not corpus size. `maxBasketSize` drops oversized baskets
    * before the join (bots/feeds/aggregator accounts in practice): the
    * size census is one map-side-combined count, and with the cap in
    * place no join key can fan out past cap² — the skew guard is
    * structural, not a salting afterthought. The support aggregate is a
    * two-phase count on the pair key. */
  def itemPairs(baskets: DataFrame, minSupport: Long,
                maxBasketSize: Long): DataFrame = {
    val d = baskets.select(col("basket"), col("item")).distinct()
    val sized = d.groupBy(col("basket")).agg(count(lit(1)).as("sz"))
      .where(col("sz") <= maxBasketSize)
      .select(col("basket"))
    val kept = d.join(sized, "basket")
    kept.as("x").join(kept.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
