package killa.mine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining over basket-shaped data (the Elasticsearch
  * `frequent_item_sets` aggregation, size-2, computed EXACTLY — ES itself
  * approximates via sampling): which items co-occur in at least `minSupport`
  * baskets? Over transcripts the natural baskets are conversations and the
  * items their distinct terms (or tools, or roles) — "which APIs are used
  * together", the workload-discovery query next to significant_terms.
  *
  * The reference has no aggregation layer at all (its only read is exact
  * set-membership, Searcher.cs:16-23); this sits in the engine's capability
  * layer like the rest of the agg family.
  */
object Itemsets {

  /** Exact frequent co-occurring pairs with Apriori pruning.
    *
    * Scale shape (downward closure: a pair can be frequent only if BOTH
    * members are): pass 1 folds per-item support map-side-combinably and
    * keeps items with support ≥ minSupport; that frequent-item set joins
    * back as a broadcast semi-join filter (it is bounded by corpus/minSupport
    * — at any fixed support FRACTION it is a constant-size dictionary, never
    * corpus-sized); pass 2 folds surviving items per basket (shuffle 1,
    * sorted sets for determinism), expands pairs with two codegen explodes
    * bounded per basket by that basket's FREQUENT-item count, and folds pair
    * supports (shuffle 2). No all-pairs self-join of the raw item table ever
    * runs, and nothing unbounded reaches the driver.
    *
    * @param baskets    (idCol, itemCol) rows; duplicates within a basket
    *                   collapse (set semantics, the ES contract).
    * @param minSupport minimum number of baskets a pair must co-occur in.
    * @param k          result cap.
    * @return (item_a, item_b, support) with item_a < item_b, ordered
    *         support desc then pair asc — a deterministic total order.
    */
  def frequentItemPairs(baskets: DataFrame, idCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1L, "minSupport must be >= 1")
    val items = baskets
      .select(col(idCol).as("__b"), col(itemCol).cast("string").as("__i"))
      .where(col("__i").isNotNull)
      .distinct()
    val frequent = items.groupBy("__i").agg(count(lit(1)).as("__s"))
      .where(col("__s") >= minSupport).select("__i")
    val surviving = items.join(broadcast(frequent), "__i")
    surviving
      .groupBy("__b").agg(sort_array(collect_set(col("__i"))).as("__items"))
      .select(col("__items"), explode(col("__items")).as("item_a"))
      .select(col("item_a"), explode(col("__items")).as("item_b"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item_a").asc, col("item_b").asc)
      .limit(k)
  }
}
