package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair affinity (association-rule mining's counting
  * core): for every item pair co-occurring in at least `minSupport`
  * baskets, the co-count plus integer-exact confidence and lift — the
  * relational sibling of `text.Corpus.pmiCollocations` (adjacent token
  * pairs there, set co-occurrence within a basket here).
  *
  * Shape at scale: items are deduped per basket first (one aggregate-
  * style distinct), then the pair generation is a SELF-JOIN ON THE
  * BASKET KEY — the join fans out per basket as |items|², so the cost is
  * Σ|basket|², bounded by the max basket size (TPC-H order ≈ 7 lines;
  * carts and sessions are similarly capped in practice), never |items|×
  * |items| globally. The `itemA < itemB` predicate halves the fan-out
  * and canonicalizes pair order. A degenerate mega-basket (thousands of
  * items) is the operator's skew axis — cap or sample those upstream.
  *
  * Integer-exact readouts (q143 discipline — no float in the decision
  * path): with `n_b` total baskets, `c12` pair count, `c1`/`c2` item
  * basket-counts,
  *   - `lift_e6  = (c12 · n_b · 10⁶) div (c1 · c2)`  (>10⁶ ⇔ positively
  *     associated),
  *   - `conf_e6 = (c12 · 10⁶) div c1` (P(item2 | item1) scaled).
  * Caller keeps `c12 · n_b · 10⁶ < 2⁶³` — true until ~10¹² baskets. */
object Affinity {

  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long = 1L): DataFrame = {
    // persist the deduped basket-item table: FOUR consumers read it (both
    // self-join sides, the item counts, the basket count) — unpersisted,
    // the scan+distinct would run four times (the minhashCandidates
    // lesson); the nBaskets count doubles as the cache materializer, and
    // the ContextCleaner frees the blocks once the result is unreachable
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = items.select("__b").distinct().count()
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairs = items.select(col("__b"), col("__i").as("item1"))
      .join(items.select(col("__b"), col("__i").as("item2")), Seq("__b"))
      .filter(col("item1") < col("item2"))
      .groupBy(col("item1"), col("item2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minSupport)
    pairs
      .join(itemCounts.select(col("__i").as("item1"), col("__c").as("c1")), Seq("item1"))
      .join(itemCounts.select(col("__i").as("item2"), col("__c").as("c2")), Seq("item2"))
      // SQL `div`, not `/`: long/long in Spark is DOUBLE division, and
      // c12·n_b·10⁶ exceeds 2⁵³ long before it exceeds 2⁶³ — a float
      // detour would corrupt the low digits exactly where lift ties break
      .select(col("item1"), col("item2"), col("c12"), col("c1"), col("c2"),
        expr(s"c12 * ${nBaskets}L * 1000000L div (c1 * c2)").as("lift_e6"),
        expr("c12 * 1000000L div c1").as("conf_e6"))
  }
}
