package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair affinity (association-rule mining's counting
  * core): for every item pair co-occurring in at least `minSupport`
  * baskets, the co-count plus integer-exact confidence and lift — the
  * relational sibling of `text.Corpus.pmiCollocations` (adjacent token
  * pairs there, set co-occurrence within a basket here).
  *
  * Shape at scale: ONE basket-keyed aggregate builds each basket's
  * sorted deduped item set (map-side-combined — the shuffle carries
  * sets, not rows), and the pair fan-out runs IN-TASK over that array
  * as |items|² per basket, so the cost is Σ|basket|², bounded by the
  * max basket size (TPC-H order ≈ 7 lines; carts and sessions are
  * similarly capped in practice), never |items|×|items| globally.
  * Ascending array order canonicalizes pairs (item1 < item2), halving
  * the fan-out. A degenerate mega-basket (thousands of items) is the
  * operator's skew axis — cap or sample those upstream. That contract
  * fails LOUD at the bound (round 17, the [[GridFence]] convention):
  * the pair fan-out builds all |b|·(|b|−1)/2 pair structs as ONE array
  * value per basket, so an unbounded mega-basket would hit the 2 GB
  * single-value / executor-heap wall with an opaque error; the fenced
  * basket column raises the contract message past `maxBasketItems`
  * instead (default 2¹² items ≈ 8.4M pair structs ≈ low hundreds of MB
  * in one value — far above any real cart, comfortably below the
  * cliff). Zero cost in-contract: one `size()` comparison per basket.
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
                   minSupport: Long = 1L,
                   maxBasketItems: Int = 1 << 12): DataFrame = {
    // ONE shuffle on the basket key builds the per-basket sorted item
    // set (collect_set partial-aggregates map-side, so the shuffle
    // carries per-partition deduped sets, not rows); dedup, the basket
    // count, the item counts, and the |basket|² pair fan-out all read
    // off that grouped frame IN-TASK — this replaces the former
    // distinct + self-join form, whose basket-keyed join exchanges and
    // separate distinct/count passes re-shuffled the row-scale table
    // four times. Persisted because three consumers derive from it; the
    // nBaskets count doubles as the cache materializer, and the
    // ContextCleaner frees the blocks once the result is unreachable.
    val baskets = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull && col("__i").isNotNull)
      .groupBy(col("__b"))
      .agg(array_sort(collect_set(col("__i"))).as("__is"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = baskets.count()
    val itemCounts = baskets.select(explode(col("__is")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    // ascending-sorted array makes position order the canonical
    // item1 < item2 order: pair element i with every later element.
    // The fence guards ONLY the quadratic fan-out path — item counts
    // explode linearly and stay unfenced.
    val fencedIs = when(size(col("__is")) <= lit(maxBasketItems), col("__is"))
      .otherwise(raise_error(lit(
        s"coOccurrence: basket exceeds $maxBasketItems items " +
          "(maxBasketItems) — cap or sample mega-baskets upstream")))
    val pairs = baskets
      .select(fencedIs.as("__is"))
      .select(explode(expr(
        """flatten(transform(__is, (x, i) ->
          |  transform(slice(__is, i + 2, size(__is)),
          |            y -> struct(x as item1, y as item2))))""".stripMargin))
        .as("__p"))
      .select(col("__p.item1"), col("__p.item2"))
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
