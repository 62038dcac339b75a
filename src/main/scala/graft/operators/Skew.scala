package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (100 TB toolbox; complements AQE's
  * runtime skew-join splitting, which only triggers on sort-merge joins
  * past size thresholds).
  *
  * Classic salting: the skewed (large) side gets a random salt in
  * [0, buckets); the small side is replicated `buckets` times; the join key
  * becomes (key, salt). One hot key's rows spread over `buckets` tasks at
  * the cost of replicating the other side — use when one side is small
  * enough to replicate but too big (or too skew-correlated) to broadcast.
  */
object Skew {

  /** Salted inner/left equi-join of `skewed` with `small` on `keys`.
    * Deterministic salt (hash of the whole skewed row, not rand()) so
    * retried tasks produce identical output — rand() would break
    * speculative execution and recomputed lineage. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-k heavy-hitter keys with their frequencies — the driver-side
    * planning aid for choosing what to salt/broadcast-isolate. */
  def heavyHitters(df: DataFrame, keys: Seq[String], k: Int): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc)
      .limit(k)

  /** `(hottest key's row count, total rows)` — the two numbers the
    * hot-key crossover arithmetic needs, off one map-side-combined
    * aggregate (no key rows cross to the driver, just the two scalars). */
  def hotKeyStats(df: DataFrame, keys: Seq[String]): (Long, Long) = {
    val r = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n")).as("__mx"), sum(col("__n")).as("__tot"))
      .head()
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  /** The measured engage rule for the per-key-window hot-key dials
    * (SURVEY §8 hot100 probe): a per-key window serializes the hottest
    * key's whole row set into ONE task — no AQE recourse, skew-join
    * splitting applies to joins only — so the sliced/aggregate rewrite
    * wins once that task's rows exceed the even per-slot share. Engage
    * when `maxKeyRows > costFactor · totalRows / slots`: `costFactor`
    * is the alternate path's pass count over the plain path's one
    * (1 for the time-sliced sessions rewrite — same single pass, finer
    * partitioning; `stages` for the funnel aggregate path, which scans
    * the pruned events once per stage — the round-13 auto sweep
    * measured the funnel dial at parity, not a win, when engaged at
    * factor 1 on a 91%-hot 11M-row corpus). Both routes are
    * contractually row-identical, so a borderline call costs only the
    * smaller of the two plans' overheads, never correctness. */
  def shouldEngageHotKeyDial(df: DataFrame, keys: Seq[String],
                             slots: Int = 0, costFactor: Int = 1): Boolean = {
    require(costFactor >= 1, s"costFactor must be >= 1, got $costFactor")
    val s = if (slots > 0) slots
            else df.sparkSession.sparkContext.defaultParallelism
    val (mx, tot) = hotKeyStats(df, keys)
    // compare without truncation: `tot / s` rounds the per-slot share
    // DOWN to 0 whenever tot < slots, which would engage the rewrite on
    // every nonempty small frame on high-core machines (cost-only —
    // routes are row-identical — but the crossover should hold at small
    // row counts too). Doubles are exact here far beyond any realistic
    // probe (2⁵³ row·slot products).
    tot > 0 && mx.toDouble * s > costFactor.toDouble * tot
  }

  /** PARTIAL salting — the production skew pattern: only the top
    * `hotKeys` heavy-hitter keys route through the salted path (hot rows
    * spread over `buckets` tasks, hot small-side rows replicated); the
    * cold majority takes the plain equi-join and pays no replication at
    * all. Semantically the identity on the join result (q67's oracle is
    * the plain join). The heavy-hitter probe collects `hotKeys` key rows
    * to the driver — planning metadata, same class as IVF's centroids. */
  def hotKeySaltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                       buckets: Int, hotKeys: Int = 16,
                       joinType: String = "inner"): DataFrame = {
    // the hot/cold split preserves semantics only when unmatched rows can
    // come from the SKEWED side alone: a right/full join would re-emit
    // hot small-side rows null-extended from the cold branch (their
    // matches were routed to the hot branch) and `buckets`-times from the
    // replicated side
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"hotKeySaltedJoin supports inner/left joins only, got '$joinType'")
    val hot = heavyHitters(skewed, keys, hotKeys).select(keys.map(col): _*).collect()
    val hotPred = hot.toSeq
      .map(r => keys.map(k => col(k) <=> lit(r.getAs[Any](k))).reduce(_ && _))
      .reduceOption(_ || _).getOrElse(lit(false))
    val hotJoin = saltedJoin(skewed.filter(hotPred), small.filter(hotPred),
      keys, buckets, joinType)
    val coldJoin = skewed.filter(!hotPred).join(small, keys, joinType)
    hotJoin.unionByName(coldJoin)
  }
}
