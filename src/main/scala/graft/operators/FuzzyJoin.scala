package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy key join (record linkage): match rows whose string keys agree
  * up to `maxDist` edits — the dedup/linkage primitive for keys that
  * went through humans (typos, OCR, transliteration) rather than
  * machines.
  *
  * A naive edit-distance join is a cross product with a DP kernel per
  * pair — O(|L|·|R|·len²), the first plan to die at corpus scale. This
  * operator uses BLOCKING, the standard record-linkage rewrite: a cheap
  * equality key (here the `prefixLen`-char prefix) partitions both
  * sides, an equi-join pairs only within blocks, and the exact
  * `levenshtein ≤ maxDist` predicate filters candidates. One hash
  * shuffle per side; the DP kernel runs on candidates only.
  *
  * RECALL CONTRACT (the documented blocking tradeoff): a pair whose
  * edits touch the first `prefixLen` characters lands in different
  * blocks and is MISSED. Sized right (3-4 chars) that is the classic
  * >95%-recall/1000x-cost point of record linkage; for higher recall,
  * union several blocking keys (prefix + phonetic + length band) — the
  * candidate union stays linear while the cross product never is. A
  * length pre-filter (`|len(a) − len(b)| ≤ maxDist`, a levenshtein
  * lower bound) prunes candidates before the DP kernel runs.
  *
  * SCALE CONTRACT: fixed-granularity blocks mean candidate mass
  * Σ_blocks |L_b|·|R_b| grows QUADRATICALLY with catalog size (measured
  * ×12,800 for ×100 catalogs, SURVEY r17) — right for a bounded
  * catalog, wrong for a growing corpus. [[byEditDistanceQGram]] is the
  * corpus-scale sibling: recall-COMPLETE and candidate-linear on
  * realistic key distributions. */
object FuzzyJoin {

  /** Output: left columns + right `payload` + `edit_dist` (int).
    * Both key columns must be non-null to match (SQL semantics). */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftCol: String, rightCol: String,
                     payload: Seq[String], maxDist: Int = 2,
                     prefixLen: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(payload.nonEmpty, "byEditDistance needs >= 1 payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    val reserved = Seq("__blk", "__rk", "edit_dist")
    val hits = (leftCols ++ payload).filter(reserved.contains)
    require(hits.isEmpty, s"columns $hits collide with reserved names")
    val par = left.sparkSession.sparkContext.defaultParallelism * 2
    val l = left.filter(col(leftCol).isNotNull)
      .withColumn("__blk", substring(col(leftCol), 1, prefixLen))
      .repartition(par, col("__blk"))
    val r = right.filter(col(rightCol).isNotNull)
      .select(payload.map(col) :+ col(rightCol).as("__rk"): _*)
      .withColumn("__blk", substring(col("__rk"), 1, prefixLen))
      .repartition(par, col("__blk"))
    val candidates = l.join(r, Seq("__blk"))
      // levenshtein lower bound: prune before the DP kernel runs
      .filter(abs(length(col(leftCol)) - length(col("__rk"))) <= maxDist)
      // EXPLOSIVE-JOIN REDISTRIBUTION: the join's INPUT is tiny (two
      // key-projected sides), so left to itself AQE coalesces its
      // shuffle to a couple of partitions — and then the candidate
      // EXPLOSION (~|block|² pairs) plus the DP kernel all run inside
      // those few tasks (AQE's cost model sizes partitions by input
      // bytes and cannot see the blow-up). Two countermeasures: the
      // explicit `repartition(par, __blk)` on each side above pins the
      // join's parallelism (AQE never coalesces a user-specified
      // partition count), and this round-robin redistribution of the
      // candidates balances the kernel across tasks even when one hot
      // block dominates the pair count. One extra shuffle bounded by
      // the candidate count, which the kernel cost dwarfs. (q139
      // contract query, sf0.1, 12.5M candidates: 20.8 s near-serial →
      // 3.0 s with both in place.)
      .repartition(par)
    candidates
      // THRESHOLDED kernel: the 3-arg form runs a banded DP — O(len·k)
      // cells instead of the full O(len²) table, abandoning a pair the
      // moment every band cell exceeds maxDist (returns −1). On a
      // coarse-blocked join where candidates are ~1000× the matches,
      // the kernel is the whole cost and the band is a ~7× cut; the
      // distance returned for surviving pairs is still exact.
      .withColumn("edit_dist", levenshtein(col(leftCol), col("__rk"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select(leftCols.map(col) ++ payload.map(col) :+ col("edit_dist"): _*)
  }

  /** All strings reachable from `s` by deleting at most `d` characters
    * (including `s` itself), deduplicated. Only ever called on strings
    * with fewer than `maxDist·q + 1` DISTINCT q-grams — short or
    * highly repetitive keys whose neighborhood stays small. The length
    * cap is the loud-contract fence: a long low-complexity key would
    * otherwise fan out O(len^d) variants per row. */
  private def deletionNeighborhood(s: String, d: Int, maxLen: Int): Array[String] = {
    if (s.length > maxLen)
      throw new IllegalArgumentException(
        s"byEditDistanceQGram: key '${s.take(32)}…' (${s.length} chars) has too few " +
          s"distinct q-grams for prefix filtering but exceeds the $maxLen-char " +
          "deletion-neighborhood cap — clean or truncate degenerate repetitive keys upstream")
    var cur = Set(s)
    val all = scala.collection.mutable.Set(s)
    var i = 0
    while (i < d) {
      cur = cur.flatMap(t => (0 until t.length).map(j =>
        t.substring(0, j) + t.substring(j + 1)))
      all ++= cur
      i += 1
    }
    all.toArray
  }

  /** EXACT fuzzy key join — recall-COMPLETE, unlike [[byEditDistance]]:
    * returns every (left, right) pair with `levenshtein ≤ maxDist`, with
    * no blocking recall loss, at candidate cost near-linear in realistic
    * key catalogs. [[byEditDistance]]'s fixed 3-char-prefix blocking is
    * the right dial for a bounded catalog (documented >95%-recall
    * tradeoff), but its candidate mass is Σ_blocks |L_b|·|R_b| over a
    * FIXED number of blocks — quadratic in corpus scale. This operator
    * is the corpus-scale dial: q-gram PREFIX FILTERING (the Ed-Join
    * family, Xiao/Wang/Lin VLDB'08): an edit destroys at most `q`
    * distinct q-grams, so two keys within `maxDist` edits share at least
    * `max(|G_a|,|G_b|) − maxDist·q` distinct grams; ordering every key's
    * gram set by GLOBAL ascending document frequency (ties by gram
    * value), any qualifying pair must collide on one of each side's
    * `maxDist·q + 1` RAREST grams. Candidates are pairs sharing a rare
    * gram — Σ over prefix grams of df_L·df_R, which self-tunes to the
    * corpus: common grams never become join keys.
    *
    * Keys with fewer than `maxDist·q + 1` distinct grams (short or
    * repetitive — the prefix bound is vacuous there) emit their FULL
    * gram set into the gram channel (covers low↔high pairs: the bound
    * from the high side alone forces any match to intersect the low
    * side's whole set) and additionally join a FastSS deletion-
    * neighborhood channel (covers low↔low pairs, where the gram count
    * bound can reach zero): `ed(a,b) ≤ d` implies a common string is
    * reachable by ≤ d deletions from each, so neighborhood-key equality
    * is a complete filter. Both channels feed one distinct candidate
    * set; the banded `levenshtein(_, _, maxDist)` kernel then decides
    * exactly — run once per DISTINCT key pair, with row payloads joined
    * back after (duplicate keys share one DP).
    *
    * Scale shape: two linear gram scans + one map-side-combined df
    * aggregate + rare-gram equi-joins; no fixed-granularity block whose
    * occupancy grows with the corpus. Adversarial all-near-equal-key
    * input degenerates to true-pair mass — output-bound, which no
    * complete join can beat. */
  def byEditDistanceQGram(left: DataFrame, right: DataFrame,
                          leftCol: String, rightCol: String,
                          payload: Seq[String], maxDist: Int = 2,
                          q: Int = 3, maxDelKeyLen: Int = 64): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    require(payload.nonEmpty, "byEditDistanceQGram needs >= 1 payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    val reserved = Seq("__a", "__b", "__rk", "edit_dist")
    val hits = (leftCols ++ payload).filter(reserved.contains)
    require(hits.isEmpty, s"columns $hits collide with reserved names")
    val pref = maxDist * q + 1
    val spark = left.sparkSession
    val par = spark.sparkContext.defaultParallelism * 2

    val la = left.filter(col(leftCol).isNotNull)
      .select(col(leftCol).as("__a")).distinct()
    val rb = right.filter(col(rightCol).isNotNull)
      .select(col(rightCol).as("__b")).distinct()

    // one row per (key, distinct gram); empty for len < q
    def grams(names: DataFrame, c: String): DataFrame =
      names.select(col(c), explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length($c) - ${q - 1}, 0)), " +
          s"i -> substring($c, i, $q))"))).as("__g"))
    val ga = grams(la, "__a")
    val gb = grams(rb, "__b")
    // global gram document frequency over BOTH catalogs of distinct keys
    // — the shared total order (df, gram) both prefixes sort by. The df
    // table is bounded by the q-gram space (charset^q — ~50k for ASCII
    // text, always map-side-combined small), so BROADCAST it: the
    // alternative shuffles every (key, gram) row just to attach one int
    val dfreq = ga.select(col("__g")).unionAll(gb.select(col("__g")))
      .groupBy("__g").agg(count(lit(1)).as("__df"))
    def prefixKeys(g: DataFrame, c: String): DataFrame =
      g.join(broadcast(dfreq), Seq("__g"))
        .groupBy(col(c))
        .agg(slice(array_sort(collect_list(struct(col("__df"), col("__g")))),
          1, pref).as("__p"))
        .select(col(c), explode(col("__p")).as("__pg"))
        .select(col(c), col("__pg.__g").as("__g"))
    val candGram = prefixKeys(ga, "__a").join(prefixKeys(gb, "__b"), Seq("__g"))
      .select(col("__a"), col("__b"))

    // low-gram channel: keys whose distinct-gram count leaves the prefix
    // bound vacuous join on deletion-neighborhood keys (complete for
    // low↔low; low↔high pairs are covered by the gram channel above)
    val delUdf = udf((s: String) => deletionNeighborhood(s, maxDist, maxDelKeyLen))
    def lowKeys(g: DataFrame, names: DataFrame, c: String): DataFrame =
      names.join(
          g.groupBy(col(c)).agg(count(lit(1)).as("__ng"))
            .filter(col("__ng") >= pref).select(col(c)),
          Seq(c), "left_anti")
        .select(col(c), explode(delUdf(col(c))).as("__g"))
    val candDel = lowKeys(ga, la, "__a").join(lowKeys(gb, rb, "__b"), Seq("__g"))
      .select(col("__a"), col("__b"))

    // one banded DP per distinct key pair (byEditDistance's explosive-
    // join redistribution rationale applies: pin kernel parallelism)
    val matches = candGram.unionAll(candDel).distinct()
      .filter(abs(length(col("__a")) - length(col("__b"))) <= maxDist)
      .repartition(par)
      .withColumn("edit_dist", levenshtein(col("__a"), col("__b"), maxDist))
      .filter(col("edit_dist") >= 0)
    left.join(matches, col(leftCol) === col("__a"))
      .join(right.filter(col(rightCol).isNotNull)
          .select(payload.map(col) :+ col(rightCol).as("__rk"): _*),
        col("__b") === col("__rk"))
      .select(leftCols.map(col) ++ payload.map(col) :+ col("edit_dist"): _*)
  }
}
