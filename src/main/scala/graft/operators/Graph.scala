package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analytics — PageRank (Page et al. 1999), the standard
  * link-based quality prior for web-scale corpus curation (harmonic
  * centrality / PageRank percentile is a CommonCrawl-derived quality
  * feature in several public pretraining recipes).
  *
  * Fixed-point arithmetic, deliberately: ranks live on an integer grid
  * (`scale` = 1e12) and every update is integer math — `17·r ÷ (20·deg)`
  * for the damped spread (d = 0.85 = 17/20 exactly), integer division
  * throughout. Cross-partition double summation has no deterministic
  * order (the classic oracle-killer); SUMS OF LONGS are exact in any
  * order, so the whole iteration — and therefore the final ranks — is
  * bit-reproducible across engines, partitionings, and retries, and the
  * DuckDB oracle replays it iteration by iteration.
  *
  * Per iteration: one join (ranks ⋈ edges on src) + one aggregate on
  * dst + a broadcast-sized dangling-mass scalar — the standard
  * distributed PageRank shape. The edge⋈degree frame is built ONCE and
  * persisted (it never changes across rounds); the rank frame — one
  * row per NODE, usually orders of magnitude smaller than the edge
  * list — BROADCASTS while it fits (≤ `broadcastMaxNodes`), so each
  * round is a map-side hash join over the cached edges plus the dst
  * aggregate, and the big side never re-shuffles. Past that size the
  * same loop degrades to the shuffle join. Lineage hygiene: each round
  * persists its rank frame and unpersists the previous one (the
  * connectedComponents discipline; an un-persisted loop re-computes
  * every prior round per action). Edges are DISTINCT'd: parallel edges
  * would double-spread mass.
  *
  * Dangling nodes (no out-edges) redistribute their damped mass
  * uniformly — the textbook-complete variant; integer floors leak
  * ≤ 1 grid unit per node per round, which is the documented price of
  * exactness. */
object Graph {

  /** PageRank over a directed edge list. Output: `node`,
    * `rank_scaled` (exact integer on the `scale` grid) and `pagerank`
    * (= rank_scaled/scale, one IEEE division). Nodes are every distinct
    * endpoint; `iterations` fixed rounds from the uniform start
    * `scale ÷ N`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, scale: Long = 1000000000000L,
               broadcastMaxNodes: Long = 5000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val lvl = StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist(lvl)
    val n = nodes.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // the loop-invariant big side, built once: every edge with its
    // source degree attached
    val ed = e.join(deg, "src").persist(lvl)
    // dangling = nodes with no out-edges; their damped mass spreads
    // uniformly (computed per round as one scalar)
    val dangling = nodes.join(deg, nodes("node") === deg("src"), "left_anti")
      .select(col("node")).persist(lvl)
    // rank frames are node-sized — broadcast them while that holds
    val bcast = n <= broadcastMaxNodes
    def rside(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df

    var ranks = nodes.withColumn("r", lit(scale / n)).persist(lvl)
    var prev: DataFrame = null
    for (_ <- 1 to iterations) {
      // damped spread along edges: (17·r) ÷ (20·deg), exact longs
      val contrib = ed.join(rside(ranks), ed("src") === col("node"))
        .select(col("dst").as("node"), expr("(17 * r) div (20 * deg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      val dangMass = dangling.join(ranks, "node")
        .agg(coalesce(sum(col("r")), lit(0L))).head.getLong(0)
      val teleport = (3L * scale) / (20L * n)
      val dangShare = (17L * dangMass) / (20L * n)
      prev = ranks
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport + dangShare) + coalesce(col("in_mass"), lit(0L))).as("r"))
        .persist(lvl)
      ranks.count() // materialize before dropping the previous round
      prev.unpersist()
    }
    // `pagerank`, not `rank`: RANK is a window keyword in ANSI engines,
    // and the oracle column names must match byte-for-byte
    val out = ranks.select(col("node"), col("r").as("rank_scaled"),
      (col("r").cast("double") / scale.toDouble).as("pagerank"))
    ed.unpersist(); nodes.unpersist(); dangling.unpersist()
    out
  }
}
