package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Monte-Carlo random-walk simulation + quantile fans (SURVEY §2.11 U9,
  * §2.6 W9, §2.5 A8; reference notebook cells 27/28/32
  * `simulate_exog_paths` / `monte_carlo_forecast`).
  *
  * Fully Spark-native: the (sim × step) grid is `spark.range × sequence/
  * explode`, the Gaussian draws are *deterministic counter-based* randoms
  * (Box-Muller over two universal hashes of (seed, sim, step)) rather than
  * `randn()`, because `randn(seed)` is partition-dependent — repartitioning
  * the grid would silently change the draw. Counter-based randoms are the
  * standard reproducible-at-scale choice (same idea as Philox/Threefry):
  * bit-identical on 1 executor or 1000.
  */
object MonteCarlo {

  /** Deterministic standard-normal draw for integer columns (seed, sim, step).
    * u1 ∈ (0,1], u2 ∈ [0,1) from two independent affine hashes of the
    * counter; z = sqrt(-2 ln u1)·cos(2π u2). */
  def counterRandn(seed: Long, sim: Column, step: Column): Column =
    boxMuller(Cols.hash32(concat_ws("_", lit(seed), sim, step)))

  /** [[counterRandn]] with a series key mixed into the counter — the
    * per-key variant used by the composed SARIMAX Monte-Carlo fan. */
  def counterRandnKeyed(seed: Long, key: Column, sim: Column, step: Column): Column =
    boxMuller(Cols.hash32(concat_ws("_", lit(seed), key, sim, step)))

  private def boxMuller(counter: Column): Column = {
    val p = 4294967311L
    val u1 = (Cols.affineHash(counter, 683077, 104729, p) + lit(1.0)) / lit(p.toDouble + 1.0)
    val u2 = Cols.affineHash(counter, 999331, 15487469, p) / lit(p.toDouble)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** JVM twin of [[counterRandnKeyed]] — bit-identical (parity-asserted in
    * ForecastPipelineSpec), for kernels that draw inside a UDF instead of
    * through the expression tree. */
  def gaussianJvm(seed: Long, key: String, sim: Long, step: Int): Double = {
    val p = 4294967311L
    val c = graft.text.TextHash.hash32(s"${seed}_${key}_${sim}_${step}")
    val u1 = ((c * 683077L + 104729L) % p + 1.0) / (p + 1.0)
    val u2 = ((c * 999331L + 15487469L) % p).toDouble / p.toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** RW-with-drift paths: value_t = start + Σ_{i≤t} (mu + sigma·z_i),
    * optionally clipped below. Output: (sim_id, step, value). */
  def simulatePaths(spark: SparkSession, sims: Int, horizon: Int,
                    start: Double, mu: Double, sigma: Double,
                    seed: Long = 42L, clipMin: Option[Double] = None): DataFrame = {
    val grid = spark.range(sims).toDF("sim_id")
      .select(col("sim_id"), explode(sequence(lit(1), lit(horizon))).as("step"))
    val z  = counterRandn(seed, col("sim_id"), col("step"))
    val dx = lit(mu) + lit(sigma) * z
    val w  = Window.partitionBy("sim_id").orderBy("step")
    val cum = lit(start) + sum(dx).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val v = clipMin.fold(cum)(lo => greatest(cum, lit(lo)))
    grid.select(col("sim_id"), col("step"), v.as("value"))
  }

  /** A8: per-step fan table — exact percentiles (NumPy-matching linear
    * interpolation) + mean/std/min/max across the simulation axis. */
  def fan(paths: DataFrame, qs: Seq[Double] = Seq(0.05, 0.10, 0.50, 0.90, 0.95)): DataFrame =
    fanKeyed(paths, Nil, qs)

  /** [[fan]] grouped by extra key columns (one fan table per series). */
  def fanKeyed(paths: DataFrame, keys: Seq[String],
               qs: Seq[Double] = Seq(0.05, 0.10, 0.50, 0.90, 0.95)): DataFrame =
    fanAgg(paths, keys,
      qs.map(q => percentile(col("value"), lit(q)).as(f"p${(q * 100).round}%02d")))

  /** Shared fan body: one schema for the exact and approximate quantile
    * variants, so the two can never silently diverge. */
  private def fanAgg(paths: DataFrame, keys: Seq[String], qcols: Seq[Column]): DataFrame = {
    val gcols = keys :+ "step"
    paths.groupBy(gcols.map(col): _*).agg(
      qcols.head,
      (qcols.tail ++ Seq(
        avg(col("value")).as("mean"),
        stddev_samp(col("value")).as("std"),
        min(col("value")).as("min"),
        max(col("value")).as("max"))): _*
    ).orderBy(gcols.map(col): _*)
  }

  /** At-scale variant of [[fanKeyed]]: `percentile_approx` (a mergeable
    * quantile sketch with map-side partial aggregation) replaces exact
    * `percentile`, which must hold every group's full value set in one
    * aggregation buffer. Same dial philosophy as GRAFT_HASH: exact stays
    * the VERIFY default (oracle-comparable), the sketch is the production
    * path when a fan spans billions of simulations. Rank error is bounded
    * by ~1/`accuracy`; MonteCarloSpec pins the observed gap vs the exact
    * fan. */
  def fanApproxKeyed(paths: DataFrame, keys: Seq[String] = Nil,
                     qs: Seq[Double] = Seq(0.05, 0.10, 0.50, 0.90, 0.95),
                     accuracy: Int = 10000): DataFrame =
    fanAgg(paths, keys, qs.map(q =>
      percentile_approx(col("value"), lit(q), lit(accuracy)).as(f"p${(q * 100).round}%02d")))

  /** A9: RW drift parameters from the trailing `window` rows of a series
    * (reference `fit_rw_drift_params`): mean and ddof=1 std of first
    * differences. Returns one row per key. */
  def fitDrift(df: DataFrame, keyCols: Seq[String], orderCol: String,
               valueCol: String, window: Int): DataFrame = {
    val tail = Features.tailRows(df, keyCols, Seq(orderCol), window)
    val w = Features.keyWindow(keyCols, orderCol)
    val dx = tail.withColumn("__dx", Features.diff(col(valueCol), 1, w))
    val gb = if (keyCols.isEmpty) dx.groupBy(lit(1).as("__g")) else dx.groupBy(keyCols.map(col): _*)
    val out = gb.agg(avg(col("__dx")).as("mu"), stddev_samp(col("__dx")).as("sigma"))
    if (keyCols.isEmpty) out.drop("__g") else out
  }
}
