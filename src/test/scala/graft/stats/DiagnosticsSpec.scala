package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = {
    val rng = new Random(5)
    val noise = (1 to 200).map(i => ("stationary", f"t$i%04d", rng.nextGaussian() * 2 + 10))
    var acc = 0.0
    val rw = (1 to 200).map { i => acc += rng.nextGaussian(); ("walk", f"t$i%04d", acc) }
    (noise ++ rw).toDF("k", "t", "v")
  }

  test("stationarity: per-key verdicts computed distributed, no driver collect") {
    val out = Diagnostics.stationarity(series, Seq("k"), "t", "v")
      .orderBy("key").collect()
    assert(out.length === 2)
    val st = out.find(_.getString(0) == "stationary").get
    val wk = out.find(_.getString(0) == "walk").get
    assert(st.getAs[Boolean]("adf_stationary_5pct"))
    assert(!wk.getAs[Boolean]("adf_stationary_5pct"))
    assert(st.getAs[Boolean]("kpss_stationary_5pct"))
    assert(st.getAs[Int]("n_obs") === 200)
  }

  test("stationarity: short series yields nulls, not failure") {
    val tiny = Seq(("a", "t1", 1.0), ("a", "t2", 2.0)).toDF("k", "t", "v")
    val r = Diagnostics.stationarity(tiny, Seq("k"), "t", "v").collect().head
    assert(r.getAs[Int]("n_obs") === 2)
    assert(r.get(r.fieldIndex("adf_stat")) == null)
  }

  test("numeric order columns sort numerically, not lexicographically") {
    // values increase with t; a lexicographic sort (1, 10, 100, 101, ... 2)
    // would scramble the series and inflate the diffs
    val df = (1 to 150).map(i => ("k", i, i.toDouble)).toDF("g", "t", "v")
    val out = Diagnostics.arForecast(df, Seq("g"), "t", "v", horizon = 3).collect()
    // a clean linear trend forecast keeps climbing past the last value
    assert(out.forall(_.getAs[Double]("forecast") > 140.0),
      out.map(_.getAs[Double]("forecast")).toSeq.toString)
  }

  test("arForecast: a too-short key yields no rows instead of failing the job") {
    val df = (Seq(("short", "t1", 1.0), ("short", "t2", 2.0)) ++
      (1 to 100).map(i => ("long", f"t$i%04d", math.sin(i / 5.0))))
      .toDF("k", "t", "v")
    val out = Diagnostics.arForecast(df, Seq("k"), "t", "v", horizon = 4).collect()
    assert(out.forall(_.getString(0) == "long"))
    assert(out.length === 4)
  }

  test("arForecast: one row per (key, step) with chosen order") {
    val out = Diagnostics.arForecast(series, Seq("k"), "t", "v", horizon = 6)
      .orderBy("key", "step").collect()
    assert(out.length === 12)
    assert(out.map(_.getAs[Int]("step")).toSeq === Seq(1, 2, 3, 4, 5, 6, 1, 2, 3, 4, 5, 6))
    // stationary series forecasts stay near its mean of 10
    val stF = out.filter(_.getString(0) == "stationary").map(_.getAs[Double]("forecast"))
    assert(stF.forall(f => f > 5 && f < 15))
  }
}
