package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch gap sessionization: session boundaries, tie determinism, and
  * the per-session stats. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // minutes → MILLISECOND offset from a fixed origin (Timestamp(long)
  // takes epoch millis)
  private def ts(min: Long) =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("byGap: sessions split exactly when the gap EXCEEDS the threshold") {
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(30)),   // same session (30 <= 30)
      (1L, 3L, ts(61)),                    // 31-min gap -> new session
      (1L, 4L, ts(200)),                   // new session
      (2L, 5L, ts(0))                      // other key, own session
    ).toDF("uid", "eid", "t")
    val out = Sessionize.byGap(df, "uid", "t", "eid", gapMinutes = 30)
      .select("uid", "eid", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 1L)) == 1L && out((1L, 2L)) == 1L)
    assert(out((1L, 3L)) == 2L)
    assert(out((1L, 4L)) == 3L)
    assert(out((2L, 5L)) == 1L)
  }

  test("byGap: equal timestamps order by the tiebreak, deterministically") {
    val df = Seq(
      (1L, 20L, ts(0)), (1L, 10L, ts(0)),  // tie: eid 10 sorts first
      (1L, 30L, ts(45))
    ).toDF("uid", "eid", "t")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sessionize.byGap(d, "uid", "t", "eid", gapMinutes = 30)
        .select("eid", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(df)
    assert(a(10L) == 1L && a(20L) == 1L && a(30L) == 2L)
    assert(run(df.repartition(7)) == a)
  }

  test("sessionStats: counts, bounds, and exact micro durations") {
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(10)), (1L, 3L, ts(100))
    ).toDF("uid", "eid", "t")
    val out = Sessionize.sessionStats(df, "uid", "t", "eid", gapMinutes = 30)
      .orderBy("session_idx").collect()
    assert(out.length == 2)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Long]("duration_us") == 10L * 60 * 1000000)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_events") == 1L && s2.getAs[Long]("duration_us") == 0L)
  }

  test("byGapTimeSliced equals byGap — sessions spanning slice boundaries re-merge") {
    // gap 30 min, slice 60 min: events at 50 and 70 straddle a slice edge
    // 20 min apart (same session); 61->200 crosses edges with a break
    val df = Seq(
      (1L, 1L, ts(0)), (1L, 2L, ts(50)), (1L, 3L, ts(70)),  // one session across slices
      (1L, 4L, ts(200)), (1L, 5L, ts(210)),                 // second session
      (2L, 6L, ts(59)), (2L, 7L, ts(60))                    // boundary-adjacent pair merges
    ).toDF("uid", "eid", "t")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("uid", "eid", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = rows(Sessionize.byGap(df, "uid", "t", "eid", 30))
    val sliced = rows(Sessionize.byGapTimeSliced(df, "uid", "t", "eid", 30,
      sliceMinutes = 60))
    assert(sliced == plain)
    assert(plain.count(_._1 == 1L) == 5)
  }

  test("byGapTimeSliced: slice-width invariance on LCG streams (the equality law)") {
    var x = 42L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val ev = (1 to 400).map { i =>
      (math.floorMod(next(), 5L), i.toLong, ts(math.floorMod(next(), 3000L)))
    }.toDF("uid", "eid", "t")
    val plain = Sessionize.sessionStats(ev, "uid", "t", "eid", 45)
      .collect().map(_.toSeq).toSet
    // slices much smaller than, equal to, and larger than the gap
    Seq(10, 45, 300, 10000).foreach { slice =>
      val sliced = Sessionize.sessionStatsTimeSliced(ev, "uid", "t", "eid", 45,
        sliceMinutes = slice).collect().map(_.toSeq).toSet
      assert(sliced == plain, s"sliceMinutes=$slice diverged")
    }
  }

  test("sessionStatsAuto equals the plain stats on skewed AND uniform keys") {
    var x = 7L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    // skewed: one user owns ~90% of rows (the hot100 shape, scaled down)
    val hot = (1 to 300).map { i =>
      val uid = if (i <= 270) 1L else math.floorMod(next(), 9L) + 2L
      (uid, i.toLong, ts(math.floorMod(next(), 3000L)))
    }.toDF("uid", "eid", "t")
    // uniform control: round-robin keys, exactly 6 rows each — the max
    // stays below total/slots at any plausible test parallelism
    val uni = (1 to 300).map { i =>
      ((i % 50).toLong, i.toLong, ts(math.floorMod(next(), 3000L)))
    }.toDF("uid", "eid", "t")
    for (ev <- Seq(hot, uni)) {
      val plain = Sessionize.sessionStats(ev, "uid", "t", "eid", 45)
        .collect().map(_.toSeq).toSet
      val auto = Sessionize.sessionStatsAuto(ev, "uid", "t", "eid", 45,
        sliceMinutes = 300).collect().map(_.toSeq).toSet
      assert(auto == plain)
    }
    // the probe itself routes the two frames differently
    assert(Skew.shouldEngageHotKeyDial(hot, Seq("uid"),
      slots = spark.sparkContext.defaultParallelism))
    assert(!Skew.shouldEngageHotKeyDial(uni, Seq("uid"),
      slots = spark.sparkContext.defaultParallelism))
  }

  test("topPaths: sessions become ordered truncated paths, counted and ranked") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      ("u1", ts(0), 1L, "view"), ("u1", ts(1), 2L, "click"), ("u1", ts(2), 3L, "buy"),
      // u1 second session (gap > 30min)
      ("u1", ts(50), 4L, "view"), ("u1", ts(51), 5L, "click"),
      ("u2", ts(0), 6L, "view"), ("u2", ts(1), 7L, "click"),
      ("u3", ts(0), 8L, "view"), ("u3", ts(1), 9L, "click"), ("u3", ts(2), 10L, "buy"),
      ("u3", ts(3), 11L, "refund") // truncated away at maxLen 3
    ).toDF("u", "ts", "id", "s")
    val out = Sessionize.topPaths(ev, "u", "ts", "id", "s",
      gapMinutes = 30, maxLen = 3, k = 2).collect()
    assert(out.map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions")))
      .toSeq == Seq(("view>click", 2L), ("view>click>buy", 2L)))
  }
}
