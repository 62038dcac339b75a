package graft

/** The driver's flagship smoke check, pinned as a spec: `SparkEntry.entry`
  * on sf0.001 must return rows. */
class EntrySmokeSpec extends SparkSpec {
  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
