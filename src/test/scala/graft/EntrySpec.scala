package graft

/** Pins the driver's smoke contract: `SparkEntry.entry` must return
  * rows on the sf0.001 fixture. */
class EntrySpec extends SparkSpec {
  test("driver smoke: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
