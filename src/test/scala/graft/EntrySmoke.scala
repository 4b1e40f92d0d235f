package graft
class EntrySmoke extends SparkSpec {
  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
