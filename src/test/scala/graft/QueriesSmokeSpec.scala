package graft

/** Every registered query runs and returns rows at smoke scale, and every
  * oracle entry points at a registered query. */
class QueriesSmokeSpec extends SparkSuite {
  init()

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
