package graft

/** Driver-contract surface: entry smoke (rows > 0), every registered query
  * runs at sf0.001, and every oracle key matches a query key. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys; names are unique") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok -- qk}")
    assert(qk.size >= 120)
  }

  test("every registered query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n >= 0, s"$name failed")
    }
    spark.catalog.clearCache()
  }
}
