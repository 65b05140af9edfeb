package graft.plans

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Runtime row-level join pruning (SURVEY.md §4 scale toolbox): with a
  * selective predicate on the dimension side of a fact join, Catalyst can
  * inject a bloom-filter semi-filter on the fact scan — at 100 TB this
  * skips most of the probe-side shuffle input. Default thresholds only
  * arm it for >10 GB application sides, so the spec tunes them down to
  * demonstrate the same plan shape at test scale (the conf a production
  * deployment leaves at its defaults).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom runtime filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf0001)
      val urgent = Tables.orders(spark, sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"expected a bloom runtime filter in:\n$optimized")

      // and the filtered plan stays correct
      val expected = Tables.lineitem(spark, sf0001).join(
        Tables.orders(spark, sf0001).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(j.head().getAs[Long]("n") == expected)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
