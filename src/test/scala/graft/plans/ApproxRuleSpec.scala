package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The countDistinct→HLL rewrite: plan shape changes only when enabled,
  * estimates stay within HLL++ error bounds of the exact answer. */
class ApproxRuleSpec extends SparkSpec {

  test("rule rewrites exact distinct to HLL++ when enabled, not otherwise") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxCountDistinctRule
    try {
      // queryExecution is cached per Dataset: rebuild after toggling conf
      def df = graft.ops.Tables.events(spark, sf0001)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("u"))

      spark.conf.set(ApproxCountDistinctRule.ConfKey, "false")
      val exactPlan = df.queryExecution.optimizedPlan.toString
      assert(!exactPlan.contains("approx_count_distinct"))
      val exact = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      spark.conf.set(ApproxCountDistinctRule.ConfKey, "true")
      val approxPlan = df.queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("approx_count_distinct"), approxPlan)
      val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      exact.foreach { case (k, v) =>
        val a = approx(k)
        assert(math.abs(a - v) <= math.max(2, (v * 0.1).toLong),
          s"$k: exact=$v approx=$a")
      }
    } finally {
      spark.conf.set(ApproxCountDistinctRule.ConfKey, "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ApproxCountDistinctRule)
    }
  }
}
