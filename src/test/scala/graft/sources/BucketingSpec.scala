package graft.sources

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY.md §4 / builder prompt): two
  * tables bucketed on the join key sort-merge-join with ZERO shuffle
  * exchanges — the pre-partitioning strategy for repeated large-fact joins
  * at 100 TB, where re-shuffling the fact per query is the bottleneck.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs shuffle-free (no Exchange under the SMJ)") {
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables.lineitem(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderstatus"), col("l_quantity"))

      val plan = joined.queryExecution.executedPlan
      val smjs = plan.collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected SortMergeJoin:\n$plan")
      val shufflesUnderJoin = smjs.head.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join should not shuffle:\n$plan")

      // and it is still correct
      assert(joined.count() ==
        Tables.lineitem(spark, sf0001).join(
          Tables.orders(spark, sf0001),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
