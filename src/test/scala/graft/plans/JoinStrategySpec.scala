package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Join-strategy intent, asserted on the physical plan (SURVEY.md §4):
  * dimension joins are EXPLICITLY broadcast (they must not depend on size
  * estimates that flip at 100 TB), facts never are. Auto-broadcast is
  * disabled for these tests so only the explicit `broadcast()` hints in
  * the query code can produce broadcast joins — the assertions pin the
  * code's intent, not the optimizer's size luck at test scale.
  */
class JoinStrategySpec extends SparkSpec {

  private def withNoAutoBroadcast[T](f: => T): T = {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("billing mart: pre-aggregated fact broadcast-joins every dim, nothing shuffles to join") {
    withNoAutoBroadcast {
      val plan = graft.SparkEntry.queries("meter_billing_daily")(spark, sf0001)
        .queryExecution.sparkPlan
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bhj.size >= 2, s"meters+customers should broadcast:\n$plan")
      assert(bnlj.size >= 1, s"1-row tariff should broadcast:\n$plan")
      val shuffledJoins = plan.collect { case j: SortMergeJoinExec => j } ++
        plan.collect { case j: ShuffledHashJoinExec => j }
      assert(shuffledJoins.isEmpty,
        s"no join in the mart should shuffle the fact:\n$plan")
    }
  }

  test("join strategy hints are honored: shuffle_hash and merge steer the same equi join") {
    withNoAutoBroadcast {
      import org.apache.spark.sql.functions.col
      val o = graft.ops.Tables.orders(spark, sf0001)
      val c = graft.ops.Tables.customer(spark, sf0001)
      // default (no hint): SortMergeJoin
      val smj = o.join(c, col("o_custkey") === col("c_custkey"))
        .queryExecution.sparkPlan
      assert(smj.collect { case j: SortMergeJoinExec => j }.nonEmpty, s"$smj")
      // shuffle_hash hint: hash join without the per-partition sort — the
      // right call when one side is much smaller but not broadcastable
      val shj = o.join(c.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .queryExecution.sparkPlan
      assert(shj.collect { case j: ShuffledHashJoinExec => j }.nonEmpty, s"$shj")
      // merge hint: forces the sort-merge path even where hash would win
      val merged = o.join(c.hint("merge"), col("o_custkey") === col("c_custkey"))
        .queryExecution.sparkPlan
      assert(merged.collect { case j: SortMergeJoinExec => j }.nonEmpty, s"$merged")
    }
  }

  test("q5: the fact-fact join shuffles (never broadcasts a fact); dims broadcast") {
    withNoAutoBroadcast {
      val plan = graft.SparkEntry.queries("q5_nation_revenue")(spark, sf0001)
        .queryExecution.sparkPlan
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
      val shuffledJoins = plan.collect { case j: SortMergeJoinExec => j } ++
        plan.collect { case j: ShuffledHashJoinExec => j }
      assert(shuffledJoins.nonEmpty,
        s"lineitem-orders must stay a shuffle join at scale:\n$plan")
      assert(bhj.nonEmpty, s"dims should broadcast:\n$plan")
    }
  }
}
