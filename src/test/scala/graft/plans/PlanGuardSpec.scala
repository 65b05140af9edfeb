package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Engine-wide scale tripwire: no registered query may plan a
  * CartesianProduct — the one join strategy that cannot survive any
  * scale-up. Explicit `crossJoin(broadcast(tiny))` compiles to
  * BroadcastNestedLoopJoin (bounded by the broadcast side, which every
  * use here keeps at O(1)–O(k) rows), so it stays allowed; the unbounded
  * shuffle-side cartesian does not.
  *
  * Plans are built (analyzed + optimized + planned), NOT executed — this
  * sweeps all ~114 queries in seconds and catches a regression the
  * per-query specs would only see as a timeout.
  */
class PlanGuardSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans in: ${offenders.mkString(", ")}")
    spark.catalog.clearCache()
  }
}
