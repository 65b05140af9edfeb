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
    // Disable size-based auto-broadcast while planning: at sf0.001 every
    // table fits the default 10 MB threshold, so JoinSelection would pick
    // BroadcastNestedLoopJoin for ANY non-equi join and the guard would
    // never fire. With -1, only joins that carry an explicit broadcast()
    // hint stay BNLJ (the allowed bounded-build pattern); an unhinted
    // non-equi join between two facts degrades to CartesianProduct here —
    // exactly like it would at 100 TB.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
      assert(offenders.isEmpty, s"cartesian plans in: ${offenders.mkString(", ")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.catalog.clearCache()
    }
  }
}
