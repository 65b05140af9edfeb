package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-4 relational extensions (MERGE upsert,
  * forward as-of) that go beyond the DuckDB hash check: semantic
  * postconditions and the broadcast plan shape the 100 TB story rests on. */
class OpsExtSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("merge upsert: deletes gone, updates applied, inserts disjoint") {
    val base = ops.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), ops.Tables.cents(col("c_acctbal")).as("bal_c"))
      .cache()
    val out = run("merge_upsert_customers").cache()
    try {
      // every %10==1 BASE key is gone (inserted keys may land on any residue)
      assert(out.filter(col("src") =!= "inserted" && col("c_custkey") % 10 === 1)
        .count() === 0)
      // every surviving %10==0 key got +100.00 and is tagged updated
      val upd = out.filter(col("src") === "updated")
        .join(base.withColumnRenamed("bal_c", "old_bal"), "c_custkey")
      assert(upd.filter(col("bal_c") =!= col("old_bal") + 10000L).count() === 0)
      assert(upd.count() === base.filter(col("c_custkey") % 10 === 0).count())
      // inserted keys sit strictly above the base key range
      val maxBase = base.agg(max("c_custkey")).head.getLong(0)
      assert(out.filter(col("src") === "inserted" && col("c_custkey") <= maxBase).count() === 0)
      // row accounting: base - deletes + inserts
      val nBase = base.count()
      val nDel = base.filter(col("c_custkey") % 10 === 1).count()
      val nIns = base.filter(col("c_custkey") % 10 === 2).count()
      assert(out.count() === nBase - nDel + nIns)
    } finally { out.unpersist(); base.unpersist() }
  }

  test("merge upsert plan: CDC arms broadcast, base never exchanges on a join key") {
    val plan = run("merge_upsert_customers").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"base should not sort-merge:\n$plan")
  }

  test("salted skew join exchanges on (skew_key, salt), not skew_key alone") {
    // at sf0.001 the dim fits the auto-broadcast threshold and the join
    // would not shuffle at all; disable it to expose the shuffle shape
    // the salt exists for (dim too large to broadcast — e.g. one row per
    // user). DataFrame must be rebuilt AFTER the conf change.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = run("j_salted_skew_join").queryExecution.executedPlan.toString
      // the join-feeding exchange must carry the salt column too — an
      // exchange on skew_key alone would put the hot key on one task
      val saltedExchange = "hashpartitioning\\(skew_key#\\d+L?, salt#\\d+".r
      assert(saltedExchange.findFirstIn(plan).isDefined,
        s"no (skew_key, salt) exchange found in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("forward as-of: gaps nonnegative and within tolerance; null iff no error in window") {
    val out = run("asof_next_error_tolerance").cache()
    try {
      assert(out.count() > 0)
      val withGap = out.filter(col("gap_us").isNotNull)
      assert(withGap.filter(col("gap_us") < 0 || col("gap_us") > 3600000000L).count() === 0)
      // next_error_us and gap_us are null together
      assert(out.filter(col("gap_us").isNull =!= col("next_error_us").isNull).count() === 0)
    } finally out.unpersist()
  }

  test("forward as-of matches a brute-force per-row scan at sf0.001") {
    val ev = ops.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("error", "purchase"))
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("event_id", "user_id", "ts_us", "event_type")
      .collect()
    val errors = ev.filter(_.getAs[String]("event_type") == "error")
      .groupBy(_.getAs[Long]("user_id"))
    val expect = ev.filter(_.getAs[String]("event_type") == "purchase").map { p =>
      val uid = p.getAs[Long]("user_id")
      val t = p.getAs[Long]("ts_us")
      val eid = p.getAs[Long]("event_id")
      // frame is 1 FOLLOWING on (ts_us, event_id) ordering, not ts alone
      val next = errors.getOrElse(uid, Array.empty)
        .filter { e =>
          val (ets, eeid) = (e.getAs[Long]("ts_us"), e.getAs[Long]("event_id"))
          ets > t || (ets == t && eeid > eid)
        }
        .map(_.getAs[Long]("ts_us")).sorted.headOption
      p.getAs[Long]("event_id") -> next.filter(_ - t <= 3600000000L)
    }.toMap
    val got = run("asof_next_error_tolerance").collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("next_error_us")).map(_.longValue)).toMap
    assert(got === expect)
  }

  test("mergeable HLL sketches: per-day and unioned estimates stay within 5% of exact") {
    // the 5%-bound check is computed INSIDE the query (bounded-assertion
    // oracle: the hashed within_bound verdict); here assert the frame has
    // both per-day rows and the union row, exacts are sane, and every
    // verdict — per-day and union alike — is genuinely true
    val out = run("a_sketch_union_distinct").cache()
    try {
      val days = out.filter(col("day").isNotNull).collect()
      assert(days.nonEmpty)
      val globalExact = ops.Tables.events(spark, sf0001)
        .select(countDistinct(col("user_id"))).head.getLong(0)
      val union = out.filter(col("day").isNull).collect()
      assert(union.length === 1)
      assert(union.head.getAs[Long]("exact_users") === globalExact)
      (days ++ union).foreach { r =>
        assert(r.getAs[Boolean]("within_bound"),
          s"slice ${r.get(0)}: exact=${r.getAs[Long]("exact_users")} outside 5% bound")
      }
    } finally out.unpersist()
  }
}
