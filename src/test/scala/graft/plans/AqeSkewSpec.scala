package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: beyond the MANUAL salting the engine ships
  * (`j_salted_skew_join` / `a_salted_skew_agg`), Spark's adaptive runtime
  * must split a skewed shuffle partition on its own — the second layer of
  * the skew story ("salt what you know, AQE catches what you don't").
  * Thresholds are scaled down so test-sized data trips the same machinery
  * a hot 100 TB key would. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join (skew=true in the adaptive plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left lands on key 0 — one shuffle partition dwarfs the rest
      val left = spark.range(200000)
        .select(when($"id" % 10 =!= 0, 0L).otherwise($"id").as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pad"))
      val right = spark.range(5000).select($"id".as("k"), ($"id" * 2).as("v"))
      // keep the wide payload ALIVE through the join (column pruning would
      // otherwise shrink the skewed partition under the detection threshold)
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"), sum(length($"pad")).as("pl"))
      // collect() (not head — that spawns a separate limited execution)
      // finalizes THIS frame's adaptive plan
      val row = joined.collect()(0)
      assert(row.getLong(0) > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "setup must produce a shuffled join")
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed partition; plan:\n${plan.take(2000)}")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
