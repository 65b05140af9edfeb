package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Misra–Gries sketch's completeness guarantee (candidates ⊇ every key
  * with frequency > n/k) under adversarial partitioning, plus the two-pass
  * sketch+recount exactness the `a_heavy_hitters_sketch` query relies on. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** 10_000 rows: 'hot' 20%, 'warm' 5%, tail unique — cardinality ~7.5k. */
  private def skewed: DataFrame =
    spark.range(10000).select(
      when(col("id") % 10 < 2, "hot")
        .when(col("id") % 20 === 2, "warm")
        .otherwise(concat(lit("t"), col("id").cast("string"))).as("key"))

  private def candidates(df: DataFrame, k: Int): Set[String] =
    df.agg(MisraGries(col("key"), k).as("c")).head
      .getSeq[String](0).toSet

  test("every key above n/k survives, whatever the partitioning") {
    // k = 8: heavy eviction pressure (7 counters vs ~7.5k distinct keys)
    for (parts <- Seq(1, 4, 13)) {
      val c = candidates(skewed.repartition(parts), 8)
      assert(c.contains("hot"), s"hot (20% > n/8) must survive at $parts partitions")
      assert(c.size <= 7, s"sketch must hold at most k-1 counters, got ${c.size}")
    }
    // k = 32: warm (5% > 1/32) is guaranteed too
    for (parts <- Seq(1, 4, 13)) {
      val c = candidates(skewed.repartition(parts), 32)
      assert(c.contains("hot") && c.contains("warm"))
      assert(c.size <= 31)
    }
  }

  test("two-pass sketch + exact recount equals brute force exactly") {
    val df = skewed
    // brute force: keys at or above 1%
    val exact = df.groupBy("key").count()
      .filter(col("count") * 100 >= 10000)
      .as[(String, Long)].collect().toMap
    // sketch pass (k=256 so 1% > n/k holds) + recount of candidates only
    val sk = df.agg(MisraGries(col("key"), 256).as("cands"), count(lit(1)).as("n"))
    val twoPass = df.crossJoin(broadcast(sk))
      .filter(array_contains(col("cands"), col("key")))
      .groupBy(col("key"), col("n")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * 100 >= col("n"))
      .select(col("key"), col("freq"))
      .as[(String, Long)].collect().toMap
    assert(twoPass === exact)
    assert(exact.keySet === Set("hot", "warm"))
  }

  test("serialization round-trips partial buffers bit-exactly") {
    val mg = MisraGries(org.apache.spark.sql.GraftShims.expression(col("x")), 8)
    val buf = mg.createAggregationBuffer()
    buf.update("a", 5L); buf.update("b", 2L); buf.update("ключ-β", 9L)
    val back = mg.deserialize(mg.serialize(buf))
    assert(back === buf)
  }

  test("merge keeps at most k-1 counters and preserves the undercount bound") {
    val mg = MisraGries(org.apache.spark.sql.GraftShims.expression(col("x")), 4)
    val a = mg.createAggregationBuffer()
    a.update("p", 10L); a.update("q", 3L); a.update("r", 2L)
    val b = mg.createAggregationBuffer()
    b.update("s", 4L); b.update("t", 1L); b.update("p", 6L)
    val merged = mg.merge(a, b)
    assert(merged.size <= 3)
    // p has 16 of 26 total; after subtracting the 4th-largest it must survive
    assert(merged.contains("p"))
  }
}
