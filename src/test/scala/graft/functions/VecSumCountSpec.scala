package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[VecSumCount]] (r15): the one-buffer element-wise sum aggregate must be
  * value-identical to the 64-separate-`sum()` form it replaced in the Lloyd
  * update — under any partitioning (partial/merge paths) — because the
  * trained centroids feed oracle-hashed queries. */
class VecSumCountSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf(rows: Seq[(Long, Seq[Long])], parts: Int) =
    rows.toDF("g", "qv").repartition(parts)

  test("equals the per-column sum form under 1, 3 and 7 partitions") {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val rows = (0L until 500L).map { i =>
      (i % 7, Seq.fill(dim)(rnd.nextLong() % 1000000L))
    }
    val dimSums = (0 until dim).map(i => sum(col("qv")(i)).as(s"s$i"))
    for (parts <- Seq(1, 3, 7)) {
      val df = mkDf(rows, parts)
      val viaCols = df.groupBy($"g")
        .agg(count(lit(1)).as("n"), dimSums: _*)
        .select(col("g"), col("n"),
          array((0 until dim).map(i => col(s"s$i")): _*).as("s"))
        .as[(Long, Long, Seq[Long])].collect().toSet
      val viaAgg = df.groupBy($"g")
        .agg(VecSumCount($"qv").as("sc"))
        .select(col("g"), expr("sc[0]").as("n"),
          expr("slice(sc, 2, 64)").as("s"))
        .as[(Long, Long, Seq[Long])].collect().toSet
      assert(viaAgg === viaCols, s"parts=$parts")
    }
  }

  test("mixed widths fail loudly; empty groups never occur but empty buffer evals to [0]") {
    val bad = Seq((1L, Seq(1L, 2L)), (1L, Seq(1L, 2L, 3L))).toDF("g", "qv")
    val e = intercept[Exception] {
      bad.repartition(1).groupBy($"g").agg(VecSumCount($"qv")).collect()
    }
    assert(e.getMessage != null)
  }
}
