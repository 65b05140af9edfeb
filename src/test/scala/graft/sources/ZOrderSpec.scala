package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: a box predicate on BOTH dimensions must touch fewer
  * files (by min/max skipping) than a linear single-column sort allows —
  * the whole point of the curve. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // files whose [min,max] envelope on each dim intersects the box — what
  // parquet row-group / file skipping prunes on
  private def filesTouched(
      dir: String, uLo: Long, uHi: Long, vLo: Long, vHi: Long): Long = {
    spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("u").as("ulo"), max("u").as("uhi"),
        min("v").as("vlo"), max("v").as("vhi"))
      .filter(col("uhi") >= uLo && col("ulo") <= uHi &&
        col("vhi") >= vLo && col("vlo") <= vHi)
      .count()
  }

  private def dims(): DataFrame =
    graft.ops.Tables.events(spark, sf0001)
      .select(col("user_id").cast("long").as("u"),
        (col("value") * 100).cast("long").as("v"))

  test("morton code interleaves bits (spot values)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.morton2($"a", $"b").as("z")).as[Long].collect()
    // interleave(a even bits, b odd bits): (3,5)->a=0b11->0b0101, b=0b101->0b010001<<1=0b100010 -> 0b100111
    assert(got.sameElements(Array(0L, 1L, 2L, 39L, 0xFFFFFFFFL)))
  }

  test("z-order touches fewer files than linear sort for a trailing-dimension box") {
    val d = dims()
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.writeZOrdered(d, zDir, $"u", $"v", nFiles = 16)
    // linear baseline: same file count, clustered on u only
    d.repartitionByRange(16, $"u", $"v")
      .sortWithinPartitions($"u", $"v")
      .write.mode("overwrite").parquet(linDir)

    // box selective on v (the trailing dim), wide on u: linear layout
    // cannot skip on v at all — every file's v-envelope spans the domain
    val (vLo, vHi) = (1000L, 3000L)
    val zTouched = filesTouched(zDir, 0L, 200L, vLo, vHi)
    val linTouched = filesTouched(linDir, 0L, 200L, vLo, vHi)
    assert(zTouched < linTouched,
      s"z-order should skip files on the v dimension (z=$zTouched lin=$linTouched)")

    // and the layout is lossless: same rows both ways
    val a = spark.read.parquet(zDir).agg(count(lit(1)), sum("u"), sum("v")).head
    val b = spark.read.parquet(linDir).agg(count(lit(1)), sum("u"), sum("v")).head
    assert(a == b)
  }
}
