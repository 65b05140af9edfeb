package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operational robustness: a landed-but-corrupt file in a table directory
  * (truncated upload, partial write from a crashed executor) must not take
  * down every downstream scan — `ignoreCorruptFiles` is the recovery
  * switch, and its default-off behavior is the SAFE one (fail loudly). */
class CorruptFileSpec extends SparkSpec {
  import spark.implicits._

  test("corrupt file fails the scan by default; ignoreCorruptFiles recovers the healthy rows") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt").toString
    Seq(1L, 2L, 3L).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    // plant a garbage file that claims to be parquet
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      "this is not parquet".getBytes)

    // default: loud failure (silent data loss would be worse)
    val failed =
      try { spark.read.parquet(dir).count(); false }
      catch { case _: Throwable => true }
    assert(failed, "default read must fail on the corrupt file")

    // recovery mode: healthy rows survive, corrupt file skipped
    val key = "spark.sql.files.ignoreCorruptFiles"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val got = spark.read.parquet(dir).agg(count(lit(1)), sum("x")).head
      assert(got.getLong(0) == 3L && got.getLong(1) == 6L)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
