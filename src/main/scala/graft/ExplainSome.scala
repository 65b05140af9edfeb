package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Dev helper: dump `.explain("formatted")` for the named queries to
  * `plans/r15/<name>_<suffix>.txt` — the before/after plan evidence of the
  * optimization rounds. Runs at sf0.1 (the bench SF) so shape CHOOSERS
  * (flood collapse, star-vs-min-label, driver-CC) route exactly as the
  * bench sees them. Not part of the driver contract.
  *
  * `runMain graft.ExplainSome <suffix> <query>...`
  */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      val p = Paths.get(s"plans/r15/${name}_$suffix.txt")
      Files.createDirectories(p.getParent)
      Files.writeString(p, plan)
      println(s"wrote $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
