package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (n <- Seq("q1_pricing_summary", "q5_nation_revenue", "p1_projection_filter", "meter_billing_daily")) {
      println(s"===== $n")
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // summarize: scans + exchanges + joins + codegen spans
      plan.linesIterator.foreach { l =>
        if (l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
            l.contains("Exchange") || l.contains("Join") || l.contains("WholeStageCodegen"))
          println(l.take(200))
      }
    }
    spark.stop()
  }
}
