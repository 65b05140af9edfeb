package graft.sources

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format coverage beyond parquet: CSV and JSON lines round-trip
  * with explicit schemas (schema-on-read, no inference in the engine
  * path — inference is a full extra scan at 100 TB). */
class FormatsSpec extends SparkSpec {

  test("csv round trip with explicit schema") {
    val dir = Files.createTempDirectory("csv").toString + "/t"
    val src = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"))
    src.write.option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE")
      .csv(dir)
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }

  test("orc round trip") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    val src = Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }

  test("json lines round trip with explicit schema") {
    val dir = Files.createTempDirectory("json").toString + "/t"
    val src = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.write.json(dir)
    val back = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(dir)
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }
}
