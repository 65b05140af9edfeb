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

  test("avro file round trip (AvroFileFormat by class name — no shortName registration offline)") {
    val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    val dir = Files.createTempDirectory("avro").toString + "/t"
    val src = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    src.write.format(fmt).save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0 && src.except(back).count() == 0)
  }

  test("avro wire: binary twin decodes identically to the JSON wire") {
    import graft.streaming.Ingest
    val readings = graft.meter.MeterGen.readings(spark, 20, 96)
    val viaJson = Ingest.parseAndValidate(
      readings.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          col("meter_id"), col("reading_timestamp"),
          col("reading_consumption_milliwatts"),
          col("reading_production_milliwatts"), col("status"))).as("value")))
    val viaAvro = Ingest.parseAndValidateAvro(Ingest.toAvroWire(readings).select("value"))
    assert(viaAvro.count() == readings.count())
    assert(viaAvro.except(viaJson).count() == 0 && viaJson.except(viaAvro).count() == 0)
  }

  test("avro wire: malformed records drop through the validation filter") {
    import graft.streaming.Ingest
    import spark.implicits._
    val good = Ingest.toAvroWire(graft.meter.MeterGen.readings(spark, 2, 4)).select("value")
    val bad = Seq(Array[Byte](0x7f, 0x00, 0x13, 0x42)).toDF("value")
    val out = Ingest.parseAndValidateAvro(good.union(bad))
    assert(out.count() == 8, "the 8 good records survive, the corrupt one drops")
  }

  test("binaryFile source feeds the media decode path from real files on disk") {
    import graft.llm.{MediaCodec, Multimodal}
    import spark.implicits._
    val dir = Files.createTempDirectory("media").toString
    // write real PPM files the way a media corpus lands on object storage
    val ids = Seq(0L, 3L, 6L, 9L, 12L)
    ids.foreach { id =>
      Files.write(java.nio.file.Paths.get(s"$dir/img_$id.ppm"), MediaCodec.imageFor(id))
    }
    val items = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.ppm").load(dir)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.ppm", 1).cast("long").as("doc_id"),
        lit("image").as("modality"),
        col("content"))
    val dec = Multimodal.decodeMedia(items)
      .select("doc_id", "width", "height", "value_sum")
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(dec.keySet == ids.toSet)
    ids.foreach { id =>
      val (w, h, vs) = dec(id)
      assert(w == MediaCodec.imgW(id) && h == MediaCodec.imgH(id))
      val expected = (0 until w * h * 3).map(i => MediaCodec.pixelAt(id, 0, i.toLong).toLong).sum
      assert(vs == expected, s"doc $id")
    }
  }

  test("xml round trip (XmlFileFormat is registered in Spark 4)") {
    val dir = Files.createTempDirectory("xml").toString + "/t"
    val src = Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    src.write.option("rootTag", "nations").option("rowTag", "nation").xml(dir)
    val back = spark.read
      .option("rowTag", "nation")
      .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
      .xml(dir)
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

  test("src_*_roundtrip queries are lossless and mutually identical (oracle surface)") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val expected = Tables.documents(spark, sf0001)
      .withColumn("h", graft.llm.TextHash.h64(col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        expr("bit_xor(h)").as("ck"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows("src_orc_roundtrip") === expected)
    assert(rows("src_csv_roundtrip") === expected)
    assert(rows("src_jsonl_roundtrip") === expected)
    assert(rows("src_avro_roundtrip") === expected)
    assert(rows("src_xml_roundtrip") === expected)
  }
}
