package graft.ops

import graft.GraftQuery
import graft.GraftQuery.q
import graft.meter.MeterGen
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension type 2 (engine capability beyond the
  * reference, whose dims are static): build effective-dated dimension
  * versions with a `lead()` window, then join facts to the version that
  * was current at fact time. The as-of-version join keeps the equi key
  * (custkey) — the range predicate is a residual filter on a broadcast
  * hash join, so the fact never shuffles on anything but its own key and
  * the plan survives 100 TB.
  *
  * Version history is synthesized deterministically (Knuth-hash jitter,
  * [[graft.meter.MeterGen.u]]) so the whole operator family is
  * DuckDB-oracle-checked, not just spot-tested.
  */
object Scd {

  private val tiers = Seq("bronze", "silver", "gold")

  /** 3 versions per customer: v0 from the epoch of the order corpus,
    * v1/v2 starting at jittered later dates. */
  private def versions(s: SparkSession, d: String): DataFrame = {
    val vdays = (col("version") * 730 +
      floor(MeterGen.u(col("c_custkey") * 31 + col("version") * 7) * 700)).cast("int")
    Tables.customer(s, d)
      .select(col("c_custkey"),
        explode(array(lit(0), lit(1), lit(2))).as("version"))
      .withColumn("valid_from",
        when(col("version") === 0, to_date(lit("1992-01-01")))
          .otherwise(date_add(to_date(lit("1992-01-01")), vdays)))
      .withColumn("tier",
        element_at(typedLit(tiers), ((col("c_custkey") + col("version")) % 3 + 1).cast("int")))
  }

  private def versionsSql: String =
    s"""vers AS (
       |  SELECT c_custkey, version,
       |    CASE WHEN version = 0 THEN DATE '1992-01-01'
       |         ELSE DATE '1992-01-01' + CAST(version * 730 +
       |           floor(${MeterGen.uSql("c_custkey * 31 + version * 7")} * 700) AS INTEGER)
       |    END AS valid_from,
       |    (['bronze', 'silver', 'gold'])[CAST((c_custkey + version) % 3 + 1 AS INTEGER)] AS tier
       |  FROM customer, (SELECT unnest([0, 1, 2]) AS version))""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    // ---- SCD-2 build: close each version with the next one's start
    q("scd2_build",
      s"""WITH $versionsSql
         |SELECT c_custkey, version, tier, valid_from,
         |  coalesce(lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY version),
         |    DATE '2200-01-01') AS valid_to
         |FROM vers""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("version"))
      versions(s, d).select(
        col("c_custkey"), col("version"), col("tier"), col("valid_from"),
        coalesce(lead(col("valid_from"), 1).over(w),
          to_date(lit("2200-01-01"))).as("valid_to"))
    },

    // ---- as-of version join: each order lands in exactly one version
    // interval of its customer (equi join on custkey + residual range
    // filter — broadcast-able dim, fact untouched)
    q("scd2_asof_orders",
      s"""WITH $versionsSql,
         |scd AS (
         |  SELECT c_custkey, version, tier, valid_from,
         |    coalesce(lead(valid_from) OVER (PARTITION BY c_custkey ORDER BY version),
         |      DATE '2200-01-01') AS valid_to
         |  FROM vers)
         |SELECT s.tier, COUNT(*) AS n_orders,
         |  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
         |  CAST(MIN(o.o_orderkey) AS BIGINT) AS min_orderkey
         |FROM orders o JOIN scd s
         |  ON o.o_custkey = s.c_custkey
         |  AND o.o_orderdate >= s.valid_from AND o.o_orderdate < s.valid_to
         |GROUP BY s.tier""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("version"))
      val scd = versions(s, d).select(
        col("c_custkey"), col("tier"), col("valid_from"),
        coalesce(lead(col("valid_from"), 1).over(w),
          to_date(lit("2200-01-01"))).as("valid_to"))
      Tables.orders(s, d)
        .join(broadcast(scd),
          col("o_custkey") === col("c_custkey") &&
            col("o_orderdate") >= col("valid_from") &&
            col("o_orderdate") < col("valid_to"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          min(col("o_orderkey")).as("min_orderkey"))
    },

    // ---- SCD-1 MERGE / upsert: apply a CDC batch (insert / update /
    // delete ops) to the customer base — the batch analogue of
    // `MERGE INTO`. The CDC batch is synthesized deterministically from
    // the key space (custkey%10: 0→update +100.00 balance, 1→delete,
    // 2→insert a fresh key above the base range).
    //
    // Scale shape: a CDC batch is tiny next to the base, so every arm is
    // a BROADCAST of the batch — update = broadcast equi join, delete =
    // broadcast anti join, insert = plain union. The base table never
    // shuffles, which is the only MERGE plan that survives 100 TB.
    q("merge_upsert_customers",
      """WITH maxk AS (SELECT MAX(c_custkey) AS mk FROM customer),
        |ups AS (SELECT c_custkey, CAST(round(c_acctbal * 100) + 10000 AS BIGINT) AS new_bal_c
        |        FROM customer WHERE c_custkey % 10 = 0),
        |dels AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 1),
        |ins AS (SELECT c_custkey + mk AS c_custkey, c_nationkey,
        |          CAST(0 AS BIGINT) AS bal_c
        |        FROM customer, maxk WHERE c_custkey % 10 = 2),
        |kept AS (
        |  SELECT b.c_custkey, b.c_nationkey,
        |    CAST(coalesce(u.new_bal_c, CAST(round(b.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c,
        |    CASE WHEN u.c_custkey IS NOT NULL THEN 'updated' ELSE 'base' END AS src
        |  FROM customer b
        |  LEFT JOIN ups u ON b.c_custkey = u.c_custkey
        |  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM dels))
        |SELECT c_custkey, c_nationkey, bal_c, src FROM kept
        |UNION ALL
        |SELECT c_custkey, c_nationkey, bal_c, 'inserted' AS src FROM ins""".stripMargin) { (s, d) =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          Tables.cents(col("c_acctbal")).as("bal_c"))
      val ups = base.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), (col("bal_c") + 10000L).as("new_bal_c"))
      val dels = base.filter(col("c_custkey") % 10 === 1).select(col("c_custkey"))
      val maxK = base.agg(max(col("c_custkey")).as("mk"))
      val ins = base.filter(col("c_custkey") % 10 === 2)
        .crossJoin(broadcast(maxK))
        .select((col("c_custkey") + col("mk")).as("c_custkey"), col("c_nationkey"),
          lit(0L).as("bal_c"), lit("inserted").as("src"))
      base
        .join(broadcast(dels.withColumnRenamed("c_custkey", "d_key")),
          col("c_custkey") === col("d_key"), "left_anti")
        .join(broadcast(ups.withColumnRenamed("c_custkey", "u_key")),
          col("c_custkey") === col("u_key"), "left")
        .select(col("c_custkey"), col("c_nationkey"),
          coalesce(col("new_bal_c"), col("bal_c")).as("bal_c"),
          when(col("u_key").isNotNull, "updated").otherwise("base").as("src"))
        .unionByName(ins)
    }
  )
}
