package graft.ops

import graft.GraftQuery
import graft.GraftQuery.q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage over the TPC-H-ish star (SURVEY.md §2.2-§2.4,
  * §2.7): projections/filters (P1-P6), equi/semi/anti joins (J1-J4), one- and
  * two-level hash aggregations with conditional aggs, bool-or, exact distinct
  * (A1-A8), top-k, set ops.
  *
  * Money doubles go through [[Tables.cents]] (exact BIGINT hundredths) so
  * every sum is order-independent and bit-identical to the DuckDB oracle.
  * At 100 TB these plans are shuffle-minimal: dims broadcast, facts aggregate
  * partially map-side before the single shuffle on the group keys.
  */
object Relational {
  import Tables.cents

  private val T0315 = "1998-03-15"

  val all: Seq[GraftQuery] = Seq(
    // ---- A1/A5/E11: single-level hash agg with exact money sums (TPC-H Q1 shape)
    q("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS sum_disc_price,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT)/1000000.0 AS sum_charge,
        |  SUM(l_quantity)/COUNT(*) AS avg_qty,
        |  (CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0)/COUNT(*) AS avg_price,
        |  (CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT)/100.0)/COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = cents(col("l_extendedprice"))
      val disc = cents(col("l_discount"))
      val tax = cents(col("l_tax"))
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum(p) / 100.0).as("sum_base_price"),
          (sum(p * (lit(100L) - disc)) / 10000.0).as("sum_disc_price"),
          (sum(p * (lit(100L) - disc) * (lit(100L) + tax)) / 1000000.0).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          ((sum(p) / 100.0) / count(lit(1))).as("avg_price"),
          ((sum(disc) / 100.0) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- J1/J2 + top-k with deterministic tie-break (TPC-H Q3 shape)
    q("q3_topk_order_revenue",
      s"""SELECT l_orderkey,
         |  CAST(o_orderdate AS DATE) AS o_date,
         |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '$T0315 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$T0315 00:00:00'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(s"$T0315 00:00:00").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit(s"$T0315 00:00:00").cast("timestamp"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_date"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- J1-J3: five-way star join, broadcast dims (TPC-H Q5 shape)
    q("q5_nation_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)/10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      // year(x)=1996 as a half-open range so the predicate pushes down to
      // the parquet scan (year() itself is not pushdown-able)
      val o = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      // supplier is SF-scaled — no forced broadcast (AQE promotes it when
      // it fits); only fixed-size nation/region keep their hints
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))) / 10000.0).as("revenue"))
    },

    // ---- TPC-H Q4 shape: EXISTS decorrelated to a left-semi join on the
    // equi key with the date comparison as a residual condition — orders
    // never shuffles on anything but o_orderkey (this corpus has no
    // commit/receipt dates, so "late" = shipped >90 days after order)
    q("q4_late_ship_priority",
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // ---- TPC-H Q14 shape: promo revenue share for one ship month. The
    // part dim broadcasts; the global 2-value ratio is exact-cents on
    // both sides before the single final division.
    q("q14_promo_share",
      """SELECT
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
        |      ELSE 0 END) AS BIGINT)
        |    / CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
        |    AS promo_share_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(
        col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp"))
      val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
      // part is SF-scaled — AQE decides the build side
      li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0L))
          / sum(rev)).as("promo_share_pct"))
    },

    // ---- TPC-H Q18 shape: IN-subquery over a HAVING aggregate. The
    // subquery IS the aggregate the outer query re-derives, so the Spark
    // plan computes it ONCE and joins it back carrying total_qty — one
    // lineitem scan where the SQL text implies two. l_quantity holds
    // small integers in DOUBLE, so SUM is float-exact / order-independent.
    q("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_date, o_totalprice, total_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- TPC-H Q20 shape: nested IN with a correlated-style aggregate
    // gate (suppliers who moved excess PROMO volume). Decorrelated: part
    // filter broadcasts into the fact scan, the per-supplier aggregate is
    // one map-side-combined shuffle on l_suppkey, and the gate becomes a
    // left-semi join into the supplier dim.
    q("q20_excess_promo_suppliers",
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_suppkey HAVING SUM(l_quantity) > 400)""".stripMargin) { (s, d) =>
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val excess = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .join(promo, col("l_partkey") === col("p_partkey")) // SF-scaled part slice: AQE decides
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 400)
      Tables.supplier(s, d)
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    },

    // ---- TPC-H Q11 shape: HAVING against a global scalar subquery
    // (parts whose revenue exceeds 1.3× the per-part average). The scalar
    // decorrelates to a broadcast single-row join; the comparison is kept
    // in exact BIGINT — threshold = (13·total) div (10·n_parts) — so both
    // engines agree bit-for-bit with no float boundary.
    q("q11_important_parts",
      """WITH pr AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_cc
        |  FROM lineitem GROUP BY l_partkey),
        |g AS (SELECT CAST(SUM(rev_cc) AS BIGINT) AS tot, COUNT(*) AS np FROM pr)
        |SELECT l_partkey, rev_cc/10000.0 AS part_revenue
        |FROM pr, g WHERE rev_cc > (13 * tot) // (10 * np)""".stripMargin) { (s, d) =>
      val pr = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("rev_cc"))
      val g = pr.agg(sum(col("rev_cc")).as("tot"), count(lit(1)).as("np"))
      pr.crossJoin(broadcast(g))
        .filter(col("rev_cc") > expr("(13 * tot) div (10 * np)"))
        .select(col("l_partkey"), (col("rev_cc") / 10000.0).as("part_revenue"))
    },

    // ---- TPC-H Q6 shape: THE canonical scan-dominated query — filtered
    // single aggregate, zero joins. Its whole point is the plan: every
    // predicate in PushedFilters, a 3-column ReadSchema, one partial→final
    // agg. Exact cents arithmetic as everywhere.
    q("q6_forecast_revenue",
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |    * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cc,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("2001-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .as("revenue_cc"),
          count(lit(1)).as("n_items"))
    },

    // ---- TPC-H Q8 shape: market share — a conditional-over-total ratio
    // inside a 7-table star, by year. Both numerator and denominator come
    // from ONE aggregation pass (conditional sum over the same joined
    // rows); the supplier→nation chain rides as a broadcast and flags
    // which revenue is "ours". Ratio emitted in exact integer ppm.
    q("q8_market_share",
      """WITH joined AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(round(l.l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS rev_cc,
        |    CASE WHEN n2.n_name = 'NATION_3' THEN 1 ELSE 0 END AS ours
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n1.n_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN ours = 1 THEN rev_cc ELSE 0 END) AS BIGINT) AS our_rev_cc,
        |  CAST(SUM(rev_cc) AS BIGINT) AS total_rev_cc,
        |  CAST((SUM(CASE WHEN ours = 1 THEN rev_cc ELSE 0 END) * 1000000)
        |    // SUM(rev_cc) AS BIGINT) AS share_ppm
        |FROM joined GROUP BY 1""".stripMargin) { (s, d) =>
      val custNation = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"),
          when(col("sn_name") === "NATION_3", 1).otherwise(0).as("ours"))
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      // no broadcast hints on promo/suppNation: part and supplier are
      // SF-scaled (unlike nation/region), so forcing a broadcast would OOM
      // at the 100 TB SF; AQE promotes them to broadcast when they fit
      Tables.lineitem(s, d)
        .join(promo, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(custNation, col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("rev_cc"),
          col("ours"))
        .groupBy(col("o_year"))
        .agg(sum(when(col("ours") === 1, col("rev_cc")).otherwise(0L)).as("our_rev_cc"),
          sum(col("rev_cc")).as("total_rev_cc"))
        .select(col("o_year"), col("our_rev_cc"), col("total_rev_cc"),
          expr("(our_rev_cc * 1000000) div total_rev_cc").as("share_ppm"))
    },

    // ---- TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    // dims broadcast, one fact aggregation keyed by customer, a bounded
    // TakeOrderedAndProject instead of a global sort.
    q("q10_returned_revenue",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_cc DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
      // customer is SF-scaled — no forced broadcast (AQE decides); nation
      // is a fixed 25-row dim, so its hint is valid at any SF
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_cc"))
        .orderBy(col("revenue_cc").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- TPC-H Q17 shape: correlated per-group average gate
    // (small-quantity orders for one brand). Decorrelated: the per-part
    // average is an aggregate over the SAME filtered fact slice, joined
    // back on the part key; the 5× avg comparison stays in exact integers
    // (qty_cents · 5 · n < Σqty_cents · ... cross-multiplied).
    q("q17_small_quantity_revenue",
      """WITH brand_items AS (
        |  SELECT l_partkey, CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#7'),
        |avgs AS (
        |  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c
        |  FROM brand_items GROUP BY 1)
        |SELECT
        |  CAST(SUM(price_c) AS BIGINT) AS revenue_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM brand_items JOIN avgs ON l_partkey = pk
        |WHERE qty_c * n * 5 < sum_qty_c""".stripMargin) { (s, d) =>
      val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#7")
        .select(col("p_partkey"))
      val items = Tables.lineitem(s, d)
        .join(brand, col("l_partkey") === col("p_partkey")) // SF-scaled part slice: AQE decides
        .select(col("l_partkey"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"))
      val avgs = items.groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("sum_qty_c"))
      items.join(avgs, col("l_partkey") === col("pk"))
        // qty < avg/5 ⇔ qty·n·5 < Σqty — exact, no division
        .filter(col("qty_c") * col("n") * 5 < col("sum_qty_c"))
        .agg(sum(col("price_c")).as("revenue_c"), count(lit(1)).as("n_items"))
    },

    // ---- TPC-H Q7 shape: volume shipping between two nations — a 6-table
    // star with TWO independent dim chains (supplier→nation, customer→
    // nation) hanging off the fact. Plan intent: both nation filters
    // broadcast and prune EARLY (supplier side collapses to a broadcast
    // before touching lineitem; customer side prunes orders first), so the
    // only corpus-sized exchange is lineitem⋈orders on the order key.
    // Revenue in exact integer cents×percent, one cast at the end.
    q("q7_volume_shipping",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val nations = Tables.nation(s, d).filter(col("n_name").isin("NATION_1", "NATION_2"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ords = Tables.orders(s, d)
        .join(cust, col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .join(supp, col("s_suppkey") === col("l_suppkey")) // SF-scaled supplier slice: AQE decides
        .join(ords, col("o_orderkey") === col("l_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_cc"))
    },

    // ---- TPC-H Q19 shape: disjunctive (OR-of-ANDs) mixed-table
    // predicate. The plan story: Catalyst distributes the disjunction so
    // each side's derivable envelope pushes to ITS scan (part gets the
    // brand/size OR, lineitem gets the quantity-range OR) before the
    // broadcast join evaluates the full residual — the predicate never
    // forces a scan-everything plan.
    q("q19_disjunctive_revenue",
      """SELECT
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |         AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |         AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, d) =>
      val arm = (brand: String, sLo: Int, sHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(sLo, sHi) &&
          col("l_quantity").between(qLo, qHi)
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey")) // SF-scaled: AQE decides
        .filter(arm("Brand#1", 1, 15, 1, 11) ||
          arm("Brand#2", 10, 30, 10, 25) ||
          arm("Brand#3", 20, 50, 20, 40))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_cc"),
          count(lit(1)).as("n_items"))
    },

    // ---- TPC-H Q15 shape: argmax by scalar subquery — top supplier(s)
    // by quarterly revenue. Decorrelated: the per-supplier aggregate is
    // one map-side-combined shuffle; the MAX is a 1-row broadcast
    // compared back against the same aggregate (computed once, reused
    // through the exchange); the supplier dim broadcasts for names.
    q("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS total_cc
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '2001-04-01 00:00:00'
        |  GROUP BY 1),
        |mx AS (SELECT MAX(total_cc) AS m FROM rev)
        |SELECT s_suppkey, s_name, total_cc
        |FROM supplier JOIN rev ON l_suppkey = s_suppkey CROSS JOIN mx
        |WHERE total_cc = m""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("2001-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("total_cc"))
      val mx = rev.agg(max(col("total_cc")).as("m"))
      // the max-filtered side is ~1 row — broadcast THAT, not SF-scaled supplier
      Tables.supplier(s, d)
        .join(broadcast(rev.crossJoin(broadcast(mx)).filter(col("total_cc") === col("m"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cc"))
    },

    // ---- TPC-H Q2 shape: correlated scalar-MIN subquery over a dim chain
    // (supplier → nation → region), decorrelated as argmin-join-back. This
    // corpus has no partsupp, so the "offer book" is derived from the fact
    // once: per (part, supplier) the minimum observed unit price. The
    // region-scoped offers are computed ONCE and reused for both the
    // per-part minimum and the winning rows (one fact pass per role); the
    // correlated form survives verbatim in the oracle. Integer unit cost:
    // cents div whole-unit quantity (both engines truncate identically on
    // positive operands).
    q("q2_min_cost_supplier",
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(MIN(CAST(round(l_extendedprice*100) AS BIGINT)
        |      // CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS unit_cost_cc
        |  FROM lineitem GROUP BY 1, 2),
        |asia AS (
        |  SELECT o.l_partkey AS partkey, o.l_suppkey AS suppkey, o.unit_cost_cc,
        |         s.s_name, s.s_acctbal, n.n_name
        |  FROM offers o JOIN supplier s ON s.s_suppkey = o.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE r.r_name = 'ASIA')
        |SELECT CAST(round(a.s_acctbal*100) AS BIGINT) AS s_acctbal_cents, a.s_name, a.n_name,
        |  p.p_partkey, p.p_name, a.unit_cost_cc
        |FROM part p JOIN asia a ON a.partkey = p.p_partkey
        |WHERE p.p_size BETWEEN 10 AND 20
        |  AND a.unit_cost_cc = (SELECT MIN(a2.unit_cost_cc) FROM asia a2
        |                        WHERE a2.partkey = p.p_partkey)
        |ORDER BY s_acctbal_cents DESC, a.n_name, a.s_name, p.p_partkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val offers = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice")).as("ep_cc"),
          round(col("l_quantity")).cast("long").as("qty"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(expr("ep_cc div qty")).as("unit_cost_cc"))
      val asia = offers
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey").as("partkey"), col("unit_cost_cc"),
          col("s_name"), col("s_acctbal"), col("n_name"))
        // localCheckpoint (r15): asia feeds the per-part min AND the
        // winning-row join — un-cached, the offers agg + 3-join chain
        // ran twice (guide §5-caching)
        .localCheckpoint(eager = false)
      val minPerPart = asia.groupBy(col("partkey").as("mk"))
        .agg(min(col("unit_cost_cc")).as("min_cost_cc"))
      asia
        .join(minPerPart,
          col("partkey") === col("mk") && col("unit_cost_cc") === col("min_cost_cc"))
        .join(Tables.part(s, d).filter(col("p_size").between(10, 20)),
          col("partkey") === col("p_partkey"))
        .select(cents(col("s_acctbal")).as("s_acctbal_cents"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_name"), col("unit_cost_cc"))
        .orderBy(col("s_acctbal_cents").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // ---- TPC-H Q9 shape: multi-dim profit rollup by supplier nation and
    // order year across the full star (part filtered by name infix). No
    // partsupp/supplycost in this corpus, so cost = 80% of retail per
    // unit — the metric stays exact-integer end to end (cents × integer
    // quantities; no division anywhere), so sums are bit-stable under any
    // partitioning. Only the fixed 25-row nation dim is hint-broadcast.
    q("q9_product_profit",
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT))
        |    - CAST(round(p_retailprice*100) AS BIGINT)
        |      * CAST(round(l_quantity) AS BIGINT) * 80) AS BIGINT) AS profit_u
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val profitU = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) -
        cents(col("p_retailprice")) * round(col("l_quantity")).cast("long") * lit(80L)
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("red"))
            .select(col("p_partkey"), col("p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profitU).as("profit_u"))
    },

    // ---- TPC-H Q21 shape: the hardest classic decorrelation — EXISTS
    // (another supplier contributed to the same order) AND NOT EXISTS (no
    // OTHER supplier was late on it), both correlated self-references to
    // the same fact slice. Decorrelated into ONE per-order supplier
    // profile: tag each lineitem with its order's lateness ("late" =
    // shipped >90 days after order date — this corpus has no
    // commit/receipt dates, same convention as q4), roll up per
    // (order, supplier), then per order count suppliers and late
    // suppliers. For a late row of supplier s: EXISTS-other-supplier ⟺
    // n_supp ≥ 2, NOT-EXISTS-other-late ⟺ n_late_supp = 1 (s itself).
    // The fact is scanned once per role (profile build + waiting rows),
    // every join key is o_orderkey until the final broadcast dims, and
    // the top-k is a bounded TakeOrderedAndProject. The oracle keeps the
    // textbook correlated EXISTS/NOT EXISTS form.
    q("q21_suppliers_who_kept_orders_waiting",
      """WITH lo AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |         l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE o.o_orderstatus = 'F')
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lo l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE l1.late
        |  AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, d) =>
      val lo = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY")).as("late"))
        // localCheckpoint (r15): lo feeds the per-supplier rollup AND the
        // late-rows leg — un-cached, the lineitem⋈orders join ran twice
        .localCheckpoint(eager = false)
      // two-level distinct (a2 doctrine): per-(order, supplier) rollup,
      // then the per-order profile — no Expand for multi count-distinct
      val perSupp = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("supp_late"))
      val prof = perSupp.groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).as("n_supp"),
          count(when(col("supp_late"), lit(1))).as("n_late_supp"))
      lo.filter(col("late"))
        .join(prof, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // ---- TPC-H Q22 shape: scalar-average gate + NOT EXISTS, decorrelated.
    // The avg-of-positive-balances comparison is kept in exact integers
    // (cents × count > total-cents — no division, no float ulps); the
    // 1-row global aggregate broadcasts into the customer scan, and the
    // NOT EXISTS becomes a left-anti join on the order key. The customer
    // table is scanned twice (once for the average, once for candidates)
    // — at 100 TB both scans prune to two columns, and the aggregate side
    // is map-side combined to one row per partition before the broadcast.
    q("q22_global_sales_opportunity",
      """WITH pos AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |  FROM customer WHERE c_acctbal > 0),
        |cand AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS cents
        |  FROM customer CROSS JOIN pos
        |  WHERE CAST(round(c_acctbal*100) AS BIGINT) * n_pos > sum_cents
        |    AND NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_custkey = c_custkey
        |                      AND o.o_orderdate >= TIMESTAMP '2001-07-01 00:00:00'))
        |SELECT c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  CAST(SUM(cents) AS BIGINT) AS total_acctbal_cents
        |FROM cand GROUP BY 1""".stripMargin) { (s, d) =>
      val pos = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n_pos"),
          sum(cents(col("c_acctbal"))).as("sum_cents"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).as("cents"))
        .crossJoin(broadcast(pos))
        .filter(col("cents") * col("n_pos") > col("sum_cents"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2001-07-01 00:00:00").cast("timestamp")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("total_acctbal_cents"))
    },

    // ---- TPC-H Q13 shape: order-count DISTRIBUTION — a left outer join
    // whose residual filter lives in the JOIN condition (a WHERE would
    // silently drop the zero-order customers that are the query's point),
    // then a two-level re-aggregation: per-customer counts re-aggregated
    // into a histogram over counts. Both aggs map-side combine; the second
    // input is |customers| rows, not |orders|.
    q("q13_order_count_distribution",
      """WITH percust AS (
        |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM percust GROUP BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("o_custkey") === col("c_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- TPC-H Q12 shape: the shipping-priority audit — late lines
    // bucketed into high/low order priority per line channel. This corpus
    // has no l_shipmode or commit/receipt dates, so the channel is
    // l_returnflag and "late" = shipped >90 days after order (the Q4
    // convention). The join is the one fact-fact equi join on l_orderkey;
    // both priority buckets come from the SAME conditional aggregate (one
    // pass, map-side combinable).
    q("q12_late_priority_by_flag",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
    },

    // ---- TPC-H Q16 shape: supplier breadth per part attribute class with
    // a NOT-IN supplier exclusion. The partsupp offer book is derived from
    // the fact as distinct (part, supplier) pairs (the Q2 idiom); the
    // classic complaint-supplier NOT IN decorrelates to a broadcast
    // left-anti join (suppkey % 10 = 3 stands in for the complaints list —
    // deterministic and non-vacuous); COUNT(DISTINCT suppkey) per
    // (brand, type, size) with a TakeOrderedAndProject head.
    q("q16_supplier_breadth",
      """WITH offers AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT o.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM offers o JOIN part p ON p.p_partkey = o.l_partkey
        |WHERE p.p_brand <> 'Brand#13'
        |  AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND o.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_suppkey % 10 = 3)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 40""".stripMargin) { (s, d) =>
      val offers = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      val excl = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 10 === 3).select(col("s_suppkey"))
      offers
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
        .limit(40)
    },

    // ---- J4: left-anti join (orphan check pattern; NOT EXISTS)
    q("j_anti_customers_without_orders",
      """SELECT c_nationkey, COUNT(*) AS n_customers_no_orders
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND year(o.o_orderdate) = 2001)
        |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp") && col("o_orderdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers_no_orders"))
    },

    // ---- outer joins (absent in the reference — SURVEY §2.3 "not
    // present" — exposed as engine capabilities): left outer with NULL
    // accounting, and a full outer reconciling two daily series
    q("j_left_outer_order_counts",
      """SELECT c_custkey, c_mktsegment,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders_2001,
        |  COUNT(o_orderkey) = 0 AS had_no_orders
        |FROM customer c
        |LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |  AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '2002-01-01 00:00:00'
        |GROUP BY c_custkey, c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("2002-01-01 00:00:00").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders_2001"),
          (count(col("o_orderkey")) === 0).as("had_no_orders"))
    },

    q("j_full_outer_daily_series",
      """WITH od AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
        |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1),
        |ld AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
        |  FROM lineitem WHERE year(l_shipdate) = 1995 GROUP BY 1)
        |SELECT coalesce(od.d, ld.d) AS day,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_ships, 0) AS n_ships,
        |  od.d IS NULL AS ship_only, ld.d IS NULL AS order_only
        |FROM od FULL OUTER JOIN ld ON od.d = ld.d""".stripMargin) { (s, d) =>
      val od = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy(to_date(col("o_orderdate")).as("od_d"))
        .agg(count(lit(1)).as("n_orders_"))
      val ld = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy(to_date(col("l_shipdate")).as("ld_d"))
        .agg(count(lit(1)).as("n_ships_"))
      od.join(ld, col("od_d") === col("ld_d"), "full_outer")
        .select(
          coalesce(col("od_d"), col("ld_d")).as("day"),
          coalesce(col("n_orders_"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships_"), lit(0L)).as("n_ships"),
          col("od_d").isNull.as("ship_only"),
          col("ld_d").isNull.as("order_only"))
    },

    // ---- left-semi join (EXISTS)
    q("j_semi_customers_with_urgent",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
    },

    // ---- A2/A6/A7: two-level aggregation (daily/customer -> nation) with
    // exact count-distinct and bool-or-via-max, mirroring the billing mart shape
    q("a2_two_level_agg",
      """WITH daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |         COUNT(*) AS n_orders,
        |         SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE))
        |SELECT c_nationkey,
        |  CAST(SUM(n_orders) AS BIGINT) AS total_orders,
        |  CAST(SUM(cents) AS BIGINT)/100.0 AS total_price,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  CAST(MAX(CASE WHEN cents > 100000000 THEN 1 ELSE 0 END) AS BOOLEAN) AS any_big_day
        |FROM daily JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val daily = o
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("cents_"))
      daily.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          sum(col("n_orders")).as("total_orders"),
          (sum(col("cents_")) / 100.0).as("total_price"),
          countDistinct(col("o_custkey")).as("n_customers"),
          max(when(col("cents_") > 100000000L, 1).otherwise(0)).cast("boolean").as("any_big_day"))
    },

    // ---- A7: exact multi-column count-distinct
    q("a7_count_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS distinct_orders,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // repartition-after-read for the single-row-group scan (guide
      // §2.5), PROJECTED FIRST (guide §2.3): column pruning does not push
      // below a round-robin exchange, so repartitioning the full-width
      // table shuffled all 16 columns and sextupled the query's CPU —
      // the 4-column projection keeps the exchange narrow
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"))
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("distinct_orders"),
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_suppliers"),
          count(lit(1)).as("n_rows"))
    },

    // ---- §2.7: order-by + limit top-k with tie-break
    q("topk_customers_by_balance",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 15""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(15)
    },

    // ---- §2.7 set ops: EXCEPT (distinct semantics in both engines)
    q("setop_except_custkeys",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") && col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp")).select(col("o_custkey"))
        .except(o.filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")).select(col("o_custkey")))
    },

    // ---- §2.7 set ops: INTERSECT
    q("setop_intersect_custkeys",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast("timestamp") && col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp")).select(col("o_custkey"))
        .intersect(o.filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")).select(col("o_custkey")))
    },

    // ---- §2.7 set ops: UNION ALL + re-aggregate
    q("setop_union_all_agg",
      """SELECT src, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_key FROM (
        |  SELECT 'cust' AS src, c_custkey AS k FROM customer
        |  UNION ALL
        |  SELECT 'supp' AS src, s_suppkey AS k FROM supplier
        |) u GROUP BY src""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(lit("cust").as("src"), col("c_custkey").as("k"))
      val su = Tables.supplier(s, d).select(lit("supp").as("src"), col("s_suppkey").as("k"))
      c.union(su).groupBy(col("src"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_key"))
    },

    // ---- explicit cross join (dim × dim grid; absent in the reference)
    q("j_cross_region_nation",
      """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin) { (s, d) =>
      // broadcast the smaller side explicitly: a cross join is only ever
      // scale-sane as BroadcastNestedLoopJoin with a bounded build side —
      // under autoBroadcast=-1 a bare crossJoin would degrade to
      // CartesianProduct (PlanGuardSpec plans with -1 to catch exactly that)
      Tables.nation(s, d).select(col("n_name"))
        .crossJoin(broadcast(Tables.region(s, d).select(col("r_name"))))
        .select(col("r_name"), col("n_name"))
    },

    // ---- UNION (distinct) — the dedup twin of setop_union_all_agg
    q("setop_union_distinct",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    // ---- market-basket co-occurrence: part pairs bought together in the
    // same order, with support counts — the classic association-mining
    // primitive. Scale shape: the pair explosion is bounded per order key
    // (an order has ≤ 7 lines, so ≤ 21 pairs), the self-join is
    // co-partitioned on l_orderkey (ONE shuffle key end-to-end), and the
    // support count is a map-side-combinable aggregate on the pair key —
    // no unbounded fanout anywhere, which is what survives 100×.
    q("j_market_basket_pairs",
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT p1, p2, CAST(COUNT(*) AS BIGINT) AS support
        |FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin) { (s, d) =>
      // pinned-width repartition on the join key (r15, the
      // dedup_edit_distance lesson): AQE's size-based coalescing folds
      // the ~6 MB distinct output to a handful of partitions, which then
      // serialize the compute-heavy pair-generation join (profiled: the
      // pair stage ran 1.7 cpu-s on 5 tasks). The explicit repartition
      // re-states parallelism AND is the join's own key, so both sides
      // of the self-join reuse it — no extra exchange in the join.
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .repartition(s.sparkContext.defaultParallelism, col("l_orderkey"))
      items.as("a")
        .join(items.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
    },

    // ---- Pareto / ABC classification: parts ranked by revenue with their
    // CUMULATIVE revenue share, classed A (top 80%), B (to 95%), C (rest).
    // The global running sum is computed WITHOUT a global single-task
    // window: parts bucket into revenue BANDS (value div (max/32), a 1-row
    // broadcast max — deterministic, unlike sampled range partitioning),
    // each band runs its own ordered window, and the 33-row band-total
    // frame supplies cross-band offsets — the banded two-level prefix sum,
    // the same discipline as the PPS sampler's chunked prefix. All BIGINT:
    // cumulative share is ppm floor division, so the class boundaries are
    // exact in both engines.
    q("a_pareto_abc",
      """WITH rev AS (
        |  SELECT l_partkey, CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total FROM rev),
        |c AS (
        |  SELECT l_partkey, revenue_cents,
        |    SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rev)
        |SELECT l_partkey, revenue_cents,
        |  CAST(cum * 1000000 // total AS BIGINT) AS cum_share_ppm,
        |  CASE WHEN cum * 1000000 // total <= 800000 THEN 'A'
        |       WHEN cum * 1000000 // total <= 950000 THEN 'B'
        |       ELSE 'C' END AS abc_class
        |FROM c CROSS JOIN tot""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(Tables.cents(col("l_extendedprice"))).as("revenue_cents"))
      val stats = rev.agg(sum(col("revenue_cents")).as("total"),
        max(col("revenue_cents")).as("maxrev"))
      // deterministic band = revenue div ceil(max/32): band 0 holds the
      // largest revenues; within-band windows order by (revenue desc, key)
      val banded = rev.crossJoin(broadcast(stats))
        .withColumn("band", expr("32 - (revenue_cents div ((maxrev + 31) div 32))"))
      val inBand = Window.partitionBy(col("band"))
        .orderBy(col("revenue_cents").desc, col("l_partkey"))
      val bandTotals = banded.groupBy(col("band"))
        .agg(sum(col("revenue_cents")).as("band_sum"))
      val offsets = bandTotals
        .withColumn("offset",
          coalesce(sum(col("band_sum")).over(
            Window.partitionBy(pmod(col("band"), lit(1))).orderBy(col("band"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("band"), col("offset"))
      banded
        .withColumn("local_cum", sum(col("revenue_cents")).over(inBand))
        .join(broadcast(offsets), Seq("band"))
        .withColumn("cum", col("local_cum") + col("offset"))
        .withColumn("cum_share_ppm", expr("cum * 1000000 div total"))
        .select(col("l_partkey"), col("revenue_cents"), col("cum_share_ppm"),
          when(col("cum_share_ppm") <= 800000, "A")
            .when(col("cum_share_ppm") <= 950000, "B")
            .otherwise("C").as("abc_class"))
    },

    // ---- P1/P5: projection + rename + predicate (pushed to parquet scan)
    q("p1_projection_filter",
      """SELECT p_partkey AS part_id, upper(p_brand) AS brand_uc, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30 AND p_brand LIKE 'Brand#1%'""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_size").between(10, 30) && col("p_brand").startsWith("Brand#1"))
        .select(
          col("p_partkey").as("part_id"),
          upper(col("p_brand")).as("brand_uc"),
          col("p_type"), col("p_size"), col("p_retailprice"))
    }
  )
}
