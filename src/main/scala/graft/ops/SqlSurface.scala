package graft.ops

import graft.GraftQuery
import graft.GraftQuery.q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SQL-surface breadth beyond the reference (engine capabilities a user
  * migrating real workloads expects): PIVOT, lead/percent_rank/cume_dist,
  * ordered string aggregation, and native session windows
  * (`session_window`, the merging-window physical operator — the batch
  * twin of streaming session windows, vs. the lag+cumsum formulation
  * `sessionize_events` uses).
  */
object SqlSurface {

  val all: Seq[GraftQuery] = Seq(
    // ---- PIVOT: order counts per year by status (explicit value list so
    // the output schema is static — the only pivot shape that scales,
    // since inferring pivot values needs an extra pass over 100 TB)
    q("pivot_orders_status",
      """SELECT year(o_orderdate) AS y,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
        |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("y"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_filled"),
          coalesce(col("P"), lit(0L)).as("n_partial"))
    },

    // ---- lead / percent_rank / cume_dist (w3's rank family completed);
    // unique orderings keep tie semantics engine-independent
    q("w8_lead_pct_rank",
      """SELECT event_id, user_id,
        |  lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id,
        |  percent_rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS cume
        |FROM events""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val byValue = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        lead(col("event_id"), 1).over(byTime).as("next_event_id"),
        percent_rank().over(byValue).as("pct_rank"),
        cume_dist().over(byValue).as("cume"))
    },

    // ---- equi-width numeric histogram with DATA-DERIVED bounds: the
    // min/max ride in as a broadcast 1-row aggregate and the bin index is
    // exact integer-cents arithmetic (no float bin boundaries to diverge
    // at the edges). Two passes over the column, one tiny broadcast, one
    // map-side-combinable agg on the bin key.
    q("a_value_histogram",
      """WITH b AS (
        |  SELECT CAST(MIN(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS lo,
        |    CAST(MAX(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS hi
        |  FROM events),
        |binned AS (
        |  SELECT least(19, ((CAST(round(value*100) AS BIGINT) - lo) * 20)
        |      // (hi - lo + 1)) AS bin,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events CROSS JOIN b)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MIN(cents) AS BIGINT) AS min_cents,
        |  CAST(MAX(cents) AS BIGINT) AS max_cents
        |FROM binned GROUP BY 1""".stripMargin) { (s, d) =>
      val cents = Tables.cents(col("value"))
      val ev = Tables.events(s, d).select(cents.as("cents"))
      val b = ev.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      ev.crossJoin(broadcast(b))
        // div, not `/`: Column./ is double division, the bin must be exact
        .select(expr("least(19L, ((cents - lo) * 20) div (hi - lo + 1))")
          .as("bin"), col("cents"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
    },

    // ---- EXACT per-group median WITHOUT a per-group global sort — the
    // distributed order-statistic location trick (the two-level banded
    // rank scheme score_quantile_normalize uses for global ranks, here
    // locating one target rank instead of all of them). Level 1: value
    // counts collapse into $10k-wide BANDS; a band-keyed running sum
    // (window over the ≤~60-band frame per group) turns band counts into
    // cumulative offsets, and the 1-row-per-group totals pin the target
    // ranks lo=(n+1)÷2, hi=n÷2+1. Level 2: ONLY the band(s) covering a
    // target rank rank their distinct values (window bounded by
    // values-per-band; at larger scale the same banding recurses). Median
    // is reported as lo+hi ("median_x2") so even-count interpolation
    // stays in exact integers. The oracle states the naive global-window
    // form — identical output, single-task plan — which is exactly what
    // the banded shape replaces at 100 TB.
    q("a_exact_median_banded",
      """WITH v AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |r AS (
        |  SELECT grp, cents,
        |    row_number() OVER (PARTITION BY grp ORDER BY cents) AS rk,
        |    COUNT(*) OVER (PARTITION BY grp) AS n
        |  FROM v)
        |SELECT grp AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN rk = (n + 1) // 2 THEN cents ELSE 0 END)
        |     + SUM(CASE WHEN rk = n // 2 + 1 THEN cents ELSE 0 END) AS BIGINT)
        |    AS median_x2
        |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
      val counts = Tables.orders(s, d)
        .select(col("o_orderpriority").as("grp"),
          Tables.cents(col("o_totalprice")).as("cents"))
        .groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("cnt"))
        .withColumn("band", expr("cents div 1000000"))
        // feeds both the band rollup and the level-2 in-band ranking
        .localCheckpoint(eager = false)
      val bands = counts.groupBy(col("grp"), col("band"))
        .agg(sum(col("cnt")).as("band_cnt"))
      val wBand = Window.partitionBy(col("grp")).orderBy(col("band"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val withOff = bands.withColumn("offset",
        coalesce(sum(col("band_cnt")).over(wBand), lit(0L)))
      val totals = bands.groupBy(col("grp")).agg(sum(col("band_cnt")).as("n"))
        .withColumn("lo_rk", expr("(n + 1) div 2"))
        .withColumn("hi_rk", expr("n div 2 + 1"))
      val sel = withOff.join(totals, "grp")
        .filter((col("offset") < col("lo_rk")
            && col("offset") + col("band_cnt") >= col("lo_rk"))
          || (col("offset") < col("hi_rk")
            && col("offset") + col("band_cnt") >= col("hi_rk")))
        .select(col("grp"), col("band"), col("offset"),
          col("lo_rk"), col("hi_rk"))
      val wVal = Window.partitionBy(col("grp"), col("band")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val inBand = counts.join(sel, Seq("grp", "band"))
        .withColumn("start",
          col("offset") + coalesce(sum(col("cnt")).over(wVal), lit(0L)))
      val loV = inBand
        .filter(col("start") < col("lo_rk")
          && col("lo_rk") <= col("start") + col("cnt"))
        .select(col("grp"), col("cents").as("lo_cents"))
      val hiV = inBand
        .filter(col("start") < col("hi_rk")
          && col("hi_rk") <= col("start") + col("cnt"))
        .select(col("grp"), col("cents").as("hi_cents"))
      totals.join(loV, "grp").join(hiV, "grp")
        .select(col("grp").as("o_orderpriority"), col("n"),
          (col("lo_cents") + col("hi_cents")).as("median_x2"))
    },

    // ---- snapshot table diff (data-regression check between two
    // versions of a table): FULL OUTER join on the key, rows classified
    // added / removed / changed / same, with exact-cents drift mass. The
    // "new" version is derived deterministically (bump %7 balances, drop
    // %13 rows, insert 50 shifted keys) so the oracle states the same
    // scenario. At scale this is one key-partitioned full-outer join —
    // the same exchange a MERGE would need anyway.
    q("table_diff_snapshots",
      """WITH old AS (
        |  SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS cents FROM customer),
        |mx AS (SELECT MAX(c_custkey) AS mk FROM old),
        |new_v AS (
        |  SELECT c_custkey,
        |    cents + CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END AS cents
        |  FROM old WHERE c_custkey % 13 <> 0
        |  UNION ALL
        |  SELECT c_custkey + mk + 1, c_custkey * 100 FROM old CROSS JOIN mx
        |  WHERE c_custkey < 50),
        |d AS (
        |  SELECT COALESCE(o.c_custkey, n.c_custkey) AS k,
        |    CASE WHEN o.c_custkey IS NULL THEN 'added'
        |         WHEN n.c_custkey IS NULL THEN 'removed'
        |         WHEN o.cents <> n.cents THEN 'changed'
        |         ELSE 'same' END AS status,
        |    abs(COALESCE(n.cents, 0) - COALESCE(o.cents, 0)) AS drift
        |  FROM old o FULL OUTER JOIN new_v n ON o.c_custkey = n.c_custkey)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(drift) AS BIGINT) AS drift_cents
        |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
      val old = Tables.customer(s, d)
        .select(col("c_custkey"), Tables.cents(col("c_acctbal")).as("cents"))
      val mx = old.agg(max(col("c_custkey")).as("mk"))
      val newV = old.filter(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey"),
          (col("cents") + when(col("c_custkey") % 7 === 0, 1000L).otherwise(0L))
            .as("cents"))
        .unionByName(old.filter(col("c_custkey") < 50).crossJoin(broadcast(mx))
          .select((col("c_custkey") + col("mk") + 1).as("c_custkey"),
            (col("c_custkey") * 100).as("cents")))
      old.as("o").join(newV.as("n"),
          col("o.c_custkey") === col("n.c_custkey"), "full_outer")
        .select(
          when(col("o.c_custkey").isNull, "added")
            .when(col("n.c_custkey").isNull, "removed")
            .when(col("o.cents") =!= col("n.cents"), "changed")
            .otherwise("same").as("status"),
          abs(coalesce(col("n.cents"), lit(0L)) - coalesce(col("o.cents"), lit(0L)))
            .as("drift"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("drift")).as("drift_cents"))
    },

    // ---- cohort retention: users bucketed by first-activity week, then
    // distinct active users per (cohort, week-offset) — the standard
    // product-analytics mart. Shape: one agg for cohorts (user-keyed), a
    // join back on user_id (same exchange key), then a distinct-agg on
    // the (cohort, offset) pair. Weeks are ISO date_trunc on both
    // engines; the offset is exact integer day arithmetic / 7.
    q("cohort_retention",
      """WITH cohorts AS (
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT e.user_id, c.cohort_week,
        |    CAST(date_trunc('week', e.ts) AS DATE) AS act_week
        |  FROM events e JOIN cohorts c ON e.user_id = c.user_id)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, act_week) // 7 AS BIGINT) AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM activity GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
      ev.join(cohorts, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          to_date(date_trunc("week", col("ts"))).as("act_week"))
        .distinct()
        .groupBy(col("cohort_week"),
          (datediff(col("act_week"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- Markov transition matrix over the event stream: counts and
    // integer-ppm probabilities of each (prev_type → type) transition per
    // user-ordered sequence — the model a session-simulator or anomaly
    // scorer trains on. One window shuffle on user_id, one tiny agg on
    // the ≤|types|² pairs; probabilities are floor-ppm of exact counts.
    q("markov_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.event_type, c.n,
        |  CAST((c.n * 1000000) // t.tot AS BIGINT) AS p_ppm
        |FROM c JOIN t ON c.prev_type = t.prev_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val c = Tables.events(s, d)
        .select(col("event_type"), lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("prev_type")).agg(sum(col("n")).as("tot"))
      c.join(broadcast(t), Seq("prev_type"))
        .select(col("prev_type"), col("event_type"), col("n"),
          expr("(n * 1000000) div tot").as("p_ppm"))
    },

    // ---- ordered funnel analysis (view → click-after-view →
    // purchase-after-click): each stage's entry time is the MIN event time
    // AFTER the previous stage's — the staged-min formulation decorrelates
    // the sequential pattern into three keyed aggregations on user_id.
    // The same exchange key all the way down ⇒ one real shuffle, reused.
    // Comparisons stay in raw event-time (ns on both engines), only
    // counts are emitted.
    q("funnel_view_click_purchase",
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
        |  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
        |  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click""".stripMargin) {
      (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts_ns"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts_ns") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts_ns") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t3"))
      v.agg(count(lit(1)).as("n_viewed"))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_clicked_after_view"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchased_after_click"))))
    },

    // ---- multi-touch ATTRIBUTION (linear model, exact cents) — the
    // marketing-analytics companion to the funnel: every purchase's value
    // splits equally across the user's view/click touches in the prior
    // 7 days, and the books must balance to the cent — so the split uses
    // the largest-remainder discipline (base = v div n, the v mod n
    // leftover cents go +1 to the MOST RECENT touches, deterministically
    // tie-broken by event_id). Purchases with no touchpoints roll up
    // under the '(none)' channel, so the output total provably equals
    // total purchase cents (spec-asserted). Shape: one user-keyed
    // equi join with the time-range residual (the as-of/SCD2 shape —
    // the fact side never sorts on the range key); ranking and the
    // remainder windows partition per conversion (state bounded by
    // touches-per-user-week); channel rollup is map-side combinable.
    q("attribution_linear",
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS tc,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT event_id AS touch_id, user_id, ts AS tt, event_type AS channel
        |  FROM events WHERE event_type IN ('view', 'click')),
        |pairs AS (
        |  SELECT c.conv_id, c.v, t.touch_id, t.channel,
        |    CAST(COUNT(*) OVER (PARTITION BY c.conv_id) AS BIGINT) AS n,
        |    CAST(row_number() OVER (PARTITION BY c.conv_id
        |      ORDER BY t.tt DESC, t.touch_id DESC) AS BIGINT) AS rk
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |    AND t.tt < c.tc AND t.tt >= c.tc - INTERVAL 7 DAY),
        |credited AS (
        |  SELECT channel, v // n + CASE WHEN rk <= v % n THEN 1 ELSE 0 END AS credit
        |  FROM pairs),
        |attributed AS (
        |  SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |    CAST(SUM(credit) AS BIGINT) AS credit_cents
        |  FROM credited GROUP BY 1),
        |orphan AS (
        |  SELECT '(none)' AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |    CAST(COALESCE(SUM(v), 0) AS BIGINT) AS credit_cents
        |  FROM conv c WHERE NOT EXISTS (
        |    SELECT 1 FROM touch t WHERE t.user_id = c.user_id
        |      AND t.tt < c.tc AND t.tt >= c.tc - INTERVAL 7 DAY))
        |SELECT * FROM attributed UNION ALL SELECT * FROM orphan""".stripMargin) {
      (s, d) =>
      val Week = 604800000000000L // 7 days in ns
      val ev = Tables.events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts_ns").as("tc"), Tables.cents(col("value")).as("v"))
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("ts_ns").as("tt"), col("event_type").as("channel"))
      val inWindow = col("tt") < col("tc") && col("tt") >= col("tc") - Week
      val byConv = Window.partitionBy(col("conv_id"))
      val pairs = conv.join(touch, Seq("user_id")).filter(inWindow)
        .withColumn("n", count(lit(1)).over(byConv))
        .withColumn("rk", row_number().over(
          byConv.orderBy(col("tt").desc, col("touch_id").desc)))
      val attributed = pairs
        .select(col("channel"),
          (expr("v div n") + when(col("rk") <= col("v") % col("n"), 1L)
            .otherwise(0L)).as("credit"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_cents"))
      val orphan = conv.alias("c").join(touch.alias("t"),
          expr(s"t.user_id = c.user_id AND t.tt < c.tc AND t.tt >= c.tc - ${Week}L"),
          "left_anti")
        .agg(count(lit(1)).as("n_touches"),
          coalesce(sum(col("v")), lit(0L)).as("credit_cents"))
        .select(lit("(none)").as("channel"), col("n_touches"), col("credit_cents"))
      attributed.unionByName(orphan)
    },

    // ---- running COUNT(DISTINCT) over a window — not directly supported
    // by either engine's window frames; the standard re-expression is a
    // first-occurrence flag (row_number = 1 within (user, type)) summed by
    // a running frame. Two window shuffles — (user_id, event_type) then
    // user_id — both keyed, never global; the flag pass is the same
    // exchange the running sum needs, so AQE coalesces them per user.
    q("w11_running_distinct_types",
      """WITH f AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN row_number() OVER (
        |        PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |      THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS distinct_types_so_far
        |FROM f""".stripMargin) { (s, d) =>
      val byFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_ns"), col("event_id"))
      val running = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          when(row_number().over(byFirst) === 1, 1L).otherwise(0L).as("first_seen"))
        .select(col("event_id"), col("user_id"),
          sum(col("first_seen")).over(running).cast("long").as("distinct_types_so_far"))
    },

    // ---- ordered string aggregation (listagg/string_agg): sorted so the
    // result is deterministic under any partitioning — the only correct
    // form on a cluster
    q("agg_string_concat",
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  string_agg(c_name, '|' ORDER BY c_name) AS names
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          array_join(array_sort(collect_list(col("c_name"))), "|").as("names"))
    },

    // ---- ratio-to-report (share of total): the naive form is
    // `sum(x) OVER ()` — an unpartitioned window that funnels the whole
    // dataset through ONE task. The scale-correct plan aggregates per key,
    // then broadcast-joins the 1-row global total back; both stages are
    // ordinary partial-aggregated shuffles. The oracle states the naive
    // window form — same values.
    q("w10_share_of_total",
      """WITH per_user AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS user_cents
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  user_cents/100.0 AS user_value,
        |  user_cents * 1.0 / CAST(SUM(user_cents) OVER () AS BIGINT) AS share
        |FROM per_user""".stripMargin) { (s, d) =>
      val perUser = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(Tables.cents(col("value"))).as("user_cents"))
      val total = perUser.agg(sum(col("user_cents")).as("total_cents"))
      perUser
        .join(broadcast(total))
        .select(col("user_id"),
          (col("user_cents") / 100.0).as("user_value"),
          (col("user_cents") * 1.0 / col("total_cents")).as("share"))
    },

    // ---- interval/range join, bucketed: count events (any user) in the
    // 5 minutes before each event. A naive formulation is a non-equi
    // theta-join (nested-loop — dead at scale); the scale-correct plan
    // buckets time into range-width buckets, replicates each probe row
    // into its two candidate buckets, equi-joins on the bucket key, and
    // refines with the exact range predicate — candidate volume is
    // O(rows × bucket occupancy), and the only shuffle is on the bucket
    // key. Same trick as Flink interval joins / range-bucketed joins.
    q("range_join_bucketed",
      """SELECT e.event_id,
        |  CAST(COUNT(f.ts) AS BIGINT) AS n_prev_5min
        |FROM events e LEFT JOIN events f
        |  ON f.ts >= e.ts - INTERVAL 5 MINUTE AND f.ts < e.ts
        |GROUP BY e.event_id""".stripMargin) { (s, d) =>
      val BucketNs = 300L * 1000000000L // 5 minutes
      val probe = Tables.events(s, d)
        .select(col("event_id"), col("ts_ns"),
          explode(array(expr(s"ts_ns div $BucketNs"), expr(s"ts_ns div $BucketNs - 1")))
            .as("bucket"))
      val build = Tables.events(s, d)
        .select(col("ts_ns").as("f_ns"), expr(s"ts_ns div $BucketNs").as("bucket"))
      probe
        .join(build,
          probe("bucket") === build("bucket") &&
            col("f_ns") >= col("ts_ns") - BucketNs && col("f_ns") < col("ts_ns"),
          "left")
        .groupBy(col("event_id"))
        .agg(count(col("f_ns")).as("n_prev_5min"))
    },

    // ---- native session windows: Spark's merging session_window operator
    // (the batch twin of streaming session windows). Semantics equal the
    // lag+cumsum formulation when no two adjacent events sit exactly at
    // the gap boundary (true for this corpus — random sub-second
    // timestamps); the oracle states the portable formulation.
    q("sessionize_window_native",
      """WITH gaps AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |              OR CAST(epoch_ms(ts) AS BIGINT)
        |                 - CAST(epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
        |                 > 1800000
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM events),
        |sess AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM gaps)
        |SELECT user_id, CAST(epoch_ms(MIN(ts)) AS BIGINT) AS session_start_ms,
        |  COUNT(*) AS n_events, CAST(MIN(event_id) AS BIGINT) AS first_event_id
        |FROM sess GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ns")).as("min_ns"),
          min(col("event_id")).as("first_event_id"))
        .select(col("user_id"),
          expr("min_ns div 1000000").as("session_start_ms"),
          col("n_events"), col("first_event_id"))
    },

    // ---- UNPIVOT / melt: wide-to-long via the native Dataset.unpivot
    // operator (Spark's Expand node — one pass, no join, no shuffle
    // before the pre-aggregation). Melting AFTER the aggregate keeps the
    // expanded row count at |groups|×|metrics|, never |corpus|×|metrics|.
    // Exact-cents sums make the DOUBLE value column deterministic.
    q("unpivot_metrics_long",
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c,
        |    CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_c
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, CAST(qty AS DOUBLE) AS value FROM agg
        |UNION ALL
        |SELECT l_returnflag, 'sum_price' AS metric, price_c / 100.0 AS value FROM agg
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc' AS metric, disc_c / 100.0 AS value FROM agg""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).cast("long").as("sum_qty"),
          (sum(Tables.cents(col("l_extendedprice"))) / 100.0).as("sum_price"),
          (sum(Tables.cents(col("l_discount"))) / 100.0).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty").cast("double").as("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
    },

    // ---- single-pass table profiling (the Deequ/dbt-docs capability):
    // row count, per-column null counts, exact distinct counts, min/max —
    // ONE scan of the table. The three exact count-distincts expand the
    // aggregate (Spark's Expand), still one pass over the fact; at 100 TB
    // the approx variant (a7_approx_count_distinct's HLL path) swaps in
    // per column with no shape change.
    q("profile_table_orders",
      """SELECT
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_nulls,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
        |  CAST(MIN(o_custkey) AS BIGINT) AS custkey_min,
        |  CAST(MAX(o_custkey) AS BIGINT) AS custkey_max,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
        |  MIN(o_orderstatus) AS status_min,
        |  MAX(o_orderstatus) AS status_max,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS priority_distinct,
        |  CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS price_min,
        |  CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS price_max,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS price_sum
        |FROM orders""".stripMargin) { (s, d) =>
      // repartition-after-read for the single-row-group scan (guide
      // §2.5), PROJECTED FIRST (guide §2.3) — pruning does not push below
      // a round-robin exchange, so only the four profiled columns shuffle
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .repartition(s.sparkContext.defaultParallelism).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("custkey_nulls"),
        countDistinct(col("o_custkey")).as("custkey_distinct"),
        min(col("o_custkey")).as("custkey_min"),
        max(col("o_custkey")).as("custkey_max"),
        countDistinct(col("o_orderstatus")).as("status_distinct"),
        min(col("o_orderstatus")).as("status_min"),
        max(col("o_orderstatus")).as("status_max"),
        countDistinct(col("o_orderpriority")).as("priority_distinct"),
        (min(Tables.cents(col("o_totalprice"))) / 100.0).as("price_min"),
        (max(Tables.cents(col("o_totalprice"))) / 100.0).as("price_max"),
        (sum(Tables.cents(col("o_totalprice"))) / 100.0).as("price_sum"))
    },

    // ---- higher-order array functions (transform / filter / aggregate /
    // zip_with) over the embedding column — the API surface for
    // vector-valued features, all codegen-friendly per-row lambdas with
    // zero shuffles. Fixed-point quantization (2^20) keeps every derived
    // statistic an exact integer (oracle-stable regardless of order).
    q("e_hof_arrays",
      """WITH qe AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qv
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(qv) AS BIGINT) AS dim,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(len(list_filter(qv, x -> x > 0)) AS BIGINT) AS n_pos,
        |  CAST(list_sum(list_transform(list_zip(qv, qv), p -> p[1] * p[2])) AS BIGINT) AS norm2
        |FROM qe""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("qv",
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT))"))
        .select(col("vec_id"),
          size(col("qv")).cast("long").as("dim"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_max(col("qv")).as("q_max"),
          array_min(col("qv")).as("q_min"),
          size(filter(col("qv"), _ > 0L)).cast("long").as("n_pos"),
          aggregate(zip_with(col("qv"), col("qv"), _ * _), lit(0L), (acc, x) => acc + x)
            .as("norm2"))
    },

    // ---- SKYLINE (Pareto frontier) query (Börzsönyi et al., ICDE 2001):
    // the parts no other part beats on BOTH dimensions — cheaper-or-equal
    // price AND larger-or-equal size with one strict. The ORACLE states
    // the definitional NOT EXISTS (quadratic — fine at oracle scale);
    // the Spark plan is the scale shape: a part is on the frontier iff
    // its size equals its price group's max AND strictly exceeds the max
    // size over all strictly-cheaper rows. That prefix-max over cheaper
    // rows is computed WITHOUT a global window, via the banded two-level
    // prefix pattern (score_quantile_normalize's discipline): per-row
    // in-band prefix max (window KEYED by price band, RANGE frame
    // excludes equal prices) + a cross-band running max on the ~41-row
    // band frame, combined with greatest(). Equal-(price, size) ties
    // don't dominate each other and all survive. Every corpus-sized stage
    // is either a keyed groupBy or a band-keyed window; only the band
    // summary (domain-bounded, never corpus-sized) crosses partitions.
    q("skyline_pareto_frontier",
      """SELECT p.p_partkey,
        |  CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
        |  CAST(p.p_size AS BIGINT) AS p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE round(q.p_retailprice * 100) <= round(p.p_retailprice * 100)
        |    AND q.p_size >= p.p_size
        |    AND (round(q.p_retailprice * 100) < round(p.p_retailprice * 100)
        |         OR q.p_size > p.p_size))""".stripMargin) { (s, d) =>
      val BandW = 500L // cents per band: |bands| = price-domain / 500
      val rows = Tables.part(s, d)
        .select(col("p_partkey"), Tables.cents(col("p_retailprice")).as("pc"),
          col("p_size").cast("long").as("size"))
        .withColumn("band", expr(s"pc div $BandW"))
      // per-price max: dominated-by-equal-price check (keyed groupBy)
      val eqMax = rows.groupBy(col("pc").as("pc_g")).agg(max(col("size")).as("eq_max"))
      // in-band prefix max over STRICTLY cheaper rows (band-keyed window;
      // RANGE .. -1 on integer cents excludes the current price)
      val inBand = Window.partitionBy(col("band")).orderBy(col("pc"))
        .rangeBetween(Window.unboundedPreceding, -1)
      // cross-band running max over strictly earlier bands (tiny frame;
      // pmod(…,1) keeps the single-task window warning-free by doctrine)
      val bandFrame = Window.partitionBy(pmod(col("band"), lit(1L)))
        .orderBy(col("band"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bandPrev = rows.groupBy(col("band")).agg(max(col("size")).as("band_max"))
        .withColumn("prev_band_max", max(col("band_max")).over(bandFrame))
        .select(col("band").as("band_g"), col("prev_band_max"))
      val strictMax = greatest(
        coalesce(max(col("size")).over(inBand), lit(Long.MinValue)),
        coalesce(col("prev_band_max"), lit(Long.MinValue)))
      rows
        .join(broadcast(bandPrev), col("band") === col("band_g"))
        .withColumn("strict_max", strictMax)
        .join(eqMax, col("pc") === col("pc_g"))
        .filter(col("size") === col("eq_max") && col("size") > col("strict_max"))
        .select(col("p_partkey"), col("pc").as("price_cents"),
          col("size").as("p_size"))
    }
  )
}
