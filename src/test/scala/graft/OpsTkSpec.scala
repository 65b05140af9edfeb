package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the time-series toolkit operators
  * (`ops.TimeSeriesTk`): LOCF time-weighted average, counter-reset
  * accounting, M4 downsampling, hopping windows, and grouped OLS trend.
  * The DuckDB hash gate proves engine agreement; these prove the
  * SEMANTICS by independent driver-side brute-force recompute.
  */
class OpsTkSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  /** The generator frame the meter-based toolkit queries consume,
    * collected: (meter_id, epoch_ms, counter_mw) sorted by time. */
  private def readings(nIntervals: Int): Map[Int, Seq[(Long, Long)]] =
    meter.MeterGen.readings(spark, 50, nIntervals)
      .select(col("meter_id"), unix_millis(col("reading_timestamp")),
        col("reading_consumption_milliwatts"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap

  test("time-weighted avg: equals the brute-force LOCF integral and is not the plain mean") {
    val slotU = (m: Int, t: Long) => {
      val x = m.toLong * 131 + t / 900000
      (x % 2147483648L) * 2654435761L % 2147483648L / 2147483648.0 < 0.9
    }
    val expected = readings(96).map { case (m, rows) =>
      val kept = rows.filter { case (t, _) => slotU(m, t) }
      val spans = kept.zip(kept.tail).map { case ((t, v), (t2, _)) => (v, t2 - t) }
      val num = spans.map { case (v, d) => v * d }.sum
      val dur = spans.map(_._2).sum
      (m.toLong, (num, dur, num / dur))
    }
    val got = run("ts_time_weighted_avg").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // the thinning makes spacing irregular, so TWA must differ from the
    // plain mean somewhere — otherwise the operator proves nothing
    val plainMeanEverywhere = expected.forall { case (m, (num, dur, _)) =>
      val kept = readings(96)(m.toInt).filter { case (t, _) => slotU(m.toInt, t) }
      num / dur == kept.dropRight(1).map(_._2).sum / (kept.size - 1)
    }
    assert(!plainMeanEverywhere, "TWA degenerated to the plain mean on every meter")
  }

  test("counter resets: wrap count and delta sum match the brute-force reconstruction") {
    val M = 20000000L
    val expected = readings(96).map { case (m, rows) =>
      val w = rows.map(_._2 % M)
      val steps = w.zip(w.tail).map { case (p, c) => c - p }
      val total = w.zip(w.tail).map { case (p, c) => if (c - p < 0) c else c - p }.sum
      (m.toLong, (total, steps.count(_ < 0).toLong))
    }
    val got = run("ts_counter_resets").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // the regime is real: some meter must actually wrap, and the
    // reset-aware total can only undercount the true consumption
    assert(expected.values.exists(_._2 > 0), "no meter ever wrapped")
    readings(96).foreach { case (m, rows) =>
      val trueTotal = rows.last._2 - rows.head._2
      assert(expected(m.toLong)._1 <= trueTotal)
    }
  }

  test("M4 buckets: open/close/min/max match brute force; envelope ordering holds") {
    val expected = readings(96).toSeq.flatMap { case (m, rows) =>
      val deltas = rows.zip(rows.tail).map { case ((_, p), (t, c)) => (t, c - p) }
      deltas.groupBy { case (t, _) => t - t % 3600000 }.map { case (b, ds) =>
        ((m.toLong, b),
          (ds.minBy(_._1)._2, ds.maxBy(_._1)._2,
            ds.map(_._2).min, ds.map(_._2).max, ds.size.toLong))
      }
    }.toMap
    val got = run("ts_downsample_m4").collect().map(r =>
      ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
    got.values.foreach { case (open, close, mn, mx, n) =>
      assert(mn <= open && open <= mx && mn <= close && close <= mx && n >= 1)
    }
  }

  test("hopping windows: every event lands in exactly size/slide windows") {
    val events = ops.Tables.events(spark, sf0001)
      .select(col("ts_ns"), col("value")).as[(Long, Double)].collect()
    val expected = events.flatMap { case (ns, v) =>
      val us = ns / 1000
      (0 to 3).map(k => ((us / 900000000L - k) * 900000, math.round(v * 100)))
    }.groupBy(_._1).map { case (ws, xs) => ws -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val got = run("w15_hopping_windows").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum === 4L * events.length)
  }

  test("V-shape pattern: matches equal brute-force run scanning; depths positive") {
    val expected = readings(96).toSeq.flatMap { case (m, rows) =>
      val d = rows.zip(rows.tail).map { case ((_, p), (t, c)) => (t, c - p) }
      val steps = d.zip(d.tail).map { case ((_, pd), (t, cd)) =>
        (t, cd, if (cd > pd) 1 else if (cd < pd) -1 else 0)
      }
      // maximal runs of equal sign, in time order
      val runs = steps.foldLeft(Vector.empty[Vector[(Long, Long, Int)]]) { (acc, x) =>
        if (acc.nonEmpty && acc.last.head._3 == x._3) acc.init :+ (acc.last :+ x)
        else acc :+ Vector(x)
      }
      runs.zipWithIndex.flatMap { case (run, i) =>
        if (run.head._3 == -1 && i + 1 < runs.size && runs(i + 1).head._3 == 1) {
          val peak = if (i == 0) run.head._2 else runs(i - 1).last._2
          Some((m.toLong, run.last._1, run.size.toLong, runs(i + 1).size.toLong,
            peak - run.last._2))
        } else None
      }
    }.toSet
    val got = run("seq_match_vshape").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    got.foreach { case (_, _, dn, up, depth) =>
      // depth can be 0 only in the documented opening-run fallback (the
      // pre-run peak is unobservable, so peak = the run's own first value)
      assert(dn >= 1 && up >= 1 && depth >= 0)
    }
    assert(got.count(_._5 > 0) > got.size / 2, "most depths should be real drops")
  }

  test("l-diversity: class diversity matches brute force and k-anonymity's class sizes") {
    val cust = ops.Tables.customer(spark, sf0001)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(ops.Tables.cents(col("c_acctbal")) / 50000.0).cast("long"))
      .as[(Int, String, Long)].collect()
    val expected = cust.groupBy(c => (c._1, c._2)).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._3).distinct.length.toLong))
    }
    val got = run("privacy_l_diversity").collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === expected)
    got.values.foreach { case (size, nSens, below) =>
      assert(nSens <= size)
      assert(below === (if (nSens < 3) 1L else 0L))
    }
  }

  test("trend slope: OLS moments match brute force; den is the fixed design constant") {
    val expected = readings(480).map { case (m, rows) =>
      val t0 = rows.head._1 // first grid point IS the generator epoch
      val daily = rows.groupBy(r => (r._1 - t0) / 86400000).toSeq.map { case (x, rs) =>
        (x, rs.map(_._2).max - rs.map(_._2).min)
      }
      val n = daily.size.toLong
      val (sx, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
      val sxy = daily.map { case (x, y) => x * y }.sum
      val sxx = daily.map { case (x, _) => x * x }.sum
      (m.toLong, (n * sxy - sx * sy, n * sxx - sx * sx))
    }
    val got = run("a_trend_slope_per_meter").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // x = 0..4 for every meter => den = 5*30 - 100 = 50, positive always
    assert(got.values.forall(_._2 == 50L))
  }
}
