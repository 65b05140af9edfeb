package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-7e batch: CUSUM change-point
  * detection (window closed form ≡ the textbook recursion), largest-
  * remainder loss allocation (books balance exactly), and zone profile
  * correlation (bit-equal to a driver-side Pearson recompute). The DuckDB
  * hash gate proves engine agreement; these prove SEMANTICS by
  * independent brute force.
  */
class OpsR7eSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  /** Per-meter time-ordered (epoch_ms, cumulative counter) rows of the
    * 50×96 generator frame the CUSUM query consumes. */
  private lazy val cusumReadings: Map[Int, Seq[(Long, Long)]] =
    meter.MeterGen.readings(spark, 50, 96)
      .select(col("meter_id"), unix_millis(col("reading_timestamp")),
        col("reading_consumption_milliwatts"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap

  test("cusum: the prefix-sum-minus-running-min form equals the sequential recursion") {
    // the textbook recursion the closed form must reproduce exactly:
    // S_i = max(0, S_{i-1} + (d_i - k)), alarm when S_i > 4k
    val expected = cusumReadings.flatMap { case (m, rows) =>
      val d = rows.zip(rows.tail).map { case ((_, c1), (t2, c2)) => (t2, c2 - c1) }
      val k = d.map(_._2).sum / d.size
      var s = 0L
      d.flatMap { case (t, di) =>
        s = math.max(0L, s + (di - k))
        if (s > 4 * k) Some((m.toLong, t, s, 4 * k)) else None
      }
    }.toSet
    val got = run("ts_cusum_changepoints").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // non-vacuous both ways: the daily peak drives alarms, the nightly
    // trough resets them — neither zero alarms nor alarm-everywhere
    assert(got.nonEmpty)
    assert(got.size < cusumReadings.valuesIterator.map(_.size - 1).sum)
  }

  /** Driver-side recompute of the loss-allocation input: per (zone, hour,
    * meter) clamped load c, using the staging delta semantics
    * (first row's delta = its cumulative value). 200×192 like the query. */
  private lazy val lossInput: Map[(Int, Long), Seq[(Int, Long)]] = {
    val rows = meter.MeterGen.readings(spark, 200, 192)
      .select(col("meter_id"), unix_millis(col("reading_timestamp")),
        col("reading_consumption_milliwatts"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
    val perMeterHour = rows.toSeq.flatMap { case (m, rs) =>
      val deltas = rs.head +:
        rs.zip(rs.tail).map { case ((_, c1), (t2, c2)) => (t2, c2 - c1) }
      deltas
        .groupBy { case (t, _) => t - t % 3600000L }
        .map { case (h, ds) => (m, h, ds.map { case (_, d) => math.max(d, 0L) }.sum) }
    }
    perMeterHour
      .groupBy { case (m, h, _) => (m % 16 + 5, h) }
      .view.mapValues(_.map { case (m, _, c) => (m, c) }.toSeq).toMap
  }

  test("loss allocation: per-feeder books balance exactly and shares stay within one unit of pro-rata") {
    val got = run("meter_loss_allocation").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size === 200)
    // global balance: total allocated units == total gross-up loss
    val expectedLoss = lossInput.valuesIterator.map { ms =>
      val metered = ms.map(_._2).sum
      metered * 106 / 100 - metered
    }.sum
    assert(got.valuesIterator.map(_._3).sum === expectedLoss)
    // metered totals agree with the driver recompute
    val expectedMetered = lossInput.toSeq
      .flatMap { case (_, ms) => ms }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (m, (_, metered, _)) =>
      assert(metered === expectedMetered(m.toInt), s"meter $m metered")
    }
    // largest-remainder: each meter's allocation differs from exact
    // pro-rata by less than 1 unit per participating feeder-hour
    val exactShare = lossInput.toSeq.flatMap { case (_, ms) =>
      val metered = ms.map(_._2).sum
      val loss = metered * 106 / 100 - metered
      ms.map { case (m, c) => m -> (loss.toDouble * c / metered) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (m, (nHours, _, alloc)) =>
      assert(math.abs(alloc - exactShare(m.toInt)) < nHours.toDouble,
        s"meter $m alloc $alloc vs exact ${exactShare(m.toInt)} over $nHours hours")
    }
  }

  test("forecast backtest: equals the brute-force seasonal-naive scoring and beats the zero forecast") {
    val rows = meter.MeterGen.readings(spark, 200, 480)
      .select(col("meter_id"), unix_millis(col("reading_timestamp")),
        col("reading_consumption_milliwatts"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
    val expected = rows.map { case (m, rs) =>
      val deltas = rs.head +:
        rs.zip(rs.tail).map { case ((_, c1), (t2, c2)) => (t2, c2 - c1) }
      // (day, slot) -> actual; forecast = same slot previous day
      val bySlot = deltas.map { case (t, a) =>
        ((t / 86400000L, t % 86400000L / 900000L), a)
      }.toMap
      val scored = bySlot.toSeq.flatMap { case ((day, slot), a) =>
        bySlot.get((day - 1, slot)).map(f => (a, f))
      }
      val absErr = scored.map { case (a, f) => math.abs(a - f) }.sum
      val actual = scored.map(_._1).sum
      (m.toLong, (scored.size.toLong, absErr, scored.map { case (a, f) => a - f }.sum,
        actual, absErr * 1000000L / math.max(math.max(actual, absErr), 1L)))
    }
    val got = run("meter_forecast_backtest").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    // persistence must beat the trivial zero forecast (wape = 1e6) on
    // every meter — the same-slot structure is real signal
    assert(got.valuesIterator.forall { case (_, _, _, _, wape) => wape < 1000000L })
    assert(got.valuesIterator.forall { case (_, _, _, _, wape) => wape > 0L })
  }

  test("attribution: credited cents balance exactly to total purchase value; both channels earn") {
    val rows = run("attribution_linear").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val totalPurchaseCents = ops.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(ops.Tables.cents(col("value")))).collect()(0).getLong(0)
    // the largest-remainder split loses nothing: attributed + orphan
    // credit reconstructs every purchase cent
    assert(rows.valuesIterator.map(_._2).sum === totalPurchaseCents)
    assert(rows.keySet === Set("view", "click", "(none)"))
    assert(rows("view")._2 > 0 && rows("click")._2 > 0)
  }

  test("zone correlation: bit-equal to the driver Pearson recompute, bounded, non-degenerate") {
    // recompute the (zone, hour) kilo-loads exactly as the query defines
    // them: zone-hour sum of raw deltas, floor-divided by 1000
    val rows = meter.MeterGen.readings(spark, 200, 192)
      .select(col("meter_id"), unix_millis(col("reading_timestamp")),
        col("reading_consumption_milliwatts"))
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
    val zh = rows.toSeq.flatMap { case (m, rs) =>
      val deltas = rs.head +:
        rs.zip(rs.tail).map { case ((_, c1), (t2, c2)) => (t2, c2 - c1) }
      deltas.map { case (t, d) => (m % 16 + 5, t - t % 3600000L, d) }
    }.groupBy { case (z, h, _) => (z, h) }
      .map { case ((z, h), ds) => ((z, h), ds.map(_._3).sum / 1000L) }
    val byZone = zh.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, h), v) => h -> v }.toMap).toMap
    val expected = (for {
      za <- byZone.keys; zb <- byZone.keys if za < zb
    } yield {
      val hours = byZone(za).keySet.intersect(byZone(zb).keySet).toSeq
      val xs = hours.map(byZone(za)); val ys = hours.map(byZone(zb))
      val n = hours.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = hours.map(h => byZone(za)(h) * byZone(zb)(h)).sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val num = n * sxy - sx * sy
      ((za.toLong, zb.toLong),
        (n, num, num.toDouble /
          (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))))
    }).toMap
    val got = run("meter_zone_profile_corr").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, (n, num, c)) =>
      assert((n, num) === ((expected(k)._1, expected(k)._2)), s"moments $k")
      assert(java.lang.Double.doubleToLongBits(c)
        === java.lang.Double.doubleToLongBits(expected(k)._3), s"corr bits $k")
    }
    assert(got.valuesIterator.forall { case (_, _, c) => c >= -1.0 && c <= 1.0 })
    // all zones share the diurnal cycle: the matrix must not be noise
    assert(got.valuesIterator.exists { case (_, _, c) => c > 0.8 })
  }

  test("weather normalization: bit-equal to a driver OLS recompute over the hash-derived weather") {
    // rebuild the per-(meter, day) clamped daily sums with the engine's
    // own staging, then run the ENTIRE regression driver-side — hash
    // temperature, degree days, moments, truncating divisions — and
    // require bit-equality with the query
    val rows = graft.meter.Staging.stgMeterReadings(
        graft.meter.MeterGen.readings(spark, 200L, 2880L))
      .select(col("meter_id").cast("long"),
        to_date(col("reading_timestamp")).cast("string").as("d"),
        greatest(col("consumption_delta_mwh"), lit(0L)).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def hdd(d: String): Long =
      math.max(18L - (sources.PostingStore.h64(s"wx:v1:$d") % 35 - 5), 0L)
    val expected = rows.groupBy(_._1).map { case (m, rs) =>
      // keep the date key: mapping to (hdd, sum) pairs would collapse
      // distinct days that share a degree-day value
      val daily = rs.groupBy(_._2).toSeq
        .map { case (d, xs) => (hdd(d), xs.map(_._3).sum) }
      val n = daily.size.toLong
      val sx = daily.map(_._1).sum
      val sy = daily.map(_._2).sum
      val sxy = daily.map { case (x, y) => x * y }.sum
      val sxx = daily.map { case (x, _) => x * x }.sum
      val den = math.max(n * sxx - sx * sx, 1L)
      m -> ((n, sy, (n * sxy - sx * sy) * 1000000L / den,
        (sy * sxx - sx * sxy) * 1000L / den))
    }
    val got = run("meter_weather_normalize").collect()
      .map { r =>
        def l(i: Int) = r.getAs[Number](i).longValue
        l(0) -> ((l(1), l(2), l(3), l(4)))
      }.toMap
    assert(got === expected)
    // a 30-day window gives every meter a full regression frame, and the
    // hash weather must actually vary (a constant-HDD month would make
    // every slope the guarded-zero denominator artifact)
    assert(got.valuesIterator.forall { case (n, _, _, _) => n === 30L })
    assert(got.valuesIterator.exists { case (_, _, slope, _) => slope != 0L })
  }

  test("outage audit: gap structure equals a brute-force recompute of the dropped grid") {
    // replay the hash drop driver-side over the full expected grid, then
    // recount gaps sequentially per meter
    val rows = graft.meter.MeterGen.readings(spark, 200L, 192L)
      .select(col("meter_id").cast("long"),
        unix_timestamp(col("reading_timestamp")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = rows.filter { case (m, e) =>
      sources.PostingStore.h64(s"out:v1:$m:$e") % 20 != 0 }
    val expected = kept.groupBy(_._1).map { case (m, rs) =>
      val es = rs.map(_._2).sorted
      val gaps = es.zip(es.tail).map { case (a, b) => b - a }
      m -> ((es.size.toLong, 192L - es.size,
        es.size * 1000000L / 192L,
        gaps.count(_ > 900L).toLong,
        if (gaps.isEmpty) 0L else gaps.map(_ / 900L - 1L).max))
    }
    val got = run("meter_outage_intervals").collect()
      .map { r =>
        def l(i: Int) = r.getAs[Number](i).longValue
        l(0) -> ((l(1), l(2), l(3), l(4), l(5)))
      }.toMap
    assert(got === expected)
    // the coin really drops ~5%: missingness exists but no meter goes dark
    assert(got.valuesIterator.forall { case (n, miss, _, _, _) =>
      n > 150L && miss >= 0L })
    assert(got.valuesIterator.exists { case (_, _, _, gaps, _) => gaps > 0L })
    // books close: gaps' interiors never exceed total missing
    assert(got.valuesIterator.forall { case (_, miss, _, _, longest) =>
      longest <= miss })
  }
}
