package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split-conformal contract: qhat is the ceil(0.8·(n_cal+1))-th smallest
  * calibration |error| per meter (brute-forced here), coverage counts
  * test errors ≤ qhat, and fleet-mean empirical coverage sits at the
  * nominal 80% level the (n+1) correction targets. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("qhat and coverage ≡ brute force per meter; fleet coverage ≈ nominal") {
    val out = graft.SparkEntry.queries("meter_forecast_conformal")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // brute force from the same generated frame
    val stg = Staging.stgMeterReadings(MeterGen.readings(spark, 200L, 480L))
      .select($"meter_id".cast("long"), to_date($"reading_timestamp").as("d"),
        (hour($"reading_timestamp") * 4
          + expr("minute(reading_timestamp) div 15")).cast("long").as("slot"),
        $"consumption_delta_mwh".cast("long").as("a"))
      .as[(Long, java.sql.Date, Long, Long)].collect()
    val errs = stg.groupBy(r => (r._1, r._3)).values.flatMap { series =>
      val s = series.sortBy(_._2.toLocalDate.toEpochDay)
      s.sliding(2).collect { case Array(p, c) =>
        (c._1, c._2.toLocalDate.toEpochDay, math.abs(c._4 - p._4))
      }
    }.toSeq
    val d0 = errs.map(_._2).min
    var covSum = 0.0
    errs.groupBy(_._1).foreach { case (m, es) =>
      val cal = es.filter(_._2 < d0 + 2).map(_._3).sorted
      val tst = es.filter(_._2 >= d0 + 2).map(_._3)
      val k = (4 * (cal.size + 1) + 4) / 5
      val qhat = cal(k - 1)
      val covered = tst.count(_ <= qhat).toLong
      val (_, nCal, gotQ, nTest, gotCov, covPpm) = out(m)
      assert(nCal === cal.size.toLong && gotQ === qhat
        && nTest === tst.size.toLong && gotCov === covered, s"meter $m")
      covSum += covPpm
    }
    val fleetMean = covSum / out.size
    assert(fleetMean > 760000 && fleetMean < 880000,
      s"fleet-mean coverage $fleetMean should sit near the nominal 800000 ppm")
  }
}
