package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nelson-Aalen contract: the hazard table equals a sequential
  * brute-force estimator over the same subjects (per-signup durations,
  * right-censored at corpus end), and the structural invariants hold —
  * risk set strictly decreasing in t, cumulative hazard strictly
  * increasing, first risk set = total subjects when an event lands at
  * t = 0. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("hazard table ≡ sequential brute force; censoring via the risk set only") {
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"ts_ns")
      .as[(Long, Long, String, Long)].collect()
    val mx = ev.map(_._4).max
    val byUser = ev.filter(r => r._3 == "signup" || r._3 == "purchase")
      .groupBy(_._2)
    val subjects = byUser.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      sorted.zipWithIndex.collect { case ((_, _, "signup", sNs), i) =>
        val next = sorted.drop(i + 1).collectFirst {
          case (_, _, "purchase", pNs) => pNs
        }
        ((next.getOrElse(mx) - sNs) / 3600000000000L, next.isDefined)
      }
    }.toSeq
    val total = subjects.size.toLong
    val byT = subjects.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = total
    var cum = 0L
    val want = byT.flatMap { case (t, ss) =>
      val d = ss.count(_._2).toLong
      val row = if (d > 0) {
        val hz = d * 1000000L / atRisk
        cum += hz
        Some((t, atRisk, d, hz, cum))
      } else None
      atRisk -= ss.size
      row
    }
    val got = graft.SparkEntry.queries("survival_nelson_aalen")(spark, sf0001)
      .orderBy($"t_hours")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    // invariants the estimator must satisfy
    assert(got.map(_._2) === got.map(_._2).sorted.reverse, "risk set nonincreasing")
    assert(got.map(_._5) === got.map(_._5).sorted, "cumulative hazard nondecreasing")
    assert(got.head._1 >= 0 && got.last._2 >= got.last._3, "d ≤ n at the tail")
  }
}
