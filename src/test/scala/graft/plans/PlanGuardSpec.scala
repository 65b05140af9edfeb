package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Engine-wide scale tripwires, swept over EVERY registered query:
  *
  *  1. no CartesianProduct — the one join strategy that cannot survive
  *     any scale-up. Explicit `crossJoin(broadcast(tiny))` compiles to
  *     BroadcastNestedLoopJoin (bounded by the broadcast side, which
  *     every use here keeps at O(1)–O(k) rows), so it stays allowed; the
  *     unbounded shuffle-side cartesian does not.
  *  2. no bare global window — a Window with an empty partitionSpec
  *     serializes its whole input through one task. The repo's doctrine
  *     is that every DELIBERATE single-task window (always on a provably
  *     bounded frame) carries the non-foldable constant key
  *     `pmod(col, lit(1))`, so the `WindowExec: No Partition Defined`
  *     warning — and this guard — stay reserved for real regressions.
  *
  * Plans are built (analyzed + optimized + planned), NOT executed — this
  * sweeps all registered queries in seconds and catches a regression the
  * per-query specs would only see as a timeout.
  */
class PlanGuardSpec extends SparkSpec {

  /** One sweep shared by both tests: (name, physical plan string,
    * bare-global-window count in the optimized logical plan). */
  private lazy val sweep: Seq[(String, String, Int)] = {
    // Disable size-based auto-broadcast while planning: at sf0.001 every
    // table fits the default 10 MB threshold, so JoinSelection would pick
    // BroadcastNestedLoopJoin for ANY non-equi join and the guard would
    // never fire. With -1, only joins that carry an explicit broadcast()
    // hint stay BNLJ (the allowed bounded-build pattern); an unhinted
    // non-equi join between two facts degrades to CartesianProduct here —
    // exactly like it would at 100 TB.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val qe = fn(spark, sf0001).queryExecution
        val bareWindows = qe.optimizedPlan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty => w
        }.size
        (name, qe.executedPlan.toString, bareWindows)
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.catalog.clearCache()
    }
  }

  test("no registered query plans a CartesianProduct") {
    val offenders = sweep.collect {
      case (name, plan, _) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian plans in: ${offenders.mkString(", ")}")
  }

  test("no registered query plans a bare global window (empty partitionSpec)") {
    val offenders = sweep.collect { case (name, _, n) if n > 0 => name }
    assert(offenders.isEmpty,
      s"bare global windows in: ${offenders.mkString(", ")} — key the window " +
        "with pmod(col, lit(1)) if the single task is deliberate and bounded")
  }

  test("no source file — main OR test — builds an unpartitioned Window spec") {
    // The logical-plan sweep above only sees registered queries; test
    // suites build their own frames and emitted six `WindowExec: No
    // Partition Defined` warnings in r8's test log (ScaleSpec's chunk
    // prefix-sum). This grep-level tripwire covers every .scala file:
    // a Window builder whose FIRST call is orderBy has an empty
    // partitionSpec by construction. Deliberate bounded single-task
    // windows must carry the pmod(col, lit(1)) key like main source.
    val bare = java.util.regex.Pattern.compile("""Window\s*\.\s*orderBy""")
    def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isDirectory).flatMap(scalaFiles) ++
        kids.filter(f => f.isFile && f.getName.endsWith(".scala"))
    }
    // resolve the source root from a validated anchor: a relative "src"
    // silently scans nothing (vacuous pass) when the test JVM's working
    // directory is not the repo root
    val cwd = new java.io.File(sys.props("user.dir"))
    val repoRoot = Iterator.iterate(cwd)(_.getParentFile)
      .takeWhile(_ != null)
      .find(d => new java.io.File(d, "build.sbt").isFile)
      .getOrElse(fail(s"no build.sbt above ${cwd.getAbsolutePath} — cannot locate src/"))
    val files = scalaFiles(new java.io.File(repoRoot, "src"))
    assert(files.nonEmpty, s"no .scala files under ${repoRoot.getAbsolutePath}/src — guard would be vacuous")
    val offenders = files.flatMap { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      if (bare.matcher(text).find()) Some(f.getPath) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window specs in: ${offenders.mkString(", ")} — " +
        "partitionBy(pmod(col, lit(1))) if the single task is deliberate")
  }
}
