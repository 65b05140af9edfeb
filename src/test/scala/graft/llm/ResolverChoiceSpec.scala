package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The component-resolver REGIME CHOOSER ([[Dedup.chooseStar]] /
  * [[Dedup.clusterLabelsAuto]]): the min-label vs star-contraction call
  * is derived from measured pair-graph shape, with the boundary pinned
  * here so a constant drift is a test failure, and the choice proven
  * result-invariant (both resolvers label every node with its component
  * min) on graphs straddling the boundary.
  */
class ResolverChoiceSpec extends SparkSpec {
  import spark.implicits._

  test("regime boundary is pinned: degree 8 or 2M edges routes to stars") {
    // the measured anchors (Dedup.chooseStar doc): low-degree dedup/
    // embedding graphs stay on min-label, the sf1 spatial core graph
    // (15 K nodes, 139 K pairs, mean degree ~18.5) routes to stars
    assert(!Dedup.chooseStar(nodes = 1000, edges = 1500)) // deg 3
    assert(Dedup.chooseStar(nodes = 15000, edges = 139000)) // spatial sf1
    // the degree boundary itself
    assert(Dedup.chooseStar(nodes = 1000, edges = 4000)) // deg 8.0
    assert(!Dedup.chooseStar(nodes = 1000, edges = 3999)) // deg 7.998
    // the volume guard fires regardless of degree (star's O(log n)
    // rounds cap the worst case min-label's O(diameter) does not)
    assert(Dedup.chooseStar(nodes = 100000000, edges = 2000000L)) // deg 0.04
    // degenerate empty graph stays on the cheap path
    assert(!Dedup.chooseStar(nodes = 0, edges = 0))
  }

  test("the choice never changes results: auto ≡ min-label ≡ stars on graphs straddling the boundary") {
    // low-degree side: two long paths + a singleton edge (mean degree < 8
    // → min-label route; its O(diameter) rounds are fine at this size)
    val paths = (0L until 49L).map(i => (i, i + 1)) ++
      (100L until 149L).map(i => (i, i + 1)) :+ (500L, 501L)
    // high-degree side: two 30-cliques (mean degree 29 → star route)
    val cliques = for {
      base <- Seq(0L, 1000L)
      i <- 0 until 30; j <- (i + 1) until 30
    } yield (base + i, base + j)

    for ((edges, name) <- Seq((paths, "paths"), (cliques, "cliques"))) {
      val pairs = edges.toDF("d1", "d2")
      def labelSet(df: org.apache.spark.sql.DataFrame) =
        df.select($"node", $"label").as[(Long, Long)].collect().toSet
      val auto = labelSet(Dedup.clusterLabelsAuto(pairs))
      assert(auto === labelSet(Dedup.clusterLabels(pairs)), s"$name vs min-label")
      assert(auto === labelSet(Dedup.clusterLabelsStar(pairs)), s"$name vs stars")
      assert(auto === labelSet(Dedup.clusterLabelsDriver(pairs)), s"$name vs driver")
      // every node labeled with its component MIN
      val mins = auto.groupBy(_._2).keySet
      assert(auto.forall { case (n, l) => l <= n && mins.contains(l) })
    }
  }

  test("driver union-find regime (r15): tiny graphs resolve on the driver, bound enforced") {
    // auto routes everything under DriverCcEdges to the driver resolver;
    // the resolver itself refuses graphs over the bound (belt against a
    // future caller skipping the chooser)
    assert(Dedup.DriverCcEdges === 1000000L)
    // adversarial shapes for union-find: long chain (path compression),
    // reversed chain (min arrives last), duplicate + self edges
    val chain = (0L until 200L).map(i => (i + 1, i)) // reversed: min is the tail
    val withDups = chain ++ chain ++ Seq((5L, 5L), (300L, 301L), (301L, 300L))
    val labels = Dedup.clusterLabelsDriver(
        withDups.toDF("d1", "d2").filter($"d1" =!= $"d2"))
      .as[(Long, Long)].collect().toSet
    val expected = (0L to 200L).map(n => (n, 0L)).toSet ++ Set((300L, 300L), (301L, 300L))
    assert(labels === expected)
  }
}
