package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Integer-scaled PageRank: driver-side replica equivalence, partition
  * independence, dangling-node rule, and basic rank ordering. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side replica of the scaled-integer iteration. */
  private def replica(edges: Seq[(Long, Long)], iters: Int,
                      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 15L * scale / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val contribs = edges
        .map { case (s, d) => d -> r(s) / outDeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v => v -> (base + 85L * contribs.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private val g = Seq( // a small directed graph incl. a dangling node (4)
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L), (5L, 3L), (5L, 1L))

  test("3 iterations match the driver-side replica exactly") {
    val got = Graph.pageRank(g.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == replica(g, 3))
  }

  test("result is independent of input partitioning") {
    val a = Graph.pageRank(g.toDF("src", "dst").repartition(7), iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(g.toDF("src", "dst").repartition(1), iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("hub ordering: node 3 (most in-links) outranks the friendless source 5") {
    val got = Graph.pageRank(g.toDF("src", "dst"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) > got(5L), "in-link hub must outrank a no-inlink source")
    // node 5 has no in-edges: rank is exactly the teleport base
    assert(got(5L) == 15L * 1000000000000L / (100L * 5L))
  }

  test("dangling rule: total mass shrinks by the dangling share (never grows)") {
    val got = Graph.pageRank(g.toDF("src", "dst"), iterations = 1)
      .collect().map(_.getLong(1)).sum
    assert(got <= 1000000000000L, "mass must not grow")
    assert(got > 0L)
  }

  test("label propagation: 2 rounds reach distance-2 minima; fixpoint = components") {
    // path 1-2-3-4-5 plus isolated pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    def run(r: Int) = Graph.labelPropagation(edges.toDF("src", "dst"), r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val two = run(2)
    // node 4 is distance 3 from node 1: after 2 rounds its min label is 2
    assert(two(4L) == 2L && two(5L) == 3L && two(3L) == 1L)
    assert(two(10L) == 10L && two(11L) == 10L)
    // enough rounds = connected components
    val fix = run(5)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(fix(_) == 1L))
    assert(fix(10L) == 10L && fix(11L) == 10L)
    // symmetrization: direction of the input edge must not matter
    val rev = Graph.labelPropagation(
      edges.map(e => (e._2, e._1)).toDF("src", "dst"), 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rev == two)
  }

  test("empty and degenerate inputs are rejected or handled") {
    val err = intercept[Exception] {
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), 1).collect()
    }
    assert(err.getMessage.contains("empty graph"))
    // single self-loop: all mass stays (minus floor dust)
    val solo = Graph.pageRank(Seq((7L, 7L)).toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(solo.keySet == Set(7L))
    assert(solo(7L) > 999999999900L && solo(7L) <= 1000000000000L)
  }

  test("personalized PageRank: teleport confined to seeds, rank decays with distance") {
    import graft.operators.Graph
    // path 1 -> 2 -> 3 with seed {1}: every round node 1 holds only the
    // base term (no in-links), node 2 only damped node-1 mass, node 3
    // only damped node-2 mass — strict decay along the path, all exact
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graph.personalizedPageRank(edges, seeds, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val scale = 1000000000000L
    val base = 15L * scale / 100L
    assert(r(1L) == base)
    assert(r(2L) == 85L * base / 100L)
    assert(r(3L) == 85L * (85L * base / 100L) / 100L)
    // uniform PageRank on the same graph gives node 3 the MOST mass
    // (sink of the path) — personalization inverts the ordering
    val u = Graph.pageRank(edges, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(u(3L) > u(1L) && r(1L) > r(3L))
    // empty seed set refused
    intercept[IllegalArgumentException](
      Graph.personalizedPageRank(edges, Seq.empty[Tuple1[Long]].toDF("node"),
        iterations = 1).collect())
  }
}
