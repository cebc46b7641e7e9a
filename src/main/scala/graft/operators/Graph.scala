package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph algorithms over edge-list DataFrames.
  *
  * Complements [[Dedup.connectedComponents]] (similarity clustering)
  * with the ranking side: PageRank as repeated join-aggregate rounds —
  * the canonical "is your engine really distributed" iterative workload
  * (each round is one shuffle join on `src` + one hash aggregation on
  * `dst`; nothing is ever collected to the driver except the node
  * count).
  *
  * All rank arithmetic is SCALED-INTEGER with floor division at every
  * step, so the result is bit-reproducible across engines, partitionings
  * and retries — no float summation order to drift. Conventions (both
  * deliberate, both cheap to replay in ANSI SQL):
  *   - dangling nodes (no out-edges) drop their mass each round rather
  *     than redistributing it — ranks still order identically for
  *     connected graphs, and the oracle replays the same rule;
  *   - the per-round floor() loses at most 1 scale-unit per node per
  *     round (scale defaults to 10^12, so the quantization is ~1e-12).
  */
object Graph {

  /** PageRank over a directed edge list `(src BIGINT, dst BIGINT)`.
    *
    * Returns (node, rank_scaled): rank × `scale`, integer-floored at
    * every step. `damp` is the damping factor as a rational
    * dampNum/dampDen (default 85/100).
    *
    * Scale shape: per iteration, ranks join edges on `src` (shuffle
    * hash join keyed by src — co-partitioned with the out-degree join
    * on the same key) and partial-aggregate contributions by `dst`
    * (map-side combined). Each round persists + materializes its ranks
    * so round k+1 reads cached blocks, then unpersists round k's.
    * persist (not localCheckpoint, which [[Dedup.connectedComponents]]
    * uses) is the deliberate choice here: the rank plan nests only
    * LINEARLY per round (one join chain — no self-join blow-up to
    * truncate), so keeping lineage costs O(iterations) analyzer work at
    * bounded iteration counts while preserving recomputability — a lost
    * cached block on a real cluster re-derives (slowly, through the
    * unpersisted chain) instead of failing the job the way a truncated
    * local checkpoint would. */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L,
               dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen, "damping must be in [0,1]")
    val spark = edges.sparkSession
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg")).persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    // exact integer constants, identical arithmetic in the SQL oracle
    val r0 = scale / n
    val base = (dampDen - dampNum).toLong * scale / (dampDen.toLong * n)

    var ranks = nodes.withColumn("r", lit(r0)).persist()
    ranks.count() // materialize before the loop so each round is one stage
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(outDeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div __deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
            .as("r"))
        .persist()
      next.count() // cut lineage: each round reads materialized ranks
      ranks.unpersist()
      ranks = next
      i += 1
    }
    // final ranks are materialized (last next.count()); drop the helpers
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** PERSONALIZED PageRank: the teleport mass lands only on the `seeds`
    * node set instead of uniformly — the similarity-to-seed-set measure
    * behind related-item / audience-expansion queries. Same exact
    * integer scaffold as [[pageRank]] (r ≤ scale keeps products in 64
    * bits; the oracle replays every floor division): initial rank
    * scale/|S| on seeds and 0 elsewhere, per-round base term
    * (1−d)·scale/|S| on seeds and 0 elsewhere. Non-seed nodes
    * accumulate rank only through link structure, so rank decays with
    * distance from the seed set. Scale shape identical to [[pageRank]]
    * (per-round src-keyed join + dst-keyed partial agg, ranks persisted
    * and materialized per round — see pageRank's scaladoc for the
    * persist-vs-checkpoint rationale); the seed flag is one
    * broadcast-sized join on the node dimension. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int,
                           scale: Long = 1000000000000L,
                           dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen, "damping must be in [0,1]")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    val seedSet = seeds.select(col("node").cast("long").as("node"))
      .distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seedSet.withColumn("__seed", lit(1)), Seq("node"), "left")
      .persist()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg")).persist()
    val nS = seedSet.count()
    require(nS > 0, "empty seed set")
    val r0 = scale / nS
    val base = (dampDen - dampNum).toLong * scale / (dampDen.toLong * nS)

    var ranks = nodes
      .select(col("node"),
        when(col("__seed").isNotNull, lit(r0)).otherwise(lit(0L)).as("r"))
      .persist()
    ranks.count()
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(outDeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div __deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed").isNotNull, lit(base)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen")).as("r"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    e.unpersist(); nodes.unpersist(); outDeg.unpersist(); seedSet.unpersist()
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** Weighted PageRank over `(src, dst, w)` with positive integer edge
    * weights: contributions split by out-weight SHARE rather than
    * out-degree. To keep every product inside 64 bits (rank ≤ scale ~
    * 10^12 times raw weights would overflow), each edge's weight is
    * pre-normalized once to an integer share ∈ [0, shareScale]:
    * share = w·shareScale // W(u), and per round
    * contrib(u→v) = r(u)·share // shareScale — products stay ≤
    * scale·shareScale ~ 10^16. Share flooring drops at most
    * outDeg/shareScale of each node's mass per round (deterministic,
    * replayed by the oracle). Same iteration scaffold and scale shape
    * as [[pageRank]]. */
  def pageRankWeighted(edges: DataFrame, iterations: Int,
                       scale: Long = 1000000000000L,
                       shareScale: Long = 10000L,
                       dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(shareScale >= 1, "shareScale must be >= 1")
    val spark = edges.sparkSession
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .where(col("w") > 0L)
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("__W"))
    val e = e0.join(outW, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * ${shareScale}L) div __W").as("share"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = scale / n
    val base = (dampDen - dampNum).toLong * scale / (dampDen.toLong * n)
    var ranks = nodes.withColumn("r", lit(r0)).persist()
    ranks.count()
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"(r * share) div ${shareScale}L").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
            .as("r"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    e.unpersist(); nodes.unpersist()
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** Bounded-round min-label propagation over the SYMMETRIZED edge list:
    * label(v) starts as v's own id; each round takes the min over v and
    * its neighbors' labels. After r rounds label(v) = the smallest node
    * id within graph distance r — bounded-diameter community seeds, with
    * connected components as the fixpoint (the engine's
    * [[Dedup.connectedComponents]] reaches that fixpoint by pointer
    * jumping; this op is the bounded-round, oracle-unrollable variant).
    * Scale shape per round: one shuffle join edge⋈labels on src + one
    * min-aggregation on dst, labels materialized between rounds. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val nodes = sym.select(col("src").as("node")).distinct().persist()
    var labels = nodes.withColumn("lbl", col("node")).persist()
    labels.count()
    var i = 0
    while (i < rounds) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(min(col("lbl")).as("nl"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
        .persist()
      next.count()
      labels.unpersist()
      labels = next
      i += 1
    }
    sym.unpersist(); nodes.unpersist()
    labels
  }
}
