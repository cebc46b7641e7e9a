package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-6 regression triage (dev tool): pinned multi-trial timings for
  * q32/q34/q52 — the three queries BENCH_r05 flagged as regressed — plus a
  * stage breakdown and plan dump for q34's shingle staging, so a real plan
  * regression is distinguishable from host noise.
  *
  * VERDICT (measured at sf0.1, local[32], 5 trials each):
  *  - q34: trial curve 1.86 / 0.82 / 0.70 / 0.54 / 0.46 s; the identical
  *    operator re-measured once the JVM is warm runs 0.17 s — FASTER than
  *    its r4 bench figure (0.24 s). The staged `__norm` IS materialized
  *    (no regexp_replace inside any lambda; 2 occurrences = once per join
  *    side). The r5 figure (1.89 s) was expression-interpreter JIT warmup
  *    (array_intersect and the shingle transform run interpreted) plus
  *    host noise landing on both best-of-2 trials.
  *  - q32: steady-state 1.54-2.0 s = its r4 level (2.05 s); the r5 4.39 s
  *    was the same first-trial warmup effect (trial curve 4.7 / 2.0 /
  *    1.8 / 1.8 / 1.5 s). Stage split: minhash 0.68, banding 0.47,
  *    in-row pair explosion + distinct ~0.9. The in-row rewrite candidate
  *    in ProfileLsh times within noise of the shipped shape.
  *  - q52: 0.12-0.15 s = its r4 level (0.107 s); pure noise.
  * Fixes shipped: Bench.scala now takes min-of-3 (4th trial when spread
  * >1.5x) and warms the interpreted array paths before timing. */
object ProfileR6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def trials(name: String, n: Int = 3)(f: => Long): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"$name%-28s ${ts.map(_._1).map(t => f"$t%6.2f").mkString(" ")} s  min=${ts.map(_._1).min}%6.2f  rows=${ts.head._2}")
    }
    val docs = graft.core.Tables(spark, dir, "documents")
    docs.count() // warm scan + JIT

    val qs = graft.SparkEntry.queries
    trials("q34_ngram_jaccard", 5)(qs("q34_ngram_jaccard")(spark, dir).count())
    trials("q32_minhash_lsh_pairs", 5)(qs("q32_minhash_lsh_pairs")(spark, dir).count())
    trials("q52_split", 5)(qs("q52_split")(spark, dir).count())

    // q34 stages: pairs alone, shingle arrays alone, then the join
    val bySource = docs.select(col("source").as("src"), col("doc_id"))
    val pairs = bySource.toDF("src", "a")
      .join(bySource.toDF("src", "b"), Seq("src"))
      .where(col("a") < col("b") && (col("b") - col("a")) <= 40)
      .select("a", "b")
    trials("q34 pairs only")(pairs.count())
    val arrs = docs
      .select(col("doc_id"), Dedup.normalizedText(col("text")).as("__norm"))
      .select(col("doc_id"), Dedup.shinglesOfNormalized(col("__norm"), 3).as("__shs"))
    trials("q34 shingle arrays only")(arrs.count())
    // join with the arrays carried but NOT intersected — isolates the
    // array_intersect cost from the double-subplan + join cost
    val aSide = arrs.select(col("doc_id").as("a"), col("__shs").as("__sa"))
    val bSide = arrs.select(col("doc_id").as("b"), col("__shs").as("__sb"))
    trials("q34 join, no intersect")(
      pairs.join(aSide, Seq("a")).join(bSide, Seq("b"))
        .select(col("a"), col("b"),
          (size(col("__sa")) + size(col("__sb"))).as("s")).count())
    trials("q34 join + intersect")(
      pairs.join(aSide, Seq("a")).join(bSide, Seq("b"))
        .select(col("a"), col("b"),
          size(array_intersect(col("__sa"), col("__sb"))).as("i")).count())
    trials("q34 op as-is", 5)(
      Dedup.ngramJaccardCounts(docs, pairs, "text", "doc_id", 3).count())
    // same op but WITHOUT the fanOut repartition on the array side
    def noFanOut(): org.apache.spark.sql.DataFrame = {
      val arrs2 = docs
        .select(col("doc_id"), Dedup.normalizedText(col("text")).as("__norm"))
        .select(col("doc_id"), Dedup.shinglesOfNormalized(col("__norm"), 3).as("__shs"))
      val a2 = arrs2.select(col("doc_id").as("a"), col("__shs").as("__sa"))
      val b2 = arrs2.select(col("doc_id").as("b"), col("__shs").as("__sb"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("long")
      pairs.join(a2, Seq("a")).join(b2, Seq("b"))
        .select(col("a"), col("b"), inter.as("intersection"),
          (size(col("__sa")).cast("long") + size(col("__sb")).cast("long") - inter)
            .as("union_size"))
    }
    trials("q34 op no-fanout", 5)(noFanOut().count())

    // is __norm staged (a project on an attribute) or re-inlined into the
    // lambda? A healthy plan shows regexp_replace ONCE per row in its own
    // Project, not inside the transform() lambda.
    val plan = qs("q34_ngram_jaccard")(spark, dir).queryExecution.optimizedPlan.toString
    val lambdaHasRegex = plan.linesIterator
      .exists(l => l.contains("lambdafunction") && l.contains("regexp_replace"))
    println(s"q34 optimized plan: regexp_replace inside lambda = $lambdaHasRegex")
    println(s"q34 plan regexp_replace count = ${"regexp_replace".r.findAllIn(plan).size}")

    // assignNearest shape check: the nProbe=1 IVF/k-means assignment argmin
    // must be an aggregate (HashAggregate on the packed grid), not a
    // row_number window over the N·nList crossJoin fan-out
    for (q <- Seq("q90_ivf_kmeans", "q96_ivfpq", "q77_kmeans")) {
      val p = qs(q)(spark, dir).queryExecution.executedPlan.toString
      val windows = "Window".r.findAllIn(p).size
      val hashAggs = "HashAggregate".r.findAllIn(p).size
      val sortAggs = "SortAggregate".r.findAllIn(p).size
      println(s"$q physical: windows=$windows hashAgg=$hashAggs sortAgg=$sortAggs")
      p.linesIterator.filter(_.contains("Window")).foreach(l =>
        println("  " + l.trim.take(160)))
    }
    for (q <- Seq("q90_ivf_kmeans", "q96_ivfpq"))
      trials(q, 3)(qs(q)(spark, dir).count())
    spark.stop()
  }
}
