package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{KmvSketch, QuantileSketch, TopKSketch}

/** Cardinality sketching for corpus statistics at scale.
  *
  * [[distinctEstimate]] answers "how many distinct X per group" with a
  * bounded-memory KMV sketch (see [[graft.functions.KmvSketchAgg]]):
  * exact below k distinct values, (k-1)·H/kth_min above — with a FIXED
  * deterministic hash, so unlike approx_count_distinct the answer is
  * stable across runs, partitionings, and engines. Standard error is
  * ~1/sqrt(k-2) (~13% at k=64, ~4% at k=512).
  */
object Sketches {

  /** Hash domain: 40-bit md5 prefix. 40 bits keeps (k-1)·2^40 exactly
    * representable in a double for any practical k, so the estimate
    * arithmetic is bit-portable; collision odds stay negligible for the
    * sketch sizes KMV uses (P ≈ k²/2^41 per group). */
  val HashBits = 40
  def hash40(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, HashBits / 4), 16, 10).cast("long")

  /** (n_seen, kth_min, est_distinct) columns derived from a KMV sketch
    * array column — shared by the batch and streaming estimators. */
  def sketchSummary(kmins: Column, k: Int): Seq[Column] = {
    val domain = (1L << HashBits).toDouble // exact: 2^40
    Seq(
      size(kmins).cast("long").as("n_seen"),
      // guarded: an all-null group leaves an empty sketch, and ANSI
      // element_at rejects index 0
      when(size(kmins) > 0, element_at(kmins, size(kmins))).as("kth_min"),
      when(size(kmins) < k, size(kmins).cast("long"))
        .otherwise(floor(lit((k - 1).toDouble * domain) /
          element_at(kmins, k).cast("double")).cast("long"))
        .as("est_distinct"))
  }

  /** Per-group approximate distinct count of `valueCol`:
    * (group, n_seen, kth_min, est_distinct). One explode-free aggregation:
    * only k longs per group cross the shuffle (map-side combined). */
  def distinctEstimate(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int = 64): DataFrame = {
    val sketched = df
      .select(col(groupCol), hash40(col(valueCol)).as("__hv"))
      .groupBy(col(groupCol))
      .agg(KmvSketch.kMinValues(col("__hv"), k).as("__kmins"))
    sketched.select(col(groupCol) +: sketchSummary(col("__kmins"), k): _*)
  }

  /** Heavy hitters of `itemCol` via a Space-Saving sketch
    * ([[graft.functions.TopKSketchAgg]]): (item, count, err) for every
    * sketch entry with `count >= minCount`, count desc / item asc.
    *
    * The scale contrast with a groupBy-count-rank: the sketch shuffles at
    * most `capacity` counters per upstream partition (map-side combined),
    * never one row per distinct item — at 100 TB of tokens that is the
    * difference between a bounded merge and a vocabulary-sized exchange.
    * Guarantees: any item with true count > N/capacity is present;
    * count − err ≤ true count ≤ count; with capacity ≥ distinct items the
    * result is exact (every err 0) and arrival-order independent. */
  def heavyHitters(df: DataFrame, itemCol: String,
                   capacity: Int = 1024, minCount: Long = 1L): DataFrame = {
    df.select(col(itemCol))
      .agg(TopKSketch.topK(col(itemCol), capacity).as("__hh"))
      .select(explode(col("__hh")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("count"),
        col("e.err").as("err"))
      .where(col("count") >= minCount)
      .orderBy(col("count").desc, col("item").asc)
  }

  /** Per-group heavy hitters: one Space-Saving sketch PER GROUP —
    * (group, item, count, err) for every entry with count >= minCount,
    * ordered count desc / item asc within each group. Same guarantees as
    * [[heavyHitters]] per group; at most `capacity` counters per group
    * per upstream partition cross the shuffle (map-side combined), so a
    * per-domain / per-language token census at 100 TB never exchanges a
    * vocabulary-sized frame. */
  def groupHeavyHitters(df: DataFrame, groupCol: String, itemCol: String,
                        capacity: Int = 1024, minCount: Long = 1L): DataFrame = {
    df.select(col(groupCol), col(itemCol))
      .groupBy(col(groupCol))
      .agg(TopKSketch.topK(col(itemCol), capacity).as("__hh"))
      .select(col(groupCol), explode(col("__hh")).as("e"))
      .select(col(groupCol), col("e.item").as("item"),
        col("e.count").as("count"), col("e.err").as("err"))
      .where(col("count") >= minCount)
  }

  /** Per-group quantiles of `valueCol` via the min-k row-sampling sketch
    * ([[graft.functions.QuantileSketchAgg]]): one column `p{q·100}` per
    * requested quantile plus `n_sampled`. Exact when every group holds
    * ≤ k rows; a deterministic uniform-sample estimate (error
    * ~1/sqrt(k)) above that — same answer under any partitioning or
    * merge order, unlike percentile_approx.
    *
    * Scale shape: one aggregation; at most k (hash, value) pairs per
    * group cross the shuffle, map-side combined. The quantile convention
    * matches `Sampling.quantileThresholdBy`: smallest value whose
    * cumulative count reaches ceil(q·n). `idCol` must be unique per row
    * (it seeds the sampling hash). */
  def groupQuantiles(df: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, qs: Seq[Double],
                     k: Int = 8192): DataFrame = {
    require(qs.nonEmpty, "at least one quantile required")
    val sketched = df
      .select(col(groupCol), xxhash64(col(idCol)).as("__h"),
        col(valueCol).cast("double").as("__v"))
      .groupBy(col(groupCol))
      .agg(QuantileSketch.quantileSketch(col("__h"), col("__v"), k).as("__s"))
    val qCols = qs.map(q =>
      QuantileSketch.sketchQuantile(col("__s"), q)
        .as(s"p${math.round(q * 100)}"))
    sketched.select(
      (col(groupCol) +: qCols) :+ size(col("__s")).cast("long").as("n_sampled"): _*)
  }
}
