package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{CountMinSketch, HllSketch, KmvSketch, QuantileSketch, TopKSketch}

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

  // ---------------------------------------------------------------- HLL

  /** HLL hash split on the md5 convention: bucket = first p bits (p/4 hex
    * chars), rho = leading-zero count of the NEXT 40 bits + 1 ∈ [1, 41].
    * rho via `bin()`: length(bin(h)) is the MSB position of h, identical
    * in Spark and ANSI engines (no leading zeros, bin(0) = "0"). */
  def hllBucketRho(v: Column, p: Int): (Column, Column) = {
    // p ≤ 12 keeps m = 2^p within hllSummary's 64-bit-safe bound (m ≤ 2^13
    // at the aggregate, which covers even the all-zero register state; the
    // next multiple of 4, p = 16, would overflow the integer harmonic sum)
    require(p % 4 == 0 && p >= 4 && p <= 12, s"p must be a multiple of 4 in [4,12], got $p")
    val mh = md5(v.cast("string"))
    val bucket = conv(substring(mh, 1, p / 4), 16, 10).cast("long")
    val rh = conv(substring(mh, p / 4 + 1, 10), 16, 10).cast("long")
    val rho = when(rh === 0L, lit(41L))
      .otherwise(lit(41L) - length(bin(rh)).cast("long"))
    (bucket, rho)
  }

  /** alpha_m · m² · 2^49 as the exact double the estimate divides by the
    * integer harmonic sum. Bias constants per Flajolet et al. 2007: the
    * asymptotic 0.7213 / (1 + 1.079/m) holds for m ≥ 128; the paper's
    * tabulated small-m constants (0.673 / 0.697 / 0.709 for m = 16/32/64)
    * apply below that — the asymptotic formula is systematically biased
    * there. */
  def hllConstant(m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m.toDouble * m.toDouble * (1L << 49).toDouble
  }

  /** (n_zero, sum_scaled, est_distinct) derived from a register array.
    * sum_scaled = Σ 2^(49−rho_j) is the harmonic sum scaled by 2^49 —
    * EXACT integer math (rho ≤ 41 ⇒ terms ≥ 2^8; even the all-zero
    * state's m·2^49 stays ≤ 2^62 at the aggregate's m ≤ 2^13 bound), so
    * the only floating-point step is one literal/integer
    * division + floor, bit-deterministic across engines. Raw HLL regime
    * only — no small-range linear-counting branch (ln() is libm-dependent
    * and would break bit-portability); n_zero is emitted so consumers can
    * apply corrections downstream. */
  def hllSummary(regs: Column, m: Int): Seq[Column] = Seq(
    size(filter(regs, r => r === 0)).cast("long").as("n_zero"),
    aggregate(regs, lit(0L),
      (acc, r) => acc + call_function("shiftleft", lit(1L), lit(49) - r)).as("sum_scaled"),
    floor(lit(hllConstant(m)) /
      aggregate(regs, lit(0L),
        (acc, r) => acc + call_function("shiftleft", lit(1L), lit(49) - r)).cast("double"))
      .as("est_distinct"))

  /** Per-group HLL distinct count of `valueCol`:
    * (group, n_zero, sum_scaled, est_distinct). The constant-memory
    * counterpart of [[distinctEstimate]]: m BYTES per group cross the
    * shuffle (vs KMV's k longs), with ~1.04/sqrt(m) standard error — at
    * 100 TB the per-group state is fixed at m bytes no matter how many
    * billions of distinct values stream through, and the elementwise-max
    * merge is idempotent under retries. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  m: Int = 256): DataFrame = {
    val p = 31 - Integer.numberOfLeadingZeros(m)
    val (bucket, rho) = hllBucketRho(col(valueCol), p)
    val sketched = df
      .select(col(groupCol), bucket.as("__b"), rho.as("__r"))
      .groupBy(col(groupCol))
      .agg(HllSketch.registers(col("__b"), col("__r"), m).as("__regs"))
    sketched.select(col(groupCol) +: hllSummary(col("__regs"), m): _*)
  }

  /** Register-level HLL UNION: elementwise max — the sketch of A ∪ B
    * without touching the data again. With inclusion–exclusion this
    * yields intersection estimates (est(A)+est(B)−est(A∪B)); pure
    * column math, replayable in SQL. */
  def hllUnionRegisters(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => greatest(x, y))

  // ---------------------------------------------------------- Count-Min

  /** The d md5-derived CMS bucket positions of an item, as an
    * ARRAY<BIGINT> column: bucket_i = md5("i:" + item) mod w on the
    * engine's 40-bit md5-prefix convention — pure plan-space column
    * math, replayable in ANSI SQL. */
  def cmsBuckets(item: Column, depth: Int, width: Int): Column =
    // null-gated: a null item must yield a NULL array (skipped by the
    // aggregate), not an array of nulls
    when(item.isNotNull, array((0 until depth).map { i =>
      conv(substring(md5(concat(lit(s"$i:"), item.cast("string"))), 1, 10),
        16, 10).cast("long") % width
    }: _*))

  /** One CMS counter matrix (row-major d×w array) over every row of
    * `itemCol`: the frequency-estimation sketch — exactly d·w longs
    * cross the shuffle regardless of stream size, map-side combined,
    * merge = elementwise add (any partitioning yields the identical
    * matrix). */
  def cmsMatrix(df: DataFrame, itemCol: String,
                depth: Int = 4, width: Int = 512): DataFrame =
    df.select(cmsBuckets(col(itemCol), depth, width).as("__bk"))
      .agg(CountMinSketch.matrix(col("__bk"), depth, width).as("cms"))

  /** CMS INNER PRODUCT of two matrices built with the same (d, w):
    * min over hash rows of Σ_b A[row][b]·B[row][b] — the classic
    * join-size / self-join-size estimator (Σ_k fA(k)·fB(k), one-sided:
    * est ≥ true), computed from two fixed-size sketches without
    * executing the join. Exact integer math, SQL-replayable. */
  def cmsInnerProduct(a: Column, b: Column, depth: Int, width: Int): Column = {
    val perRow = (0 until depth).map { i =>
      aggregate(
        zip_with(slice(a, i * width + 1, width), slice(b, i * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }
    perRow.reduce(least(_, _))
  }

  /** Point estimate from a matrix column for an item column:
    * min over hash rows of the item's counter — the classic one-sided
    * CMS estimate (est ≥ true count; est ≤ true + e/w·N w.p. 1−e^−d). */
  def cmsEstimate(matrix: Column, item: Column,
                  depth: Int, width: Int): Column = {
    val perRow = (0 until depth).map { i =>
      val b = conv(substring(md5(concat(lit(s"$i:"), item.cast("string"))), 1, 10),
        16, 10).cast("long") % width
      element_at(matrix, (lit(i * width) + b + 1).cast("int"))
    }
    perRow.reduce(least(_, _))
  }
}
