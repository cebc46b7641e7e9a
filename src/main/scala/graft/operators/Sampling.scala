package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splits for training-data pipelines.
  *
  * Everything is hash-bucket based (md5 of the id rendered as a decimal
  * string), so assignment is a pure function of the id: stable across
  * runs, engines, partitionings, and cluster sizes — no RNG state, no
  * seed plumbing, and the oracle can recompute it in SQL. Buckets are the
  * first 48 bits of the md5 taken mod `buckets` (uniform to ~2^-48).
  */
object Sampling {

  /** Hash bucket in [0, buckets) for an id column. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic train/val/test split label: the first `trainPct`
    * buckets are train, the next `valPct` val, the rest test. */
  def splitCol(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be non-negative and sum to at most 100")
    val b = hashBucket(id, 100)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Keep-predicate sampling `pct` percent of rows by id hash —
    * deterministic, join-stable (the same ids survive in every table
    * sampled with the same column). */
  def sampledBy(id: Column, pct: Int): Column =
    hashBucket(id, 100) < pct

  /** Stratified keep-predicate: per-stratum sampling rates (percent),
    * `defaultPct` for unlisted strata — the rebalancing move of a
    * training-data pipeline (downsample the dominant language / source,
    * keep the rare ones whole). Same md5 buckets as [[sampledBy]], so
    * stratified and plain samples of the same id column stay join-stable;
    * a pure row-local predicate, no shuffle, pushes below wider plans. */
  def stratifiedKeep(id: Column, stratum: Column, rates: Map[String, Int],
                     defaultPct: Int = 0): Column = {
    require((defaultPct +: rates.values.toSeq).forall(p => p >= 0 && p <= 100),
      "sampling percentages must be in [0, 100]")
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(stratum === lit(k), lit(p)).otherwise(acc)
    }
    hashBucket(id, 100) < pct
  }

  /** Weighted Bernoulli keep-predicate (probability-proportional-to-size
    * sampling): row kept with probability min(1, num·w/denom), decided by
    * the id's 40-bit md5 prefix — EXACT INTEGER arithmetic throughout, so
    * the decision is a pure function of (id, weight) reproducible on any
    * engine (the DuckDB oracle recomputes it bit-for-bit; no float pow).
    * The standard "sample documents ∝ length/quality score" move, as a
    * row-local predicate: no shuffle, pushes below wider plans, and
    * join-stable for a fixed id column.
    *
    * Overflow-safe by construction: the p ≥ 1 short-circuit compares w
    * against a DRIVER-computed threshold (⌈denom/num⌉) instead of forming
    * w·num — which for a huge row weight would wrap negative and silently
    * DROP a row that must always be kept. The scaled compare then only
    * runs when w < ⌈denom/num⌉, so num·w < denom + num ≤ 2^21, bounding
    * the product below 2^61. Null or negative weights are never kept (a
    * null id hashes like the string "null" — ids should be non-null). */
  def weightedKeep(id: Column, weight: Column, num: Long, denom: Long): Column = {
    require(num >= 0 && denom >= 1 && denom <= (1L << 20),
      s"rate must be num/denom with num >= 0 and 1 <= denom <= 2^20, got $num/$denom")
    require(num <= (1L << 20), s"num must be <= 2^20, got $num")
    val hv = conv(substring(md5(id.cast("string")), 1, 10), 16, 10).cast("long")
    val w = coalesce(weight.cast("long"), lit(-1L))
    // smallest w with w*num >= denom; num == 0 means p = 0 (never trips)
    val alwaysKeepW = if (num == 0) Long.MaxValue else (denom - 1) / num + 1
    when(w < 0L, lit(false))
      .when(lit(num > 0) && w >= alwaysKeepW, lit(true)) // p >= 1
      .otherwise(hv * denom < w * num * lit(1L << 40))
  }

  /** Weighted sampling WITHOUT replacement, fixed size k (Efraimidis–
    * Spirakis A-ES): every row gets key = ln(u)/w with u ∈ (0,1] derived
    * from the id's md5 (deterministic; `salt` re-draws), and the k
    * largest keys win — inclusion probability ∝ weight, exactly one pass.
    * Top-k is a TakeOrderedAndProject (per-partition heads, merged on the
    * driver), never a global sort. Rows with w <= 0 or null never win.
    * ln/div are IEEE floats, so this variant is property-tested rather
    * than oracle-hashed ([[weightedKeep]] is the integer-exact gate). */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
                   k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val hv = conv(substring(
      md5(concat(lit(salt), col(idCol).cast("string"))), 1, 10), 16, 10)
      .cast("double")
    val u = (hv + lit(1.0)) / lit((1L << 40).toDouble)
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__aes_key").desc, col(idCol))
      .limit(k)
      .drop("__aes_key")
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicate documents never
    * straddle a split boundary. The split key is the connected-component
    * cluster id of the candidate-pair graph (docs in no pair are their
    * own singleton), hashed through the same md5 buckets as [[splitCol]]
    * — so a cluster moves between splits as ONE unit and eval
    * contamination by near-dups of training docs is structurally
    * impossible. The classic subtle bug this kills: id-hash splits place
    * 10 copies of a document on both sides of the boundary.
    *
    * Returns (id, cluster_id, split).
    *
    * Id types: integral ids key the component graph directly. STRING ids
    * (UUIDs, URLs — at least as common in real corpora) are mapped into
    * the long node space through a 48-bit md5 prefix hash
    * ([[Sketches.hash40]]-class, two extra hex chars; same portable
    * conv-of-md5 convention as [[hashBucket]], so an oracle replays it).
    * `cluster_id` is then in the HASHED space. Collision note: at 48
    * bits, P(any collision) ≈ n²/2^49 — and a collision can only ever
    * MERGE two split units into one (both docs ride the same split),
    * never tear a near-dup cluster across the boundary, so the
    * leakage-safety guarantee is preserved; the failure mode is strictly
    * conservative over-grouping. The `pairs` frame's a/b must be the
    * same type as the id column. Other id types are refused loudly (a
    * silent cast-to-null would merge every unclustered doc into one null
    * split unit).
    *
    * Scale shape: [[graft.operators.Dedup.connectedComponents]]'s
    * hybrid CC + one left join of the corpus to the (pair-bounded)
    * cluster map; the split itself is a row-local expression; the string
    * hash adds one row-local md5 on each side of the join key. */
  def clusterAwareSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                        trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val integralTypes = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val idType = df.schema(idCol).dataType
    val integral = integralTypes.contains(idType)
    require(integral || idType == StringType,
      s"clusterAwareSplit needs an integral or string id column; " +
        s"'$idCol' is ${idType.simpleString}")
    // the pairs frame must be in the SAME id family as the corpus id:
    // only the string branch hashes a/b into the long node space, so a
    // mixed-type call (string corpus + integral pairs, or vice versa)
    // would join hashed longs against raw longs and silently return
    // leakage-UNSAFE splits — every near-dup cluster torn apart
    Seq("a", "b").foreach { c =>
      val t = pairs.schema(c).dataType
      require(if (integral) integralTypes.contains(t) else t == StringType,
        s"clusterAwareSplit pairs column '$c' is ${t.simpleString} but the " +
          s"id column '$idCol' is ${idType.simpleString}: both sides must " +
          "be integral or both string — a mixed-type call would join " +
          "hashed node keys against raw ones and return leakage-unsafe " +
          "splits")
    }
    // 48-bit md5 prefix hash into node space (string ids); the identity
    // cast for integral ids
    def nodeKey(c: Column): Column =
      if (integral) c.cast("long")
      else conv(substring(md5(c), 1, 12), 16, 10).cast("long")
    val keyedPairs =
      if (integral) pairs
      else pairs.select(nodeKey(col("a")).as("a"), nodeKey(col("b")).as("b"))
    val clusters = graft.operators.Dedup.connectedComponents(keyedPairs)
      .withColumnRenamed("node", "__node")
      .withColumnRenamed("cluster_id", "__cid")
    df.join(clusters, nodeKey(df(idCol)) === col("__node"), "left")
      .withColumn("__skey", coalesce(col("__cid"), nodeKey(df(idCol))))
      .select(df(idCol), col("__skey").as("cluster_id"),
        splitCol(col("__skey"), trainPct, valPct).as("split"))
  }

  /** [[weightedTopK]] PER GROUP: k winners of the Efraimidis–Spirakis
    * draw within every `groupCol` value — "sample k docs per source,
    * inclusion ∝ weight", the stratified form training mixes actually
    * use. Same deterministic md5-derived u and ln(u)/w key; the global
    * TakeOrderedAndProject becomes one rank window over the group
    * shuffle, so no group ever funnels through the driver. Rows with
    * null/non-positive weight never win; groups with fewer than k
    * eligible rows keep them all. Float ln/div keys → property-tested,
    * not oracle-hashed (same trade as weightedTopK). */
  def weightedTopKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                           weightCol: String, k: Int,
                           salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val hv = conv(substring(
      md5(concat(lit(salt), col(idCol).cast("string"))), 1, 10), 16, 10)
      .cast("double")
    val u = (hv + lit(1.0)) / lit((1L << 40).toDouble)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__aes_key").desc, col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__aes_key", "__rn")
  }

  /** Sequence-packing bin assignment: documents are dealt into `shards`
    * deterministic hash shards, ordered by id within each shard, and
    * assigned to training-sequence bins of ~`maxTokens` tokens by the
    * exclusive running token sum — bin = floor(prefix_sum / maxTokens),
    * the "pack documents into fixed-length sequences, split at the
    * boundary" layout most training pipelines use for chunk-sized docs.
    * Returns (id, shard, bin, token count).
    *
    * Scale shape: packing is per-shard (exactly how production packers
    * shard their output files), so the running-sum window partitions by
    * shard — `shards` should be sized so one shard's rows fit a task
    * (e.g. executors × a few); there is no global sort. Assignment is a
    * pure function of (ids, token counts), stable across runs/engines. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
               maxTokens: Long, shards: Int = 32): DataFrame = {
    require(maxTokens >= 1 && shards >= 1, "maxTokens and shards must be >= 1")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(tokenCol),
        hashBucket(col(idCol), shards).as("shard"))
      .withColumn("__prefix",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // exact-integer floor division — `div` keeps the whole computation in
      // longs (Spark's `/` on longs is IEEE double division, which would
      // mis-bin once a shard's running prefix exceeds 2^53 tokens)
      .withColumn("bin", expr(s"__prefix div ${maxTokens}L"))
      .drop("__prefix")
  }

  /** Exact rank-quantile threshold of a discrete metric column, as a
    * 1-row DataFrame: the smallest value v such that at least ceil(p · N)
    * rows have value ≤ v — the data-dependent cutoff of an adaptive
    * quality filter ("drop the bottom quartile by token count").
    *
    * Scale shape: instead of a global sort of N rows (the naive exact
    * quantile), the corpus collapses to a VALUE HISTOGRAM first — one hash
    * aggregation with map-side combine — and the running sum runs over the
    * distinct values only. For discrete pipeline metrics (token counts,
    * char lengths, integer scores) that histogram is thousands of rows at
    * any corpus size, so the single-partition cumulative window is
    * explicitly bounded by value cardinality, not corpus size. Exact and
    * deterministic, unlike percentile_approx. */
  def quantileThreshold(df: DataFrame, valueCol: String, p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, "quantile p must be in (0, 1]")
    // nulls are excluded from both the histogram and N — without this,
    // Spark's nulls-first window order vs SQL's nulls-last would shift
    // the threshold on corpora with missing metrics
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__val"))
      .agg(count(lit(1)).as("__cnt"))
    val total = hist.agg(sum(col("__cnt")).as("__n"))
    val w = Window.orderBy(col("__val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(total))
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .where(col("__cum") >= ceil(lit(p) * col("__n").cast("double")))
      .agg(min(col("__val")).as("threshold"))
  }

  /** Per-group [[quantileThreshold]]: for each group, the smallest value
    * v with at least ceil(p · N_group) rows ≤ v — per-language/per-source
    * adaptive cutoffs in one pass. Same scale shape as the global
    * variant, but BETTER parallelism: the value histogram is one hash
    * aggregation and the cumulative window partitions BY GROUP, so there
    * is no single-partition stage at all (each group's distinct values
    * sort independently). Null groups are kept as their own group; null
    * values are excluded. */
  def quantileThresholdBy(df: DataFrame, groupCol: String, valueCol: String,
                          p: Double): DataFrame = {
    require(p > 0.0 && p <= 1.0, "quantile p must be in (0, 1]")
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("__val"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .where(col("__cum") >= ceil(lit(p) * col("__n").cast("double")))
      .groupBy(col(groupCol))
      .agg(min(col("__val")).as("threshold"))
  }

  /** Temperature-sampling budgets for [[mixtureSample]]: per-source token
    * targets ∝ observedTokens^alpha, scaled to `totalBudget` — the
    * standard multilingual/multi-source rebalancing rule (alpha = 1
    * reproduces natural proportions, alpha = 0 is uniform, the usual
    * 0.3–0.7 range up-weights small sources). One aggregate over the
    * corpus; the k-source weight vector is driver math. Budgets floor to
    * longs and are clamped to >= 1 so no listed source vanishes; a
    * source's budget may exceed its own total (mixtureSample then takes
    * all of it — temperature sampling up-weights by REPETITION in real
    * pipelines, which is a loader concern, not a selection one). */
  def temperatureBudgets(df: DataFrame, sourceCol: String, tokenCol: String,
                         totalBudget: Long, alpha: Double): Map[String, Long] = {
    require(totalBudget >= 1 && alpha >= 0.0 && alpha <= 1.0,
      "totalBudget must be >= 1 and alpha in [0, 1]")
    // null sources/token counts are excluded up front: a null source key
    // could never match mixtureSample's equality predicate anyway, and a
    // null SUM would otherwise surface as an opaque NPE here
    val totals = df
      .where(col(sourceCol).isNotNull && col(tokenCol).isNotNull)
      .groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(sum(col(tokenCol)).cast("long").as("__tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val weights = totals.map { case (s, t) =>
      s -> math.pow(math.max(t, 1L).toDouble, alpha) }
    val z = weights.map(_._2).sum
    weights.map { case (s, w) =>
      s -> math.max(1L, math.floor(totalBudget * w / z).toLong) }.toMap
  }

  /** Cluster-balanced resampling (the DataComp/DCLM-style curation move:
    * rebalance a corpus across embedding clusters so no dense region
    * dominates): given rows with a cluster assignment, keep
    * `budget(c) = max(1, totalBudget · wq(c) / z)` rows per cluster where
    * `wq(c) = floor(10^6 · sqrt(n_c))` and `z = Σ wq` — temperature
    * alpha = 0.5 in EXACT portable arithmetic (IEEE sqrt is correctly
    * rounded, the 10^6 quantization makes z an order-free integer sum,
    * and the budget is pure integer math — no float pow, no
    * summation-order drift, so an oracle recomputes it bit-for-bit).
    * Within a cluster, rows are taken in md5(id) order (deterministic
    * shuffle, stable under repartitioning) — the same selection rule as
    * [[mixtureSample]].
    *
    * Scale shape: one k-row aggregate (collected — k clusters, bounded),
    * then one window partitioned by cluster — the natural shuffle for
    * per-cluster selection; skewed mega-clusters are exactly what the
    * sqrt budget shrinks. */
  def clusterBalancedSample(assigned: DataFrame, idCol: String,
                            clusterCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget >= 1, "totalBudget must be >= 1")
    // null-cluster rows (e.g. unassigned leftovers of an outer join) are
    // excluded up front: they can't be selected (no key to balance on),
    // and leaving them in the counts would silently deflate every real
    // cluster's budget through z
    val keyed = assigned.where(col(clusterCol).isNotNull)
    // bounded collect: one row per cluster
    val counts = keyed.groupBy(col(clusterCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val wq = counts.map { case (c, n) =>
      c -> math.floor(1e6 * math.sqrt(n.toDouble)).toLong }
    val z = wq.map(_._2).sum
    val budgets = wq.map { case (c, w) =>
      c -> math.max(1L, (BigInt(totalBudget) * w / z).toLong) }
    // k is data-derived (can be tens of thousands of clusters): the
    // budgets ship as a broadcast-joined k-row frame, not a k-deep
    // when-chain (which would cost k comparisons per row and risk
    // blowing the expression tree at analysis time)
    val spark = assigned.sparkSession
    import spark.implicits._
    val budgetDf = broadcast(
      budgets.toSeq.toDF("__c", "__budget"))
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    keyed
      .withColumn("__rk", row_number().over(w))
      .join(budgetDf, col(clusterCol).cast("string") === col("__c"))
      .where(col("__rk") <= col("__budget"))
      .drop("__rk", "__c", "__budget")
  }

  /** Deterministic mixture sampling: build a training mix that fills a
    * per-source token budget — the data-mixing step of a pretraining
    * pipeline ("X tokens of web, Y of code, Z of papers"). Within each
    * source, documents are taken in md5(id) order (a deterministic
    * shuffle: a pure function of the id, stable across runs, engines and
    * partitionings — re-building the mix is reproducible and adding a
    * source never reshuffles the others) until the EXCLUSIVE running
    * token sum reaches the source's budget; the document that crosses
    * the boundary is still included ("fill until reached"), so a budget
    * of 1 takes exactly the first document. Sources absent from
    * `budgets` are dropped.
    *
    * Scale shape: one window per source, partitioned on the source key —
    * the natural shuffle for a mixing job (each source's prefix sum is
    * independent); a mega-source that dwarfs its siblings makes that one
    * partition the straggler, in which case pre-filter it with
    * [[sampledBy]] to the right order of magnitude first — the hash
    * order composes (both are md5-of-id rules). */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    tokenCol: String, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 1),
      "budgets must be non-empty with positive token targets")
    val budgetCol = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__budget", budgetCol)
      .where(col("__budget").isNotNull)
      .withColumn("__prefix", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .where(col("__prefix") < col("__budget"))
      .drop("__budget", "__prefix")
  }
}
