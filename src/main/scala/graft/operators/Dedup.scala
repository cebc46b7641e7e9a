package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Document deduplication for large-scale training-data pipelines.
  *
  * All hash primitives are md5-based column expressions (portable: identical
  * output in any engine, which the oracle gate exploits) and every operator
  * is a pure DataFrame plan — shuffles only on the natural keys
  * (hash, band signature), map-side combine everywhere.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup = one hash-aggregate over the corpus; no sort.
  *  - MinHash LSH: corpus → shingles (flatMap-shaped explode) → per-doc
  *    signature (hash-agg) → band explode → self-join *within band buckets
  *    only*. The band group-by is the only join; its fan-out is bounded by
  *    bucket sizes, the classic LSH trade-off.
  *  - SimHash: one pass, fixed 32 planes per token; no join at all until
  *    bucket grouping.
  */
object Dedup {

  /** Defend row-expanding plans against under-partitioned inputs: a small
    * parquet file arrives as ONE split, and an explode multiplies work
    * *after* the scan — without this, a 600 KB corpus shingle-explodes on
    * a single core while 31 sit idle. No-op when the input is already
    * parallel enough (the usual case at scale). */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Normalized text key: lowercase, collapsed whitespace. */
  def normalizedText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact duplicate groups by content hash: (hash, keepId, nCopies).
    * Dedup = semi-join back on keepId (or dropDuplicates on the hash). */
  def exactDuplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(normalizedText(col(textCol))).as("text_md5"), col(idCol))
      .groupBy("text_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Drop exact duplicates, keeping the smallest id per content hash. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactDuplicateGroups(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Character k-shingle set of the normalized text (distinct).
    *
    * PERF: prefer [[shinglesOfNormalized]] with a STAGED normalized-text
    * column. This convenience form inlines the normalization expression
    * into the per-element lambda, and higher-order-function lambdas are
    * interpreted with no subexpression elimination — the regexes re-run
    * once per shingle (measured ~100× slowdown on 300-char docs). */
  def shingles(text: Column, k: Int): Column =
    shinglesOfNormalized(normalizedText(text), k)

  /** [[shingles]] over an already-normalized text column. Pass a staged
    * ATTRIBUTE (a `.withColumn`/`.select` alias), not an inline
    * expression: the column is referenced from the sequence bound and the
    * lambda body (2+ uses), which keeps CollapseProject from re-inlining
    * a non-cheap definition, so normalization runs once per row. */
  def shinglesOfNormalized(norm: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
      i => norm.substr(i, lit(k))))

  /** Two independent 48-bit integer hashes from ONE md5 per shingle
    * (hex halves; portable: DuckDB ('0x'||substr)::BIGINT equals Spark
    * conv(substr,16,10)). */
  def shingleHashPair(s: Column): (Column, Column) = {
    val h = md5(s)
    (conv(substring(h, 1, 12), 16, 10).cast("long"),
     conv(substring(h, 13, 12), 16, 10).cast("long"))
  }

  /** MinHash signature: numHashes min-hash longs per document, derived as
    * h1 + i*h2 (Kirsch-Mitzenmacher) so each shingle costs ONE md5 instead
    * of numHashes — the md5 dominates the pipeline at scale. Values stay
    * < 2^53, exact in doubles/BIGINTs everywhere.
    *
    * ZERO-SHUFFLE shape: the per-shingle hash pairs and the numHashes mins
    * are computed IN-ROW with higher-order array functions (transform +
    * array_min) instead of explode + groupBy. At scale this removes the
    * shuffle of |corpus|×|shingles/doc| hashed rows entirely — the only
    * movement left is `fanOut`'s round-robin of the raw (small) doc rows
    * when the input arrives under-partitioned. The `__hp` staging column is
    * multi-referenced and non-cheap, so CollapseProject keeps it staged and
    * the md5 runs once per shingle, not numHashes times.
    *
    * Row semantics match the previous explode shape: a null text produced
    * no exploded rows and hence no output row, so null texts are filtered
    * here too. Assumes one row per id (duplicate ids now yield one
    * signature row each instead of a merged min — ids are keys in every
    * caller). */
  def minHashSignature(df: DataFrame, textCol: String, idCol: String,
                       shingleK: Int = 3, numHashes: Int = 8): DataFrame = {
    val hp = transform(shinglesOfNormalized(col("__norm"), shingleK), s => {
      val h = md5(s)
      struct(conv(substring(h, 1, 12), 16, 10).cast("long").as("h1"),
             conv(substring(h, 13, 12), 16, 10).cast("long").as("h2"))
    })
    val staged = fanOut(df).where(col(textCol).isNotNull)
      .select(col(idCol), normalizedText(col(textCol)).as("__norm"))
      .select(col(idCol), hp.as("__hp"))
    val mins = (0 until numHashes).map(i =>
      array_min(transform(col("__hp"),
        p => p.getField("h1") + lit(i.toLong) * p.getField("h2"))).as(s"mh$i"))
    staged.select(col(idCol) +: mins: _*)
  }

  /** LSH banding: (band, bandSig, id) — docs sharing a (band, bandSig)
    * bucket are near-duplicate candidates. */
  def lshBands(signatures: DataFrame, idCol: String,
               numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val sig = concat_ws("_",
        (b * rows until (b + 1) * rows).map(h => col(s"mh$h")): _*)
      struct(lit(b).as("band"), sig.as("band_sig"))
    }
    signatures.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.band_sig").as("band_sig"))
  }

  /** Candidate near-duplicate pairs (a < b) from LSH buckets.
    *
    * Bucket-width defense: a degenerate band signature (boilerplate or
    * near-empty docs) can put 10^5+ docs in one (band, band_sig) bucket,
    * and the within-bucket self-join goes quadratic — the classic LSH
    * scale-killer. Buckets over `maxBucketSize` therefore degrade from
    * all-pairs to CHAINED candidates (consecutive ids in sort order):
    * O(n) pairs instead of O(n²), and connected-component dedup recall is
    * preserved through transitivity (the chain spans the same component a
    * clique would). Pairwise Jaccard verification of chained pairs is
    * weaker than of clique pairs — acceptable for buckets whose size
    * already says "mass duplication". Buckets at or under the cap are
    * exact all-pairs as before. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numHashes: Int = 8,
                        bands: Int = 4, maxBucketSize: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = minHashSignature(df, textCol, idCol, shingleK, numHashes)
    // The explicit-width repartition pins the bucket exchange against
    // AQE byte-based coalescing: banded rows are a few dozen bytes each,
    // so at scale the (band, band_sig) shuffle coalesces to ONE
    // partition while everything expensive — the collect_list bucket
    // aggregate, the in-row pair expansion, the cap window — fuses
    // downstream of it on one core (10× StageAudit, r17: q111/q32/q45
    // each carried 60-70 single-task core-sec here). Both the cap
    // window and the bucket aggregate need exactly this hash
    // partitioning, so the exchange is reused by every branch — width
    // pinned, nothing added.
    val banded = lshBands(sigs, idCol, numHashes, bands)
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("band"), col("band_sig"))
    // In-bucket membership arrays are built ONLY for buckets at or under
    // the cap, so no unbounded array ever materializes in an aggregation
    // buffer: bucket sizes and chain successors come from ONE window over
    // the (band, band_sig) shuffle — count(*) for the cap split, lead(id)
    // for the chained pairs; window buffers spill to disk, unlike an agg
    // collect_list buffer. Both branches read the SAME exchange
    // (ReuseExchange dedups it), so the minhash/banding subplan — one md5
    // per shingle over the whole corpus — is computed once per action,
    // not once per branch. Under-cap buckets keep the in-row
    // higher-order-function pair expansion (one hash agg, no join
    // materialization of bucket × bucket).
    def allPairsOf(rows: DataFrame): DataFrame = {
      val buckets = rows.groupBy("band", "band_sig")
        .agg(sort_array(collect_list(col(idCol))).as("__ids"))
      val n = size(col("__ids"))
      // two CHAINED generators, not one flattened in-row array: the old
      // `explode(flatten(transform(...)))` materialized a bucket's whole
      // B²/2 pair-struct array in ONE allocation before the generator
      // ever streamed a row — a memory cliff that OOM'd a task the
      // moment a degenerate bucket got big enough (measured: a 30×
      // replication run pushed a template-text bucket past the heap in
      // the expansion stage itself, r15). posexplode streams the bucket
      // as B rows, each exploding an O(B) successor slice, so peak
      // per-row memory is O(B); a degenerate bucket still costs
      // quadratic TIME under the uncapped contract (that is what
      // maxBucketSize is for) but no longer detonates the executor.
      buckets.where(n >= 2)
        .select(posexplode(col("__ids")).as(Seq("__i", "a")), col("__ids"))
        .select(col("a"), explode(
          slice(col("__ids"), col("__i") + lit(2), size(col("__ids"))))
          .as("b"))
    }
    // Uncapped idiom (Int.MaxValue, used where the oracle is uncapped): no
    // bucket can exceed the cap, so skip the size probe — one scan, not two.
    if (maxBucketSize == Int.MaxValue) return allPairsOf(banded).distinct()
    val w = Window.partitionBy("band", "band_sig")
    val wo = w.orderBy(col(idCol))
    val sized = banded
      .withColumn("__bn", count(lit(1)).over(w))
      .withColumn("__nid", lead(col(idCol), 1).over(wo))
    val allPairs = allPairsOf(
      sized.where(col("__bn") <= maxBucketSize).drop("__bn", "__nid"))
    val chained = sized
      .where(col("__bn") > maxBucketSize && col("__nid").isNotNull)
      .select(col(idCol).as("a"), col("__nid").as("b"))
    allPairs.union(chained).distinct()
  }

  /** 32-plane SimHash from whitespace tokens, engine-portable: the sign of
    * plane j for a token is the top bit of hex digit j of md5(token),
    * approximated portably as digit ∈ {8..f} (tested by strpos on the hex
    * alphabet tail). simhash = Σ 2^j over planes with positive vote sum. */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokens = fanOut(df).select(col(idCol),
      explode(split(normalizedText(col(textCol)), " ")).as("__tok"))
    val hashed = tokens.withColumn("__h", md5(col("__tok")))
    val planes = hashed.select(col(idCol),
        explode(sequence(lit(1), lit(32))).as("j"), col("__h"))
      .withColumn("vote",
        when(expr("instr('89abcdef', substr(__h, j, 1))") > 0, 1L)
          .otherwise(-1L))
    planes.groupBy(col(idCol), col("j"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), j - 1)"))
        .otherwise(0L)).as("simhash"))
  }

  /** Connected components over a candidate-pair edge list: every node gets
    * the minimum id of its component — the cluster representative for
    * group deduplication (keep one doc per cluster).
    *
    * Small edge lists (≤ driverEdgeLimit) use driver union-find — one
    * collect, explicit memory bound, no per-round job latency. Larger ones
    * run iterative min-label propagation WITH pointer jumping: each round
    * every node adopts the smallest label among itself and its neighbors,
    * then shortcuts label := label(label). The shortcut doubles propagation
    * distance per round, so convergence is O(log diameter) — needed now
    * that capped LSH buckets emit CHAIN-shaped components (diameter n),
    * not just cliques; a 2^20-long chain converges within the default
    * maxIter. Each round is two shuffle joins + a hash agg, and an eager
    * localCheckpoint stops the logical plan growing exponentially. Both
    * paths reach the same fixpoint (min id per component).
    */
  /** Driver-side union-find with path compression over a collected edge
    * array — the small-path terminal of [[connectedComponents]]; emits
    * the same min-id-per-component fixpoint as the distributed loop. */
  private def unionFind(spark: org.apache.spark.sql.SparkSession,
                        edgeArr: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeArr.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // min-id representative per component (same fixpoint as the loop)
    val rows = parent.keys.toArray.sorted.map(n => (n, find(n)))
    spark.createDataset(scala.collection.immutable.ArraySeq.unsafeWrapArray(rows))
      .toDF("node", "cluster_id")
  }

  /** The storage blocks behind a localCheckpoint'ed frame. Dataset
    * .unpersist does NOT free them (the checkpoint's cache lives on the
    * internal RDD, not the Dataset), so a long-lived session calling
    * [[connectedComponents]] repeatedly would accumulate
    * MEMORY_AND_DISK_SER blocks until the ContextCleaner happens to GC
    * the RDDs — the explicit unpersist below releases each round's
    * blocks as soon as the next round is materialized. Unpersisting a
    * LOCAL checkpoint discards the data irrecoverably (lineage is
    * truncated), so only frames provably never read again go through
    * this. */
  private def checkpointBlocks(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverEdgeLimit: Int = 2000000): DataFrame = {
    // Hybrid: the candidate edge list is usually tiny relative to the
    // corpus (LSH pairs, not raw rows). Up to `driverEdgeLimit` edges a
    // driver-side union-find answers — milliseconds instead of per-round
    // shuffle latency. Above it, or for non-integral id types, the
    // distributed label-propagation loop below is the path. The limit
    // bounds driver memory explicitly (16 bytes/edge → ~32 MB).
    //
    // BOTH paths start from ONE materialization — the CANONICAL
    // undirected edge list (least/greatest + distinct), lazily
    // localCheckpoint'ed below and materialized by the adjudicating
    // count — and the path choice is that count over its cached blocks,
    // not a limit probe. The original `pairs.limit(lim+1).collect()`
    // probe planned a GlobalLimit whose single-partition exchange
    // funneled up to 2M rows through ONE task (r18 10× StageAudit: 7–18
    // single-task core-sec on every uncapped-CC gate,
    // q45/q111/q210/q212) and, when the probe then failed, the
    // expensive pair pipeline ran a second time for the loop. Why
    // checkpoint-first rather than persist-the-pair-RDD (the first r18
    // attempt): the distinct() puts the pair expansion on the WRITE
    // side of a shuffle, which streams through the task sorter's own
    // spill path — while a cache unroll of the same rows runs INSIDE
    // the 32-way LSH bucket-aggregate stage and OOM'd an 8 g heap at
    // 10× (storage unroll stacked on aggregation buffers) where the
    // shuffle shape completes at 30× (r15 note below). Canonical-form
    // storage (not the doubled src↔dst union the loop scans) halves the
    // distinct's shuffle volume and the stored bytes; the loop
    // re-derives the doubled form as a narrow map over the cached
    // blocks. The small path reads its edges back from the checkpoint —
    // full width, no funnel, nothing reaches the driver unless the
    // count confirms it fits.
    val spark = pairs.sparkSession
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralIds = Seq("a", "b").forall(c =>
      Set[org.apache.spark.sql.types.DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(pairs.schema(c).dataType))
    // localCheckpoint here (lazy) and after every loop round (eager):
    // iterative
    // self-joins grow the logical plan exponentially otherwise — the
    // driver OOMs on plan analysis long before the (tiny) data does.
    // SERIALIZED storage (MEMORY_AND_DISK_SER), not the default
    // deserialized level: the checkpointed frames here are GRAPH-scale
    // (the edge list is the uncapped pair set — quadratic in
    // duplication-degenerate corpora), and caching them as deserialized
    // JVM objects costs several× the raw bytes plus GC pressure;
    // measured r15, a 30×-replicated corpus OOM'd the executor unrolling
    // the deserialized edge cache where the serialized level completes.
    // Compact serialized blocks spill to disk cleanly — the right trade
    // for an intermediate that is scanned once per round, not
    // point-queried.
    //
    // Null-id pairs are dropped for ALL id types — a null node is
    // meaningless, and without the explicit filter the canonical
    // least/greatest below would SILENTLY fold a (null, x) pair into an
    // (x, x) self-loop (least/greatest skip nulls), which is a quieter
    // wrong than an absent row. Integral ids are additionally widened to
    // long up front so BOTH paths emit the same (node long, cluster_id
    // long) schema — without this the output schema would silently
    // change when the edge count crosses driverEdgeLimit. Non-integral
    // ids (strings etc.) only ever take the distributed path, so their
    // type passes through unchanged.
    val normalized = {
      val nn = pairs.where(col("a").isNotNull && col("b").isNotNull)
      if (integralIds)
        nn.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      else nn
    }
    // canonical undirected form: (lo, hi) per pair — self-loops survive
    // (lo == hi) so a node appearing only in one still registers on both
    // paths. LAZY checkpoint: the adjudicating count below is the
    // materializing action (one job fewer than eager-then-count; when
    // the count is skipped, the loop's first action materializes it).
    val edgesU = normalized
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    // Driver union-find on the small path, collected off the
    // checkpoint's cached blocks. The limit now bounds DISTINCT
    // undirected edges (16 bytes/edge → ~32 MB) — a strictly better
    // driver-memory measure than the raw pair count the old probe used
    // (multi-band LSH emits each pair once per agreeing band).
    if (integralIds && driverEdgeLimit > 0 &&
        edgesU.count() <= driverEdgeLimit.toLong) {
      import spark.implicits._
      val collected = edgesU.as[(Long, Long)].collect()
      // release the checkpoint's cached blocks now that the edges are on
      // the driver — see checkpointBlocks (Dataset.unpersist can't)
      checkpointBlocks(edgesU).foreach(_.unpersist(false))
      return unionFind(spark, collected)
    }
    val edges = edgesU.union(edgesU
      .where(col("src") =!= col("dst"))
      .select(col("dst").as("src"), col("src").as("dst")))
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // Convergence: labels only ever decrease per node, so the sum of a
    // per-node key is stationary exactly at the fixpoint — one cheap
    // action per round instead of a change-detection join. Integral
    // labels sum EXACTLY (strictly monotone — zero false-convergence
    // risk). Non-integral labels (raw string ids) have no numeric value
    // to sum — the old sum(label) leaned on ANSI's string→double cast
    // and THREW on any non-numeric id (latent until the r19 null-id
    // spec; the q212 gate pre-hashes its string ids to longs) — so
    // their key is a PAIR of independent hash sums: xxhash64(label) and
    // xxhash64(label, "#2") (the extra literal input makes the second
    // digest independent of the first). A changed round reads as
    // converged only if BOTH 64-bit delta sums cancel exactly —
    // a ~2^-128-class event, and unlike the md5 posture exact dedup
    // rests on (where a collision merges two documents), a collision
    // HERE would silently return under-merged clusters, so it is
    // hardened rather than merely documented (r19 ADVICE). Decimal(38,0)
    // accumulation on both: ANSI sum(bigint) raises on overflow, and
    // millions of 64-bit hash values can exceed the long range.
    val convKeys: Seq[Column] =
      if (integralIds) Seq(col("label").cast("decimal(38,0)"))
      else Seq(xxhash64(col("label")).cast("decimal(38,0)"),
        xxhash64(col("label"), lit("#2")).cast("decimal(38,0)"))
    def labelSum(d: DataFrame): Seq[java.math.BigDecimal] = {
      val sums = convKeys.map(k => sum(k))
      val row = d.agg(sums.head, sums.tail: _*).head()
      convKeys.indices.map(i =>
        if (row.isNullAt(i)) java.math.BigDecimal.ZERO else row.getDecimal(i))
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    // every per-round join has BOTH sides scaling with the graph (labels
    // and neighborMin are node-cardinality, edges is edge-cardinality) —
    // shuffle_hash hints pin them to partitioned joins so AQE can never
    // promote a graph-sized side to a driver-built broadcast (observed:
    // at a 10x-replicated corpus the 2M+-node label frame compressed
    // under the adaptive broadcast threshold and the broadcast BUILD
    // OOM'd the driver; a broadcast that scales with the graph is wrong
    // at any cluster size)
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("label", "__nl").hint("shuffle_hash"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("__nl")).as("__minNeighbor"))
      val stepped = labels.join(neighborMin.hint("shuffle_hash"),
          Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__minNeighbor"), col("label"))).as("label"))
      // pointer jumping: follow one more hop through the label table so
      // each round doubles the distance a minimum has traveled
      val updated = stepped.as("x")
        .join(stepped.select(col("node").as("__ln"), col("label").as("__ll"))
            .hint("shuffle_hash").as("y"),
          col("x.label") === col("__ln"), "left")
        .select(col("x.node").as("node"),
          least(col("x.label"), coalesce(col("__ll"), col("x.label"))).as("label"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      val newSum = labelSum(updated)
      // the previous round's checkpoint blocks are dead once `updated` is
      // materialized (eager checkpoint above) — free them now instead of
      // leaving every round's label frame cached until ContextCleaner GC
      checkpointBlocks(labels).foreach(_.unpersist(false))
      labels = updated
      converged = newSum.zip(prevSum).forall { case (n, p) => n.compareTo(p) == 0 }
      prevSum = newSum
      iter += 1
    }
    // the loop's result is a materialized checkpoint — it no longer reads
    // the edge blocks, so those are freed too. The FINAL label frame's
    // blocks back the returned DataFrame and must stay: their lifetime is
    // the caller's, reclaimed by the ContextCleaner when the result frame
    // becomes unreachable (the one checkpoint this method cannot free).
    checkpointBlocks(edgesU).foreach(_.unpersist(false))
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Quality-aware group deduplication: resolve candidate pairs into
    * duplicate clusters ([[connectedComponents]]) and keep the BEST
    * document of each cluster — highest `qualityCol`, ties by smallest
    * id — instead of the arbitrary min-id representative. Documents in no
    * cluster survive untouched (each is its own singleton). The standard
    * "among near-duplicates, keep the longest / highest-scoring copy"
    * rule of training-data pipelines.
    *
    * Scale shape: one left join of the corpus to the (small) cluster
    * map, one min(struct) aggregate per cluster — map-side partial
    * combine; the winner set semi-joins back, so full rows shuffle only
    * on the id join keys, never into aggregation buffers. Null quality
    * loses to any non-null (coalesced to -Infinity). */
  def keepBestPerCluster(df: DataFrame, pairs: DataFrame, idCol: String,
                         qualityCol: String): DataFrame = {
    // integral ids only: a string id would cast("long") to null below,
    // silently merging every unclustered document into one null cluster
    // (keeping a single survivor) — fail loudly instead
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)
      .contains(df.schema(idCol).dataType),
      s"keepBestPerCluster needs an integral id column; '$idCol' is " +
        s"${df.schema(idCol).dataType.simpleString}")
    val clusters = connectedComponents(pairs)
      .withColumnRenamed("node", "__node")
    val member = df
      .join(clusters, df(idCol).cast("long") === col("__node"), "left")
      .withColumn("__cl",
        coalesce(col("cluster_id"), col(idCol).cast("long")))
    val winners = member.groupBy(col("__cl"))
      .agg(min(struct(
          negate(coalesce(col(qualityCol).cast("double"),
            lit(Double.NegativeInfinity))).as("__negq"),
          col(idCol).cast("long").as("__wid")))
        .getField("__wid").as("__keep"))
      .select(col("__keep"))
    df.join(winners, df(idCol).cast("long") === col("__keep"), "left_semi")
  }

  /** Re-chunk a document into lines of `tokensPerLine` whitespace tokens
    * joined by '\n' — gives line-level operators a deterministic line
    * structure on corpora whose documents arrive as one long line. */
  def chunkIntoLines(text: Column, tokensPerLine: Int): Column =
    chunkTokensIntoLines(split(normalizedText(coalesce(text, lit(""))), " "),
      tokensPerLine)

  /** [[chunkIntoLines]] over an already-split token-array column — pass a
    * staged attribute so the split runs once per row, not once per line
    * (the lambda below references it per element; see
    * [[shinglesOfNormalized]] for the CollapseProject rationale). */
  def chunkTokensIntoLines(toks: Column, tokensPerLine: Int): Column = {
    require(tokensPerLine >= 1, "tokensPerLine must be >= 1")
    // floor of 1 line: an EMPTY token array would otherwise make
    // sequence(0, -1) count DOWN ([0, -1] — two phantom empty lines);
    // one empty line matches the [""] that split("") produces
    val nLines = greatest(
      ceil(size(toks).cast("double") / tokensPerLine).cast("int"), lit(1))
    array_join(transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * tokensPerLine + 1, lit(tokensPerLine)), " ")),
      "\n")
  }

  /** C4-style line-level corpus deduplication: every line that occurs more
    * than once ANYWHERE in the corpus keeps only its first occurrence (in
    * (id, line position) order); documents are reassembled from their
    * surviving lines. Returns (id, n_lines, n_lines_kept, clean_text) —
    * the boilerplate-removal pass (headers, footers, cookie banners) of a
    * web-scale training-data pipeline.
    *
    * Scale shape: one shuffle on the line text (the ranking window's
    * partition key — high cardinality, so it spreads; a degenerate
    * corpus of one repeated line concentrates one partition, which
    * Spark's window buffer spills rather than OOMs), then one hash
    * aggregation back on the id to reassemble. No joins, no collects;
    * reassembly sorts each document's own lines only. */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
                 sep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = fanOut(df).select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep))).as(Seq("__line_no", "__line")))
    val w = Window.partitionBy(col("__line")).orderBy(col(idCol), col("__line_no"))
    val kept = lines.withColumn("__keep", row_number().over(w) === 1)
    kept.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("__keep").cast("long")).as("n_lines_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__line_no"), col("__line"))))),
          s => s.getField("__line")), sep).as("clean_text"))
  }

  /** Exact repeated-substring spans (the memorization/contamination
    * signal of exact-substring dedup, à la "Deduplicating Training Data
    * Makes Language Models Better"): every `spanLen`-char window of
    * normalized text that occurs in at least `minDocs` DISTINCT
    * documents, with its document and occurrence counts. Fixed-length
    * windows make it tractable as one pass: any repeated substring of
    * length ≥ spanLen contains a repeated spanLen-window, so the result
    * is a complete detector at that resolution.
    *
    * Scale shape: the window fan-out is in-row (one array build per doc,
    * like the shingle path — no join), then ONE aggregation on the span
    * text — `n_occurrences` combines map-side; `n_docs` is a distinct
    * aggregate (Spark's two-phase Expand), the same shape the vocabulary
    * operator ships. Output is bounded by the HAVING filter, not corpus
    * size. */
  def repeatedSpans(df: DataFrame, textCol: String, idCol: String,
                    spanLen: Int, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2 && minDocs >= 2,
      "spanLen must be >= 2 and minDocs >= 2")
    fanOut(df)
      .select(col(idCol), normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(col(idCol),
        explode(filter(transform(
          sequence(lit(1), greatest(length(col("__norm")) - (spanLen - 1), lit(1))),
          i => col("__norm").substr(i, lit(spanLen))),
          g => length(g) === spanLen)).as("span"))
      .groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .where(col("n_docs") >= minDocs)
  }

  /** Per-document duplicated-span coverage: how many of a document's
    * `spanLen`-char windows (of normalized text) also occur in at least
    * `minDocs` distinct documents — the doc-level statistic that
    * exact-substring dedup thresholds on ("drop documents that are
    * mostly memorized/boilerplate text"). Returns
    * (id, n_windows, n_dup_windows); the caller derives the ratio
    * (kept integer-exact here for cross-engine hashing).
    *
    * Scale shape: window fan-out is in-row; then per-(doc, span) counts
    * collapse repeats BEFORE anything crosses a join (one hash-agg), the
    * span's document count is a second hash-agg over that (rows per
    * span = distinct docs, never raw windows), and the join back is
    * span-keyed between two already-aggregated sides. No window
    * functions, no collected arrays — every step map-side combines. */
  def spanDuplicationStats(df: DataFrame, textCol: String, idCol: String,
                           spanLen: Int, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2 && minDocs >= 2,
      "spanLen must be >= 2 and minDocs >= 2")
    val windows = fanOut(df)
      .select(col(idCol), normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(col(idCol),
        explode(filter(transform(
          sequence(lit(1), greatest(length(col("__norm")) - (spanLen - 1), lit(1))),
          i => col("__norm").substr(i, lit(spanLen))),
          g => length(g) === spanLen)).as("__span"))
    val perDocSpan = windows.groupBy(col(idCol), col("__span"))
      .agg(count(lit(1)).as("__cnt"))
    val perSpan = perDocSpan.groupBy(col("__span"))
      .agg(count(lit(1)).as("__span_docs"))
    perDocSpan.join(perSpan, "__span")
      .groupBy(col(idCol))
      .agg(
        sum(col("__cnt")).as("n_windows"),
        sum(when(col("__span_docs") >= minDocs, col("__cnt"))
          .otherwise(lit(0L))).as("n_dup_windows"))
  }

  /** WINNOW-SAMPLED [[spanDuplicationStats]] — the scalable middle ground
    * between the full-resolution exact-span coverage (every char position
    * crosses the shuffle; petabyte-class at corpus scale) and doc-level
    * sketches: only winnowing-SELECTED windows cross the shuffle, a
    * ~2/(w+1) density (Schleimer, Wilkerson, Aiken, SIGMOD'03 "Winnowing:
    * local algorithms for document fingerprinting").
    *
    * Selection rule (the paper's): hash every spanLen-window, slide a
    * window of `w` consecutive hashes, select each window's MINIMUM hash
    * position, rightmost on ties; a document with fewer than w hashes is
    * one short window. Selection depends only on LOCAL content, so the
    * property that makes the sample useful for duplication stats holds:
    * inside any shared run of length ≥ spanLen + w − 1, both documents
    * select the SAME spans (self-synchronization) — a guarantee neither
    * mod-p sampling (no density bound) nor per-doc min-k (no cross-doc
    * alignment at partial overlap) provides.
    *
    * Returns (id, n_windows_sampled, n_dup_windows_sampled): of the
    * document's selected windows, how many hold a span that at least
    * `minDocs` distinct documents also SELECTED. On heavily duplicated
    * text the sampled dup RATIO tracks q126's exact ratio; counts are
    * ~2/(w+1) of exact by construction.
    *
    * Scale shape: hashing and selection are one fused codegen'd
    * Expression per document ([[graft.functions.WinnowSelectSpans]] — a
    * single JVM pass: md5 per window position, monotonic-deque sliding
    * argmin, only SELECTED spans materialized; the earlier Catalyst-HOF
    * formulation paid O(n·w) interpreted lambda steps and was the
    * board's most expensive line). Only selected spans explode into the
    * same three hash-agg pipeline as [[spanDuplicationStats]] — the
    * shuffle carries 2/(w+1) of the char positions, the knob the
    * full-resolution operator lacks. */
  def winnowedSpanStats(df: DataFrame, textCol: String, idCol: String,
                        spanLen: Int, w: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanLen >= 2 && minDocs >= 2,
      "spanLen must be >= 2 and minDocs >= 2")
    require(w >= 2, "winnow window w must be >= 2")
    // explode drops empty arrays, so sub-spanLen docs vanish here — the
    // same semantics the old size()>=1 filter enforced, without a second
    // evaluation of the expression
    val windows = fanOut(df)
      .select(col(idCol), normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
      .select(col(idCol),
        explode(graft.functions.WinnowSelectSpans.column(
          col("__norm"), spanLen, w)).as("__span"))
    val perDocSpan = windows.groupBy(col(idCol), col("__span"))
      .agg(count(lit(1)).as("__cnt"))
    val perSpan = perDocSpan.groupBy(col("__span"))
      .agg(count(lit(1)).as("__span_docs"))
    perDocSpan.join(perSpan, "__span")
      .groupBy(col(idCol))
      .agg(
        sum(col("__cnt")).as("n_windows_sampled"),
        sum(when(col("__span_docs") >= minDocs, col("__cnt"))
          .otherwise(lit(0L))).as("n_dup_windows_sampled"))
  }

  /** Content-defined chunking (the rolling-hash boundary rule of
    * LBFS/FastCDC storage dedup, windowed-hash form): a chunk boundary
    * falls AFTER position i whenever the hash of the `window`-char
    * context ending at i starts with `zeroNibbles` zero hex digits —
    * boundary probability 16^-zeroNibbles per position, so expected
    * chunk length is 16^zeroNibbles chars. Because boundaries depend
    * only on LOCAL content, an insertion early in a document shifts at
    * most one chunk — the property that makes chunk-hash dedup robust
    * where fixed-offset blocks break. Returns
    * (id, chunk_no, n_chars, chunk_hash) — hash + length, never the
    * chunk text (dedup joins on the hash).
    *
    * Scale shape: entirely in-row (staged normalized text → boundary
    * positions → span substrings → posexplode); one md5 per character
    * position, the same per-element hash budget as the shingle/minhash
    * path. No shuffle at all until the caller aggregates chunk hashes. */
  def contentDefinedChunks(df: DataFrame, textCol: String, idCol: String,
                           window: Int = 16, zeroNibbles: Int = 2): DataFrame = {
    require(window >= 2 && zeroNibbles >= 1,
      "window must be >= 2 and zeroNibbles >= 1")
    val zeros = "0" * zeroNibbles
    val staged = fanOut(df).select(col(idCol),
      normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
    // cut positions: i in [window, len-1] — a boundary at len would
    // create an empty tail chunk, so the final position never cuts
    // NB: sequence(a, b) runs DESCENDING when a > b, so the filter must
    // re-assert i >= window as well as the upper bound
    val bounds = filter(
      transform(sequence(lit(window), greatest(length(col("__norm")) - 1,
        lit(window - 1))), i => i),
      i => (i >= window) && (i <= length(col("__norm")) - 1) &&
        md5(col("__norm").substr(i - (window - 1), lit(window)))
          .startsWith(zeros))
    val withB = staged.select(col(idCol), col("__norm"), bounds.as("__b"))
    val starts = concat(array(lit(1)), transform(col("__b"), p => p + 1))
    val ends = concat(col("__b"), array(length(col("__norm"))))
    withB
      .select(col(idCol), col("__norm"),
        posexplode(zip_with(starts, ends,
          (s, e) => struct(s.as("s"), e.as("e")))).as(Seq("chunk_no", "__sp")))
      .select(col(idCol), col("chunk_no"),
        (col("__sp.e") - col("__sp.s") + 1).cast("long").as("n_chars"),
        md5(col("__norm").substr(col("__sp.s"),
          col("__sp.e") - col("__sp.s") + 1)).as("chunk_hash"))
      .where(col("n_chars") > 0) // empty doc → no chunks, not one empty chunk
  }

  /** SimHash near-duplicate pairs (Manku, Jain & Das Sarma, WWW'07 —
    * the web-crawl dedup design): every pair of documents whose 32-bit
    * simhashes differ in at most `maxHamming` bits, found WITHOUT an
    * all-pairs comparison. The fingerprint splits into `bands` equal
    * chunks; by pigeonhole, any pair within `maxHamming` ≤ bands−1
    * differing bits agrees EXACTLY on at least one chunk — so
    * bucket-joining on (band, chunk value) is recall-complete, and
    * bit_count(xor) verifies the survivors. Returns (a, b, hamming).
    *
    * Scale shape: one shuffle on (band, chunk) + in-bucket pair
    * expansion + one distinct to collapse cross-band duplicates — the
    * same bucketed-candidate discipline as the MinHash LSH path, with
    * the same degenerate-bucket cap: over `maxBucketSize`, a bucket
    * degrades to neighbor-chain pairs (O(n) instead of O(n²)); capped ≡
    * uncapped whenever buckets fit. Unlike the LSH chain, the simhash
    * chain orders by (simhash, id), NOT id alone: identical fingerprints
    * then form contiguous runs, so a degenerate bucket still pairs every
    * exact duplicate with its run neighbor even when several unrelated
    * duplicate families collide into one bucket — and numerically close
    * fingerprints sort near each other, keeping chain recall meaningful
    * for near-dups too. */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, bands: Int = 4,
                   maxBucketSize: Int = 1024): DataFrame = {
    require(maxHamming >= 0 && maxHamming < bands,
      "pigeonhole recall guarantee needs maxHamming <= bands - 1")
    require(bands >= 2 && 32 % bands == 0, "bands must divide 32")
    val width = 32 / bands
    val mask = (1L << width) - 1
    val sh = simHash(df, textCol, idCol)
    val chunks = sh.select(col(idCol).as("__id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("chunk",
        expr(s"shiftright(simhash, band * $width)").bitwiseAND(lit(mask)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("band", "chunk")
    val wo = w.orderBy(col("simhash"), col("__id"))
    val sized = chunks
      .withColumn("__bn", count(lit(1)).over(w))
      .withColumn("__nid", lead(col("__id"), 1).over(wo))
      .withColumn("__nsh", lead(col("simhash"), 1).over(wo))
    val small = sized.where(col("__bn") <= maxBucketSize)
    val l = small.select(col("band"), col("chunk"),
      col("__id").as("a"), col("simhash").as("__sa"))
    val r = small.select(col("band"), col("chunk"),
      col("__id").as("b"), col("simhash").as("__sb"))
    val allPairs = l.join(r, Seq("band", "chunk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long")
          .as("hamming"))
    val chained = sized
      .where(col("__bn") > maxBucketSize && col("__nid").isNotNull)
      .select(least(col("__id"), col("__nid")).as("a"),
        greatest(col("__id"), col("__nid")).as("b"),
        bit_count(col("simhash").bitwiseXOR(col("__nsh"))).cast("long")
          .as("hamming"))
    allPairs.union(chained)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Edit-distance verification for candidate pairs — the other classic
    * fuzzy-dedup verify stage (n-gram Jaccard measures set overlap;
    * Levenshtein measures sequence closeness, catching transpositions
    * and local edits Jaccard underweights). Returns exact
    * (a, b, edit_distance, max_len) integers — the caller thresholds on
    * edit_distance/max_len without the engine ever emitting a float.
    *
    * Scale shape: two id-keyed joins bring each side's normalized text
    * to the pair row, then Levenshtein runs row-local inside codegen.
    * Cost is O(|a|·|b|) per pair — which is exactly why this belongs
    * AFTER a bucketed candidate generator (LSH / SimHash), never on a
    * cross join. */
  def editDistancePairs(df: DataFrame, pairs: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    val t = fanOut(df)
      .select(col(idCol), normalizedText(coalesce(col(textCol), lit(""))).as("__nt"))
    pairs
      .join(t.select(col(idCol).as("a"), col("__nt").as("__ta")), Seq("a"))
      .join(t.select(col(idCol).as("b"), col("__nt").as("__tb")), Seq("b"))
      .select(col("a"), col("b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("edit_distance"),
        greatest(length(col("__ta")), length(col("__tb"))).cast("long")
          .as("max_len"))
  }

  /** n-gram Jaccard set sizes for candidate pairs: the distinct-shingle
    * array stays a column (no explode), each pair is two array lookups and
    * an array_intersect — set arithmetic inside codegen instead of a
    * shingle-level shuffle join. Returns exact (a, b, intersection, union)
    * integers, hash-stable across engines. */
  def ngramJaccardCounts(df: DataFrame, pairs: DataFrame, textCol: String,
                         idCol: String, shingleK: Int = 3): DataFrame = {
    val arrs = fanOut(df)
      .select(col(idCol), normalizedText(col(textCol)).as("__norm"))
      .select(col(idCol), shinglesOfNormalized(col("__norm"), shingleK).as("__shs"))
    val aSide = arrs.select(col(idCol).as("a"), col("__shs").as("__sa"))
    val bSide = arrs.select(col(idCol).as("b"), col("__shs").as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("long")
    pairs.join(aSide, Seq("a")).join(bSide, Seq("b"))
      .select(col("a"), col("b"),
        inter.as("intersection"),
        (size(col("__sa")).cast("long") + size(col("__sb")).cast("long") - inter)
          .as("union_size"))
  }

  /** Shingle CONTAINMENT counts over candidate pairs:
    * containment(a→b) = |S(a) ∩ S(b)| / |S(a)| over DISTINCT shingle
    * sets — the asymmetric measure that catches subset duplication
    * (quotes, partial copies, doc-inside-doc) which symmetric Jaccard
    * dilutes: a short doc fully contained in a long one has tiny
    * Jaccard but containment 1.0. Emits exact integers (intersection,
    * n_a, n_b) so callers pick either direction's ratio.
    *
    * Same scale shape as [[ngramJaccardCounts]]: shingle sets are
    * in-row arrays, candidates join them in by id — set algebra never
    * crosses the shuffle, only the (bounded) candidate pairs do. */
  /** Exact set-similarity self-join by PREFIX FILTERING (PPJoin-style):
    * all pairs with token-set Jaccard ≥ tNum/tDen, with NO candidate
    * ever generated from a frequent token.
    *
    * Order each document's distinct tokens by GLOBAL rarity (df asc,
    * token asc); a pair at Jaccard ≥ t must share a token inside each
    * side's first n − ceil(t·n) + 1 rarest tokens, so the inverted-index
    * join runs only over those prefixes — rare tokens by construction,
    * which is what kills the hot-token skew that a naive token join dies
    * on at corpus scale. Verification is exact (in-row
    * array_intersect over the distinct sets), and the threshold test is
    * pure integers: tDen·inter ≥ tNum·(n_a + n_b − inter).
    *
    * Unlike [[lshCandidatePairs]] (probabilistic recall), this is EXACT:
    * every qualifying pair is returned. Output (a, b, intersection,
    * n_a, n_b). */
  /** Per-doc hashed distinct token rows (id, tok) for the prefix-filter
    * family: word tokens (shingleK = 0) or character k-shingles —
    * shingles discriminate far better on small-vocabulary corpora, where
    * every doc shares most of its WORDS with every other. __norm staged
    * as a column FIRST: shinglesOfNormalized's transform lambda is
    * interpreted and would otherwise re-normalize per shingle.
    * Elements are 40-bit md5 hashes, not strings: the exact-verify
    * merge-intersect is interpreted, and long compares are several times
    * cheaper than string compares at millions of candidate pairs.
    * Collisions are deterministic (both engines hash the same way) and
    * vanishingly rare at set sizes of a few hundred. distinct AFTER
    * hashing: array_distinct dedupes the raw strings, but a within-doc
    * 40-bit collision would otherwise duplicate a tok row, inflating __n
    * and shrinking the effective prefix below the n − ceil(t·n) + 1
    * coverage bound — silently dropping a qualifying pair (and diverging
    * from the oracle's post-hash DISTINCT). */
  private def hashedToks(df: DataFrame, textCol: String, idCol: String,
                         shingleK: Int): DataFrame = {
    val staged = fanOut(df).select(col(idCol).as("id"),
      normalizedText(coalesce(col(textCol), lit(""))).as("__norm"))
    val elems =
      if (shingleK == 0) split(col("__norm"), " ")
      else shinglesOfNormalized(col("__norm"), shingleK)
    staged
      .select(col("id"), explode(array_distinct(elems)).as("__raw"))
      .where(col("__raw") =!= "")
      .select(col("id"), Sketches.hash40(col("__raw")).as("tok"))
      .distinct()
  }

  /** Bounded production mode for the exact similarity joins: keep only
    * the `topKPerLeft` best matches per left id (highest Jaccard, ties
    * by smallest right id) and report the TOTAL qualifying match count
    * in an extra `n_matches` column — so truncation is LOUD
    * (`n_matches > topKPerLeft` on any surviving row says matches were
    * dropped), mirroring the [[lshCandidatePairs]] `maxBucketSize`
    * contract of degrading with a documented shape instead of going
    * quadratic. On duplication-pathological corpora (the one case where
    * the exact joins' true output is super-linear) this bounds the
    * output at k rows per left doc; the rank window shuffles only the
    * already-thresholded matches on `a` and spills if a left id is
    * pathologically hot, instead of materializing an unbounded result.
    * `Int.MaxValue` (the default) keeps the exact, uncapped semantics
    * and schema (no `n_matches` column). */
  private def capPerLeft(out: DataFrame, topKPerLeft: Int): DataFrame =
    if (topKPerLeft == Int.MaxValue) out
    else {
      require(topKPerLeft >= 1, s"topKPerLeft must be >= 1, got $topKPerLeft")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("a"))
      val ordered = w.orderBy(
        (col("intersection").cast("double") /
          (col("n_a") + col("n_b") - col("intersection")).cast("double")).desc,
        col("b").asc)
      // explicit-width repartition on the window key: the verified-match
      // rows are a few dozen bytes each, so AQE's byte-based coalescing
      // folds the cap window's exchange to ONE partition while the
      // window eval is the CPU (r18 sf0.1 StageAudit flagged the 1-task
      // stage on q214; same offender shape as the r17 LSH bucket
      // exchange). Both window specs require exactly this hash
      // partitioning, so they reuse the pinned exchange; explicit-
      // numPartitions repartitions are exempt from AQE coalescing.
      // The explicit width also opts this exchange out of AQE SKEW
      // splitting — a trade accepted deliberately: a window over one `a`
      // is ONE partition's work under any split (skew-splitting cannot
      // parallelize it), so the only exposure is several hot keys
      // hashing to one partition, bounded here because capPerLeft runs
      // only in capped mode and the rank window spills rather than
      // buffers a pathologically hot left id.
      out
        .repartition(out.sparkSession.sparkContext.defaultParallelism,
          col("a"))
        .withColumn("n_matches", count(lit(1)).over(w))
        .withColumn("__rk", row_number().over(ordered))
        .where(col("__rk") <= topKPerLeft)
        .drop("__rk")
    }

  def prefixFilterPairs(df: DataFrame, textCol: String, idCol: String,
                        tNum: Int, tDen: Int, shingleK: Int = 0,
                        topKPerLeft: Int = Int.MaxValue): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val toks = hashedToks(df, textCol, idCol, shingleK)
    val dfCounts = toks.groupBy("tok").agg(count(lit(1)).as("__df"))
    // explicit-width repartition on the ranking windows' key: token
    // rows are ~12 bytes, so AQE's byte-based coalescing folds the
    // id-partitioned exchange to one task while the window eval over
    // the CORPUS-LINEAR token set is the CPU (r18 sf0.1 StageAudit,
    // q214's sibling plan; the r17 LSH offender shape). Both window
    // specs need exactly this partitioning and reuse the pin. The pin
    // also forfeits AQE skew splitting on this exchange — acceptable
    // because a window over one doc id is one partition's work under
    // any split, and tokens-per-id is bounded by document length, so no
    // single key can dominate a partition the way an unbounded join
    // fan-in could.
    val ranked = toks.join(dfCounts, "tok")
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("id"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("__df").asc, col("tok").asc)))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
    // prefix length p = n − ceil(t·n) + 1;  ceil(a/b) = (a+b−1) div b
    val prefix = ranked.where(col("__rk") <=
      col("__n") - expr(s"(($tNum * __n + $tDen - 1) div $tDen)") + 1)
    val cands = prefix.select(col("id").as("a"), col("tok"))
      .join(prefix.select(col("id").as("b"), col("tok")), "tok")
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    // sets sorted ascending so exact verify is ONE codegen'd merge pass
    // per candidate (SortedLongIntersectCount) — interpreted
    // array_intersect built a hash set per pair and dominated the join
    // at millions of candidates
    // the explicit-width repartition FEEDING the aggregate pins the
    // verify stage's parallelism: set rows are a few KB each, so AQE's
    // byte-based coalescing folds the groupBy's shuffle into ONE
    // post-shuffle partition — and the whole verify (candidate-pair
    // broadcast join + per-pair sorted-merge intersect over both docs'
    // FULL token sets) fuses downstream of it, serialized onto one core
    // (StageAudit r17 offender: 2.6 core-sec on q214's sf0.1 gate,
    // growing with corpus). The aggregate reuses the explicit exchange
    // (same key, same bytes — nothing is added, the width is just
    // pinned), and explicit-numPartitions repartitions are exempt from
    // AQE coalescing.
    val sets = toks
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .groupBy("id")
      .agg(array_sort(collect_set(col("tok"))).as("__set"))
    // LENGTH FILTER before the (expensive) array-attach joins: Jaccard
    // ≥ t forces t·max(|a|,|b|) ≤ min(|a|,|b|). The size frame is one
    // LONG per doc (vs one array of hundreds of longs), so
    // size-incompatible candidates die before any set array crosses a
    // join. Corpus-cardinality frame — joined, not broadcast; AQE
    // downgrades to broadcast when it actually fits.
    val sizes = sets.select(col("id"), size(col("__set")).cast("long").as("__n"))
    val sized = cands
      .join(sizes.select(col("id").as("a"), col("__n").as("__na")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("__n").as("__nb")), Seq("b"))
      .where(lit(tDen.toLong) * least(col("__na"), col("__nb")) >=
        lit(tNum.toLong) * greatest(col("__na"), col("__nb")))
      .select("a", "b")
    val verified = sized
      .join(sets.select(col("id").as("a"), col("__set").as("__sa")), Seq("a"))
      // pin the width of the exchange feeding the b-side attach: the
      // per-row verify work downstream (the sorted-merge intersect) is
      // this join's whole cost, but its input BYTES are small enough
      // that AQE's byte-based coalescing folds the shuffle into one
      // partition and serializes the verify onto one core (StageAudit
      // r17 offender: 2.6 core-sec on q214's sf0.1 gate). The explicit
      // numPartitions is exempt from coalescing, and the b-join reuses
      // this exact hash(b) partitioning — pinned width, no added shuffle.
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("b"))
      .join(sets.select(col("id").as("b"), col("__set").as("__sb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.ArrayIntersectCount
          .sortedIntersectCount(col("__sa"), col("__sb")).as("intersection"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"))
    // threshold with ONE occurrence of `intersection`:
    // tDen*I >= tNum*(na+nb-I)  <=>  (tDen+tNum)*I >= tNum*(na+nb),
    // integer-exact. It matters because Catalyst pushes this filter INTO
    // the join condition, substituting the defining expression — the
    // two-occurrence form evaluated the codegen'd sorted-merge intersect
    // TWICE per candidate in the join condition (plus once in the
    // project); this form caps it at once each (join conditions get no
    // subexpression elimination).
    capPerLeft(
      verified.where(lit(tDen.toLong + tNum.toLong) * col("intersection") >=
        lit(tNum.toLong) * (col("n_a") + col("n_b"))),
      topKPerLeft)
  }

  /** EXACT two-corpus (R-S) set-similarity join by prefix filtering: all
    * (left, right) pairs with token-set Jaccard ≥ tNum/tDen — the
    * decontamination shape (eval set vs training corpus) where the
    * self-join [[prefixFilterPairs]] doesn't apply. Same algorithm, one
    * change: document frequencies (the token rarity order) are computed
    * over the UNION of both sides, giving the single global total order
    * the prefix-filter completeness theorem needs — under a COMMON
    * order, any pair at Jaccard ≥ t must share a token inside each
    * side's first n − ceil(t·n) + 1 rarest tokens, so the inverted-index
    * join runs left-prefix × right-prefix only. Verification is the
    * codegen'd sorted merge-intersect; the threshold test is pure
    * integers. Output (a = left id, b = right id, intersection, n_a,
    * n_b); ids need not be disjoint across sides (a always names the
    * left doc). */
  def prefixFilterJoin(left: DataFrame, right: DataFrame,
                       textCol: String, idCol: String,
                       tNum: Int, tDen: Int, shingleK: Int = 0,
                       topKPerLeft: Int = Int.MaxValue): DataFrame = {
    require(tNum > 0 && tNum <= tDen, "threshold must be in (0, 1]")
    val lt = hashedToks(left, textCol, idCol, shingleK)
    val rt = hashedToks(right, textCol, idCol, shingleK)
    val dfCounts = lt.unionByName(rt).groupBy("tok")
      .agg(count(lit(1)).as("__df"))
    def prefixed(t: DataFrame): DataFrame = {
      // pinned-width ranking-window exchange — see prefixFilterPairs
      // (same byte-coalescing offender shape on the token rows; same
      // AQE-skew trade, bounded the same way: per-id window work is one
      // partition's work regardless, and tokens-per-id is doc-length
      // bounded)
      val ranked = t.join(dfCounts, "tok")
        .repartition(left.sparkSession.sparkContext.defaultParallelism,
          col("id"))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
            .orderBy(col("__df").asc, col("tok").asc)))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
      ranked.where(col("__rk") <=
        col("__n") - expr(s"(($tNum * __n + $tDen - 1) div $tDen)") + 1)
    }
    val cands = prefixed(lt).select(col("id").as("a"), col("tok"))
      .join(prefixed(rt).select(col("id").as("b"), col("tok")), "tok")
      .select("a", "b").distinct()
    // explicit-width repartition feeding the aggregate: pins the verify
    // stage's parallelism against AQE byte-based coalescing (see the
    // comment in prefixFilterPairs — same offender shape)
    def sets(t: DataFrame) = t
      .repartition(left.sparkSession.sparkContext.defaultParallelism,
        col("id"))
      .groupBy("id")
      .agg(array_sort(collect_set(col("tok"))).as("__set"))
    val lSets = sets(lt)
    val rSets = sets(rt)
    val lSizes = lSets.select(col("id").as("a"),
      size(col("__set")).cast("long").as("__na"))
    val rSizes = rSets.select(col("id").as("b"),
      size(col("__set")).cast("long").as("__nb"))
    // length filter on one LONG per doc before any set array crosses a join
    val sized = cands.join(lSizes, Seq("a")).join(rSizes, Seq("b"))
      .where(lit(tDen.toLong) * least(col("__na"), col("__nb")) >=
        lit(tNum.toLong) * greatest(col("__na"), col("__nb")))
      .select("a", "b")
    val verified = sized
      .join(lSets.select(col("id").as("a"), col("__set").as("__sa")), Seq("a"))
      // pinned-width b-side exchange — see prefixFilterPairs
      .repartition(left.sparkSession.sparkContext.defaultParallelism,
        col("b"))
      .join(rSets.select(col("id").as("b"), col("__set").as("__sb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.ArrayIntersectCount
          .sortedIntersectCount(col("__sa"), col("__sb")).as("intersection"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"))
    // threshold with ONE occurrence of `intersection`:
    // tDen*I >= tNum*(na+nb-I)  <=>  (tDen+tNum)*I >= tNum*(na+nb),
    // integer-exact. It matters because Catalyst pushes this filter INTO
    // the join condition, substituting the defining expression — the
    // two-occurrence form evaluated the codegen'd sorted-merge intersect
    // TWICE per candidate in the join condition (plus once in the
    // project); this form caps it at once each (join conditions get no
    // subexpression elimination).
    capPerLeft(
      verified.where(lit(tDen.toLong + tNum.toLong) * col("intersection") >=
        lit(tNum.toLong) * (col("n_a") + col("n_b"))),
      topKPerLeft)
  }

  def containmentCounts(df: DataFrame, pairs: DataFrame, textCol: String,
                        idCol: String, shingleK: Int = 3): DataFrame = {
    // NULL-text docs drop BEFORE shingling, matching the oracle's
    // semantics exactly: its LATERAL UNNEST over range(1, NULL) emits no
    // rows for a NULL normalized text, so the doc (and every pair
    // holding it) vanishes via the inner joins. Empty ("") text is NOT
    // special-cased — both engines shingle it to the one-element set
    // {""} and keep the pair (range/sequence lower-bound clamp of 1 on
    // both sides). The filter is a plain scan-pushable isNotNull; any
    // predicate over the shingle ARRAY would instead substitute through
    // the projection and inline the staged __norm into the interpreted
    // lambda — normalization re-running per shingle took the q187 gate
    // from 0.24 s to 12 s before this was measured and removed.
    val arrs = fanOut(df.where(col(textCol).isNotNull))
      .select(col(idCol), normalizedText(col(textCol)).as("__norm"))
      .select(col(idCol),
        array_distinct(shinglesOfNormalized(col("__norm"), shingleK)).as("__shs"))
    val aSide = arrs.select(col(idCol).as("a"), col("__shs").as("__sa"))
    val bSide = arrs.select(col(idCol).as("b"), col("__shs").as("__sb"))
    pairs.join(aSide, Seq("a")).join(bSide, Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long")
          .as("intersection"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"))
  }
}
