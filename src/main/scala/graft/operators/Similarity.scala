package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus; one scan, no shuffle of the corpus.
  * Scale path: random-hyperplane LSH bucketing — the corpus is hashed to
  * sign-bit buckets in one pass, candidates come only from the query's
  * bucket. Hyperplanes are deterministic (seeded), generated driver-side.
  *
  * All float math is done in doubles with fixed evaluation order
  * (sequential fold), so an SQL transcription reproduces bits.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns (codegen'd
    * builtins; same order as a C loop: acc += a(i)*b(i)). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** The one squared-L2 expansion used by every PQ/ADC path:
    * (||v||² − 2·v·c) + ||c||². Bit-exactness across engines depends on
    * this exact evaluation order — never reassociate it per call site. */
  private def adcD2(sv: Column, svv: Column, c: Column, cc: Column): Column =
    svv - lit(2.0) * dot(sv, c) + cc

  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** [[cosine]] with the two norms pre-staged as columns. Bit-identical —
    * the dot, the norm product and the division are the same expressions
    * in the same order — but evaluating each side's norm ONCE per row
    * (before a join fans rows into candidate pairs) instead of once per
    * pair drops the per-pair array passes from three to one. The norm
    * columns sit below the join in the plan, so CollapseProject cannot
    * re-inline them into the per-pair projection. */
  def cosineStaged(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force cosine top-k: for each query row, the k nearest corpus
    * rows (excluding self), ties broken by ascending corpus id. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosineStaged(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "cos")
  }

  /** Exact squared-L2 top-k — the ground truth an ANN recall curve is
    * scored against: d² = ‖q‖² − 2q·c + ‖c‖² on the same `quantizeScale`
    * integer grid the PQ index encodes on, so approximate and exact
    * searches rank on the SAME geometry and recall@k measures the index,
    * not a quantization mismatch. Self-pairs are excluded (recall
    * queries are drawn from the corpus).
    *
    * Scale shape: identical to [[cosineTopK]] — queries broadcast, one
    * corpus pass, per-query top-k window; the |queries|·|corpus| frame
    * streams through the window without materializing. */
  def l2TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int,
             quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = prepVectors(queries, idCol, vecCol, quantizeScale)
      .select(col("__id").as("query_id"), col("__v").as("__qv"),
        col("__vv").as("__qvv"))
    val c = prepVectors(corpus, idCol, vecCol, quantizeScale)
      .select(col("__id").as("neighbor_id"), col("__v").as("__cv"),
        col("__vv").as("__cvv"))
    val scored = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2",
        col("__qvv") + col("__cvv") - lit(2.0) * dot(col("__qv"), col("__cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "d2")
  }

  /** Deterministic hyperplanes: nPlanes × dim in [-1, 1), seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Sign-bit bucket signature ("0110…") of each vector under the planes —
    * one pass, no shuffle; the Column literal arrays keep it codegen'd. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** LSH-bucketed approximate NN: top-k per query among corpus vectors in
    * the query's own bucket. Recall trades off with nPlanes; multi-probe
    * (flipping one bit) can be layered on by unioning probe signatures. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8,
              seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)
    val q = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv"))
      .withColumn("bucket", lshBucket(col("__qv"), planes))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("__cv"))
      .withColumn("bucket", lshBucket(col("__cv"), planes))
      .withColumn("__cn", norm(col("__cv")))
    val scored = broadcast(q).join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosineStaged(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "cos", "bucket")
  }

  /** Multi-probe LSH top-k: like [[lshTopK]] but each query also probes
    * every bucket at Hamming distance 1 (one sign bit flipped) — recall
    * approaches brute force at (nPlanes+1)× the candidate cost, still far
    * below a full scan. */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, k: Int, nPlanes: Int = 8,
                        seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)
    val q0 = queries.select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv"))
      .withColumn("__bucket0", lshBucket(col("__qv"), planes))
    // probe set: exact bucket + every 1-bit flip
    val flips = (0 until nPlanes).map { i =>
      concat(
        substring(col("__bucket0"), 1, i),
        when(substring(col("__bucket0"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("__bucket0"), i + 2, nPlanes - i - 1))
    }
    val q = q0.withColumn("bucket",
        explode(array((col("__bucket0") +: flips): _*)))
      .drop("__bucket0")
    val c = corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("__cv"))
      .withColumn("bucket", lshBucket(col("__cv"), planes))
      .withColumn("__cn", norm(col("__cv")))
    val scored = broadcast(q.withColumn("__qn", norm(col("__qv"))))
      .join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosineStaged(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "cos")
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `nList` centroid vectors by cosine (ties → smallest centroid id).
    * With k-means-trained centroids this is classic IVF; any
    * deterministic centroid set works — the cheap default takes rows with
    * id < nList as centroids, which keeps the whole operator (and its
    * oracle) free of training randomness. One broadcast of nList vectors,
    * one corpus pass.
    *
    * Scale shape: the argmax is an AGGREGATION, not a window (same
    * rationale as [[assignNearest]]): map-side partial combine collapses
    * the N·nList scored fan-out to N skinny rows before the exchange and
    * the vector joins back in — not N·nList full rows shuffled to rank
    * one. min(struct(−cos, cid)) = max cosine with ties by smallest cid.
    * Edge semantics: a NaN cosine (zero-norm vector) loses to any finite
    * candidate under struct-min — saner than the previous window-DESC
    * shape, where NaN sorted FIRST and a single zero-norm centroid would
    * capture every row; an all-NaN row still deterministically takes the
    * smallest cid. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val c = broadcast(centroids.select(col(idCol).as("centroid_id"),
        asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cvn", norm(col("__cv"))))
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .withColumn("__vn", norm(col("__v")))
    val scored = v.crossJoin(c)
      .withColumn("__cos",
        cosineStaged(col("__v"), col("__cv"), col("__vn"), col("__cvn")))
    val best = scored.groupBy(col(idCol))
      .agg(min(struct(negate(col("__cos")), col("centroid_id")))
        .getField("centroid_id").as("centroid_id"))
    best.join(v, Seq(idCol))
      .select(col(idCol), col("centroid_id"), col("__v"))
  }

  /** IVF top-k search: probe the query's own cell (nProbe=1) — candidates
    * come only from vectors sharing the centroid. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nList: Int): DataFrame = {
    val centroids = corpus.where(col(idCol) < nList)
    val assignedCorpus = ivfAssign(corpus, idCol, vecCol, centroids)
      .withColumnRenamed(idCol, "neighbor_id")
      .withColumnRenamed("__v", "__cv2")
    val assignedQueries = ivfAssign(queries, idCol, vecCol, centroids)
      .withColumnRenamed(idCol, "query_id")
    val scored = broadcast(assignedQueries.withColumn("__qn", norm(col("__v"))))
      .join(assignedCorpus.withColumn("__cn2", norm(col("__cv2"))),
        Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        cosineStaged(col("__v"), col("__cv2"), col("__qn"), col("__cn2")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "centroid_id")
  }

  /** Corpus-size-aware hyperplane count: enough sign bits that the MEAN
    * bucket holds ~`targetBucketSize` vectors (buckets are uneven — pair
    * it with [[embeddingNearDupPairs]]' `maxBucketSize` cap for the tail).
    * The fixed nPlanes=8 default (256 buckets) is fine for 10^5 docs but
    * quadratic-death at 10^9; callers at scale should pass
    * `nPlanes = planesFor(corpus.count())`. */
  def planesFor(corpusSize: Long, targetBucketSize: Int = 1024): Int =
    math.max(8, 64.min(math.ceil(
      math.log(math.max(corpusSize.toDouble / targetBucketSize, 1.0)) /
        math.log(2.0)).toInt))

  /** Combined IVF + PQ asymmetric-distance search — the billion-scale ANN
    * layout: the corpus is coarse-assigned to `nList` cells (deterministic
    * id < nList centroids, as [[ivfTopK]]) and stored as `m` PQ codes per
    * vector; a query probes its `nProbe` nearest cells and ranks
    * candidates by ADC from a per-query lookup table, never touching
    * corpus vectors.
    *
    * `residual = false` quantizes raw vectors — one shared codebook, and
    * the distance tables don't depend on the probed cell. `residual =
    * true` is the classic IVF-PQ refinement: codes quantize v − c(cell),
    * whose smaller spread gives finer codes for the same k; the codebook
    * trains on the residuals of rows nList ≤ id < nList + k (centroid
    * rows have zero residuals and would waste slots), and distance
    * tables become per (query, probed cell). Both paths stay
    * integer-exact on the quantized grid (residuals are differences of
    * integers).
    *
    * Scale shape: centroids (nList rows) and the distance tables
    * (queries·nProbe·m·k rows) broadcast. The corpus side costs one
    * assignment pass (window argmin on the vector id), one encode pass
    * (two hash aggregates), and the final (query, neighbor) hash
    * aggregate; in production, persist the (cell, codes) frame — it IS
    * the index — and searches reduce to the broadcast join plus the
    * per-pair aggregate. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, m: Int, k: Int, nList: Int,
                topK: Int, nProbe: Int = 1, residual: Boolean = false,
                quantizeScale: Option[Double] = Some(1000.0),
                trainUpdates: Int = 0): DataFrame = {
    require(topK >= 1 && nList >= 1 && nProbe >= 1,
      "topK, nList and nProbe must be >= 1")
    require(m >= 1 && dims % m == 0, "dims must divide evenly into m subspaces")
    require(trainUpdates >= 0, "trainUpdates must be >= 0")
    if (!residual) {
      // build-the-index + search-the-index: the same decomposition
      // [[graft.sources.AnnIndex]] persists, so an inline search and a
      // saved/reloaded index produce identical results (the index frames
      // round-trip exactly: integer-valued doubles and longs)
      val (centroids, cb, codes) = ivfPqIndexExploded(corpus, idCol, vecCol,
        dims, m, k, nList, quantizeScale, trainUpdates)
      return ivfPqSearchIndex(queries, idCol, vecCol, centroids, cb, codes,
        dims, m, k, nList, topK, nProbe, quantizeScale)
    }
    val (centroids, cb, codes) = ivfPqResidualIndexExploded(corpus, idCol,
      vecCol, dims, m, k, nList, quantizeScale, trainUpdates)
    ivfPqResidualSearchIndex(queries, idCol, vecCol, centroids, cb, codes,
      dims, m, k, nList, topK, nProbe, quantizeScale)
  }

  /** residual = v − c(cell), guarded against a dims/data mismatch the
    * same way subvectorFrame guards raw vectors. */
  private def residualOf(v: Column, c: Column, dims: Int): Column = {
    val r = zip_with(v, c, (a, b) => a - b)
    when(size(v) === lit(dims), r).otherwise(raise_error(concat(
      lit(s"PQ: expected $dims-dim vectors, got "),
      size(v).cast("string"))))
  }

  /** The RESIDUAL IVF-PQ index frames — same three-frame contract as
    * [[ivfPqIndexExploded]] (and persistable by the same
    * [[graft.sources.AnnIndex]] layout), except the codebook quantizes
    * v − c(cell) and codes therefore carry the cell they were encoded
    * against. Codebook rows start AT nList: rows id < nList are their own
    * cell centroid, so their residuals are identically zero — training on
    * id < k would fill slots with duplicate zero vectors the cid
    * tie-break can never pick, silently halving the effective codebook.
    * `trainUpdates` Lloyd-refines on the residual subvectors (classic
    * trained residual IVF-PQ); residuals of integers are integers, so
    * round 0 keeps the packed argmin. */
  private[graft] def ivfPqResidualIndexExploded(corpus: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, k: Int, nList: Int,
      quantizeScale: Option[Double],
      trainUpdates: Int = 0): (DataFrame, DataFrame, DataFrame) = {
    val sub = dims / m
    val centroids = prepVectors(corpus, idCol, vecCol, quantizeScale)
      .where(col("__id") < nList)
      .select(col("__id").cast("long").as("centroid_id"), col("__v").as("__c"))
    val corpusRes = assignNearest(
        prepVectors(corpus, idCol, vecCol, quantizeScale), centroids,
        packCentroids = if (quantizeScale.isDefined) nList else 0)
      .join(broadcast(centroids), Seq("centroid_id"))
      .select(col("__id"), col("centroid_id"),
        residualOf(col("__v"), col("__c"), dims).as("__v"))
    val resSub = subvectorsOf(corpusRes, m, sub)
    val cb0 = resSub
      .where(col("__id") >= nList && col("__id") < nList + k)
      .select(col("__s"), (col("__id") - nList).cast("long").as("__cid"),
        col("__sv").as("__c"))
    val cb = refineCodebook(resSub, cb0, k, trainUpdates,
      quantized = quantizeScale.isDefined)
    val cbb = broadcast(cb.withColumn("__cc", dot(col("__c"), col("__c"))))
    val scoredCodes = resSub.join(cbb, Seq("__s"))
      .withColumn("__d2",
        adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")))
    val codes = codeArgmin(scoredCodes,
        Seq(col("__id"), col("centroid_id"), col("__s")), k,
        quantized = quantizeScale.isDefined && trainUpdates == 0)
      .withColumnRenamed("__id", "neighbor_id")
    (centroids, cb, codes)
  }

  /** Search a RESIDUAL IVF-PQ index from its three frames — the corpus is
    * never touched. Per probed cell, the query's residual (and so its
    * distance tables) differ, which is why tables key on (query, cell). */
  private[graft] def ivfPqResidualSearchIndex(queries: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame,
      codebook: DataFrame, codes: DataFrame, dims: Int, m: Int, k: Int,
      nList: Int, topK: Int, nProbe: Int = 1,
      quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(topK >= 1 && nProbe >= 1, "topK and nProbe must be >= 1")
    val sub = dims / m
    val cbb = broadcast(codebook.select(col("__s"), col("__cid"), col("__c"))
      .withColumn("__cc", dot(col("__c"), col("__c"))))
    val queryRes = assignNearest(
        prepVectors(queries, idCol, vecCol, quantizeScale), centroids, nProbe,
        packCentroids = if (quantizeScale.isDefined) nList else 0)
      .join(broadcast(centroids), Seq("centroid_id"))
      .select(col("__id"), col("centroid_id"),
        residualOf(col("__v"), col("__c"), dims).as("__v"))
    val tables = subvectorsOf(queryRes, m, sub)
      .join(cbb, Seq("__s"))
      .select(col("__id").as("query_id"),
        col("centroid_id").as("__qcell"), col("__s"), col("__cid"),
        adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc"))
          .as("__ld"))
    adcRank(codes, tables, topK)
  }

  /** Final IVF-PQ scoring stage: candidate codes meet the (broadcast)
    * per-query distance tables on (probed cell, subspace, code), ADC
    * distances sum per (query, neighbor) in one hash aggregate, and the
    * top-k rank window (WindowGroupLimit caps it map-side) picks winners.
    * `codes`: (neighbor_id, centroid_id, __s, __code); `tables`:
    * (query_id, __qcell, __s, __cid, __ld). */
  private def adcRank(codes: DataFrame, tables: DataFrame,
                      topK: Int): DataFrame = {
    val scored = codes
      .join(broadcast(tables),
        col("centroid_id") === col("__qcell") &&
          codes("__s") === tables("__s") && col("__code") === col("__cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"), col("centroid_id"))
      .agg(sum(col("__ld")).as("adc_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("centroid_id"), col("adc_d2"))
  }

  /** Build the three frames of a NON-residual IVF-PQ index over a corpus:
    * centroids (centroid_id, __c) — the nList coarse cells; codebook
    * (__s, __cid, __c) — the m·k PQ subspace centroids; codes
    * (neighbor_id, centroid_id, __s, __code) — each corpus vector reduced
    * to its cell plus m small code ids. These ARE the persistent index:
    * [[graft.sources.AnnIndex]] writes them to parquet (codes partitioned
    * by cell, so an nProbe search prunes to the probed directories) and
    * searches never touch the raw corpus again. Everything in them
    * round-trips parquet exactly — integer-valued doubles and longs. */
  private[graft] def ivfPqIndexExploded(corpus: DataFrame, idCol: String,
      vecCol: String, dims: Int, m: Int, k: Int, nList: Int,
      quantizeScale: Option[Double],
      trainUpdates: Int = 0): (DataFrame, DataFrame, DataFrame) = {
    require(nList >= 1, "nList must be >= 1")
    require(m >= 1 && dims % m == 0, "dims must divide evenly into m subspaces")
    val centroids = prepVectors(corpus, idCol, vecCol, quantizeScale)
      .where(col("__id") < nList)
      .select(col("__id").cast("long").as("centroid_id"), col("__v").as("__c"))
    val corpusCells = assignNearest(
        prepVectors(corpus, idCol, vecCol, quantizeScale), centroids,
        packCentroids = if (quantizeScale.isDefined) nList else 0)
      .select(col("__id").as("neighbor_id"), col("centroid_id"))
    // ONE codebook frame feeds both the encode and the returned index, so
    // trained codes can never drift from the tables searches will build
    val cb = pqCodebookFor(corpus, idCol, vecCol, dims, m, k, quantizeScale,
      trainUpdates)
    val codes = pqCodesAgainst(corpus, idCol, vecCol, dims, m, k,
        quantizeScale, cb, integerCb = trainUpdates == 0)
      .withColumnRenamed("__id", "neighbor_id")
      .join(corpusCells, Seq("neighbor_id"))
    (centroids, cb, codes)
  }

  /** Encode NEW vectors against an EXISTING index's frames (centroids +
    * codebook, e.g. reloaded by [[graft.sources.AnnIndex]]) — the
    * incremental-ingest half of the index lifecycle: cells and codes for
    * the new rows only, nothing retrains, nothing re-encodes. Returns
    * the same exploded (neighbor_id, centroid_id, __s, __code) shape the
    * search paths consume. `integerCb` must be false for a TRAINED
    * codebook (fractional means). */
  private[graft] def encodeAgainstIndex(newCorpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, codebook: DataFrame,
      dims: Int, m: Int, k: Int, nList: Int, residual: Boolean,
      quantizeScale: Option[Double], integerCb: Boolean): DataFrame = {
    val sub = dims / m
    if (!residual) {
      val cells = assignNearest(
          prepVectors(newCorpus, idCol, vecCol, quantizeScale), centroids,
          packCentroids = if (quantizeScale.isDefined) nList else 0)
        .select(col("__id").as("neighbor_id"), col("centroid_id"))
      pqCodesAgainst(newCorpus, idCol, vecCol, dims, m, k, quantizeScale,
          codebook.select(col("__s"), col("__cid"), col("__c")), integerCb)
        .withColumnRenamed("__id", "neighbor_id")
        .join(cells, Seq("neighbor_id"))
    } else {
      val res = assignNearest(
          prepVectors(newCorpus, idCol, vecCol, quantizeScale), centroids,
          packCentroids = if (quantizeScale.isDefined) nList else 0)
        .join(broadcast(centroids), Seq("centroid_id"))
        .select(col("__id"), col("centroid_id"),
          residualOf(col("__v"), col("__c"), dims).as("__v"))
      val resSub = subvectorsOf(res, m, sub)
      val cbb = broadcast(codebook.select(col("__s"), col("__cid"), col("__c"))
        .withColumn("__cc", dot(col("__c"), col("__c"))))
      val scored = resSub.join(cbb, Seq("__s"))
        .withColumn("__d2",
          adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")))
      codeArgmin(scored, Seq(col("__id"), col("centroid_id"), col("__s")), k,
          quantized = quantizeScale.isDefined && integerCb)
        .withColumnRenamed("__id", "neighbor_id")
    }
  }

  /** Map-only PQ encode against DRIVER-COLLECTED centroid/codebook
    * matrices — the stateless encode a STREAMING ingest needs: every
    * operator is a projection (no joins, no aggregations), so the plan is
    * append-mode safe and exactly-once under the file sink. Returns
    * (idCol, cell, pq_code) rows. Winners match the batch
    * [[pqCodesAgainst]]/[[assignNearest]] argmins exactly: the common
    * ||v||² term is dropped from both comparisons (order-preserving —
    * subtracting the same exact-integer value from every candidate), and
    * ties break by centroid id via the same least(struct) shape
    * [[kmeansFitCollected]] uses. Driver state is the nList×dims +
    * m·k×(dims/m) matrices — the usual bounded-collect trust. */
  private[graft] def encodeRowsAgainstCollected(df: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Double])],
      cb: Map[Int, Array[(Long, Array[Double])]], dims: Int, m: Int,
      quantizeScale: Option[Double], residual: Boolean = false): DataFrame = {
    require(cents.nonEmpty && (0 until m).forall(s => cb.getOrElse(s, Array.empty).nonEmpty),
      "collected centroids and every subspace codebook must be non-empty")
    val sub = dims / m
    def sqNorm(c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    // NaN fail-fast mirrors codeArgmin's batch guard: least(struct) would
    // otherwise TOLERATE NaN (NaN loses in Spark ordering) and encode a
    // malformed vector silently, breaking the documented byte-identical-
    // to-batch equivalence exactly on the inputs where batch raises
    def scoreOf(vec: Column, c: Array[Double]): Column = {
      val s = lit(-2.0) * dot(vec, array(c.toSeq.map(lit): _*)) + lit(sqNorm(c))
      when(isnan(s), raise_error(
        lit("PQ encode: non-finite distance (NaN vector element?)")))
        .otherwise(s)
    }
    def argminScore(vec: Column, cands: Array[(Long, Array[Double])]): Column = {
      val scored = cands.map { case (cid, c) =>
        struct(scoreOf(vec, c).as("s"), lit(cid).as("cid"))
      }
      (if (scored.length == 1) scored.head else least(scored.toSeq: _*))
        .getField("cid")
    }
    // fail fast on a dims mismatch (same rationale as subvectorFrame: a
    // short vector would dot to garbage silently, not error)
    val checked = when(size(col(vecCol)) === lit(dims), col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"PQ: expected $dims-dim vectors in '$vecCol', got "),
        size(col(vecCol)).cast("string"))))
    val vec = quantizeScale.map(sc => quantize(checked, sc))
      .getOrElse(asDouble(checked))
    val staged = df.select(col(idCol), vec.as("__v"))
    // residual path: the winning centroid's VECTOR rides in the argmin
    // struct (third field — never compared, cid ties are impossible), so
    // cell + residual come from ONE staged struct, still pure projection
    val (codeInput, cellCol, base) =
      if (!residual) (col("__v"), argminScore(col("__v"), cents), staged)
      else {
        val winCands = cents.map { case (cid, c) =>
          struct(scoreOf(col("__v"), c).as("s"), lit(cid).as("cid"),
            array(c.toSeq.map(lit): _*).as("c")) }
        val win =
          if (winCands.length == 1) winCands.head
          else least(winCands.toSeq: _*)
        val withWin = staged.withColumn("__win", win)
          .withColumn("__r",
            zip_with(col("__v"), col("__win").getField("c"), (a, b) => a - b))
        (col("__r"), col("__win").getField("cid"), withWin)
      }
    val withSubs = (0 until m).foldLeft(base)((d, s) =>
      d.withColumn(s"__sv$s", slice(codeInput, s * sub + 1, sub)))
    withSubs.select(col(idCol),
      cellCol.as("cell"),
      array((0 until m).map(s =>
        argminScore(col(s"__sv$s"), cb(s))): _*).as("pq_code"))
  }

  /** The DISTINCT probe-cell set of a query batch against a
    * (centroid_id, __c) centroid frame — bounded by the centroid count
    * (never by query count), so collecting it is safe at any query
    * volume. [[graft.sources.AnnIndex]] pushes it as a static partition
    * filter on the cell-partitioned codes scan: deterministic directory
    * pruning, instead of hoping runtime DPP fires on the join. */
  private[graft] def probeCells(queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, nList: Int, nProbe: Int,
      quantizeScale: Option[Double]): Seq[Long] =
    assignNearest(prepVectors(queries, idCol, vecCol, quantizeScale),
        centroids, nProbe,
        packCentroids = if (quantizeScale.isDefined) nList else 0)
      .select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSeq

  /** Search a NON-residual IVF-PQ index given as the three
    * [[ivfPqIndexExploded]] frames — possibly reloaded from parquet by
    * [[graft.sources.AnnIndex]]. The corpus is never touched: queries
    * assign to their nProbe nearest cells against `centroids` (each
    * probed cell duplicates the query's broadcast-tiny distance-table
    * rows — the standard IVF recall knob; a corpus row still pairs with
    * a query at most once, it lives in exactly one cell), ADC tables
    * come from `codebook`, and candidates from `codes`. */
  private[graft] def ivfPqSearchIndex(queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, codebook: DataFrame,
      codes: DataFrame, dims: Int, m: Int, k: Int, nList: Int, topK: Int,
      nProbe: Int = 1,
      quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(topK >= 1 && nProbe >= 1, "topK and nProbe must be >= 1")
    val queryCells = assignNearest(
        prepVectors(queries, idCol, vecCol, quantizeScale), centroids, nProbe,
        packCentroids = if (quantizeScale.isDefined) nList else 0)
      .select(col("__id").as("query_id"), col("centroid_id").as("__qcell"))
    // __cc is re-derived rather than persisted: dot() has a fixed fold
    // order, so the recomputed value is bit-identical to the build side's
    val cb = codebook.select(col("__s"), col("__cid"), col("__c"))
      .withColumn("__cc", dot(col("__c"), col("__c")))
    val tables = subvectorFrame(queries, idCol, vecCol, dims, m, quantizeScale)
      .withColumnRenamed("__id", "query_id")
      .join(cb, Seq("__s"))
      .select(col("query_id"), col("__s"), col("__cid"),
        adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")).as("__ld"))
      .join(queryCells, Seq("query_id"))
    adcRank(codes, tables, topK)
  }

  /** Quantize a float vector onto an integer grid (floor(x * scale), kept
    * as doubles). Makes every downstream sum EXACT (integer-valued doubles
    * add associatively below 2^53), so k-means over quantized vectors is
    * bit-reproducible regardless of partitioning, shuffle order, or
    * engine — the property the correctness gate needs, and a cheap
    * stability win in production too (re-runs can't flip assignments). */
  def quantize(vec: Column, scale: Double = 1000.0): Column =
    transform(asDouble(vec), x => floor(x * lit(scale)).cast("double"))

  /** Lloyd's k-means over a vector column, expressed as one lazy DataFrame
    * plan: `iters` rounds of (assign to nearest centroid, recompute
    * centroid means), returning the final assignment (idCol, centroid_id).
    * Initial centroids are the rows with id < k — deterministic, no RNG
    * (k-means++ can be layered on by passing better-seeded input ids).
    * This is the training step [[ivfAssign]] expects: feed the fitted
    * centroids in as the IVF coarse quantizer.
    *
    * Scale shape per round: centroids are a k-row frame joined in with an
    * explicit broadcast (k ≤ a few thousand); assignment is one corpus
    * pass (distance = ||v||² - 2v·c + ||c||², with ||v||² staged once per
    * row, so each candidate costs ONE dot product); the centroid update is
    * posexplode + (centroid, dim) hash aggregation — map-side partial
    * combine, never a collect of members. The corpus is scanned, never
    * shuffled on a key (the window's partition key is the row id, which
    * AQE handles; the (k × dim) update aggregate is tiny). Distances on
    * quantized input are exact integers in round 1 and deterministic
    * doubles after (means divide exact sums), so ties break identically
    * everywhere (by centroid id). Empty clusters drop out of the update,
    * as in classic Lloyd. For large `iters` interpose localCheckpoint
    * every few rounds; the plan is linear in iters. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int,
                   quantizeScale: Option[Double] = Some(1000.0),
                   seeding: String = "first-ids"): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val v = prepVectors(df, idCol, vecCol, quantizeScale)
    val centroids = kmeansCentroidsFrame(df, idCol, vecCol, k,
      updates = iters - 1, quantizeScale, seeding)
    // iters == 1 assigns against the integer seed centroids → packed argmin
    assignNearest(v, centroids,
        packCentroids = if (quantizeScale.isDefined && iters == 1) k else 0)
      .select(col("__id").as(idCol), col("centroid_id"))
  }

  /** (id as __id, quantized-or-double vector as __v, staged ||v||² as
    * __vv) — the shared input shape of assignment and search. */
  private def prepVectors(df: DataFrame, idCol: String, vecCol: String,
                          quantizeScale: Option[Double]): DataFrame = {
    val vec = quantizeScale.map(s => quantize(col(vecCol), s))
      .getOrElse(asDouble(col(vecCol)))
    df.select(col(idCol).as("__id"), vec.as("__v"))
      .withColumn("__vv", dot(col("__v"), col("__v")))
  }

  /** Nearest-centroid assignment of a [[prepVectors]] frame against a
    * (centroid_id, __c) frame: ||v||² - 2v·c + ||c||² argmin, ties by
    * centroid id. Keeps __v/__vv for downstream search. `nProbe` > 1
    * returns the nProbe closest centroids per vector (the IVF probe
    * set) instead of just the best.
    *
    * Scale shape (nProbe = 1, the path every IVF assignment and k-means
    * round takes): the argmin is an AGGREGATION, not a window — a window
    * would shuffle all N·nList scored rows (each dragging the full vector)
    * on __id just to pick one; the aggregate's map-side partial combine
    * collapses them to N skinny rows before the exchange, and the vector
    * rides back in via one N-row join. With nList = 4096 that is a 4096×
    * shuffle-byte reduction per Lloyd round. When distances are exact
    * integers (quantized vectors scored against SEED centroids — pass
    * `packCentroids` = the exclusive centroid-id bound), (d2, cid) packs
    * into one long and the argmin is a primitive-min HashAggregate
    * ([[codeArgmin]]); fractional centroids (post-mean-update rounds) use
    * the struct min, which falls to SortAggregate but keeps the same
    * partial-combine shuffle shape. nProbe > 1 keeps the window: its
    * output IS nProbe rows per vector, so there is nothing to collapse.
    *
    * Ids must be unique keys (the contract every caller already holds —
    * see minHashSignature's identical note): the aggregate + join-back
    * emits one output row per INPUT row, so a duplicated id would ride
    * through twice (double-weighting Lloyd means) where the old rank-1
    * window silently collapsed it. */
  private def assignNearest(v: DataFrame, cs: DataFrame,
                            nProbe: Int = 1,
                            packCentroids: Int = 0): DataFrame = {
    val c = broadcast(cs.withColumn("__cc", dot(col("__c"), col("__c"))))
    val scored = v.crossJoin(c)
      .withColumn("__d2",
        col("__vv") - lit(2.0) * dot(col("__v"), col("__c")) + col("__cc"))
    if (nProbe == 1) {
      val best =
        if (packCentroids > 0)
          codeArgmin(scored.withColumnRenamed("centroid_id", "__cid"),
            Seq(col("__id")), packCentroids, quantized = true)
            .select(col("__id"), col("__code").as("centroid_id"))
        else
          scored.groupBy(col("__id"))
            .agg(min(struct(col("__d2"), col("centroid_id")))
              .getField("centroid_id").as("centroid_id"))
      best.join(v, Seq("__id"))
        .select(col("__id"), col("centroid_id"), col("__v"), col("__vv"))
    } else {
      val w = Window.partitionBy(col("__id"))
        .orderBy(col("__d2").asc, col("centroid_id").asc)
      scored.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= nProbe)
        .select(col("__id"), col("centroid_id"), col("__v"), col("__vv"))
    }
  }

  /** The Lloyd-trained centroid frame (centroid_id, __c) after `updates`
    * mean-recomputation rounds — the lazy-plan counterpart of
    * [[kmeansFitCollected]]'s matrix, consumable by [[ivfKmeansTopK]] or
    * a custom searcher. `seeding` picks the init: "first-ids" (rows with
    * id < k — zero extra passes, fine when ids are uncorrelated with
    * content) or "farthest" ([[farthestPointSeeds]] — spreads seeds
    * across the data's extent, immune to adversarial id order). */
  def kmeansCentroidsFrame(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, updates: Int,
                           quantizeScale: Option[Double] = Some(1000.0),
                           seeding: String = "first-ids"): DataFrame = {
    require(k >= 1 && updates >= 0, "k must be >= 1 and updates >= 0")
    val v = prepVectors(df, idCol, vecCol, quantizeScale)
    var centroids = seeding match {
      case "first-ids" => v.where(col("__id") < k)
        .select(col("__id").cast("long").as("centroid_id"), col("__v").as("__c"))
      case "farthest" => farthestPointSeeds(df, idCol, vecCol, k, quantizeScale)
      case other => throw new IllegalArgumentException(
        s"unknown seeding '$other' (use 'first-ids' or 'farthest')")
    }
    for (round <- 0 until updates) {
      // round 0 scores the integer seed centroids → packed-long argmin;
      // later rounds score fractional means → struct-min (same shape
      // codeArgmin's callers use)
      val pack = if (quantizeScale.isDefined && round == 0) k else 0
      centroids = lloydMeanUpdate(
        assignNearest(v, centroids, packCentroids = pack)
          .select(col("centroid_id"), col("__v")),
        Seq("centroid_id"), "__v")
    }
    centroids
  }

  /** Deterministic farthest-point (k-means++-flavored) seeding: start
    * from the smallest-id row, then greedily pick the row FARTHEST from
    * the current seed set (max over rows of min distance to any seed),
    * ties by smallest id — the classic k-center greedy init. No RNG: on
    * the quantized grid every distance is an exact integer and every
    * tie-break is by id, so the seeds are a pure function of the data —
    * same property the id < k init has, without its failure mode (the
    * first k ids all landing in one cluster, e.g. ingest order grouped by
    * source). Returns (centroid_id 0..k-1 in pick order, __c), directly
    * consumable as `kmeansCentroidsFrame(..., seeding = "farthest")`.
    *
    * Scale shape: k-1 corpus passes, each a broadcast-literal distance
    * projection + TakeOrdered(1) (no shuffle, no sort — a top-1 heap per
    * partition then on the driver); driver state is the k × dim seed
    * matrix, the same bounded-state trust as [[kmeansFitCollected]]. The
    * pass count is linear in k — for k in the thousands, run it on a
    * deterministic hash-sample of the corpus instead (seed quality needs
    * the data's extent, not its bulk). */
  def farthestPointSeeds(df: DataFrame, idCol: String, vecCol: String,
                         k: Int,
                         quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val v = prepVectors(df, idCol, vecCol, quantizeScale)
    val first = v.orderBy(col("__id").asc)
      .select(col("__id").cast("long"), col("__v")).head(1)
    require(first.nonEmpty, "farthestPointSeeds: empty input")
    def sqNorm(c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc = acc + c(i) * c(i); i += 1 }
      acc
    }
    def d2To(c: Array[Double]): Column = {
      val cLit = array(c.toSeq.map(lit): _*)
      col("__vv") - lit(2.0) * dot(col("__v"), cLit) + lit(sqNorm(c))
    }
    val seeds = scala.collection.mutable.ArrayBuffer[Array[Double]](
      first(0).getSeq[Double](1).toArray)
    for (_ <- 1 until k) {
      val minD = seeds.map(d2To).reduceLeft(least(_, _))
      // NaN guard: desc ordering sorts NaN FIRST in Spark, so one vector
      // with a NaN element (quantize keeps NaN) would silently become
      // every remaining seed — fail loudly instead, like codeArgmin
      val guarded = when(isnan(minD), raise_error(concat(
        lit("farthestPointSeeds: non-finite distance for id "),
        col("__id").cast("string")))).otherwise(minD)
      val next = v.select(col("__id").cast("long").as("__id"), col("__v"),
          guarded.as("__md"))
        .orderBy(col("__md").desc, col("__id").asc)
        .head()
      seeds += next.getSeq[Double](1).toArray
    }
    spark.createDataset(seeds.toSeq.zipWithIndex.map { case (c, i) =>
      (i.toLong, c) }).toDF("centroid_id", "__c")
  }

  /** Total within-cluster squared distance (inertia) of a corpus against
    * a (centroid_id, __c) centroid frame — the elbow-method / seeding-
    * comparison metric. One broadcast, one corpus pass, two hash
    * aggregates (per-row min then global sum); never shuffles vectors. */
  def kmeansInertia(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame,
                    quantizeScale: Option[Double] = Some(1000.0)): Double = {
    val v = prepVectors(df, idCol, vecCol, quantizeScale)
    val c = broadcast(centroids.withColumn("__cc", dot(col("__c"), col("__c"))))
    v.crossJoin(c)
      .withColumn("__d2",
        col("__vv") - lit(2.0) * dot(col("__v"), col("__c")) + col("__cc"))
      .groupBy(col("__id")).agg(min(col("__d2")).as("__md"))
      .agg(sum(col("__md"))).head().getDouble(0)
  }

  /** The sums stage of a Lloyd mean update: member rows (keys..., vecCol)
    * → (keys..., __pos, __sx, __cnt). Exact integer sums on the quantized
    * grid; shared by [[lloydMeanUpdate]] and the collected scale path
    * ([[kmeansFitCollected]]), which divides driver-side. */
  private def lloydMeanSums(members: DataFrame, keys: Seq[String],
                            vecCol: String): DataFrame =
    members
      .select(keys.map(col) :+ posexplode(col(vecCol)).as(Seq("__pos", "__x")): _*)
      .groupBy((keys :+ "__pos").map(col): _*)
      .agg(sum(col("__x")).as("__sx"), count(lit(1)).as("__cnt"))

  /** One Lloyd mean update, shared by every trained path: member rows
    * (keys..., vecCol) → (keys..., __c mean vector). Sums are exact
    * (integer-valued doubles on the quantized grid); the division per
    * (key, pos) is the only inexact step and is deterministic. Keys with
    * no members drop out — classic Lloyd empty-cluster behavior. */
  private def lloydMeanUpdate(members: DataFrame, keys: Seq[String],
                              vecCol: String): DataFrame =
    lloydMeanSums(members, keys, vecCol)
      .withColumn("__mn", col("__sx") / col("__cnt").cast("double"))
      .groupBy(keys.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__mn")))),
        st => st.getField("__mn")).as("__c"))

  /** End-to-end IVF with Lloyd-TRAINED centroids: fit `nList` centroids
    * on the corpus (`iters` k-means rounds, quantized grid so the whole
    * pipeline is bit-reproducible), assign corpus and queries to cells,
    * then top-k nearest (squared-L2 ascending, ties by id) within the
    * query's `nProbe` nearest cells. Train → coarse-quantize → search,
    * the full IVF lifecycle in one lazy plan; [[ivfTopK]] remains the
    * untrained-centroid (id < nList) variant. nProbe > 1 is the standard
    * IVF recall knob: each probed cell widens the query's candidate set;
    * a corpus row still pairs with a query at most once (it lives in
    * exactly one cell).
    *
    * Scale shape: training per round is one broadcast + one corpus pass +
    * a (nList × dim) aggregate; search joins corpus cells to broadcast
    * queries — the corpus shuffles once on cell id, and nProbe only
    * multiplies the broadcast-tiny query side. */
  def ivfKmeansTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, nList: Int, iters: Int,
                    nProbe: Int = 1,
                    quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(k >= 1 && nProbe >= 1, "k and nProbe must be >= 1")
    val centroids = kmeansCentroidsFrame(corpus, idCol, vecCol, nList,
      updates = iters - 1, quantizeScale)
    // iters == 1: centroids are still the integer seeds → packed argmin
    val pack = if (quantizeScale.isDefined && iters == 1) nList else 0
    val corpusAssigned = assignNearest(
        prepVectors(corpus, idCol, vecCol, quantizeScale), centroids,
        packCentroids = pack)
      .select(col("__id").as("neighbor_id"), col("centroid_id"),
        col("__v").as("__nv"), col("__vv").as("__nvv"))
    val queryAssigned = assignNearest(
        prepVectors(queries, idCol, vecCol, quantizeScale), centroids,
        nProbe, packCentroids = pack)
      .select(col("__id").as("query_id"), col("centroid_id"),
        col("__v").as("__qv"), col("__vv").as("__qvv"))
    val scored = broadcast(queryAssigned)
      .join(corpusAssigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__d2",
        col("__qvv") - lit(2.0) * dot(col("__qv"), col("__nv")) + col("__nvv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d2").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("centroid_id"))
  }

  /** Symmetric int8 quantization of an embedding column: round-to-floor
    * of x·scale, clamped to [-128, 127] — the 4× storage/bandwidth
    * compression serving stacks apply before shipping vectors. Integer
    * outputs, deterministic everywhere. NaN elements are pinned to 0
    * BEFORE scaling (engines disagree on clamp-vs-floor ordering for NaN;
    * the oracle mirrors this guard). */
  def quantizeInt8(vec: Column, scale: Double = 127.0): Column =
    transform(asDouble(vec), x =>
      greatest(lit(-128),
        least(lit(127), floor(nanvl(x, lit(0.0)) * lit(scale)))).cast("int"))

  /** Matryoshka-style truncation: keep the first `dims` dimensions and
    * re-normalize to unit length (null when the truncated prefix is all
    * zeros). Cosine over truncated+renormed vectors approximates full
    * cosine at dims/d of the cost — the standard cheap-first-pass
    * retrieval trick for MRL-trained embeddings. Deterministic doubles
    * (sequential-fold norm, IEEE sqrt/divide).
    *
    * Convenience Column form — the division lambda re-evaluates the norm
    * fold per element (O(dims²) per row, interpreted); for hot paths use
    * [[truncateRenormed]], which stages prefix and norm as attributes. */
  def truncateRenorm(vec: Column, dims: Int): Column = {
    require(dims >= 1, "dims must be >= 1")
    val prefix = slice(asDouble(vec), 1, dims)
    val n = sqrt(dot(prefix, prefix))
    when(n > 0.0, transform(prefix, x => x / n))
  }

  /** [[truncateRenorm]] with the prefix and its norm staged once per row
    * (multi-referenced attributes survive CollapseProject) — the shape to
    * use on real corpora. Replaces `vecCol` with the truncated unit vector
    * in place; every other column passes through unchanged. (`idCol` is
    * kept for signature stability; the passthrough covers it.) */
  def truncateRenormed(df: DataFrame, idCol: String, vecCol: String,
                       dims: Int): DataFrame = {
    require(dims >= 1, "dims must be >= 1")
    val passthrough = df.columns.filter(_ != vecCol).map(col)
    val staged = df
      .select(passthrough :+ slice(asDouble(col(vecCol)), 1, dims).as("__p"): _*)
      .withColumn("__n", sqrt(dot(col("__p"), col("__p"))))
    val out = df.columns.map { c =>
      if (c == vecCol)
        when(col("__n") > 0.0, transform(col("__p"), x => x / col("__n")))
          .as(vecCol)
      else col(c)
    }
    staged.select(out: _*)
  }

  /** Scale-path Lloyd's k-means: IDENTICAL assignments to [[kmeansAssign]]
    * (bit-for-bit on quantized input — asserted by `PipelineSpec`), but
    * each round collects the k × dim centroid matrix to the driver (a few
    * KB — the same bounded-driver-state trust as the LSH hyperplanes) and
    * evaluates the argmin IN-ROW against literal arrays. The corpus is
    * never shuffled: assignment is a map-only projection, and the only
    * thing crossing the network per round is the (k × dim) partial-sum
    * aggregate of the centroid update. Prefer this at scale / high iter
    * counts; [[kmeansAssign]] stays one lazy replayable plan (no driver
    * state), which the correctness oracle needs. Returns (assignments,
    * final centroid matrix sorted by centroid id) — feed the centroids to
    * [[ivfAssign]] as the trained coarse quantizer. */
  def kmeansFitCollected(df: DataFrame, idCol: String, vecCol: String,
                         k: Int, iters: Int,
                         quantizeScale: Option[Double] = Some(1000.0))
      : (DataFrame, Array[(Long, Array[Double])]) = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val vec = quantizeScale.map(s => quantize(col(vecCol), s))
      .getOrElse(asDouble(col(vecCol)))
    val v = df.select(col(idCol).as("__id"), vec.as("__v"))
      .withColumn("__vv", dot(col("__v"), col("__v")))
    // sequential fold, same order as the dot() Column expression
    def sqNorm(c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc = acc + c(i) * c(i); i += 1 }
      acc
    }
    def assignCol(cs: Array[(Long, Array[Double])]): Column = {
      val candidates = cs.map { case (cid, c) =>
        val cLit = array(c.map(lit).toSeq: _*)
        struct(
          (col("__vv") - lit(2.0) * dot(col("__v"), cLit) + lit(sqNorm(c)))
            .as("d"),
          lit(cid).as("cid"))
      }
      // least(struct) = (min d2, then min cid): same pick as the ranking
      // window in kmeansAssign
      (if (candidates.length == 1) candidates.head else least(candidates.toSeq: _*))
        .getField("cid")
    }
    var centroids: Array[(Long, Array[Double])] = v.where(col("__id") < k)
      .select(col("__id").cast("long"), col("__v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    for (_ <- 1 until iters) {
      val assigned = v.withColumn("__cid", assignCol(centroids))
      val sums = lloydMeanSums(assigned.select(col("__cid"), col("__v")),
        Seq("__cid"), "__v").collect()
      centroids = sums.groupBy(_.getLong(0)).toArray.map { case (cid, rows) =>
        val dim = rows.length
        val c = new Array[Double](dim)
        rows.foreach(r => c(r.getInt(1)) = r.getDouble(2) / r.getLong(3).toDouble)
        cid -> c
      }.sortBy(_._1)
    }
    (v.select(col("__id").as(idCol), assignCol(centroids).as("centroid_id")),
      centroids)
  }

  /** Embedding near-duplicate pairs: cosine above threshold, via LSH
    * buckets (a < b to halve the candidate space).
    *
    * Bucket-width defense (same rationale as Dedup.lshCandidatePairs): a
    * bucket over `maxBucketSize` — e.g. a corpus of near-identical
    * embeddings all hashing to one signature — degrades from all-pairs to
    * chained consecutive pairs (O(n), transitivity keeps clusters
    * connected); buckets at or under the cap stay exact all-pairs. */
  /** (__id, __s, __sv, __svv): each vector split into `m` contiguous
    * subvectors of dims/m, exploded one row per (vector, subspace), with
    * the subvector's squared norm staged. Shared by PQ encode and ADC
    * search. */
  private def subvectorFrame(df: DataFrame, idCol: String, vecCol: String,
                             dims: Int, m: Int,
                             quantizeScale: Option[Double]): DataFrame = {
    require(m >= 1 && dims % m == 0, "dims must divide evenly into m subspaces")
    val sub = dims / m
    // fail fast on a dims/data mismatch: slicing past the array end would
    // otherwise yield empty subvectors whose distance to every centroid is
    // 0 — silently corrupt codes, not an error
    val checked = when(size(col(vecCol)) === lit(dims), col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"PQ: expected $dims-dim vectors in '$vecCol', got "),
        size(col(vecCol)).cast("string"))))
    val vec = quantizeScale.map(s => quantize(checked, s))
      .getOrElse(asDouble(checked))
    subvectorsOf(df.select(col(idCol).as("__id"), vec.as("__v")), m, sub)
  }

  /** Split an already-prepared (__id, __v, carry...) frame into one row
    * per (vector, subspace): (__id, carry..., __s, __sv, __svv). */
  private def subvectorsOf(df: DataFrame, m: Int, sub: Int): DataFrame = {
    val carry = df.columns.filter(_ != "__v").map(col)
    df.select(carry :+
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("__v"), s * sub + 1, lit(sub)))).as(Seq("__s", "__sv")): _*)
      .withColumn("__svv", dot(col("__sv"), col("__sv")))
  }

  /** Per-subspace codebook (__s, __cid, __c, __cc): centroids are the
    * subvectors of rows with id < k — the same deterministic no-RNG init
    * as [[ivfTopK]] (layer [[kmeansCentroidsFrame]] per subspace for
    * trained codebooks). */
  private def pqCodebook(df: DataFrame, idCol: String, vecCol: String,
                         dims: Int, m: Int, k: Int,
                         quantizeScale: Option[Double]): DataFrame =
    // bounded BOTH ways: cid must land in [0, k) for the packed argmin's
    // d2*k + cid encoding (a negative id would alias across distance
    // levels and decode wrongly via pmod)
    subvectorFrame(df.where(col(idCol) >= 0 && col(idCol) < k),
      idCol, vecCol, dims, m, quantizeScale)
      .select(col("__s"), col("__id").cast("long").as("__cid"),
        col("__sv").as("__c"), col("__svv").as("__cc"))

  /** Product-quantization encode: each vector becomes `m` codebook ids
    * (code(s) = nearest of `k` per-subspace centroids, squared-L2, ties
    * by centroid id) — m bytes-ish per vector instead of 4·dims, the
    * compression that lets a 100 TB vector store keep its codes in
    * memory. On the quantized grid every distance is an exact integer, so
    * codes are bit-reproducible across engines and partitionings.
    *
    * `trainUpdates` > 0 Lloyd-refines each subspace codebook that many
    * mean-update rounds before encoding (classic trained PQ; the
    * deterministic id < k subvectors seed round 0). Updated centroids are
    * fractional means, so post-training determinism rests on
    * deterministic IEEE doubles with fixed fold order — the q77/q90
    * guarantee — rather than integer exactness.
    *
    * Scale shape: the codebook (m·k rows) broadcasts; the corpus explodes
    * to n·m subvector rows scored against k candidates each, and the
    * argmin is a primitive min() over (d2, cid) packed into one long —
    * a true HashAggregate with map-side combine (quantized path; the
    * unquantized fallback uses min-of-struct, which Spark evaluates with
    * SortAggregate); reassembly is one more hash aggregate on id. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String, dims: Int,
               m: Int, k: Int,
               quantizeScale: Option[Double] = Some(1000.0),
               trainUpdates: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    pqCodesExploded(df, idCol, vecCol, dims, m, k, quantizeScale, trainUpdates)
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("__s"), col("__code")))),
        s => s.getField("__code")).as("pq_code"))
      .select(col("__id").as(idCol), col("pq_code"))
  }

  /** The (untrained or Lloyd-refined) per-subspace codebook as
    * (__s, __cid, __c) — ONE frame shared by encode and distance tables,
    * so a trained search cannot drift between the codebook its codes used
    * and the one its tables use. */
  private def pqCodebookFor(df: DataFrame, idCol: String, vecCol: String,
                            dims: Int, m: Int, k: Int,
                            quantizeScale: Option[Double],
                            trainUpdates: Int): DataFrame = {
    require(k >= 1 && trainUpdates >= 0,
      "k must be >= 1 and trainUpdates >= 0")
    if (trainUpdates == 0)
      pqCodebook(df, idCol, vecCol, dims, m, k, quantizeScale)
        .select(col("__s"), col("__cid"), col("__c"))
    else
      pqTrainedCodebook(df, idCol, vecCol, dims, m, k, trainUpdates,
        quantizeScale).select(col("__s"), col("__cid"), col("__c"))
  }

  /** Encode a frame against a GIVEN (__s, __cid, __c) codebook:
    * (__id, __s, __code). `integerCb` gates the packed-long argmin (valid
    * only while the codebook is integer-valued — i.e. untrained seeds on
    * the quantized grid; trained centroids are fractional means). */
  private def pqCodesAgainst(df: DataFrame, idCol: String, vecCol: String,
                             dims: Int, m: Int, k: Int,
                             quantizeScale: Option[Double],
                             cb: DataFrame, integerCb: Boolean): DataFrame = {
    val cbb = broadcast(cb.withColumn("__cc", dot(col("__c"), col("__c"))))
    val scored = subvectorFrame(df, idCol, vecCol, dims, m, quantizeScale)
      .join(cbb, Seq("__s"))
      .withColumn("__d2",
        adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")))
    codeArgmin(scored, Seq(col("__id"), col("__s")), k,
      quantized = quantizeScale.isDefined && integerCb)
  }

  /** The exploded (__id, __s, __code) PQ assignment — what the search
    * paths consume directly (assembling per-id code arrays just to
    * re-explode them would cost an extra corpus-wide aggregate). */
  private def pqCodesExploded(df: DataFrame, idCol: String, vecCol: String,
                              dims: Int, m: Int, k: Int,
                              quantizeScale: Option[Double],
                              trainUpdates: Int = 0): DataFrame =
    pqCodesAgainst(df, idCol, vecCol, dims, m, k, quantizeScale,
      pqCodebookFor(df, idCol, vecCol, dims, m, k, quantizeScale, trainUpdates),
      integerCb = trainUpdates == 0)

  /** Per-subspace Lloyd refinement of the PQ codebook: `updates` rounds
    * of (assign each subvector to its nearest subspace centroid,
    * recompute means). All m subspaces train in ONE grouped plan per
    * round. Per-round cost: two corpus scans (score + member recovery —
    * the subvector projection is map-only over the scan) and one
    * (vector, subspace)-keyed shuffle join; the join-back moves n·m rows,
    * k× less than a window or min_by argmin would sort (those buffer all
    * n·m·k scored rows to carry the subvector through). Round 0 scores
    * the integer seed centroids, so its argmin takes the packed-long
    * HashAggregate; later rounds score fractional means and use the
    * struct min. Empty clusters drop out, as in classic Lloyd. */
  private def pqTrainedCodebook(df: DataFrame, idCol: String, vecCol: String,
                                dims: Int, m: Int, k: Int, updates: Int,
                                quantizeScale: Option[Double]): DataFrame = {
    val sub = subvectorFrame(df, idCol, vecCol, dims, m, quantizeScale)
    val cb0 = pqCodebook(df, idCol, vecCol, dims, m, k, quantizeScale)
      .select(col("__s"), col("__cid"), col("__c"))
    refineCodebook(sub, cb0, k, updates,
        quantized = quantizeScale.isDefined)
      .withColumn("__cc", dot(col("__c"), col("__c")))
  }

  /** The shared per-subspace Lloyd loop: `updates` rounds of (assign each
    * (__id, __s, __sv, __svv) subvector to its nearest (__s, __cid, __c)
    * centroid, recompute means). Works on raw subvectors (trained PQ) and
    * on residual subvectors (trained residual IVF-PQ) alike — `sub` may
    * carry extra columns (e.g. the cell id), they ride through untouched.
    * Round 0 may use the packed-long argmin when `quantized` (integer
    * seeds); later rounds score fractional means via the struct min. */
  private def refineCodebook(sub: DataFrame, cb0: DataFrame, k: Int,
                             updates: Int, quantized: Boolean): DataFrame = {
    var cb = cb0
    for (round <- 0 until updates) {
      val scored = sub
        .join(broadcast(cb.withColumn("__cc", dot(col("__c"), col("__c")))),
          Seq("__s"))
        .withColumn("__d2",
          adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")))
      val best = codeArgmin(scored, Seq(col("__id"), col("__s")), k,
          quantized = quantized && round == 0)
        .withColumnRenamed("__code", "__cid")
      cb = lloydMeanUpdate(
        best.join(sub, Seq("__id", "__s"))
          .select(col("__s"), col("__cid"), col("__sv")),
        Seq("__s", "__cid"), "__sv")
    }
    cb
  }

  /** Per-group argmin over (__d2, __cid) → __code. On the quantized path
    * distances are exact non-negative integers, so packing (d2, cid) into
    * one long keeps the argmin a primitive min() that HashAggregate
    * evaluates with map-side combine; min over a struct would fall back
    * to SortAggregate — a per-partition sort of all scored rows.
    * Tie-break by cid rides in the low bits either way.
    *
    * The packed encoding is only lexicographic for finite d2 and
    * cid ∈ [0, k): a NaN d2 would cast to 0 and WIN every assignment
    * (struct-min sorts NaN last), an Inf would overflow the pack, and a
    * cid outside [0, k) ALIASES across distance levels (d·k − 1 decodes
    * as (d−1)·k + (k−1) — a wrong centroid at a wrong distance). The
    * packed path fails fast on all of them instead of silently
    * corrupting assignments: PQ codebook builders bound cid by
    * construction, but coarse IVF/k-means seed sets are `id < n` corpus
    * rows, where a NEGATIVE row id would otherwise slip through. */
  private def codeArgmin(scored: DataFrame, groupCols: Seq[Column], k: Int,
                         quantized: Boolean): DataFrame =
    if (quantized) {
      val bound = 9.0e15 / k // packing multiplies by k; stay below 2^53
      val d2 = when(isnan(col("__d2")) || col("__d2") < 0.0 ||
          col("__d2") > lit(bound),
        raise_error(concat(lit("PQ: non-finite or out-of-range distance "),
          col("__d2").cast("string"))))
        .otherwise(col("__d2"))
      val cid = when(col("__cid") < 0L || col("__cid") >= lit(k.toLong),
        raise_error(concat(lit(s"PQ: centroid id outside [0, $k): "),
          col("__cid").cast("string"))))
        .otherwise(col("__cid"))
      scored.groupBy(groupCols: _*)
        .agg(min(d2.cast("long") * lit(k.toLong) + cid)
          .as("__packed"))
        .withColumn("__code", pmod(col("__packed"), lit(k.toLong)))
        .drop("__packed")
    } else
      scored.groupBy(groupCols: _*)
        .agg(min(struct(col("__d2"), col("__cid"))).getField("__cid")
          .as("__code"))

  /** Per-query ADC lookup tables (query_id, __s, __cid, __ld): the
    * distance from each query subvector to every codebook centroid —
    * queries·m·k rows, built once and broadcast by the search paths. */
  private def pqDistanceTables(queries: DataFrame, corpus: DataFrame,
                               idCol: String, vecCol: String, dims: Int,
                               m: Int, k: Int,
                               quantizeScale: Option[Double]): DataFrame = {
    val cb = pqCodebook(corpus, idCol, vecCol, dims, m, k, quantizeScale)
    subvectorFrame(queries, idCol, vecCol, dims, m, quantizeScale)
      .withColumnRenamed("__id", "query_id")
      .join(cb, Seq("__s"))
      .select(col("query_id"), col("__s"), col("__cid"),
        adcD2(col("__sv"), col("__svv"), col("__c"), col("__cc")).as("__ld"))
  }

  /** PQ asymmetric-distance (ADC) top-k: queries stay full-precision,
    * corpus vectors are represented ONLY by their PQ codes; distance is
    * the sum over subspaces of ||q_s − centroid(code_s)||² looked up from
    * a per-query distance table. The standard IVF-PQ search kernel: the
    * distance tables (queries × m × k rows) broadcast, corpus codes join
    * them without touching corpus vectors, and the per-pair sum is a hash
    * aggregate. Exact integers on the quantized grid end to end. */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, dims: Int, m: Int, k: Int, topK: Int,
                quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val codes = pqCodesExploded(corpus, idCol, vecCol, dims, m, k, quantizeScale)
      .withColumnRenamed("__id", "neighbor_id")
    val tables = pqDistanceTables(queries, corpus, idCol, vecCol, dims, m, k,
      quantizeScale)
    val scored = codes
      .join(broadcast(tables),
        codes("__s") === tables("__s") && codes("__code") === tables("__cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__ld")).as("adc_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("adc_d2"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    * several per-query rankings — dense ANN, BM25, a quality prior —
    * into one, scoring each candidate Σᵢ 1/(k0 + rankᵢ) over the systems
    * that retrieved it. Rank-based fusion needs no score calibration
    * between systems, which is why it is the default hybrid-retrieval
    * combiner. Inputs are (query_id, rk, neighbor_id) frames (the shape
    * every search operator here emits); ties break by neighbor id.
    *
    * Determinism note: contributions are summed by a FIXED left-to-right
    * fold over the ranking list (a full-outer join chain, absent
    * contributions coalesced to 0), not a float aggregation whose
    * addend order would depend on shuffle arrival — the same expression
    * evaluates bit-identically in any engine.
    *
    * Scale shape: every frame is |queries|·k rows, corpus-independent;
    * the join chain and the final per-query window are negligible next
    * to the searches that produced the inputs. */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 1 && topK >= 1, "k0 and topK must be >= 1")
    val scored = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("neighbor_id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rk").cast("double")))
          .as(s"__c$i"))
    }
    val joined = scored.reduce(
      (a, b) => a.join(b, Seq("query_id", "neighbor_id"), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0))).reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    joined.withColumn("rrf", score)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("rrf"))
  }

  /** ANN quality evaluation: per-query recall@k of an approximate
    * search result against the exact one — the metric that drives every
    * index-tuning decision (nProbe, nPlanes, codebook size). Both inputs
    * are (query_id, rk, neighbor_id) frames (what every search operator
    * here returns); output is (query_id, possible, hits) with
    * hits ≤ possible ≤ k, kept as exact integers so the caller computes
    * recall = hits/possible without the engine emitting a float.
    *
    * Scale shape: both sides are |queries|·k rows — corpus-independent —
    * so the join and aggregation cost nothing next to the searches that
    * produced them. */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = exact.where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val a = approx.where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("possible"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
  }

  /** Two-stage ANN: ADC shortlist then exact re-rank — the standard
    * recall-restoring refinement (coarse PQ distances pick `candK`
    * candidates, exact distances on the raw/quantized vectors pick the
    * final `topK`). This is what production vector search does: the
    * compressed index bounds the scan, the exact pass removes PQ
    * quantization error from the final ordering.
    *
    * Scale shape: stage 1 is [[pqAdcTopK]] (codes-only corpus, broadcast
    * distance tables). Stage 2 touches raw vectors for CANDIDATES ONLY —
    * |queries|·candK rows broadcast against the corpus scan (one pass, no
    * corpus shuffle), then a broadcast join brings in query vectors and
    * the final rank window is candK rows per query. The corpus-wide
    * vector column never crosses a shuffle in either stage. */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, dims: Int, m: Int, k: Int,
                   candK: Int, topK: Int,
                   quantizeScale: Option[Double] = Some(1000.0)): DataFrame = {
    require(candK >= topK && topK >= 1,
      "need candK >= topK >= 1 (shortlist at least as wide as the result)")
    val cands = pqAdcTopK(queries, corpus, idCol, vecCol, dims, m, k,
        candK, quantizeScale)
      .select(col("query_id"), col("neighbor_id"))
    val corpusV = prepVectors(corpus, idCol, vecCol, quantizeScale)
      .select(col("__id").as("neighbor_id"),
        col("__v").as("__cv"), col("__vv").as("__cvv"))
    val queryV = prepVectors(queries, idCol, vecCol, quantizeScale)
      .select(col("__id").as("query_id"),
        col("__v").as("__qv"), col("__vv").as("__qvv"))
    val exact = corpusV.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(queryV), Seq("query_id"))
      .withColumn("exact_d2",
        col("__qvv") + col("__cvv") - lit(2.0) * dot(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("exact_d2").asc, col("neighbor_id").asc)
    exact.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("exact_d2"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * k-means-cluster the embeddings, then inside each cluster drop every
    * vector that has a LOWER-id vector at cosine ≥ `threshold`. Returns
    * (id, centroid_id, kept) — kept = false marks the semantic
    * duplicates to discard.
    *
    * The clustering is what makes this tractable at corpus scale: the
    * quadratic pair comparison is confined to one cluster, never the
    * corpus, so k is the knob that bounds per-cluster work (the paper
    * uses k large enough that clusters hold ~thousands). Defense against
    * a degenerate mega-cluster mirrors [[embeddingNearDupPairs]]: over
    * `maxClusterSize`, the cluster degrades to an id-ordered
    * neighbor-chain comparison (O(n) pairs) instead of all-pairs —
    * capped ≡ uncapped whenever clusters fit, proven the same way the
    * LSH cap is (q58).
    *
    * Cosines are computed on the RAW double vectors (quantization is for
    * the cluster assignment only) with the engine's one staged-norm
    * cosine expression, so thresholds compare bit-identically across
    * engines. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, threshold: Double,
               quantizeScale: Option[Double] = Some(1000.0),
               maxClusterSize: Int = 1024): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val assign = kmeansAssign(df, idCol, vecCol, k, iters, quantizeScale)
      .withColumnRenamed(idCol, "__id")
    val v = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("__n", norm(col("__v")))
      .join(assign, "__id")
    val w = Window.partitionBy("centroid_id")
    // chain order (vector, id), not id alone: identical embeddings form
    // contiguous runs, so an over-cap cluster still drops every exact
    // duplicate even when several dup families share the cluster
    val wo = w.orderBy(col("__v"), col("__id"))
    val sized = v
      .withColumn("__cn", count(lit(1)).over(w))
      .withColumn("__pid", lag(col("__id"), 1).over(wo))
      .withColumn("__pv", lag(col("__v"), 1).over(wo))
      .withColumn("__pn", lag(col("__n"), 1).over(wo))
    val small = sized.where(col("__cn") <= maxClusterSize)
    val l = small.select(col("centroid_id"), col("__id").as("a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val r = small.select(col("centroid_id"), col("__id").as("b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val dupSmall = l.join(r, Seq("centroid_id"))
      .where(col("a") < col("b"))
      .where(cosineStaged(col("__va"), col("__vb"), col("__na"), col("__nb"))
        >= threshold)
      .select(col("b").as("__id"))
    // over-cap clusters: each row compares against its id-order
    // predecessor only — bounded work, same drop rule on the pairs kept
    val dupChained = sized
      .where(col("__cn") > maxClusterSize && col("__pid").isNotNull)
      .where(cosineStaged(col("__pv"), col("__v"), col("__pn"), col("__n"))
        >= threshold)
      .select(col("__id"))
    val dropped = dupSmall.union(dupChained).distinct()
      .withColumn("__dup", lit(true))
    v.join(dropped, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("centroid_id"),
        col("__dup").isNull.as("kept"))
  }

  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, nPlanes: Int = 8,
                            seed: Long = 42L,
                            maxBucketSize: Int = 1024): DataFrame = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(nPlanes, dim, seed)
    val v = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("bucket", lshBucket(col("__v"), planes))
      .withColumn("__n", norm(col("__v")))
    val w = Window.partitionBy("bucket")
    // chain order (vector, id) — identical embeddings stay adjacent, so
    // the over-cap branch still pairs exact dup runs (same rationale as
    // Dedup.simHashPairs' fingerprint-ordered chain)
    val wo = w.orderBy(col("__v"), col("__id"))
    val sized = v
      .withColumn("__bn", count(lit(1)).over(w))
      .withColumn("__nid", lead(col("__id"), 1).over(wo))
      .withColumn("__nv", lead(col("__v"), 1).over(wo))
      .withColumn("__nn", lead(col("__n"), 1).over(wo))
    val small = sized.where(col("__bn") <= maxBucketSize)
    val l = small.select(col("bucket"), col("__id").as("a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val r = small.select(col("bucket"), col("__id").as("b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    val allPairs = l.join(r, Seq("bucket"))
      .where(col("a") < col("b"))
      .withColumn("cos",
        cosineStaged(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .where(col("cos") >= threshold)
      .select("a", "b", "cos")
    // each doc lives in exactly one bucket, so the two branches are
    // disjoint — plain union, no dedup needed
    val chained = sized
      .where(col("__bn") > maxBucketSize && col("__nid").isNotNull)
      .withColumn("cos",
        cosineStaged(col("__v"), col("__nv"), col("__n"), col("__nn")))
      .where(col("cos") >= threshold)
      .select(least(col("__id"), col("__nid")).as("a"),
        greatest(col("__id"), col("__nid")).as("b"), col("cos"))
    allPairs.union(chained)
  }

  /** Deterministic ±1 sign for the random-projection matrix: parity of
    * the first 48 bits of `md5("rp:<i>:<j>")` — the engine-portable hash
    * convention [[graft.operators.Sampling.hashBucket]] established (an
    * oracle recomputes it as `('0x' || substr(md5(...), 1, 12))::BIGINT`).
    */
  def rpSign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$i:$j".getBytes("UTF-8"))
    val hex = d.take(6).map(b => f"${b & 0xff}%02x").mkString // 12 hex chars
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1 else -1
  }

  /** Johnson-Lindenstrauss random projection `inDim → outDim` with a
    * deterministic ±1 (Achlioptas) sign matrix — the cheap dimensionality
    * reduction a pipeline applies before LSH bucketing or brute scoring
    * when the embedding dim is large. Vectors are grid-quantized first
    * ([[quantize]]), so each output coordinate is an exact integer sum —
    * bit-reproducible on any engine, partitioning, or add order.
    *
    * Scale shape: the sign matrix is an `outDim × inDim` LITERAL baked
    * into the plan (no join, no broadcast round-trip) and the projection
    * is row-local `zip_with`/`aggregate` arithmetic — zero shuffle, so it
    * streams at scan speed over 100 TB and composes under whatever
    * partitioning the downstream op (LSH, k-means) wants. Output: one row
    * per (id, output coordinate j) with the exact integer value. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       inDim: Int, outDim: Int): DataFrame = {
    require(inDim >= 1 && outDim >= 1, "dims must be >= 1")
    val signs: Seq[Seq[Double]] =
      Seq.tabulate(outDim, inDim)((j, i) => rpSign(i, j).toDouble)
    val signsLit = typedLit(signs)
    // a vector of the wrong length must fail LOUDLY: zip_with would pad
    // the shorter side with nulls and the aggregate would emit null
    // rows, silently poisoning downstream LSH/k-means
    val checked = when(size(col(vecCol)) === inDim, col(vecCol))
      .otherwise(raise_error(concat(
        lit("randomProjection: vector length "),
        size(col(vecCol)).cast("string"),
        lit(s" != inDim $inDim for id "), col(idCol).cast("string"))))
    val q = quantize(checked)
    df.select(col(idCol), posexplode(
      transform(signsLit, row =>
        aggregate(zip_with(q, row, (a, b) => a * b), lit(0d), _ + _)
          .cast("long"))).as(Seq("j", "val")))
  }

  // ----------------------------------------- dominant direction (PCA-1)

  /** Dominant principal direction of the corpus's quantized second-moment
    * matrix Σ v·vᵀ, by power iteration — the top-1 PCA component used for
    * embedding whitening / drift monitoring, with every step in EXACT
    * integer arithmetic so the result is bit-reproducible and
    * SQL-replayable.
    *
    * Scale shape: the ONLY corpus-sized work is the second-moment
    * accumulation — one explode to (vec, i, q) and one shuffle hash
    * aggregation over dim² keys (map-side combined); at 100 TB that is a
    * single pass. The dim×dim matrix (bounded, data-independent size) is
    * then collected and the O(iters·dim²) iteration runs on the driver —
    * the same bounded-collect contract as `kmeansFitCollected`.
    *
    * Arithmetic, replayed verbatim by the oracle: q = floor(x·scale);
    * M(i,j) = Σ q_i·q_j; x⁰ = xScale everywhere; per round
    * y = M·x, then x' = y / (max|y| / xScale + 1) in TRUNCATING integer
    * division — the +1 keeps the denominator positive and |x'| ≤ xScale,
    * and truncation (toward zero) is what both JVM `/` and DuckDB `//`
    * do on negatives (checked: -7 // 2 = -3). */
  def dominantDirection(df: DataFrame, vecCol: String, idCol: String,
                        scale: Double = 1000.0, iters: Int = 3,
                        xScale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("__id"),
      posexplode(transform(asDouble(col(vecCol)),
        x => floor(x * lit(scale)).cast("long"))).as(Seq("i", "q")))
    val entries = q.as("a").join(q.as("b"), col("a.__id") === col("b.__id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.q") * col("b.q")).as("m"))
      .collect() // bounded: dim² rows, data-independent
    require(entries.nonEmpty, "empty input: no vectors to analyze")
    val dim = entries.map(_.getInt(0)).max + 1
    val m = Array.ofDim[Long](dim, dim)
    entries.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    var x = Array.fill(dim)(xScale)
    var it = 0
    while (it < iters) {
      val y = Array.tabulate(dim) { i =>
        var acc = 0L
        var j = 0
        while (j < dim) { acc += m(i)(j) * x(j); j += 1 }
        acc
      }
      val mx = y.map(math.abs).max
      val denom = mx / xScale + 1L // mx >= 0
      x = y.map(_ / denom) // truncating division ≡ SQL //
      it += 1
    }
    import spark.implicits._
    x.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("i", "x")
  }

  /** Per-vector projection onto [[dominantDirection]]: score(v) = Σ
    * q_i·x_i in exact integers — the PCA-1 coordinate used for
    * embedding drift monitoring and axis-extremal outlier surfacing.
    * The direction (dim rows, bounded) broadcasts; scoring is one
    * map-side join + hash agg over the exploded coordinates. */
  def principalScores(df: DataFrame, vecCol: String, idCol: String,
                      scale: Double = 1000.0, iters: Int = 3,
                      xScale: Long = 1000000L): DataFrame = {
    val x = dominantDirection(df, vecCol, idCol, scale, iters, xScale)
    val q = df.select(col(idCol),
      posexplode(transform(asDouble(col(vecCol)),
        v => floor(v * lit(scale)).cast("long"))).as(Seq("i", "q")))
    q.join(broadcast(x), "i")
      .groupBy(col(idCol))
      .agg(sum(col("q") * col("x")).as("score"))
  }

  /** SCALAR (int8-style) quantization — the SQ companion to IVF-PQ: each
    * dimension d gets a global [min_d, max_d] range from one corpus agg,
    * and every value quantizes independently to
    * floor((v − min_d) · (levels−1) / (max_d − min_d)) ∈ [0, levels−1]
    * (constant dimensions code to 0). floor of identical IEEE-double
    * expressions is bit-stable across engines, so the codes — and any
    * INTEGER arithmetic over them — replay exactly in the oracle, unlike
    * a round() whose half-way ties differ by convention.
    *
    * Returns (id, __codes array<long>). The per-dim stats collect is
    * bounded by the embedding dimensionality (dims rows — 16..4096 in
    * practice), then rides into the row-local transform as two literal
    * arrays; the corpus is touched twice (stats agg + encode), both
    * full-scan passes with no join. */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String,
                     levels: Int = 256): DataFrame = {
    require(levels >= 2, "levels must be >= 2")
    val dimStats = df
      .select(posexplode(asDouble(col(vecCol))).as(Seq("__d", "__x")))
      .groupBy(col("__d")).agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mnA = array(dimStats.map(t => lit(t._2)): _*)
    val mxA = array(dimStats.map(t => lit(t._3)): _*)
    df.select(col(idCol),
      transform(asDouble(col(vecCol)), (v, i) => {
        val mn = element_at(mnA, i + 1)
        val mx = element_at(mxA, i + 1)
        when(mx === mn, lit(0L))
          .otherwise(floor((v - mn) * lit((levels - 1).toDouble) / (mx - mn)))
      }).as("__codes"))
  }

  /** Exact top-k in SQ code space: asymmetric distance is the pure
    * INTEGER Σ_d (code_q − code_c)² over [[scalarQuantize]] codes — the
    * cheap first-pass ranking SQ indexes serve (rerank against raw
    * vectors when precision matters; [[cosineTopK]] is that path).
    * Same scale shape as [[cosineTopK]]: query codes broadcast, one
    * corpus pass, per-query top-k window; ties break on neighbor id.
    * Every output value is integral — hash-oracle exact. */
  def sqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, levels: Int = 256): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val codes = scalarQuantize(corpus, idCol, vecCol, levels)
    val q = queries.select(col(idCol).as("query_id"))
      .join(codes.select(col(idCol).as("query_id"), col("__codes").as("__qc")),
        Seq("query_id"))
    val c = codes.select(col(idCol).as("neighbor_id"), col("__codes").as("__cc"))
    val scored = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dist_sq", aggregate(
        zip_with(col("__qc"), col("__cc"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dist_sq").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "dist_sq")
  }

  /** BINARY (1-bit) quantization: bit_d = v_d > midrange_d, packed into
    * ceil(dims/64) longs in-row — 64x smaller than raw floats, the
    * coarsest rung of the quantization ladder (binary → SQ8 → PQ → raw
    * rerank). The threshold is the per-dim MIDRANGE (min+max)/2: min and
    * max are exact under any aggregation order (unlike a float mean,
    * whose shuffle-order-dependent sum would break bit-reproducibility),
    * so codes replay exactly in the oracle. Stats collect bounded by
    * dims, as in [[scalarQuantize]]. Returns (id, __bits array<long>). */
  def binaryQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dimStats = df
      .select(posexplode(asDouble(col(vecCol))).as(Seq("__d", "__x")))
      .groupBy(col("__d")).agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .collect().map(r => (r.getInt(0), (r.getDouble(1) + r.getDouble(2)) / 2.0))
      .sortBy(_._1)
    val dims = dimStats.length
    val nWords = (dims + 63) / 64
    val thA = array(dimStats.map(t => lit(t._2)): _*)
    // word w = Σ_{d in [64w, 64w+64)} (v_d > th_d) << (d − 64w)
    val words = (0 until nWords).map { w =>
      val lo = w * 64
      val hi = math.min(dims, lo + 64)
      aggregate(
        transform(sequence(lit(lo), lit(hi - 1)), d =>
          when(element_at(asDouble(col(vecCol)), d + 1) >
               element_at(thA, d + 1),
            call_function("shiftleft", lit(1L),
              (d - lit(lo)).cast("int"))).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
    }
    df.select(col(idCol), array(words: _*).as("__bits"))
  }

  /** Exact top-k under Hamming distance over [[binaryQuantize]] codes:
    * Σ_w bit_count(q_w XOR c_w) — pure integers, the SIMD-cheap first
    * pass binary-embedding retrieval serves before rerank. Queries must
    * be corpus members (codes computed once); ties break on neighbor
    * id. Same broadcast + one-corpus-pass + per-query window shape as
    * [[cosineTopK]]. */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                  vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val codes = binaryQuantize(corpus, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"))
      .join(codes.select(col(idCol).as("query_id"), col("__bits").as("__qb")),
        Seq("query_id"))
    val c = codes.select(col(idCol).as("neighbor_id"), col("__bits").as("__cb"))
    val scored = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", aggregate(
        zip_with(col("__qb"), col("__cb"),
          (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
        lit(0L), (acc, x) => acc + x))
    val w = Window.partitionBy("query_id")
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "hamming")
  }
}
