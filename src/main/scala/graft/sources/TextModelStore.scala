package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.{DsirWeights, NaiveBayesCounts, NaiveBayesModel}

/** Persisted lifecycle for trained text-scoring models — the fourth
  * persisted artifact next to [[AnnIndex]]/[[DedupIndex]]/[[TextIndex]]:
  * a quality classifier or DSIR weight table is trained ONCE (on labeled
  * seed data or a target/raw distribution pair) and then scores every
  * future corpus batch, so it must round-trip disk exactly and load
  * without the training data.
  *
  * The classifier persists in its ADDITIVE form — per-token class
  * COUNTS plus document priors, not likelihood ratios — because counts
  * are what new labeled batches can merge into ([[appendNaiveBayes]]);
  * the scoring weights are a pure derived function of the counts
  * (quantized integer arithmetic), so counts → model → score is
  * bit-reproducible whether the counts came from fresh training, a disk
  * round trip, or k incremental appends. Appends follow the shared
  * generation-commit protocol: merged counts land in `counts/gen=N+1`,
  * then one atomic manifest rename moves the live generation — a
  * crashed append leaves the old model loadable and its debris is
  * swept on retry. DSIR weights persist in weight form (one frozen
  * estimation pass; re-estimation is retraining, not appending).
  *
  * The manifest is the commit point (same protocol as the indexes: old
  * manifest deleted first on save so a crashed SAVE fails to load
  * LOUDLY, new manifest written last via atomic temp+rename).
  */
object TextModelStore {

  val ManifestFile = "model_manifest.json"

  private def commit(dir: String, fields: List[(String, JValue)]): Unit =
    BucketFs.writeStringAtomic(s"$dir/$ManifestFile",
      JsonMethods.pretty(JsonMethods.render(JObject(fields))))

  private def manifest(dir: String, wantType: String): JValue = {
    val p = s"$dir/$ManifestFile"
    if (!BucketFs.exists(p))
      throw new IllegalArgumentException(
        s"no $ManifestFile in $dir — not a saved model (or a crashed save)")
    val mf = JsonMethods.parse(BucketFs.readString(p))
    mf \ "model_type" match {
      case JString(t) if t == wantType => mf
      case other => throw new IllegalArgumentException(
        s"expected model_type '$wantType' in $dir, found $other")
    }
  }

  private def long(mf: JValue, field: String): Long = mf \ field match {
    case JInt(x) => x.toLong
    case other => throw new IllegalArgumentException(
      s"manifest field '$field' missing or non-integer: $other")
  }

  private def commitNb(dir: String, c: NaiveBayesCounts, gen: Long): Unit =
    commit(dir, List(
      "model_type" -> JString("naive_bayes"),
      "nd_pos" -> JInt(c.ndPos), "nd" -> JInt(c.nd),
      "gen" -> JInt(gen)))

  /** Train-and-persist: aggregate the labeled batch into counts,
    * validate it derives a scorable model, write generation 0, commit. */
  def saveNaiveBayes(labeled: org.apache.spark.sql.DataFrame,
                     textCol: String, labelCol: String, dir: String,
                     claimStaleness: Long =
                       GenerationLock.DefaultStalenessMs): Unit = {
    val c = TextAnalysis.naiveBayesCounts(labeled, textCol, labelCol)
    TextAnalysis.naiveBayesFromCounts(c) // class-balance guard pre-commit
    // provisioning is a mutation too (round 17): two racing saves would
    // interleave their overwrite-mode count rewrites and the surviving
    // manifest could serve a mix of both runs' files — same whole-dir
    // claim discipline as the index saves
    val claim = GenerationLock.claimDir(dir, claimStaleness)
    try {
      BucketFs.deleteRecursive(s"$dir/$ManifestFile")
      BucketFs.deleteRecursive(s"$dir/counts")
      c.tokenCounts.write.mode("overwrite").parquet(s"$dir/counts/gen=0")
      GenerationLock.verify(claim) // re-assert right before the commit
      commitNb(dir, c, gen = 0)
    } finally GenerationLock.release(claim)
  }

  /** Merge a NEW labeled batch into the persisted counts (counts are
    * additive; the batch must be disjoint from earlier training data —
    * re-appending the same documents double-counts, exactly as it would
    * in any count-based model). Generation-committed: merged counts land
    * in `gen=N+1`, the atomic manifest rename is the commit, and debris
    * of a crashed earlier append is swept before writing. */
  def appendNaiveBayes(spark: SparkSession,
                       newLabeled: org.apache.spark.sql.DataFrame,
                       textCol: String, labelCol: String, dir: String,
                       claimStaleness: Long =
                         GenerationLock.DefaultStalenessMs): Unit = {
    val gen = long(manifest(dir, "naive_bayes"), "gen")
    // writer-claim serialization on the STAGED generation (shared
    // [[GenerationLock]] protocol, same as the indexes): two sessions
    // racing the same head would both read gen, co-write gen+1, and the
    // loser's manifest rename would commit merged counts containing BOTH
    // batches exactly once each against ONE prior — double counting.
    // Claim first, then re-read the head under the claim.
    val claim = GenerationLock.claim(dir, (gen + 1).toInt, claimStaleness)
    try {
      val mf = manifest(dir, "naive_bayes")
      require(long(mf, "gen") == gen,
        s"stale model head: $dir moved to generation ${long(mf, "gen")} " +
          s"while this append targeted $gen — retry against the new head")
      BucketFs.dropGensAtOrAbove(s"$dir/counts", (gen + 1).toInt)
      val prior = NaiveBayesCounts(
        spark.read.parquet(s"$dir/counts/gen=$gen"),
        long(mf, "nd_pos"), long(mf, "nd"))
      val merged = TextAnalysis.naiveBayesMerge(prior,
        TextAnalysis.naiveBayesCounts(newLabeled, textCol, labelCol))
      TextAnalysis.naiveBayesFromCounts(merged) // guard before committing
      merged.tokenCounts.write.mode("overwrite")
        .parquet(s"$dir/counts/gen=${gen + 1}")
      // ownership re-assert right before the commit point
      GenerationLock.verify(claim)
      commitNb(dir, merged, gen + 1)
    } finally GenerationLock.release(claim)
  }

  /** Load the committed counts (the additive form). */
  def loadNaiveBayesCounts(spark: SparkSession, dir: String): NaiveBayesCounts = {
    val mf = manifest(dir, "naive_bayes")
    NaiveBayesCounts(
      spark.read.parquet(s"$dir/counts/gen=${long(mf, "gen")}"),
      long(mf, "nd_pos"), long(mf, "nd"))
  }

  /** Load the scoring-form model; scores bit-identically to a model
    * trained in memory on the same (merged) labeled data. */
  def loadNaiveBayes(spark: SparkSession, dir: String): NaiveBayesModel =
    TextAnalysis.naiveBayesFromCounts(loadNaiveBayesCounts(spark, dir))

  /** Persist a char-n-gram LM in its ADDITIVE counts form (per-gram
    * occurrence counts at order n and n−1) — same lifecycle discipline
    * as the Naive Bayes artifact: counts merge by plain addition, so
    * [[appendCharLm]] folds a new corpus batch in under the
    * generation-commit protocol and `counts → score` stays
    * bit-reproducible after any number of appends. */
  def saveCharLm(corpus: org.apache.spark.sql.DataFrame, textCol: String,
                 dir: String, n: Int = 3,
                 claimStaleness: Long =
                   GenerationLock.DefaultStalenessMs): Unit = {
    val c = TextAnalysis.charLmTrain(corpus, textCol, n)
    val claim = GenerationLock.claimDir(dir, claimStaleness)
    try {
      BucketFs.deleteRecursive(s"$dir/$ManifestFile")
      Seq("ngrams", "contexts").foreach(sub =>
        BucketFs.deleteRecursive(s"$dir/$sub"))
      c.ngrams.write.mode("overwrite").parquet(s"$dir/ngrams/gen=0")
      c.contexts.write.mode("overwrite").parquet(s"$dir/contexts/gen=0")
      GenerationLock.verify(claim) // re-assert right before the commit
      commit(dir, List(
        "model_type" -> JString("char_lm"), "n" -> JInt(n), "gen" -> JInt(0)))
    } finally GenerationLock.release(claim)
  }

  /** Merge a NEW corpus batch into the persisted gram counts (additive;
    * the batch must be disjoint from earlier training text — re-appending
    * double-counts, as in any count-based model). Generation-committed:
    * merged counts land in `gen=N+1`, the atomic manifest rename is the
    * commit, crashed-append debris is swept before writing. */
  def appendCharLm(spark: SparkSession,
                   corpus: org.apache.spark.sql.DataFrame, textCol: String,
                   dir: String,
                   claimStaleness: Long =
                     GenerationLock.DefaultStalenessMs): Unit = {
    val gen = long(manifest(dir, "char_lm"), "gen")
    // same writer-claim serialization as [[appendNaiveBayes]]: claim the
    // staged generation first, re-read the head under the claim
    val claim = GenerationLock.claim(dir, (gen + 1).toInt, claimStaleness)
    try {
      val mf = manifest(dir, "char_lm")
      require(long(mf, "gen") == gen,
        s"stale model head: $dir moved to generation ${long(mf, "gen")} " +
          s"while this append targeted $gen — retry against the new head")
      val n = long(mf, "n").toInt
      Seq("ngrams", "contexts").foreach(sub =>
        BucketFs.dropGensAtOrAbove(s"$dir/$sub", (gen + 1).toInt))
      val batch = TextAnalysis.charLmTrain(corpus, textCol, n)
      def merge(sub: String, add: org.apache.spark.sql.DataFrame): Unit =
        spark.read.parquet(s"$dir/$sub/gen=$gen")
          .unionByName(add)
          .groupBy(col("gram")).agg(sum(col("cnt")).as("cnt"))
          .write.mode("overwrite").parquet(s"$dir/$sub/gen=${gen + 1}")
      merge("ngrams", batch.ngrams)
      merge("contexts", batch.contexts)
      // ownership re-assert right before the commit point
      GenerationLock.verify(claim)
      commit(dir, List(
        "model_type" -> JString("char_lm"), "n" -> JInt(n),
        "gen" -> JInt(gen + 1)))
    } finally GenerationLock.release(claim)
  }

  /** Load the committed gram counts; scoring through
    * [[TextAnalysis.charLmScore]] is bit-identical to a model trained in
    * memory on the same (merged) corpus. */
  def loadCharLm(spark: SparkSession, dir: String): TextAnalysis.CharLmCounts = {
    val mf = manifest(dir, "char_lm")
    val gen = long(mf, "gen")
    TextAnalysis.CharLmCounts(
      spark.read.parquet(s"$dir/ngrams/gen=$gen"),
      spark.read.parquet(s"$dir/contexts/gen=$gen"),
      long(mf, "n").toInt)
  }

  /** Persist DSIR importance weights with their bucket-space size. */
  def saveDsir(model: DsirWeights, dir: String,
               claimStaleness: Long =
                 GenerationLock.DefaultStalenessMs): Unit = {
    val claim = GenerationLock.claimDir(dir, claimStaleness)
    try {
      BucketFs.deleteRecursive(s"$dir/$ManifestFile")
      BucketFs.deleteRecursive(s"$dir/weights")
      model.weights.select(col("bucket"), col("wq_q4"))
        .write.mode("overwrite").parquet(s"$dir/weights")
      GenerationLock.verify(claim) // re-assert right before the commit
      commit(dir, List(
        "model_type" -> JString("dsir"),
        "buckets" -> JInt(model.buckets)))
    } finally GenerationLock.release(claim)
  }

  /** Load DSIR weights; the bucket modulus rides in the manifest so
    * scoring can never hash with a different bucket space. */
  def loadDsir(spark: SparkSession, dir: String): DsirWeights = {
    val mf = manifest(dir, "dsir")
    DsirWeights(spark.read.parquet(s"$dir/weights"),
      long(mf, "buckets").toInt)
  }
}
