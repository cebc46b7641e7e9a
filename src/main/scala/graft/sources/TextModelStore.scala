package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.TextAnalysis.{DsirWeights, NaiveBayesModel}

/** Persisted lifecycle for trained text-scoring models — the fourth
  * persisted artifact next to [[AnnIndex]]/[[DedupIndex]]/[[TextIndex]]:
  * a quality classifier or DSIR weight table is trained ONCE (on labeled
  * seed data or a target/raw distribution pair) and then scores every
  * future corpus batch, so it must round-trip disk exactly and load
  * without the training data.
  *
  * Layout: `weights/` (one small parquet table — vocab- or
  * bucket-bounded) plus a JSON manifest carrying the scalar terms. The
  * manifest is the commit point (same protocol as the indexes: old
  * manifest deleted first so a crashed save fails to load LOUDLY, new
  * manifest written last via atomic temp+rename). Weights are integer
  * `wq_q4` columns, so a reloaded model scores BIT-IDENTICALLY to the
  * in-memory one on any engine.
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

  /** Persist a trained Naive Bayes quality model. */
  def saveNaiveBayes(model: NaiveBayesModel, dir: String): Unit = {
    BucketFs.deleteRecursive(s"$dir/$ManifestFile")
    BucketFs.deleteRecursive(s"$dir/weights")
    model.tokenWeights.select(col("token"), col("wq_q4"))
      .write.mode("overwrite").parquet(s"$dir/weights")
    commit(dir, List(
      "model_type" -> JString("naive_bayes"),
      "prior_q4" -> JInt(model.priorQ4),
      "unknown_q4" -> JInt(model.unknownQ4)))
  }

  /** Load a Naive Bayes model; scores bit-identically to the saved one. */
  def loadNaiveBayes(spark: SparkSession, dir: String): NaiveBayesModel = {
    val mf = manifest(dir, "naive_bayes")
    NaiveBayesModel(spark.read.parquet(s"$dir/weights"),
      long(mf, "prior_q4"), long(mf, "unknown_q4"))
  }

  /** Persist DSIR importance weights with their bucket-space size. */
  def saveDsir(model: DsirWeights, dir: String): Unit = {
    BucketFs.deleteRecursive(s"$dir/$ManifestFile")
    BucketFs.deleteRecursive(s"$dir/weights")
    model.weights.select(col("bucket"), col("wq_q4"))
      .write.mode("overwrite").parquet(s"$dir/weights")
    commit(dir, List(
      "model_type" -> JString("dsir"),
      "buckets" -> JInt(model.buckets)))
  }

  /** Load DSIR weights; the bucket modulus rides in the manifest so
    * scoring can never hash with a different bucket space. */
  def loadDsir(spark: SparkSession, dir: String): DsirWeights = {
    val mf = manifest(dir, "dsir")
    DsirWeights(spark.read.parquet(s"$dir/weights"),
      long(mf, "buckets").toInt)
  }
}
