package graft.sources

import scala.jdk.CollectionConverters._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.partitioning.Partitioning2D

/** Bucket manifest round-trip (reference bucket_info.yaml,
  * satbucket/io.py:35-73). We store JSON (`bucket_info.json`): the
  * partitioning class name + ctor kwargs plus the optional temporal
  * partitioning, and rebuild the partitioning via a small factory.
  */
object BucketInfo {
  // underscore prefix: Spark's file index treats it as metadata and skips
  // it during parquet discovery (like _SUCCESS / _metadata)
  val FileName = "_bucket_info.json"

  def write(bucketDir: String, partitioning: Partitioning2D,
            temporalPartitioning: Option[String] = None): Unit = {
    // crs: GIS consumers read the grid's reference system off the manifest
    // (reference attaches EPSG:4326 per product, partitioning.py:947-956);
    // fromDict ignores unknown keys, so old manifests stay readable
    val dict: Map[String, Any] = partitioning.toDict +
      ("crs" -> partitioning.crs) ++
      temporalPartitioning.map("temporal_partitioning" -> _).toMap
    // Hadoop FS: the manifest lands next to the data wherever it lives
    // (file://, hdfs://, s3a://); create() makes parent dirs itself
    BucketFs.writeString(s"$bucketDir/$FileName", toJson(dict))
    // ALSO write the reference's own manifest (bucket_info.yaml, nested
    // write_bucket_info format, satbucket/io.py:59-73) so the reference
    // stack can open graft-written buckets — interop both directions.
    BucketFs.writeString(s"$bucketDir/$ReferenceFileName",
      toReferenceYaml(partitioning, temporalPartitioning))
  }

  private def toReferenceYaml(p: Partitioning2D,
                              temporal: Option[String]): String = {
    def toJava(v: Any): Any = v match {
      case s: Seq[_] =>
        val l = new java.util.ArrayList[Any](); s.foreach(x => l.add(toJava(x))); l
      case m: Map[_, _] =>
        val j = new java.util.LinkedHashMap[String, Any]()
        m.foreach { case (k, vv) => j.put(k.toString, toJava(vv)) }; j
      case other => other
    }
    val root = new java.util.LinkedHashMap[String, Any]()
    // reference flavor semantics: "hive" = level= prefixes, None = bare dirs
    val refDict = p.toDict.updated("flavor",
      if (p.flavor.contains("directory")) null else "hive")
    root.put("spatial_partitioning", toJava(refDict))
    root.put("temporal_partitioning", temporal.orNull)
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(root)
  }

  /** Reference-written buckets carry `bucket_info.yaml` (satbucket
    * io.py:35-73); ours carry `_bucket_info.json`. Accept both. */
  val ReferenceFileName = "bucket_info.yaml"

  def read(bucketDir: String): Map[String, Any] = {
    val p = s"$bucketDir/$FileName"
    val ref = s"$bucketDir/$ReferenceFileName"
    if (BucketFs.exists(p)) fromJson(BucketFs.readString(p))
    else if (BucketFs.exists(ref)) fromYaml(BucketFs.readString(ref))
    else throw new IllegalArgumentException(
      s"no $FileName or $ReferenceFileName in $bucketDir — not a bucket?")
  }

  private def fromYaml(s: String): Map[String, Any] = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    def conv(v: Any): Any = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, vv) => k.toString -> conv(vv) }.toMap
      case l: java.util.List[_] => l.asScala.map(conv).toSeq
      case i: java.lang.Integer => i.toDouble
      case other => other
    }
    val flat = conv(yaml.load[java.util.Map[String, Any]](s))
      .asInstanceOf[Map[String, Any]]
    // the reference's write_bucket_info nests the partitioning under
    // `spatial_partitioning` (io.py:59-73); older/fixture manifests are
    // flat — accept both
    val unwrapped = flat.get("spatial_partitioning") match {
      case Some(nested: Map[_, _]) =>
        nested.asInstanceOf[Map[String, Any]] ++
          flat.get("temporal_partitioning").filter(_ != null)
            .map("temporal_partitioning" -> _).toMap
      case _ => flat
    }
    // reference flavor semantics: null/None = BARE label dirs. Internally
    // None means hive (our JSON manifests), so the yaml path must map the
    // reference's null to the explicit "directory" flavor.
    if (unwrapped.contains("flavor") && unwrapped("flavor") == null)
      unwrapped.updated("flavor", "directory")
    else unwrapped
  }

  def readPartitioning(bucketDir: String): Partitioning2D =
    Partitioning2D.fromDict(read(bucketDir))

  def readTemporalPartitioning(bucketDir: String): Option[String] =
    read(bucketDir).get("temporal_partitioning").map(_.toString)

  private def toJson(m: Map[String, Any]): String = {
    def conv(v: Any): JValue = v match {
      case null => JNull
      case s: String => JString(s)
      case i: Int => JInt(i)
      case l: Long => JInt(l)
      case d: Double => JDouble(d)
      case b: Boolean => JBool(b)
      case s: Seq[_] => JArray(s.map(conv).toList)
      case m: Map[_, _] =>
        JObject(m.map { case (k, vv) => k.toString -> conv(vv) }.toList)
      case other => JString(other.toString)
    }
    JsonMethods.pretty(JsonMethods.render(conv(m)))
  }

  private def fromJson(s: String): Map[String, Any] = {
    def conv(v: JValue): Any = v match {
      case JNull | JNothing => null
      case JString(x) => x
      case JInt(x) => x.toDouble
      case JLong(x) => x.toDouble
      case JDouble(x) => x
      case JDecimal(x) => x.toDouble
      case JBool(x) => x
      case JArray(xs) => xs.map(conv)
      case JObject(fields) => fields.map { case (k, vv) => k -> conv(vv) }.toMap
      case other => other.toString
    }
    conv(JsonMethods.parse(s)).asInstanceOf[Map[String, Any]]
  }
}
