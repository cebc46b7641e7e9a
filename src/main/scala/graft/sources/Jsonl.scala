package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-delimited JSON ingestion with corrupt-record quarantine — the
  * raw-corpus entry point of a training-data pipeline (web dumps and
  * crawl extracts arrive as JSONL long before anything is parquet).
  * Mirrors the reference's "read whatever the archive contains" ingestion
  * posture (satbucket/readers.py:101-159) for the text-corpus case.
  *
  * Design: schema is ALWAYS explicit — schema inference is a full extra
  * pass over 100 TB and infers from whichever files it sampled, so the
  * library refuses to guess. Lines are read as text and parsed with
  * `from_json` (a codegen'd expression, so parsing lives inside
  * whole-stage codegen and carries none of the JSON scan's internal
  * corrupt-column restrictions); malformed lines land whole in a
  * quarantine column instead of killing the job or being dropped
  * silently — [[valid]]/[[corrupt]] split the stream so bad records stay
  * countable and inspectable. PERMISSIVE partial parses (a prefix of the
  * object decodes before the syntax error) keep their decoded fields AND
  * the quarantine line, so [[valid]] keys strictly off the quarantine
  * column, never off field nullness.
  *
  * Scale shape: line-delimited JSON splits by newline, so a single huge
  * file still fans out across executors (`maxPartitionBytes` governs
  * split size exactly as for parquet); parsing is per-line, no shuffle.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Parse a frame of raw lines (column `value`; batch OR streaming —
    * this is pure column algebra) into data + quarantine columns.
    * `from_json` returns a NULL STRUCT (not a corrupt-record row) for
    * empty/whitespace input, so the quarantine column is rebuilt as
    * "parser's corrupt record, else the raw line whenever the struct is
    * null" — otherwise a blank line in a crawl dump would surface as a
    * 'valid' all-null document and valid+corrupt would no longer
    * partition the input. */
  def parseLines(lines: DataFrame, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val parsed = lines
      .select(col("value"),
        from_json(col("value"), schema.add(CorruptCol, StringType),
          Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> CorruptCol)).as("__parsed"))
    val dataCols = schema.fieldNames.toSeq
      .map(f => col("__parsed").getField(f).as(f))
    val quarantine = coalesce(col("__parsed").getField(CorruptCol),
      when(col("__parsed").isNull, col("value"))).as(CorruptCol)
    parsed.select(dataCols :+ quarantine: _*)
  }

  /** Read JSONL under `path` with an explicit data schema; a malformed
    * line yields its raw text in [[CorruptCol]] (plus whatever prefix
    * fields decoded), a well-formed line yields null there. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    parseLines(spark.read.text(path), schema)

  /** Streaming variant of [[read]]: tail a growing JSONL directory as a
    * file-source stream with the same parse + quarantine semantics —
    * crawl dumps land incrementally in real pipelines, and quarantine
    * accounting must survive micro-batching. `maxFilesPerTrigger` bounds
    * per-batch work. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    parseLines(r.text(path), schema)
  }

  /** Successfully parsed rows, quarantine column dropped. */
  def valid(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined raw lines (malformed JSON, one row per bad line). */
  def corrupt(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
}
