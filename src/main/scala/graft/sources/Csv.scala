package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Delimiter-separated (CSV/TSV) line ingestion with corrupt-record
  * quarantine — the second raw-corpus entry point next to [[Jsonl]]
  * (metadata dumps, alignment pairs, and label files arrive tab- or
  * comma-separated as often as JSON). Same design decisions, same
  * contract:
  *
  *  - schema is ALWAYS explicit (inference is an extra full pass that
  *    samples whichever files it happens to read);
  *  - lines are read as text and parsed with `from_csv` (codegen'd
  *    expression — parsing stays inside whole-stage codegen);
  *  - a malformed line (wrong column count, a field that fails its
  *    declared type) keeps its decoded prefix fields AND lands whole in
  *    the quarantine column; [[valid]]/[[corrupt]] split off the
  *    quarantine column only, never field nullness;
  *  - quoting is DISABLED (empty `quote` option): corpus text routinely
  *    contains stray quote characters, and RFC-4180 quote handling
  *    would silently glue lines/fields around them — the ingest
  *    convention for text corpora is sanitize-on-write (strip the
  *    delimiter and newlines from free-text fields), not quoting.
  *
  * Scale shape: identical to [[Jsonl]] — newline splitting fans a single
  * huge file across executors, parsing is per-line, no shuffle. */
object Csv {

  val CorruptCol = "_corrupt_record"

  /** Parse a frame of raw lines (column `value`; batch OR streaming).
    * `from_csv` cannot return a null struct, but the same blank-line
    * guard as [[Jsonl.parseLines]] is kept for defense: a quarantined
    * row always carries its raw line. */
  def parseLines(lines: DataFrame, schema: StructType,
                 sep: String = "\t"): DataFrame = {
    require(sep.length == 1, s"sep must be a single character, got '$sep'")
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol,
      "sep" -> sep,
      "quote" -> "") // empty disables quoting
    val parsed = lines
      .select(col("value"),
        from_csv(col("value"), schema.add(CorruptCol, StringType), opts)
          .as("__parsed"))
    val dataCols = schema.fieldNames.toSeq
      .map(f => col("__parsed").getField(f).as(f))
    val quarantine = coalesce(col("__parsed").getField(CorruptCol),
      when(col("__parsed").isNull, col("value"))).as(CorruptCol)
    parsed.select(dataCols :+ quarantine: _*)
  }

  /** Read delimiter-separated lines under `path` with an explicit data
    * schema; malformed lines yield their raw text in [[CorruptCol]]. */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = "\t"): DataFrame =
    parseLines(spark.read.text(path), schema, sep)

  /** Streaming variant: tail a growing directory as a file-source
    * stream with the same parse + quarantine semantics. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 sep: String = "\t",
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    parseLines(r.text(path), schema, sep)
  }

  /** Successfully parsed rows, quarantine column dropped. */
  def valid(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined raw lines (one row per bad line). */
  def corrupt(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
}
