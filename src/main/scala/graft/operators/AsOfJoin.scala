package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent right
  * row with right.time <= left.time (optionally within a tolerance),
  * per key — the time-series lookup Spark lacks as a built-in operator.
  *
  * Implemented as the union-tag trick (compose-existing-ops path of the
  * custom-operator preference order): tag both sides, union, and take
  * `last(right ROW as one struct, ignoreNulls)` over a per-key
  * time-ordered window — row-atomic, so a right row carrying null
  * values still IS the match (pandas merge_asof / DuckDB ASOF
  * semantics), never skipped for an older non-null one. One
  * shuffle on (key), no range explosion — the classic alternative (range
  * join + top-1 per pair) shuffles the cross product. Right rows sort
  * before simultaneous left rows so `right.time == left.time` matches.
  */
object AsOfJoin {

  /** @param left       fact side (keeps all rows)
    * @param right      lookup side
    * @param keyCols    equi-join keys present on both sides
    * @param timeCol    event-time column name present on both sides
    * @param valueCols  right-side columns to attach
    * @param toleranceSeconds  max allowed left.time - right.time (<0 = unbounded)
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, valueCols: Seq[String],
               toleranceSeconds: Long = -1L): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rt", lit(null).cast("timestamp"))
    val lAligned = valueCols.foldLeft(l) { (d, c) =>
      d.withColumn(s"__v_$c", lit(null).cast(
        right.schema(c).dataType))
    }
    val r0 = right.select((keyCols :+ timeCol).map(col) ++
      valueCols.map(col): _*)
    var rAligned = r0
      .withColumn("__side", lit(0))
      .withColumn("__rt", col(timeCol))
    valueCols.foreach { c => rAligned = rAligned.withColumn(s"__v_$c", col(c)) }
    // null out left-only columns on the right side
    val rFull = leftCols.foldLeft(rAligned) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lAligned.columns.map(col): _*)

    val unioned = lAligned.unionByName(rFull)
    // right rows first within a timestamp (side 0 < 1) so equal times match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Fill ONE struct of (time, values) per right ROW, not each value
    // column independently: last(value, ignoreNulls) per column would
    // SKIP a right row whose value is null and reach back to an older
    // row — attaching a value the most-recent row does not carry, and
    // with several valueCols even mixing columns from different right
    // rows. The as-of contract (and DuckDB's native ASOF JOIN, which
    // the q43 oracle replays) attaches the most recent ROW atomically,
    // nulls included: the struct is non-null for every right row even
    // when its fields are null, so last(struct, ignoreNulls) lands on
    // exactly that row. One window fill instead of 1 + |valueCols|.
    // A right row whose time is NULL is excluded from the fill: NULL
    // sorts FIRST under asc, so without the isNotNull guard it would
    // become the "most recent" match for any left row that no real
    // right row precedes — but pandas merge_asof / DuckDB ASOF never
    // match a NULL-time row (NULL inequality = no match). The bounded
    // path already rejected it (null tolerance arithmetic); this guard
    // closes the unbounded path too.
    val rowStruct = when(col("__side") === 0 && col("__rt").isNotNull,
      struct((col("__rt").as("__t") +:
        valueCols.map(c => col(s"__v_$c").as(s"__v_$c"))): _*))
    val filled = unioned
      .withColumn("__last", last(rowStruct, ignoreNulls = true).over(w))
    val lastRt = col("__last").getField("__t")
    val withinTol =
      if (toleranceSeconds < 0) lit(true)
      else unix_micros(col(timeCol)) - unix_micros(lastRt) <=
        toleranceSeconds * 1000000L
    val out = filled.where(col("__side") === 1)
    val projected = valueCols.foldLeft(out) { (d, c) =>
      d.withColumn(c, when(col("__last").isNotNull && withinTol,
        col("__last").getField(s"__v_$c")).otherwise(lit(null)))
    }
    projected.select((leftCols ++ valueCols).map(col): _*)
  }
}
