package graft.sources

import java.time.{LocalDateTime, LocalDate}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Temporal partitioning of consolidated bucket files
  * (reference satbucket/routines.py:325-504).
  *
  * Valid groupings: year / month / quarter / day. ("season" is accepted by
  * the reference's check but unimplemented downstream — we reject it, per
  * SURVEY §2.7 T1.)
  */
object Temporal {

  val valid = Seq("year", "month", "quarter", "day")

  def check(tp: String): String = {
    require(valid.contains(tp),
      s"invalid temporal_partitioning '$tp'; valid: ${valid.mkString(", ")}")
    tp
  }

  /** File prefix for a timestep: "2021", "2021_1", "2021_1_15"
    * (get_time_prefix, routines.py:372-384 — no zero padding). */
  def timePrefix(t: LocalDateTime, tp: String): String = tp match {
    case "year" => s"${t.getYear}"
    case "month" => s"${t.getYear}_${t.getMonthValue}"
    case "quarter" => s"${t.getYear}_${(t.getMonthValue - 1) / 3 + 1}"
    case "day" => s"${t.getYear}_${t.getMonthValue}_${t.getDayOfMonth}"
    case other => throw new IllegalArgumentException(s"invalid '$other'")
  }

  /** Same prefix as a Column over a timestamp column (executor-side). */
  def timePrefixCol(time: Column, tp: String): Column = check(tp) match {
    case "year" => year(time).cast("string")
    case "month" => concat_ws("_", year(time), month(time))
    case "quarter" => concat_ws("_", year(time), quarter(time))
    case "day" => concat_ws("_", year(time), month(time), dayofmonth(time))
  }

  /** Period boundaries covering [start, end] snapped to period starts
    * (get_partitioning_boundaries, routines.py:387-446). */
  def boundaries(start: LocalDateTime, end: LocalDateTime, tp: String): Seq[LocalDateTime] = {
    def startOfPeriod(t: LocalDateTime): LocalDateTime = tp match {
      case "year" => LocalDate.of(t.getYear, 1, 1).atStartOfDay
      case "month" => LocalDate.of(t.getYear, t.getMonthValue, 1).atStartOfDay
      case "quarter" =>
        val qm = 3 * ((t.getMonthValue - 1) / 3) + 1
        LocalDate.of(t.getYear, qm, 1).atStartOfDay
      case "day" => t.toLocalDate.atStartOfDay
    }
    def next(t: LocalDateTime): LocalDateTime = tp match {
      case "year" => t.plusYears(1)
      case "month" => t.plusMonths(1)
      case "quarter" => t.plusMonths(3)
      case "day" => t.plusDays(1)
    }
    check(tp)
    // end boundary: snap forward one period unless end is exactly a start
    val lastBoundary = {
      val sp = startOfPeriod(end)
      if (end == sp) sp else startOfPeriod(next(end))
    }
    val buf = scala.collection.mutable.ArrayBuffer[LocalDateTime]()
    var t = startOfPeriod(start)
    while (!t.isAfter(lastBoundary)) { buf += t; t = next(t) }
    buf.toSeq
  }

  /** [(prefix, clampedStart, clampedEnd)] skipping empty periods
    * (get_list_group_periods, routines.py:449-471). Periods are half-open
    * [start, end) except the final one which is clamped to `end`. */
  def listGroupPeriods(start: LocalDateTime, end: LocalDateTime,
                       tp: String): Seq[(String, LocalDateTime, LocalDateTime)] = {
    val bs = boundaries(start, end, tp)
    bs.zipWithIndex.flatMap { case (gs, i) =>
      val ge0 = if (i < bs.length - 1) bs(i + 1) else end
      val gStart = if (gs.isBefore(start)) start else gs
      val gEnd = if (ge0.isAfter(end)) end else ge0
      if (gStart.isBefore(gEnd)) Some((timePrefix(gStart, tp), gStart, gEnd))
      else None
    }
  }

  /** Pad (start, end) symmetrically out to a minimum interval (reference
    * ensure_start_end_time_interval, analysis.py:291-309 — W10). */
  def ensureMinInterval(start: LocalDateTime, end: LocalDateTime,
                        minSeconds: Long): (LocalDateTime, LocalDateTime) = {
    val dur = java.time.Duration.between(start, end).getSeconds
    if (dur >= minSeconds) (start, end)
    else (start.minusSeconds(minSeconds / 2), end.plusSeconds(minSeconds / 2))
  }

  /** Interval-overlap predicate (is_within_time_period, filters.py:91-110):
    * true when [fileStart, fileEnd] overlaps [start, end] per the
    * reference's three-case rule. */
  def isWithinTimePeriod(fileStart: LocalDateTime, fileEnd: LocalDateTime,
                         start: LocalDateTime, end: LocalDateTime): Boolean = {
    val case1 = !fileStart.isAfter(start) && fileEnd.isAfter(start)
    val case2 = !fileStart.isBefore(start) && !fileEnd.isAfter(end)
    val case3 = fileStart.isBefore(end) && fileEnd.isAfter(end)
    case1 || case2 || case3
  }

  /** Assign files (with filename-derived times) to temporal groups
    * (group_files_by_time, routines.py:474-504). */
  def groupFilesByTime(files: Seq[(String, LocalDateTime, LocalDateTime)],
                       startOpt: Option[LocalDateTime], endOpt: Option[LocalDateTime],
                       tp: String): Map[String, (LocalDateTime, LocalDateTime, Seq[String])] = {
    require(files.nonEmpty, "no files to group")
    val start = startOpt.getOrElse(files.map(_._2).min(Ordering.fromLessThan[LocalDateTime](_ isBefore _)))
    val end = endOpt.getOrElse(files.map(_._3).max(Ordering.fromLessThan[LocalDateTime](_ isBefore _)))
    listGroupPeriods(start, end, tp).flatMap { case (prefix, gs, ge) =>
      val inGroup = files.filter(f => isWithinTimePeriod(f._2, f._3, gs, ge)).map(_._1)
      if (inGroup.nonEmpty) Some(prefix -> ((gs, ge, inGroup))) else None
    }.toMap
  }
}
