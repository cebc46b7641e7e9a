package graft.sources

import java.time.{LocalDateTime, LocalDate, LocalTime}
import java.time.format.DateTimeFormatter
import scala.util.Try
import scala.util.matching.Regex

/** Granule-filename metadata extraction (reference satbucket/info.py).
  *
  * The reference parses trollsift patterns like
  * `{product_level:s}.{satellite:s}...{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id}...`.
  * We translate the pattern to an anchored regex with one named group per
  * field, parse date/time fields with DateTimeFormatter, and apply the
  * reference's recombination rules (info.py:35-72):
  *   - missing end_time  → start_time + 2h
  *   - date-less end_time → start_time's date, +1 day if it would precede
  *   - date-less start_time (time-only) → requires start_date field
  */
object FilenameInfo {

  final case class Info(fields: Map[String, String],
                        startTime: LocalDateTime, endTime: LocalDateTime)

  private val fieldRe: Regex = "\\{([A-Za-z0-9_]+)(?::([^}]*))?\\}".r

  /** strptime directive → (regex fragment, java pattern fragment). */
  private def directive(ch: Char): (String, String) = ch match {
    case 'Y' => ("\\d{4}", "yyyy")
    case 'm' => ("\\d{2}", "MM")
    case 'd' => ("\\d{2}", "dd")
    case 'j' => ("\\d{3}", "DDD")
    case 'H' => ("\\d{2}", "HH")
    case 'M' => ("\\d{2}", "mm")
    case 'S' => ("\\d{2}", "ss")
    case 'y' => ("\\d{2}", "yy")
    case other => throw new IllegalArgumentException(s"unsupported %$other")
  }

  private final case class CompiledPattern(regex: Regex, names: Seq[String],
                                           timeFormats: Map[String, String])

  private def compile(pattern: String): CompiledPattern = {
    val sb = new StringBuilder("^")
    var last = 0
    val names = scala.collection.mutable.ArrayBuffer[String]()
    val formats = scala.collection.mutable.Map[String, String]()
    for (m <- fieldRe.findAllMatchIn(pattern)) {
      sb.append(Regex.quote(pattern.substring(last, m.start)))
      val name = m.group(1)
      val fmt = Option(m.group(2)).getOrElse("")
      names += name
      // positional groups (java named groups reject '_' in names); group i
      // maps to names(i)
      if (fmt.contains("%")) {
        // datetime field: translate strptime directives
        val rx = new StringBuilder
        val jf = new StringBuilder
        var i = 0
        while (i < fmt.length) {
          if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
            val (r, j) = directive(fmt.charAt(i + 1))
            rx.append(r); jf.append(j); i += 2
          } else {
            val c = fmt.charAt(i)
            rx.append(Regex.quote(c.toString))
            // DateTimeFormatter: letters are pattern chars and need quoting;
            // everything else can appear literally
            if (c.isLetter) jf.append("'").append(c).append("'") else jf.append(c)
            i += 1
          }
        }
        formats(name) = jf.toString
        sb.append(s"(${rx.toString})")
      } else {
        // plain field: non-greedy up to the next literal
        sb.append("(.*?)")
      }
      last = m.end
    }
    sb.append(Regex.quote(pattern.substring(last))).append("$")
    CompiledPattern(sb.toString.r, names.toSeq, formats.toMap)
  }

  private def parseDateTime(value: String, javaFmt: String): LocalDateTime = {
    val f = DateTimeFormatter.ofPattern(javaFmt)
    // full datetime, date-only, or time-only (reference: year 1900 marks a
    // date-less time; we model time-only as 1900-01-01THH:MM)
    Try(LocalDateTime.parse(value, f))
      .orElse(Try(LocalDate.parse(value, f).atStartOfDay))
      .orElse(Try(LocalDateTime.of(LocalDate.of(1900, 1, 1), LocalTime.parse(value, f))))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse datetime '$value' with '$javaFmt'"))
  }

  /** Parse one filename with one pattern (parse_filename_pattern). */
  def parse(filename: String, pattern: String): Info = {
    val cp = compile(pattern)
    val m = cp.regex.findFirstMatchIn(filename).getOrElse(
      throw new IllegalArgumentException(s"'$filename' does not match pattern"))
    val fields = cp.names.zipWithIndex.map { case (n, i) => n -> m.group(i + 1) }.toMap
    val times: Map[String, LocalDateTime] = cp.timeFormats.map { case (n, f) =>
      n -> parseDateTime(fields(n), f)
    }

    require(times.contains("start_time") || fields.contains("start_time"),
      "Missing start_time information.")
    var start = times.getOrElse("start_time",
      throw new IllegalArgumentException("start_time has no datetime format"))
    if (start.getYear == 1900) {
      val sd = times.getOrElse("start_date", throw new IllegalArgumentException(
        "start_time is a time object but start_date is missing or invalid."))
      start = LocalDateTime.of(sd.toLocalDate, start.toLocalTime)
    }

    var end = times.get("end_time") match {
      case None => start.plusHours(2)
      case Some(e0) =>
        if (e0.getYear != 1900) e0
        else times.get("end_date") match {
          case Some(ed) => LocalDateTime.of(ed.toLocalDate, e0.toLocalTime)
          case None =>
            val e1 = LocalDateTime.of(start.toLocalDate, e0.toLocalTime)
            if (e1.isBefore(start)) e1.plusDays(1) else e1
        }
    }
    Info(fields - "start_date" - "end_date", start, end)
  }

  /** First-matching-pattern parse (reference _get_info_from_filename). */
  def parseAny(filename: String, patterns: Seq[String]): Info = {
    patterns.view.flatMap(p => Try(parse(filename, p)).toOption).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no pattern matches '$filename'"))
  }

  def fromPath(path: String, patterns: Seq[String]): Info =
    parseAny(path.split('/').last, patterns)

  /** Driver-side granule-file pruning by filename time vs a query window
    * (reference filter_filepaths, filters.py:134-228; defaults: mission
    * start 1998-01-01 → now). */
  def filterFilepaths(paths: Seq[String], patterns: Seq[String],
                      start: Option[LocalDateTime] = None,
                      end: Option[LocalDateTime] = None): Seq[String] = {
    val s = start.getOrElse(LocalDateTime.of(1998, 1, 1, 0, 0))
    val e = end.getOrElse(LocalDateTime.now())
    paths.filter { p =>
      Try(fromPath(p, patterns)).toOption.exists(i =>
        Temporal.isWithinTimePeriod(i.startTime, i.endTime, s, e))
    }
  }
}
