package graft

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{FilenameInfo, Temporal}

/** Golden values from satbucket/tests/test_routines.py:464-640 and
  * test_info.py:8-81. */
class TemporalSpec extends AnyFunSuite {
  private def t(s: String) = LocalDateTime.parse(s)

  test("time prefixes (test_routines.py:570-605)") {
    assert(Temporal.timePrefix(t("2021-03-15T00:00:00"), "year") == "2021")
    assert(Temporal.timePrefix(t("2021-03-15T00:00:00"), "month") == "2021_3")
    assert(Temporal.timePrefix(t("2021-02-15T00:00:00"), "quarter") == "2021_1")
    assert(Temporal.timePrefix(t("2021-05-15T00:00:00"), "quarter") == "2021_2")
    assert(Temporal.timePrefix(t("2021-08-15T00:00:00"), "quarter") == "2021_3")
    assert(Temporal.timePrefix(t("2021-11-15T00:00:00"), "quarter") == "2021_4")
    assert(Temporal.timePrefix(t("2021-07-05T00:00:00"), "day") == "2021_7_5")
    intercept[IllegalArgumentException](Temporal.check("season"))
  }

  test("partitioning boundaries (test_routines.py:464-563)") {
    def b(s: String, e: String, tp: String) =
      Temporal.boundaries(t(s), t(e), tp).map(_.toString)
    assert(b("2021-07-05T01:39:42", "2021-10-15T12:00:00", "year") ==
      Seq("2021-01-01T00:00", "2022-01-01T00:00"))
    assert(b("2021-01-01T00:00:00", "2022-01-01T00:00:00", "year") ==
      Seq("2021-01-01T00:00", "2022-01-01T00:00"))
    assert(b("2021-07-05T01:39:42", "2021-10-15T12:00:00", "month") ==
      Seq("2021-07-01T00:00", "2021-08-01T00:00", "2021-09-01T00:00",
          "2021-10-01T00:00", "2021-11-01T00:00"))
    assert(b("2021-07-01T00:00:00", "2021-10-01T00:00:00", "month") ==
      Seq("2021-07-01T00:00", "2021-08-01T00:00", "2021-09-01T00:00",
          "2021-10-01T00:00"))
    assert(b("2021-08-05T01:39:42", "2021-11-15T12:00:00", "quarter") ==
      Seq("2021-07-01T00:00", "2021-10-01T00:00", "2022-01-01T00:00"))
    assert(b("2021-07-01T00:00:00", "2021-10-01T00:00:00", "quarter") ==
      Seq("2021-07-01T00:00", "2021-10-01T00:00"))
    assert(b("2021-07-05T01:39:42", "2021-07-07T15:30:00", "day") ==
      Seq("2021-07-05T00:00", "2021-07-06T00:00", "2021-07-07T00:00",
          "2021-07-08T00:00"))
    assert(b("2021-07-05T00:00:00", "2021-07-07T00:00:00", "day") ==
      Seq("2021-07-05T00:00", "2021-07-06T00:00", "2021-07-07T00:00"))
  }

  test("group periods clamp to [start, end) and skip empties") {
    val ps = Temporal.listGroupPeriods(
      t("2021-07-05T01:39:42"), t("2021-09-15T12:00:00"), "month")
    assert(ps.map(_._1) == Seq("2021_7", "2021_8", "2021_9"))
    assert(ps.head._2 == t("2021-07-05T01:39:42"))
    assert(ps.last._3 == t("2021-09-15T12:00:00"))
  }

  test("filename parsing (test_info.py:8-81)") {
    val full = FilenameInfo.parse("20240501T120000-20240501T123000",
      "{start_time:%Y%m%dT%H%M%S}-{end_time:%Y%m%dT%H%M%S}")
    assert(full.startTime == t("2024-05-01T12:00:00"))
    assert(full.endTime == t("2024-05-01T12:30:00"))

    val modis = FilenameInfo.parse("MOD021KM.A2018358.1010.061.2018358192717.hdf",
      "{product:s}.A{start_time:%Y%j.%H%M}.{others:s}.{processing_time:s}.{data_format}")
    assert(modis.startTime == t("2018-12-24T10:10:00"))
    assert(modis.endTime == t("2018-12-24T12:10:00")) // +2h fallback

    val gpm = FilenameInfo.parse(
      "2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5",
      "{product_level:s}.{satellite:s}.{sensor:s}.{algorithm:s}.{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id}.{version}.{data_format}")
    assert(gpm.startTime == t("2021-07-05T01:39:42"))
    assert(gpm.endTime == t("2021-07-05T03:12:14"))
    assert(gpm.fields("granule_id") == "041760")

    val gpm2 = FilenameInfo.parse(
      "2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5",
      "{product_level:s}.{satellite:s}.{sensor:s}.{algorithm:s}.{start_date:%Y%m%d}-S{start_time:%H%M%S}-E{end_time:%H%M%S}.{granule_id}.{version}.{data_format}")
    assert(gpm2.startTime == t("2021-07-05T01:39:42"))
    assert(gpm2.endTime == t("2021-07-05T03:12:14"))

    val wrap = FilenameInfo.parse("20240501-S230000-E003000",
      "{start_date:%Y%m%d}-S{start_time:%H%M%S}-E{end_time:%H%M%S}")
    assert(wrap.startTime == t("2024-05-01T23:00:00"))
    assert(wrap.endTime == t("2024-05-02T00:30:00")) // next-day wrap

    val bothDates = FilenameInfo.parse("20240501-S230000-20240502-E003000",
      "{start_date:%Y%m%d}-S{start_time:%H%M%S}-{end_date:%Y%m%d}-E{end_time:%H%M%S}")
    assert(bothDates.endTime == t("2024-05-02T00:30:00"))

    intercept[IllegalArgumentException] {
      FilenameInfo.parse("S120000-E123000", "S{start_time:%H%M%S}-E{end_time:%H%M%S}")
    }

    val noEnd = FilenameInfo.parse("20240501-S120000",
      "{start_date:%Y%m%d}-S{start_time:%H%M%S}")
    assert(noEnd.endTime == t("2024-05-01T14:00:00"))
  }

  test("interval-overlap predicate (filters.py:91-110)") {
    val s = t("2021-01-01T00:00:00"); val e = t("2021-02-01T00:00:00")
    // straddles start / inside / straddles end / outside
    assert(Temporal.isWithinTimePeriod(t("2020-12-31T00:00:00"), t("2021-01-01T01:00:00"), s, e))
    assert(Temporal.isWithinTimePeriod(t("2021-01-10T00:00:00"), t("2021-01-11T00:00:00"), s, e))
    assert(Temporal.isWithinTimePeriod(t("2021-01-31T00:00:00"), t("2021-02-02T00:00:00"), s, e))
    assert(!Temporal.isWithinTimePeriod(t("2021-03-01T00:00:00"), t("2021-03-02T00:00:00"), s, e))
    assert(!Temporal.isWithinTimePeriod(t("2020-11-01T00:00:00"), t("2020-12-01T00:00:00"), s, e))
  }

  test("filterFilepaths prunes by filename-derived time (P9)") {
    val pat = "{product_level:s}.{satellite:s}.{sensor:s}.{algorithm:s}.{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id}.{version}.{data_format}"
    val files = Seq(
      "2A.GPM.DPR.V9-20211125.20210705-S013942-E031214.041760.V07A.HDF5",
      "2A.GPM.DPR.V9-20211125.20210805-S013942-E031214.041760.V07B.HDF5",
      "2A.GPM.DPR.V9-20211125.20230705-S013942-E031214.041760.V07A.HDF5")
    val got = FilenameInfo.filterFilepaths(files, Seq(pat),
      Some(t("2021-07-01T00:00:00")), Some(t("2021-08-01T00:00:00")))
    assert(got == files.take(1))
  }
}
