package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analysis, Similarity}

/** Funnel / cohort-retention / dominant-direction: semantic edges that
  * the oracle gates can't isolate (ordering, window boundary, axis
  * recovery). */
class FunnelCohortSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: order and window are enforced per user") {
    val ev = Seq(
      // u1 completes A->B->C in order, inside the hour
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:10:00")),
      (1L, "C", ts("2024-01-01 10:20:00")),
      // u2 does B before A: B must not count
      (2L, "B", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      // u3's C lands outside the 1h window of their first A
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:30:00")),
      (3L, "C", ts("2024-01-01 11:30:00")),
      // u4 never does A: nothing counts
      (4L, "B", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Analysis.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), withinSeconds = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: boundary — an event exactly at t1 + window still counts") {
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00"))) // exactly +1h (<=, closed)
      .toDF("user_id", "event_type", "ts")
    val got = Analysis.funnelSteps(ev, "user_id", "event_type", "ts",
        Seq("A", "B"), withinSeconds = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(2) == 1L, "closed upper boundary must count")
  }

  test("cohort retention: first-touch buckets and distinct actives") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00")), (1L, ts("2024-01-01 12:05:00")),
      (1L, ts("2024-01-01 12:45:00")), // same cell twice -> 1 distinct
      (2L, ts("2024-01-01 10:30:00")),
      (3L, ts("2024-01-01 11:30:00")))
      .toDF("user_id", "ts")
    val got = Analysis.cohortRetention(ev, "user_id", "ts", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h10 = ts("2024-01-01 10:00:00").getTime * 1000L / 3600000000L
    assert(got((h10, 0L)) == 2L)       // u1 + u2 in their cohort hour
    assert(got((h10, 2L)) == 1L)       // u1 two hours later, deduped
    assert(got((h10 + 1, 0L)) == 1L)   // u3's own cohort
    assert(got.values.sum == 4L)
  }

  test("dominant direction: recovers a planted dominant axis") {
    // 50 vectors strongly aligned with axis 2, small noise on axis 5
    val vecs = (0 until 50).map { i =>
      val v = Array.fill(8)(0.0f)
      v(2) = 0.5f + (i % 3) * 0.01f
      v(5) = 0.02f * (i % 5)
      (i.toLong, v.toSeq)
    }
    val got = Similarity.dominantDirection(
        vecs.toDF("vec_id", "embedding"), "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val top = got.maxBy { case (_, x) => math.abs(x) }
    assert(top._1 == 2, s"dominant axis must be 2, got $got")
    assert(math.abs(top._2) == 1000000L || math.abs(top._2) >= 999000L,
      "dominant component must saturate the xScale")
    assert(math.abs(got(0)) == 0L && math.abs(got(7)) == 0L,
      "untouched axes must be exactly zero")
  }

  test("funnelCompletions: completer count matches funnelSteps' last stage") {
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), (1L, "B", ts("2024-01-01 10:10:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      (3L, "A", ts("2024-01-01 10:00:00")), (3L, "B", ts("2024-01-01 10:20:00")))
      .toDF("user_id", "event_type", "ts")
    val comp = Analysis.funnelCompletions(ev, "user_id", "event_type", "ts",
      Seq("A", "B"), withinSeconds = 3600L).collect()
    assert(comp.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // latency = tk - t1 per completer
    val lat = comp.map(r => r.getLong(0) -> (r.getLong(2) - r.getLong(1))).toMap
    assert(lat(1L) == 600000000L && lat(3L) == 1200000000L)
    val steps = Analysis.funnelSteps(ev, "user_id", "event_type", "ts",
      Seq("A", "B"), withinSeconds = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(steps(2) == comp.length.toLong)
  }

  test("outlier flags: obvious spike flags, uniform group does not") {
    import org.apache.spark.sql.functions.col
    val rows = (Seq.fill(20)(100L) :+ 10000L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }
    val got = Analysis.outlierFlags(
        rows.toDF("id", "g", "c"), Seq("g"), col("c"), kSigma = 3)
      .select("id", "is_outlier")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(got(20L), "the 100x spike must flag")
    assert((0L until 20L).forall(!got(_)), "baseline rows must not flag")
    // constant group: variance 0, strict > means nothing flags
    val const = Analysis.outlierFlags(
        Seq((1L, "g", 5L), (2L, "g", 5L)).toDF("id", "g", "c"),
        Seq("g"), col("c"), kSigma = 3)
      .select("is_outlier").collect().map(_.getBoolean(0))
    assert(const.forall(!_), "zero-variance group must not flag")
  }

  test("dominant direction: independent of input partitioning") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(6)(j => ((i * 7 + j * 13) % 10 - 5) / 10.0f))
    }
    def run(parts: Int) = Similarity.dominantDirection(
        vecs.toDF("vec_id", "embedding").repartition(parts), "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run(7) == run(1))
  }

  test("cooccurrenceCounts: exact pair/item/total integers, within-key join only") {
    import graft.operators.Analysis
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),        // dup (1,b) must count once
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"),
      (4L, null.asInstanceOf[String])          // null item dropped
    ).toDF("k", "item")
    val got = Analysis.cooccurrenceCounts(df, "k", "item")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 3L, 2L, 3L),
      ("a", "c", 1L, 3L, 1L, 3L),
      ("b", "c", 1L, 2L, 1L, 3L)))
  }

  test("touchAttribution: first/last preceding touch, ties toward earlier id, nulls kept") {
    import graft.operators.Analysis
    val ev = Seq(
      // u1: view -> click -> purchase
      (1L, "view", ts("2024-01-01 10:00:00"), 10L),
      (1L, "click", ts("2024-01-01 10:05:00"), 11L),
      (1L, "purchase", ts("2024-01-01 10:10:00"), 12L),
      // u1 second purchase after another click
      (1L, "click", ts("2024-01-01 10:20:00"), 13L),
      (1L, "purchase", ts("2024-01-01 10:30:00"), 14L),
      // u2: purchase with NO prior touch -> nulls
      (2L, "purchase", ts("2024-01-01 09:00:00"), 20L),
      // u3: touch at the SAME time as the purchase but smaller id counts
      (3L, "view", ts("2024-01-01 08:00:00"), 30L),
      (3L, "purchase", ts("2024-01-01 08:00:00"), 31L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Analysis.touchAttribution(ev, "user_id", "event_type", "ts",
        "event_id", "purchase", Seq("view", "click"))
      .select($"conversion_id", $"first_touch_type", $"last_touch_type")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (12L, "view", "click"),
      (14L, "view", "click"),
      (20L, null, null),
      (31L, "view", "view")))
  }

  test("eventPaths: time order with id tiebreak, k truncation") {
    import graft.operators.Analysis
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:01:00"), 2L),
      (1L, "purchase", ts("2024-01-01 10:02:00"), 3L),
      // u2 same path; the 3rd+ events truncate at k=2
      (2L, "view", ts("2024-01-01 11:00:00"), 4L),
      (2L, "click", ts("2024-01-01 11:01:00"), 5L),
      (2L, "error", ts("2024-01-01 11:02:00"), 6L),
      // u3: same-timestamp events order by id
      (3L, "b_second", ts("2024-01-01 12:00:00"), 8L),
      (3L, "a_first", ts("2024-01-01 12:00:00"), 7L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Analysis.eventPaths(ev, "user_id", "event_type", "ts",
        "event_id", k = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("view>click" -> 2L, "a_first>b_second" -> 1L))
  }
}
