package graft.tools

/** Board-start host calibration (r19 verdict directive #3): pins are
  * absolute seconds measured across host classes with a documented
  * 1.2–1.35× drift band plus INTERMITTENT host-level steal (r19:
  * loadavg 12.8 with no in-VM consumer; a control query reading 1.6×
  * its morning figure on identical code) — three rounds of pin
  * adjudication toil (r17 LSH sweep, r18 q192, r19 watch list) trace
  * to reading absolute ratios on an uncalibrated host.
  *
  * This tool times a small PLAN-STABLE calibration set (min of warm
  * trials, cold trial discarded — PERFNOTES timing-trap rule) against
  * committed quiet-window reference figures and prints one JSON line:
  *
  *   {"host_index": median ratio, "per_query": {...}, "loadavg": ...}
  *
  * Adjudication protocol (PERFNOTES r20):
  *   - normalized ratio = t / (pin × host_index); the re-time trigger
  *     (1.5×) and the hard rule (2×) apply to the NORMALIZED ratio,
  *     raw ratios are still recorded beside it.
  *   - a host_index outside [0.7, 1.6] is NOT a normalization factor —
  *     it is evidence the window is not quiet (steal) or the
  *     calibration set itself regressed; the ritual treats it as
  *     INVALID and re-queues the step instead of normalizing.
  *   - the calibration queries are chosen for plan stability across
  *     rounds; any round that touches one of their plans must
  *     re-baseline CalPins in the same commit with a written rationale
  *     (same governance as BENCH_PINS rule 1). A code regression would
  *     have to move ALL FIVE stable plans in lockstep to skew the
  *     median — and would still show raw, since raw ratios are never
  *     dropped.
  *
  * Run: sbt "runMain graft.tools.HostCal [sfDir] [trials]"
  * (defaults /root/testdata/sf0.1, 4 trials — min of trials 2..4).
  */
object HostCal {

  /** Reference figures: measured BY THIS TOOL (min-of-warm after the
    * untimed pre-run below) on the r20 build host in an evidenced quiet
    * window — self-consistent, NOT copied from BENCH_PINS: the full
    * board reaches a deeper steady state than a 5-query JVM, so pins
    * from it would bias sub-second members high (measured: q31 read
    * 2.0× its board pin here while q86/q192 read 1.1×). Members are
    * mid-size (0.5–3.5 s), CPU-bound, plan-stable across rounds, and
    * span the workload's cost shapes: file listing + scan (q64),
    * explode+join+agg (q86), span aggregation (q124), iterative BPE
    * training (q131), and the prefix-filter join q192 — the r19
    * control query, so the steal bracket and the host index read the
    * same signal. */
  val CalPins: Seq[(String, Double)] = Seq( // min of two quiet r20 runs
    "q64_glob_read" -> 1.19,
    "q86_tfidf" -> 1.17,
    "q124_repeated_spans" -> 1.13,
    "q131_bpe_train" -> 1.49,
    "q192_prefix_filter_join" -> 2.52)

  def loadavg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val trials = args.lift(1).map(_.toInt).getOrElse(4)
    require(trials >= 2, "need at least one warm trial after the cold one")
    val loadBefore = loadavg1m()
    val spark = graft.core.GraftSession
      .builder("32", "32", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed pre-run of the WHOLE set before any timing (Bench's
    // warm-up discipline): the sub-second members are otherwise
    // dominated by whole-JVM JIT + parquet-footer cache misses and read
    // 2-3x their steady state, swamping the host signal they exist for
    CalPins.foreach { case (q, _) =>
      graft.SparkEntry.queries(q)(spark, sfDir).count() }
    val per = CalPins.map { case (q, pin) =>
      val times = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      (q, times.tail.min, times.tail.min / pin)
    }
    val loadAfter = loadavg1m()
    val sortedRatios = per.map(_._3).sorted
    val hostIndex = sortedRatios(sortedRatios.size / 2)
    val perJson = per.map { case (q, t, r) =>
      f""""$q":{"sec":$t%.3f,"ratio":$r%.3f}""" }.mkString(",")
    println(f"""{"host_index":$hostIndex%.3f,"quiet":${
      hostIndex >= 0.7 && hostIndex <= 1.6},"per_query":{$perJson},""" +
      f""""loadavg_before":$loadBefore%.2f,"loadavg_after":$loadAfter%.2f}""")
    spark.stop()
    if (hostIndex < 0.7 || hostIndex > 1.6) sys.exit(2)
  }
}
