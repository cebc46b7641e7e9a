package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  *
  * A short warmup at sf0.001 first: JIT + codegen + parquet footer caches
  * otherwise land entirely on whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // canonical config (incl. the InferFiltersFromGenerate exclusion — see
    // GraftSession for the rationale) lives in graft.core.GraftSession
    val spark = graft.core.GraftSession.builder(cpus, cpus, rawLocalFs = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: representative scan/agg, window, hash/shingle plans, AND the
    // interpreted higher-order-function paths (array_intersect, in-row LSH
    // pair explosion) — those are evaluated by the expression interpreter,
    // whose JIT warmup dominated early trials of q32/q34 in round 5 and
    // reported phantom 2-8x "regressions" (see tools/ProfileR6: q34 trial
    // curve 1.86 -> 0.46 s at sf0.1, steady-state 0.17 s)
    val warmDir = "/root/testdata/sf0.001"
    Seq("q01_pricing_summary", "q06_sessionize", "q31_minhash_sig",
        "q32_minhash_lsh_pairs", "q34_ngram_jaccard")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }

    // min-of-3 per query: single local[*] runs jitter ±15-25% under system
    // noise; the minimum of three trials is the stable, reproducible figure
    // (a mean would fold one GC storm or external CPU burst into the
    // number — this mis-reported q31 as 6.7s vs 0.9s reproducible in one
    // round, and q52 as a 3.7x "regression" in another). If even the three
    // trials spread by >1.5x the whole window may have been poisoned by one
    // sustained burst — take a fourth so a transient can't survive as a
    // phantom regression.
    // A trial that throws reports None: a failed run's elapsed time is
    // meaningless (an aborted job exits EARLY, so folding it into the min
    // would print a fast phantom figure for a broken query — exactly what
    // hid a FileScanRDD job abort inside the r6 run). Failures are counted
    // per query and surfaced in the output JSON instead.
    def trial(name: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch { case t: Throwable =>
        System.err.println(s"BENCH TRIAL FAILED $name: ${t.getClass.getName}: ${t.getMessage}")
        None
      }
    }
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val three = Seq(trial(name, fn), trial(name, fn), trial(name, fn))
      var ok = three.flatten
      var nFail = three.count(_.isEmpty)
      // retry rules: any failure, or a >1.5x spread (one sustained external
      // burst can poison a whole 3-trial window), earns a fourth trial
      if (nFail > 0 || (ok.nonEmpty && ok.max > 1.5 * ok.min)) {
        val t4 = trial(name, fn)
        ok = ok ++ t4
        nFail += (if (t4.isEmpty) 1 else 0)
      }
      if (nFail > 0) failed(name) = nFail
      name -> (if (ok.nonEmpty) ok.min else Double.NaN)
    }
    val total = results.map(_._2).filterNot(_.isNaN) match {
      case s if s.nonEmpty => s.sum; case _ => 0.0 }
    // JSON has no NaN: an all-trials-failed query renders as -1 (the
    // "failed" map names it, so the marker can't read as a real time)
    def failedJson(short: Boolean): String =
      failed.map { case (k, n) =>
        val key = if (short) k.takeWhile(_ != '_') else k
        "\"" + key + "\":" + n
      }.mkString("{", ",", "}")
    def render(short: Boolean, decimals: Int): String = {
      val fmt = s"%.${decimals}f"
      val qs = results.map { case (k, v) =>
        val key = if (short) k.takeWhile(_ != '_') else k
        val num = if (v.isNaN) "-1" else
          fmt.formatLocal(java.util.Locale.ROOT, v).toDouble.toString
        "\"" + key + "\":" + num
      }.mkString("{", ",", "}")
      val sf = sfDir.split('/').last.stripPrefix("sf")
      s"""{"metric":"total","value":${"%.3f".formatLocal(java.util.Locale.ROOT, total).toDouble},"unit":"sec","queries":$qs,"failed":${failedJson(short)},"sf":"$sf"}"""
    }
    // Dual-channel for the driver's parser: a clean line on stdout AND a
    // dedicated file. The driver captures only the LAST ~2000 bytes of
    // stdout, and sbt appends a ~72-byte "[success] ..." line after us —
    // a JSON line longer than ~1900 bytes gets its head truncated and
    // fails to parse (this silently dropped the round-3 numbers). Keep
    // full names + 3 decimals while it fits; fall back to the spec's
    // short "qNN" keys when the query count grows past that.
    val full = render(short = false, decimals = 3)
    val stdoutLine = if (full.length <= 1800) full else render(short = true, decimals = 3)
    println(stdoutLine)
    val fileJson = {
      val qs = results.map { case (k, v) =>
        "\"" + k + "\":" + (if (v.isNaN) "-1" else v.toString)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failedJson(short = false)},"sf":"$sfDir"}"""
    }
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_OUT.json"),
      (fileJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
