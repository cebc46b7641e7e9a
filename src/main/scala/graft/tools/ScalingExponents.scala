package graft.tools

import org.apache.spark.sql.functions._

/** Per-query SCALING-EXPONENT smoke: times a set of the workload's most
  * expensive gates at sf0.1 and at a synthesized 10x replication of the
  * pipeline tables, and reports exponent = log10(t10 / t1) — 1.0 is
  * data-linear, anything materially above ~1.3 means a super-linear plan
  * that the per-round sf0.1 bench can never catch (the cheapest early
  * warning before anyone scales the workload for real; VERDICT r11 #7).
  *
  * The replication recipe (shifted ids, adversarially-exact text copies,
  * preserved timestamps) lives in [[ScaleStage]], shared with
  * [[StageAudit]]'s standing 10x pass.
  *
  * Usage: runMain graft.tools.ScalingExponents [sfDir] [q1,q2,...] [factor]
  * (factor defaults to 10; round 13 directive #9 extends the three
  * cheapest heavy gates to 30x — exponent is log_factor(ratio) so the
  * 1.0-is-linear reading is factor-independent).
  */
object ScalingExponents {

  /** The expensive-gate set (bench top-enders spanning the operator
    * families: dedup joins, merge, streaming lifecycle, index compact,
    * ANN search, graph, exact similarity join). */
  val DefaultQueries: Seq[String] = Seq(
    "q187_containment", "q192_prefix_filter_join", "q54_update_merge",
    "q31_minhash_sig", "q32_minhash_lsh_pairs", "q45_dedup_clusters",
    "q147_stream_dedup_ingest", "q163_text_index_compact",
    "q122_index_compact", "q177_pagerank")

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val queries = if (args.length > 1) args(1).split(',').toSeq.map(_.trim)
                  else DefaultQueries
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // staging shared with StageAudit's standing 10x pass (r18)
    val out = ScaleStage.ensure(spark, base, factor)

    def time(name: String, dir: String): Double = {
      // min-of-2 with a warm lead-in at the small dir only (JIT)
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    println(f"${"query"}%-28s ${"t_x1"}%8s ${"t_x10"}%8s ${"ratio"}%7s exponent")
    val rows = queries.map { q =>
      try {
        val t1 = time(q, base)
        val t10 = time(q, out)
        val ratio = t10 / math.max(t1, 1e-3)
        val expn = math.log(math.max(ratio, 1e-3)) / math.log(factor.toDouble)
        println(f"$q%-28s $t1%8.2f $t10%8.2f $ratio%7.2f $expn%.2f")
        (q, t1, t10, ratio, expn)
      } catch {
        case t: Throwable =>
          println(f"$q%-28s FAILED ${t.getClass.getSimpleName}: ${t.getMessage}")
          (q, -1.0, -1.0, -1.0, -1.0)
      }
    }
    val bad = rows.filter { case (_, _, _, r, _) => r > 1.3 * factor }
    println(if (bad.isEmpty) "ALL <= 1.3x data-linear"
            else s"SUPER-LINEAR: ${bad.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
