package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stages (once, marker-gated) the synthesized N× replication of the
  * pipeline tables that the scale diagnostics share: [[ScalingExponents]]
  * times gates against it, and [[StageAudit]]'s 10× pass — a standing
  * per-round gate since round 18 — hunts single-task stages on it that
  * sf0.1 structurally cannot surface (r17: AQE byte-based coalescing
  * serialized the LSH bucket aggregate 60–172 core-sec at 10× while the
  * sf0.1 audit read clean).
  *
  * The N× set replicates events/documents/embeddings with shifted ids
  * (k·10¹² offsets keep id arithmetic like `% 3600` well distributed);
  * the small TPC-H side tables pass through unchanged. Replicated TEXT
  * is N exact copies per doc — deliberately adversarial for the dedup
  * family (every LSH bucket gets N× hotter) — and replicated events keep
  * their timestamps, so per-user and per-hour densities grow N× too.
  *
  * The staged dir is keyed by factor + base and re-used across runs in
  * the same container (`_staged_ok` marker); delete it to force a
  * restage after the base tables change.
  */
object ScaleStage {

  def ensure(spark: SparkSession, base: String, factor: Int): String = {
    val out = s"/tmp/graft_scale${factor}x_${graft.queries.QueryModule.cacheKey(base)}"
    if (!graft.sources.BucketFs.exists(s"$out/_staged_ok")) {
      graft.sources.BucketFs.deleteRecursive(out)
      val scaled = Seq("events" -> Seq("event_id", "user_id"),
        "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))
      scaled.foreach { case (t, idCols) =>
        val src = graft.core.Tables(spark, base, t)
        val copies = (0 until factor).map { k =>
          idCols.foldLeft(src) { (d, c) =>
            // big stride keeps modular id arithmetic in the gates
            // (e.g. event_id % 3600) distributed like the original
            d.withColumn(c, col(c) + lit(k.toLong * 1000000000000L))
          }
        }
        copies.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem").foreach { t =>
        graft.core.Tables(spark, base, t)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      graft.sources.BucketFs.writeString(s"$out/_staged_ok", "ok\n")
    }
    out
  }
}
