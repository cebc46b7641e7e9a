package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Directed decomposition of the q147/q148 per-batch lifecycle floor
  * (r19 verdict stretch #7): the two most expensive board queries are
  * adjudicated ~80% scale-invariant per-batch fixed cost (PERFNOTES
  * r18 — 90 stages summing ~0.5 s of 32-way core time against ~10 s of
  * wall). The open question the stretch poses: can the per-batch
  * commit/claim/checkpoint ROUND-TRIPS be batched or elided at sf0.1
  * micro-batch sizes without touching exactly-once semantics?
  *
  * This tool answers by A/B + micro-bench, on the exact q147 shape
  * (base index save, three mtime-ordered batches, fused ingest):
  *
  *   A. STREAM path — the gate's wiring verbatim (readStream +
  *      foreachBatch + AvailableNow + checkpoint WAL).
  *   B. DIRECT path — the same three ingest() calls in a plain loop,
  *      no streaming machinery at all (no source listing, no offset /
  *      commit WAL, no genGuardedBatches sidecar).
  *   C. Claim-protocol micro-bench — claimDir+release round trips and
  *      index loads (manifest read) in isolation.
  *   D. Spark JOB COUNT of one direct ingest (listener) — the job
  *      chain the fused path runs per batch.
  *
  * If A ≈ B, the streaming checkpoint/WAL machinery is exonerated; if
  * C is milliseconds against a multi-second B, the claim/commit RPCs
  * are exonerated too — leaving D × per-job fixed latency as the
  * floor, which is Spark-scheduler-structural: the only lever would be
  * FEWER jobs per batch, and the fused ingest (r10) already collapsed
  * lookup+append into one signature pass.
  *
  * Run: sbt "runMain graft.tools.LifecycleFloor [sfDir]"
  */
object LifecycleFloor {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession
      .builder("32", "4", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = s"/tmp/graft_lifecycle_floor_${System.nanoTime()}"
    val docs = graft.core.Tables(spark, dir, "documents")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- warm-up pass (JIT/codegen; PERFNOTES cold-trial rule) + A/B ----
    // batches replicate the q147 gate: odd ids are the archived base,
    // doc_id % 8 = 0/2/4 stream in as three ordered batches
    val batches = Seq(0L, 2L, 4L).map(m => docs.where($"doc_id" % 8 === m))
    val inDir = s"$root/in"
    graft.streaming.StreamingOps.stageOrderedBatches(batches, inDir)
    val schema = spark.read.parquet(s"$inDir/b0.parquet").schema

    def streamTrial(tag: String): Double = {
      val idxDir = s"$root/idx_s_$tag"; val outDir = s"$root/out_s_$tag"
      val ckpt = s"$root/ckpt_$tag"
      graft.sources.DedupIndex.save(docs.where($"doc_id" % 2 === 1),
        "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
      timed {
        graft.streaming.StreamingOps.dedupIngest(spark, inDir, schema,
            idxDir, outDir, ckpt, "text", minMatch = 6,
            maxBucketSize = Int.MaxValue, maxFilesPerTrigger = Some(1))
          .start().awaitTermination()
      }._2
    }
    def directTrial(tag: String): Double = {
      val idxDir = s"$root/idx_d_$tag"; val outDir = s"$root/out_d_$tag"
      graft.sources.DedupIndex.save(docs.where($"doc_id" % 2 === 1),
        "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
      timed {
        batches.zipWithIndex.foldLeft(
            graft.sources.DedupIndex.load(spark, idxDir)) {
          case (idx, (b, i)) =>
            idx.ingest(b, "text", minMatch = 6,
                maxBucketSize = Int.MaxValue) { kept =>
              kept.write.mode("overwrite").parquet(s"$outDir/batch=$i")
            }
        }
      }._2
    }
    streamTrial("warm"); directTrial("warm") // discard: whole-JVM JIT
    val aSecs = (1 to 3).map(i => streamTrial(s"a$i"))
    val bSecs = (1 to 3).map(i => directTrial(s"b$i"))

    // ---- C: claim protocol + manifest-read micro-bench ----
    val scratch = s"$root/claim_scratch"
    val (_, claimTotal) = timed {
      (1 to 50).foreach { _ =>
        val c = graft.sources.GenerationLock.claimDir(scratch)
        graft.sources.GenerationLock.verify(c)
        graft.sources.GenerationLock.release(c)
      }
    }
    val loadIdx = s"$root/idx_d_b1"
    val (_, loadTotal) = timed {
      (1 to 20).foreach(_ => graft.sources.DedupIndex.load(spark, loadIdx))
    }

    // ---- D: job count of ONE direct ingest ----
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val idxDir2 = s"$root/idx_jobcount"
    graft.sources.DedupIndex.save(docs.where($"doc_id" % 2 === 1),
      "text", "doc_id", idxDir2, shingleK = 8, numHashes = 8, bands = 4)
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    jobs.set(0)
    val (_, oneIngest) = timed {
      graft.sources.DedupIndex.load(spark, idxDir2)
        .ingest(batches.head, "text", minMatch = 6,
            maxBucketSize = Int.MaxValue) { kept =>
          kept.write.mode("overwrite").parquet(s"$root/out_jobcount")
        }
    }
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)

    println(f"LIFECYCLE_FLOOR stream_min=${aSecs.min}%.2f " +
      f"stream_all=${aSecs.map(s => f"$s%.2f").mkString("/")} " +
      f"direct_min=${bSecs.min}%.2f " +
      f"direct_all=${bSecs.map(s => f"$s%.2f").mkString("/")} " +
      f"stream_overhead=${aSecs.min - bSecs.min}%.2f " +
      f"claim_verify_release_ms=${claimTotal * 1000 / 50}%.2f " +
      f"index_load_ms=${loadTotal * 1000 / 20}%.2f " +
      f"jobs_per_ingest=${jobs.get} one_ingest_sec=$oneIngest%.2f " +
      f"per_job_ms=${oneIngest * 1000 / math.max(jobs.get, 1)}%.0f")
    graft.sources.BucketFs.deleteRecursive(root)
    spark.stop()
  }
}
