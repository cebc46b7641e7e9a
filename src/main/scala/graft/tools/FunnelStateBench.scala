package graft.tools

/** Driver-local micro-bench for the streaming funnel's per-key state
  * maintenance: the round-13 path re-ran the full four-prune compaction
  * over (kept ++ new) every micro-batch — O(buffer·log buffer) per
  * update on a hot key — while the merge path keeps the buffer
  * pre-compacted and folds each batch in with one sorted merge per step.
  * Pure JVM (no Spark session): this is exactly the per-group work a
  * state-store update performs inside flatMapGroupsWithState.
  *
  * Run: sbt "runMain graft.tools.FunnelStateBench [events] [batches]".
  * Prints total ms for the chained old path vs the merge path plus the
  * final-buffer equality check (both under a non-binding cap).
  */
object FunnelStateBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val batches = args.lift(1).map(_.toInt).getOrElse(40)
    val rnd = new scala.util.Random(7)
    // µs-resolution event times: few exact duplicates, so the kept
    // buffer actually grows toward n (the adversarial hot-key shape the
    // cap exists for; second-resolution times dedup to a tiny buffer
    // where both paths are equally cheap)
    val evs = (1 to n).map(_ =>
      (rnd.nextInt(5) - 1, rnd.nextLong(7200L * 1000000L)))
    val chunks = evs.grouped(math.max(1, n / batches)).toSeq
    val (nSteps, within, cap) = (3, 3600000000L, 1000000)

    def timed[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1000000L)
    }

    // old path: from-scratch compaction of (kept ++ new) per batch
    val (oldBuf, oldMs) = timed {
      var s = Seq.empty[Int]; var t = Seq.empty[Long]
      chunks.foreach { c =>
        val r = graft.streaming.StreamingOps.compactFunnelBuf(
          s ++ c.map(_._1), t ++ c.map(_._2), nSteps, within, cap)
        s = r._1; t = r._2
      }
      s.zip(t)
    }
    // merge path: pre-compacted state, one sorted merge per batch
    val (newBuf, newMs) = timed {
      var s = Seq.empty[Int]; var t = Seq.empty[Long]
      chunks.foreach { c =>
        val r = graft.streaming.StreamingOps.mergeFunnelBuf(
          s, t, c.map(_._1), c.map(_._2), nSteps, within, cap)
        s = r._1; t = r._2
      }
      s.zip(t)
    }
    val same = oldBuf.sorted == newBuf.sorted
    println(s"events=$n batches=$batches buffer=${newBuf.size} " +
      s"compact_ms=$oldMs merge_ms=$newMs equal=$same")
    if (!same) sys.exit(1)
  }
}
