package graft.tools

/** Scale point for the round-15 funnel checkpoint re-normalization
  * (VERDICT r15 directive #3): resuming a LEGACY encounter-order
  * checkpoint (pre-merge compactFunnelBuf layout) pays a one-time
  * re-normalization per key — the old buffer is replayed as batch input
  * against an empty buffer. This tool measures that one-time cost across
  * K keys at 1× and at `factor`× (the state-store scale axis: the
  * per-key buffer is already bounded by the cap, so a 30× checkpoint is
  * 30× KEYS, not 30× deeper buffers) and reports the exponent
  * log_factor(t_N / t_1) — 1.0 is data-linear. It also times the NEXT
  * (canonical, linear-merge) batch over the same keys, the figure the
  * one-time cost amortizes into.
  *
  * Pure JVM (no Spark session) — this is exactly the per-group work a
  * state-store update performs inside flatMapGroupsWithState; the
  * surrounding micro-batch machinery is identical on both sides of the
  * comparison and scales with the same key count.
  *
  * Run: sbt "runMain graft.tools.FunnelRenormBench [keys] [factor]
  * [eventsPerKey]".
  */
object FunnelRenormBench {
  import graft.streaming.StreamingOps.{compactFunnelBuf, isCanonicalFunnelBuf,
    mergeFunnelBuf}

  private val (nSteps, within, cap) = (3, 3600000000L, 1000000)

  /** Build `k` legacy (encounter-order) per-key buffers: a genuine
    * compactFunnelBuf output per key, shuffled — the same construction
    * StreamingSpec's randomized-trial property uses. */
  private def legacyState(k: Int, eventsPerKey: Int,
                          seed: Int): Array[(Array[Int], Array[Long])] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k) {
      val hist = (1 to eventsPerKey).map(_ =>
        (rnd.nextInt(5) - 1, rnd.nextLong(7200L * 1000000L)))
      val (cs, ct) = compactFunnelBuf(
        hist.map(_._1), hist.map(_._2), nSteps, within, cap)
      val legacy = rnd.shuffle(cs.zip(ct).toVector)
      (legacy.map(_._1).toArray, legacy.map(_._2).toArray)
    }
  }

  /** One resume micro-batch over every key: re-normalize each legacy
    * buffer (empty adds — the pure one-time cost), assert canonical
    * output, return (elapsedMs, canonical state). */
  private def resumeAll(state: Array[(Array[Int], Array[Long])])
      : (Long, Array[(Seq[Int], Seq[Long])]) = {
    val t0 = System.nanoTime()
    val out = state.map { case (s, t) =>
      mergeFunnelBuf(s.toSeq, t.toSeq, Nil, Nil, nSteps, within, cap)
    }
    val ms = (System.nanoTime() - t0) / 1000000L
    out.foreach { case (s, t) =>
      require(isCanonicalFunnelBuf(s, t, nSteps), "resume not canonical")
    }
    (ms, out)
  }

  /** One steady-state micro-batch (canonical path) over every key. */
  private def nextBatch(state: Array[(Seq[Int], Seq[Long])],
                        seed: Int): Long = {
    val rnd = new scala.util.Random(seed)
    val t0 = System.nanoTime()
    state.foreach { case (s, t) =>
      val add = (1 to 8).map(_ =>
        (rnd.nextInt(5) - 1, rnd.nextLong(7200L * 1000000L)))
      mergeFunnelBuf(s, t, add.map(_._1), add.map(_._2), nSteps, within, cap)
    }
    (System.nanoTime() - t0) / 1000000L
  }

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(5000)
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val eventsPerKey = args.lift(2).map(_.toInt).getOrElse(500)

    // JIT warm-up on a throwaway set, then measure 1× and factor×
    resumeAll(legacyState(math.max(500, keys / 10), eventsPerKey, 1))

    val s1 = legacyState(keys, eventsPerKey, 11)
    val (t1, c1) = resumeAll(s1)
    val b1 = nextBatch(c1, 21)

    val sN = legacyState(keys * factor, eventsPerKey, 12)
    val (tN, cN) = resumeAll(sN)
    val bN = nextBatch(cN, 22)

    val exp = math.log(tN.toDouble / t1.toDouble) / math.log(factor.toDouble)
    val bufAvg = cN.map(_._1.size).sum.toDouble / cN.length
    println(f"keys=$keys factor=$factor events_per_key=$eventsPerKey " +
      f"avg_buf=$bufAvg%.1f renorm_ms_x1=$t1 renorm_ms_x$factor%d=$tN " +
      f"exponent=$exp%.2f next_batch_ms_x1=$b1 next_batch_ms_x$factor%d=$bN")
  }
}
