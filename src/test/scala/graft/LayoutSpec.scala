package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Similarity}

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Reference Morton interleave (driver-side): bit i of coords(j) →
    * position i*dims + j. */
  private def zRef(coords: Seq[Long], bits: Int): Long = {
    val dims = coords.size
    (for (i <- 0 until bits; j <- 0 until dims)
      yield ((coords(j) >> i) & 1L) << (i * dims + j)).sum
  }

  test("zValue matches the reference interleave on random coords (2-D and 3-D)") {
    val rng = new scala.util.Random(42)
    val pts2 = Seq.fill(200)((rng.nextInt(512).toLong, rng.nextInt(512).toLong))
    val got2 = pts2.toDF("x", "y")
      .select($"x", $"y", Layout.zValue(Seq($"x", $"y"), 9).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts2.foreach { p => assert(got2(p) == zRef(Seq(p._1, p._2), 9), s"2-D $p") }

    val pts3 = Seq.fill(100)((rng.nextInt(64).toLong, rng.nextInt(64).toLong,
      rng.nextInt(64).toLong))
    val got3 = pts3.toDF("x", "y", "w")
      .select($"x", $"y", $"w", Layout.zValue(Seq($"x", $"y", $"w"), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    pts3.foreach { p =>
      assert(got3(p) == zRef(Seq(p._1, p._2, p._3), 6), s"3-D $p")
    }
  }

  test("zValue locality: adjacent cells differ less than distant cells on average") {
    // not a strict property of Morton order, but the aggregate trend that
    // makes range-partitioning by z spatially coherent
    def z(x: Long, y: Long) = zRef(Seq(x, y), 9)
    val rng = new scala.util.Random(7)
    val near = Seq.fill(500) {
      val (x, y) = (rng.nextInt(510).toLong, rng.nextInt(510).toLong)
      math.abs(z(x, y) - z(x + 1, y))
    }
    val far = Seq.fill(500) {
      val (x, y) = (rng.nextInt(256).toLong, rng.nextInt(256).toLong)
      math.abs(z(x, y) - z(x + 255, y))
    }
    assert(near.sum < far.sum)
  }

  test("clusterByZ: z-ordered files have far tighter bounding boxes than arrival order") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 20000).map { i =>
      (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong)
    }
    val df = rows.toDF("id", "xi", "yi")
    val z = Layout.zValue(Seq($"xi", $"yi"), 9)

    def meanBoxArea(writeDf: org.apache.spark.sql.DataFrame): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
      writeDf.write.mode("overwrite").parquet(dir)
      val per = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max($"xi") - min($"xi") + 1) *
              (max($"yi") - min($"yi") + 1)).cast("double").as("area"))
        .select(avg($"area")).as[Double].head()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      per
    }

    val unsortedArea = meanBoxArea(df.repartition(8))
    val zorderedArea = meanBoxArea(Layout.clusterByZ(df, z, 8))
    // arrival-order files span the whole 512² domain; z-ordered files
    // cover ~1/8 of it — require at least a 3x tightening to stay far
    // from sampling noise
    assert(zorderedArea * 3 < unsortedArea,
      s"zordered=$zorderedArea unsorted=$unsortedArea")
  }

  test("z-order read benefit: a 2-D box predicate decodes far fewer rows") {
    // the point of the layout pass: parquet row-group/page stats prune on
    // BOTH axes when rows are Morton-ordered. Small row groups make each
    // file hold many; the box is a z-aligned 32x32 block (bits 5-8 fixed)
    // so its z range is contiguous.
    val rng = new scala.util.Random(21)
    val rows = (0 until 200000).map { i =>
      (i.toLong, rng.nextInt(512).toLong, rng.nextInt(512).toLong)
    }
    val df = rows.toDF("id", "xi", "yi")
    val z = Layout.zValue(Seq($"xi", $"yi"), 9)

    def decodedRows(writeDf: org.apache.spark.sql.DataFrame): Long = {
      val dir = java.nio.file.Files.createTempDirectory("graft_zprune").toString
      writeDf.write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024).parquet(dir)
      val q = spark.read.parquet(dir)
        .where($"xi".between(96, 127) && $"yi".between(96, 127))
      q.collect()
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      val n = scan.metrics("numOutputRows").value
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      n
    }

    val plain = decodedRows(df.repartition(4))
    val zordered = decodedRows(Layout.clusterByZ(df, z, 4))
    // arrival-order row groups all span the full 512² domain → nothing
    // prunes; z-ordered row groups cover compact z ranges → only those
    // intersecting the box decode
    assert(zordered * 5 < plain,
      s"zordered decoded $zordered rows vs plain $plain — no pruning win")
  }

  test("writeBucket(zorderWithinFiles): rows inside every file are in Morton order") {
    import graft.partitioning.{Extent, XYPartitioning}
    import graft.sources.BucketWriter
    val rng = new scala.util.Random(13)
    val rows = (0 until 4000).map { i =>
      (i.toLong, rng.nextDouble() * 10.0, rng.nextDouble() * 10.0)
    }
    val df = rows.toDF("id", "lon", "lat")
    val p = XYPartitioning(size = (5.0, 5.0), extent = Extent(0, 10, 0, 10))
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toString
    BucketWriter.writeBucket(df, dir, p, mode = "overwrite",
      zorderWithinFiles = true)

    // recompute the writer's z key per row and assert non-decreasing order
    // within each physical file
    val n = (1L << 15) - 1L
    def gi(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(lit(n), greatest(lit(0L),
        floor((c - lit(lo)) * lit((n + 1).toDouble) / lit(hi - lo)).cast("long")))
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val zs = spark.read.parquet(f).coalesce(1)
        .select(graft.operators.Layout.zValue(
          Seq(gi($"lon", 0, 10), gi($"lat", 0, 10)), 15).as("z"))
        .as[Long].collect()
      assert(zs.length > 0)
      assert(zs.zip(zs.tail).forall { case (a, b) => a <= b },
        s"file $f not z-sorted")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("writeBucket(layoutCurve=hilbert): rows inside every file follow the curve") {
    import graft.partitioning.{Extent, XYPartitioning}
    import graft.sources.BucketWriter
    val rng = new scala.util.Random(29)
    val df = (0 until 4000).map { i =>
      (i.toLong, rng.nextDouble() * 10.0, rng.nextDouble() * 10.0)
    }.toDF("id", "lon", "lat")
    val p = XYPartitioning(size = (5.0, 5.0), extent = Extent(0, 10, 0, 10))
    val dir = java.nio.file.Files.createTempDirectory("graft_hw").toString
    BucketWriter.writeBucket(df, dir, p, mode = "overwrite",
      zorderWithinFiles = true, layoutCurve = "hilbert")
    val n = (1L << 15) - 1L
    def gi(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      least(lit(n), greatest(lit(0L),
        floor((c - lit(lo)) * lit((n + 1).toDouble) / lit(hi - lo)).cast("long")))
    val files = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val hs = spark.read.parquet(f).coalesce(1)
        .select(graft.operators.Layout.hilbertValue(
          gi($"lon", 0, 10), gi($"lat", 0, 10), 15).as("h"))
        .as[Long].collect()
      assert(hs.nonEmpty)
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"file $f not hilbert-sorted")
    }
    intercept[IllegalArgumentException] {
      BucketWriter.writeBucket(df, dir, p, mode = "overwrite",
        zorderWithinFiles = true, layoutCurve = "peano")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("hilbert: bijective, unit-step adjacent, inverse round-trips") {
    import graft.functions.Hilbert
    for (bits <- Seq(1, 2, 4, 6)) {
      val n = 1 << bits
      val seen = new Array[Boolean](n * n)
      val byD = new Array[(Long, Long)](n * n)
      for (x <- 0 until n; y <- 0 until n) {
        val d = Hilbert.index(bits, x, y)
        assert(d >= 0 && d < n.toLong * n, s"d=$d out of range bits=$bits")
        assert(!seen(d.toInt), s"collision at d=$d bits=$bits")
        seen(d.toInt) = true
        byD(d.toInt) = (x.toLong, y.toLong)
        assert(Hilbert.inverse(bits, d) == ((x.toLong, y.toLong)),
          s"inverse mismatch at ($x,$y) bits=$bits")
      }
      // THE Hilbert property (Z-order lacks it): consecutive codes are
      // always one grid step apart — no quadrant-seam jumps
      (0 until n * n - 1).foreach { d =>
        val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"non-adjacent step at d=$d bits=$bits")
      }
    }
  }

  test("hilbertValue column (codegen) matches the JVM walk row-for-row") {
    val rows = (0L until 400L).map(i => (i, i % 17, (i * 7) % 19))
      .toDF("id", "x", "y")
    val got = rows.select($"id", graft.operators.Layout.hilbertValue($"x", $"y", 5).as("h"))
      .as[(Long, Long)].collect().toMap
    (0L until 400L).foreach { i =>
      assert(got(i) == graft.functions.Hilbert.index(5, i % 17, (i * 7) % 19))
    }
  }

  test("hilbert files: range splits give tighter-or-equal bboxes than z-order") {
    // cluster the same synthetic point set by z and by hilbert into the
    // same file count; hilbert's seam-free ranges must not be worse on
    // average bbox area
    val pts = (0L until 4096L).map { i =>
      (i, (i * 2654435761L) % 64, (i * 40503L) % 64)
    }.toDF("id", "x", "y")
    def avgBoxArea(key: org.apache.spark.sql.Column): Double = {
      val files = graft.operators.Layout.clusterByZ(pts, key, 16)
        .select($"x", $"y", spark_partition_id().as("p"))
        .groupBy($"p")
        .agg((max($"x") - min($"x") + 1).as("w"), (max($"y") - min($"y") + 1).as("h"))
        .select(($"w" * $"h").cast("double").as("a"))
        .as[Double].collect()
      files.sum / files.length
    }
    val zArea = avgBoxArea(graft.operators.Layout.zValue(Seq($"x", $"y"), 6))
    val hArea = avgBoxArea(graft.operators.Layout.hilbertValue($"x", $"y", 6))
    assert(hArea <= zArea * 1.05,
      s"hilbert avg bbox area $hArea worse than z-order $zArea")
  }

  test("pqEncode: codebook rows encode to their own id in every subspace") {
    val rng = new scala.util.Random(3)
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(df, "vec_id", "embedding",
        dims = 16, m = 4, k = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(codes.size == 64)
    (0L until 8L).foreach { id =>
      assert(codes(id) == Seq(id, id, id, id), s"codebook row $id")
    }
    codes.values.foreach(c => assert(c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("ivfPqTopK: ranks are contiguous from 1 and candidates share the query's cell") {
    val rng = new scala.util.Random(9)
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val res = Similarity.ivfPqTopK(df.where($"vec_id" < 4), df, "vec_id",
        "embedding", dims = 16, m = 4, k = 8, nList = 4, topK = 3)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(res.nonEmpty)
    res.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length),
        s"query $q ranks not contiguous")
      // within a query, ADC distances are non-decreasing with rank
      val byRank = rows.sortBy(_._2).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      // one cell per query: the probe set
      assert(rows.map(_._4).distinct.length == 1)
    }
    // a query that is itself a centroid sits in its own cell
    val cellsOfQueries = res.filter(r => r._1 < 4).map(r => r._1 -> r._4).toMap
    cellsOfQueries.foreach { case (q, cell) => assert(cell == q) }

    // widening the probe set can only improve (or keep) the distance at
    // each rank — the recall knob must be monotone
    val res2 = Similarity.ivfPqTopK(df.where($"vec_id" < 4), df, "vec_id",
        "embedding", dims = 16, m = 4, k = 8, nList = 4, topK = 3, nProbe = 2)
      .as[(Long, Int, Long, Long, Double)].collect()
    val d1 = res.map(r => (r._1, r._2) -> r._5).toMap
    res2.foreach { case (q, rk, _, _, d) =>
      d1.get((q, rk)).foreach(base => assert(d <= base, s"query $q rank $rk"))
    }

    // residual encoding: same structural invariants, and a codebook row's
    // ADC distance to itself-as-centroid candidates stays non-negative
    val resR = Similarity.ivfPqTopK(df.where($"vec_id" < 4), df, "vec_id",
        "embedding", dims = 16, m = 4, k = 8, nList = 4, topK = 3,
        residual = true)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(resR.nonEmpty)
    resR.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
      val byRank = rows.sortBy(_._2).map(_._5)
      assert(byRank.forall(_ >= 0.0))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("pqEncode(trainUpdates): codes stay in range and training moves assignments") {
    val rng = new scala.util.Random(17)
    val vecs = (0 until 256).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    def codesOf(updates: Int) =
      Similarity.pqEncode(df, "vec_id", "embedding", dims = 16, m = 4, k = 8,
          trainUpdates = updates)
        .as[(Long, Seq[Long])].collect().toMap
    val untrained = codesOf(0)
    val trained = codesOf(1)
    assert(trained.size == 256)
    trained.values.foreach(c =>
      assert(c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // a mean update on 256 random vectors must re-assign SOMETHING
    assert(vecs.exists { case (id, _) => trained(id) != untrained(id) })
  }

  test("pqAdcTopK: over a corpus of codebook rows, ADC equals exact distance") {
    // when every corpus vector IS a centroid, quantization error is zero:
    // ADC top-k must equal brute-force quantized squared-L2 top-k
    val rng = new scala.util.Random(5)
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val adc = Similarity.pqAdcTopK(df, df, "vec_id", "embedding",
        dims = 16, m = 4, k = 8, topK = 2)
      .select($"query_id", $"rk", $"neighbor_id", $"adc_d2")
      .as[(Long, Int, Long, Double)].collect()
      .map { case (q, rk, n, d) => (q, rk) -> ((n, d)) }.toMap

    def quant(v: Array[Float]) = v.map(x => math.floor(x * 1000.0))
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val qv = vecs.map { case (id, v) => id -> quant(v) }.toMap
    vecs.foreach { case (q, _) =>
      val expect = vecs.filter(_._1 != q)
        .map { case (n, _) => (n, d2(qv(q), qv(n))) }
        .sortBy { case (n, d) => (d, n) }.take(2)
      expect.zipWithIndex.foreach { case ((n, d), i) =>
        val (gotN, gotD) = adc((q, i + 1))
        assert(gotN == n && gotD == d, s"query $q rank ${i + 1}")
      }
    }
  }
}
