package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Perceptual dHash: decode-path equivalence with a driver-side replica,
  * pigeonhole completeness of the banded near-dup join, and dimension
  * guards. */
class DHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side replica: pixels from the closed form (no PNG decode). */
  private def replicaHash(id: Long): Seq[Long] = {
    val w = 18; val h = 16
    val px = Array.tabulate(h, w) { (y, x) =>
      var v = java.lang.Math.floorMod((id % 17) * 37 + x * 11 + y * 23, 150L).toInt
      if (id % 5 == 0 && (x == 4 || x == 5)) v += 40
      if (id % 3 == 0 && (x == 6 || x == 7) && y < 2) v += 60
      v
    }
    val bw = w / 2; val bh = h / 2
    val blk = Array.tabulate(bh, bw) { (r, c) =>
      (px(2 * r)(2 * c) + px(2 * r)(2 * c + 1) +
        px(2 * r + 1)(2 * c) + px(2 * r + 1)(2 * c + 1)) / 4
    }
    val bands = new Array[Long](4)
    for (r <- 0 until bh; c <- 0 until bw - 1)
      if (blk(r)(c + 1) > blk(r)(c)) {
        val idx = r * (bw - 1) + c
        bands(idx / 16) |= 1L << (idx % 16)
      }
    bands.toSeq
  }

  private def hashes(ids: Seq[Long]) = {
    val pngs = ids.toDF("doc_id")
      .as[Long]
      .mapPartitions(it => it.map(id =>
        (id, Multimodal.syntheticPngGrouped(id, 18, 16))))
      .toDF("doc_id", "png").withColumn("src", lit("t"))
    Multimodal.imageDHash(spark,
      Multimodal.toAssets(pngs, "doc_id", "png", "image", "src"))
  }

  test("decoded dHash equals the closed-form replica (PNG decode is lossless)") {
    val ids = (0L to 60L).toSeq
    val got = hashes(ids).collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    ids.foreach { id =>
      assert(got(id) == replicaHash(id), s"id $id hash mismatch")
    }
  }

  test("banded pairs = brute-force pairs at maxDist 3 (pigeonhole exact)") {
    val ids = (0L to 80L).toSeq
    val hs = hashes(ids)
    val got = Multimodal.dHashNearDupPairs(hs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rep = ids.map(id => id -> replicaHash(id)).toMap
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = (0 until 4).map(k =>
        java.lang.Long.bitCount(rep(a)(k) ^ rep(b)(k))).sum.toLong
      if d <= 3
    } yield (a, b, d)).toSet
    assert(got == brute, "banded join must equal brute force at dist <= 3")
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 > 0),
      "fixture must contain both exact and near dups")
  }

  test("guards: odd dimensions and maxDist > 3 are rejected") {
    val bad = Seq((1L, Multimodal.syntheticPngGrouped(1L, 17, 16)))
      .toDF("doc_id", "png").withColumn("src", lit("t"))
    val err = intercept[Exception] {
      Multimodal.imageDHash(spark,
        Multimodal.toAssets(bad, "doc_id", "png", "image", "src")).collect()
    }
    assert(err.getMessage.contains("64-bit grid"))
    val err2 = intercept[IllegalArgumentException] {
      Multimodal.dHashNearDupPairs(hashes(Seq(1L, 2L)), maxDist = 4)
    }
    assert(err2.getMessage.contains("pigeonhole"))
  }
}
