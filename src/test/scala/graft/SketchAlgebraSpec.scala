package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Sketch algebra: HLL register union / inclusion–exclusion and the CMS
  * inner-product join-size estimator. */
class SketchAlgebraSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def regsOf(vals: Seq[String]) = {
    val (b, r) = Sketches.hllBucketRho($"v", 8)
    vals.toDF("v")
      .agg(graft.functions.HllSketch.registers(b, r, 256).as("regs"))
      .collect().head.getSeq[Int](0)
  }

  test("HLL union registers equal the registers of the concatenated stream") {
    val a = (1 to 800).map(i => s"a$i")
    val b = (1 to 800).map(i => s"b$i") ++ a.take(200) // overlap
    val union = Seq(regsOf(a)).toDF("ra")
      .crossJoin(Seq(regsOf(b)).toDF("rb"))
      .select(Sketches.hllUnionRegisters($"ra", $"rb"))
      .collect().head.getSeq[Int](0)
    assert(union == regsOf(a ++ b), "elementwise max must equal one-pass build")
  }

  test("inclusion-exclusion intersection estimate lands near the truth") {
    val shared = (1 to 1000).map(i => s"s$i")
    val a = shared ++ (1 to 2000).map(i => s"a$i")
    val b = shared ++ (1 to 2000).map(i => s"b$i")
    def est(vals: Seq[String]): Long = {
      val regs = regsOf(vals)
      Seq(regs).toDF("r").select(Sketches.hllSummary($"r", 256).last)
        .collect().head.getLong(0)
    }
    val inter = est(a) + est(b) - est(a ++ b)
    // three 6.5%-error estimates of ~3k quantities; generous 3-sigma band
    assert(math.abs(inter - 1000L) < 700L, s"intersection estimate $inter")
  }

  test("CMS inner product: one-sided and near-exact for sparse key domains") {
    val va = (1 to 50).flatMap(u => Seq.fill(u % 5 + 1)(s"u$u"))
    val vb = (1 to 50).flatMap(u => Seq.fill(u % 3 + 1)(s"u$u"))
    val exact = (1 to 50).map(u => ((u % 5 + 1) * (u % 3 + 1)).toLong).sum
    val est = Sketches.cmsMatrix(va.toDF("t"), "t", 4, 512)
      .select($"cms".as("ma"))
      .crossJoin(Sketches.cmsMatrix(vb.toDF("t"), "t", 4, 512)
        .select($"cms".as("mb")))
      .select(Sketches.cmsInnerProduct($"ma", $"mb", 4, 512))
      .collect().head.getLong(0)
    assert(est >= exact, "inner product must be one-sided")
    assert(est <= exact + 200L, s"50 keys in 512 buckets: est $est vs $exact")
  }
}
