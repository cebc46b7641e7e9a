package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Bloom-prefiltered join: result ≡ plain join, and the prefilter
  * actually kills rows before the shuffle. */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("result is identical to a plain inner join (FPs removed by the join)") {
    val big = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
    val small = Seq(3L, 97L, 500L, 4999L).toDF("sk")
    val got = Joins.bloomFilteredJoin(big, small, "k", "sk")
      .select("k", "v", "sk").as[(Long, Long, Long)].collect().toSet
    val plain = big.join(small, $"k" === $"sk")
      .select("k", "v", "sk").as[(Long, Long, Long)].collect().toSet
    assert(got == plain && got.size == 4)
  }

  test("the Bloom prefilter prunes the big side before the join") {
    val big = (1L to 20000L).toDF("k")
    val small = Seq(42L, 137L).toDF("sk")
    val n = math.max(small.select("sk").distinct().count(), 1L)
    val bloom = small.select(org.apache.spark.sql.functions.xxhash64($"sk").as("__h"))
      .stat.bloomFilter("__h", n, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val kept = big.where(graft.functions.BloomMightContainLong.column(
      org.apache.spark.sql.functions.xxhash64($"k"), bc)).count()
    // 2 true keys + ~1% FP of 20k ≈ a few hundred — far below 20k
    assert(kept >= 2 && kept < 2000L, s"prefilter kept $kept of 20000")
  }

  test("empty small side joins to an empty result without failing") {
    val big = (1L to 100L).toDF("k")
    val small = Seq.empty[Long].toDF("sk")
    assert(Joins.bloomFilteredJoin(big, small, "k", "sk").count() == 0L)
  }
}
