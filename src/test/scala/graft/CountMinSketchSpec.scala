package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Count-Min sketch: matrix vs a driver-side replica, one-sided error
  * guarantee, partition/merge-order independence, and the SQL surface. */
class CountMinSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  /** Driver-side replica of the md5 bucket convention. */
  private def buckets(item: String): Seq[Int] = (0 until D).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$item".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 10), 16) % W).toInt
  }

  test("matrix matches a driver-side replica and is partition-independent") {
    val items = (1 to 2000).map(i => s"tok${i % 97}")
    def matrix(parts: Int): Seq[Long] =
      Sketches.cmsMatrix(items.toDF("t").repartition(parts), "t", D, W)
        .collect().head.getSeq[Long](0)
    val got = matrix(3)
    assert(got == matrix(13), "partitioning changed the matrix")
    val expected = Array.fill(D * W)(0L)
    items.foreach { t =>
      buckets(t).zipWithIndex.foreach { case (b, i) => expected(i * W + b) += 1L }
    }
    assert(got == expected.toSeq, "matrix differs from the replica")
    assert(got.sum == items.size.toLong * D, "total mass must be n·d")
  }

  test("point estimates are one-sided: est >= exact for every item") {
    val items = (1 to 5000).map(i => s"w${i % 211}")
    val df = items.toDF("t")
    val m = Sketches.cmsMatrix(df, "t", D, W)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = df.distinct().crossJoin(m)
      .select($"t", Sketches.cmsEstimate($"cms", $"t", D, W).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t: est ${est(t)} below exact $c")
    }
    // 211 distinct over a 4×64 matrix: collisions certain, but the min
    // over 4 rows keeps median inflation modest — sanity-bound it
    val inflation = exact.keys.map(t => est(t) - exact(t)).toSeq.sorted
    assert(inflation(inflation.size / 2) <= 5000L / W * 4,
      "median inflation out of the e/w regime")
  }

  test("null hygiene: null items add nothing") {
    val df = Seq(Some("a"), None, Some("a")).toDF("t")
    val m = Sketches.cmsMatrix(df, "t", D, W).collect().head.getSeq[Long](0)
    assert(m.sum == 2L * D, "null row must not count")
  }

  test("SQL surface: cms_sketch registered, literal depth/width enforced") {
    graft.functions.GraftFunctions.register(spark)
    Seq("x", "y", "x").toDF("t").createOrReplaceTempView("cms_in")
    val arr = spark.sql(
      s"""SELECT cms_sketch(array(
            CAST(conv(substring(md5('0:' || t), 1, 10), 16, 10) AS BIGINT) % $W,
            CAST(conv(substring(md5('1:' || t), 1, 10), 16, 10) AS BIGINT) % $W),
            2, $W) FROM cms_in""")
      .collect().head.getSeq[Long](0)
    assert(arr.length == 2 * W && arr.sum == 6L)
    val err = intercept[Exception] {
      spark.sql(s"SELECT cms_sketch(array(1L), length(t), $W) FROM cms_in").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
