package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** HLL register sketch: register construction vs a driver-side replica,
  * partition/merge-order independence, estimate accuracy in the raw
  * regime, and the SQL surface. */
class HllSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Driver-side replica of the md5 bucket/rho split at p=8. */
  private def bucketRho(v: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString
    val bucket = Integer.parseInt(hex.substring(0, 2), 16)
    val rh = java.lang.Long.parseLong(hex.substring(2, 12), 16)
    val rho = if (rh == 0L) 41 else 41 - (64 - java.lang.Long.numberOfLeadingZeros(rh))
    (bucket, rho)
  }

  test("registers match a driver-side replica and are partition-independent") {
    val vals = (1 to 3000).map(_.toString)
    def regs(parts: Int): Seq[Int] = {
      val (b, r) = Sketches.hllBucketRho($"v", 8)
      vals.toDF("v").repartition(parts)
        .agg(graft.functions.HllSketch.registers(b, r, 256).as("regs"))
        .collect().head.getSeq[Int](0)
    }
    val got = regs(3)
    assert(got == regs(17), "partitioning changed the registers")
    val expected = Array.fill(256)(0)
    vals.foreach { v =>
      val (b, r) = bucketRho(v)
      if (r > expected(b)) expected(b) = r
    }
    assert(got == expected.toSeq, "registers differ from the replica")
  }

  test("estimate: raw-regime error within ~3 standard errors at m=256") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"user$i")).toDF("g", "v")
    val row = Sketches.hllDistinct(df, "g", "v", m = 256).collect().head
    val est = row.getLong(row.fieldIndex("est_distinct"))
    // standard error 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(est - n) < 0.20 * n, s"estimate $est too far from $n")
  }

  test("exactness invariants: sum_scaled and n_zero are consistent") {
    val df = Seq(("g", "a"), ("g", "b"), ("g", "a")).toDF("g", "v")
    val row = Sketches.hllDistinct(df, "g", "v", m = 256).collect().head
    val nZero = row.getLong(row.fieldIndex("n_zero"))
    val sum = row.getLong(row.fieldIndex("sum_scaled"))
    // 2 distinct values touch exactly 2 registers (unless bucket-collide)
    assert(nZero >= 254 && nZero <= 255)
    // every register contributes at least 2^8 and at most 2^49
    assert(sum > 0 && sum <= 256L * (1L << 49))
    val untouched = nZero * (1L << 49)
    assert(sum >= untouched, "touched registers must shrink terms below 2^49")
  }

  test("null hygiene: null values are skipped, empty group keeps all-zero registers") {
    val (b, r) = Sketches.hllBucketRho($"v", 8)
    val regs = Seq[Option[String]](None, None).map(v => ("g", v))
      .toDF("g", "v")
      .groupBy($"g")
      .agg(graft.functions.HllSketch.registers(b, r, 256).as("regs"))
      .collect().head.getSeq[Int](1 - 1 + 1)
    assert(regs.forall(_ == 0), "null inputs must not touch registers")
  }

  test("m bound: 8192 summarizes the all-zero state without overflow; 16384 rejected") {
    val (b, r) = Sketches.hllBucketRho($"v", 8)
    // degenerate all-null group at the MAX m: the harmonic sum is
    // m·2^49 = 2^62, which must stay positive in 64-bit (at the old
    // m = 16384 bound it hit exactly 2^63 and wrapped negative)
    val row = Seq[Option[String]](None).map(v => ("g", v)).toDF("g", "v")
      .groupBy($"g")
      .agg(graft.functions.HllSketch.registers(b, r, 8192).as("regs"))
      .select(Sketches.hllSummary($"regs", 8192): _*)
      .collect().head
    assert(row.getLong(1) == 8192L * (1L << 49) && row.getLong(1) > 0,
      "all-zero harmonic sum overflowed at m = 8192")
    assert(row.getLong(2) >= 0, "estimate went negative")
    val e = intercept[IllegalArgumentException] {
      graft.functions.HllSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Literal(1L),
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 16384)
    }
    assert(e.getMessage.contains("[16, 8192]"))
  }

  test("plan shape: registers aggregate partially before the shuffle") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val plan = Sketches.hllDistinct(df.repartition(4), "g", "v", 256)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial mode below the exchange — m bytes per group cross the
    // shuffle, not one row per value
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_hll_sketch") || plan.contains("partial"),
      s"expected a partial aggregation mode in:\n$plan")
  }

  test("SQL surface: hll_sketch registered, literal m enforced") {
    graft.functions.GraftFunctions.register(spark)
    Seq("x", "y", "z").toDF("v").createOrReplaceTempView("hll_in")
    val arr = spark.sql(
      """SELECT hll_sketch(
           CAST(conv(substring(md5(v), 1, 2), 16, 10) AS BIGINT),
           CAST(2 AS BIGINT), 256) FROM hll_in""")
      .collect().head.getSeq[Int](0)
    assert(arr.length == 256 && arr.count(_ == 2) <= 3 && arr.sum >= 2)
    val err = intercept[Exception] {
      spark.sql("SELECT hll_sketch(CAST(v AS BIGINT), 1L, length(v)) FROM hll_in")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
