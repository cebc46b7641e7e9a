package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("... geodesic_distance(lon, lat, 12.5, 41.9) ...")` works
  * alongside the Column API. */
object GraftFunctions {

  /** Fail analysis with a clear message when a parameter that must be a
    * compile-time constant (probed via `eval()` with no input row) is a
    * non-foldable expression such as a column reference — without this the
    * bare `eval()` throws an opaque internal error. Mirrors how Spark's own
    * sketch functions (hll_sketch_agg etc.) validate literal parameters. */
  private[functions] def requireFoldable(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, param: String): Unit =
    if (!e.foldable) {
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          s"$fn: the <$param> argument must be a literal, got non-foldable expression: ${e.sql}"))
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geodesic_distance",
      exprs => {
        require(exprs.length == 4,
          "geodesic_distance(lon, lat, lon0, lat0) expects 4 arguments")
        requireFoldable(exprs(2), "geodesic_distance", "lon0")
        requireFoldable(exprs(3), "geodesic_distance", "lat0")
        val lon0 = exprs(2).eval().toString.toDouble
        val lat0 = exprs(3).eval().toString.toDouble
        GeodesicDistanceToPoint(exprs(0), exprs(1), lon0, lat0)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      exprs => {
        require(exprs.length == 2,
          "kmv_sketch(hash_bigint, k) expects 2 arguments")
        requireFoldable(exprs(1), "kmv_sketch", "k")
        KmvSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch",
      exprs => {
        require(exprs.length == 2,
          "topk_sketch(item_string, capacity) expects 2 arguments")
        requireFoldable(exprs(1), "topk_sketch", "capacity")
        TopKSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch",
      exprs => {
        require(exprs.length == 3,
          "hll_sketch(bucket_bigint, rho_bigint, m) expects 3 arguments")
        requireFoldable(exprs(2), "hll_sketch", "m")
        HllSketchAgg(exprs(0), exprs(1), exprs(2).eval().toString.toInt)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch",
      exprs => {
        require(exprs.length == 3,
          "cms_sketch(bucket_array, depth, width) expects 3 arguments")
        requireFoldable(exprs(1), "cms_sketch", "depth")
        requireFoldable(exprs(2), "cms_sketch", "width")
        CountMinSketchAgg(exprs(0), exprs(1).eval().toString.toInt,
          exprs(2).eval().toString.toInt)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => {
        require(exprs.length == 2,
          "sorted_intersect_count(sorted_array_bigint, sorted_array_bigint) expects 2 arguments")
        SortedLongIntersectCount(exprs(0), exprs(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => {
        require(exprs.length == 1, "nfc_normalize(string) expects 1 argument")
        UnicodeNormalize(exprs(0), "NFC")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unicode_normalize",
      exprs => {
        require(exprs.length == 2,
          "unicode_normalize(string, form) expects 2 arguments")
        requireFoldable(exprs(1), "unicode_normalize", "form")
        UnicodeNormalize(exprs(0), exprs(1).eval().toString)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_sketch",
      exprs => {
        require(exprs.length == 3,
          "quantile_sketch(rowkey_hash_bigint, value_double, k) expects 3 arguments")
        requireFoldable(exprs(2), "quantile_sketch", "k")
        QuantileSketchAgg(exprs(0), exprs(1), exprs(2).eval().toString.toInt)
      },
      "built-in")
  }
}

/** SparkSessionExtensions entry point: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get the engine's
  * SQL functions injected at session construction — no per-session
  * register() call. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    e.injectFunction((
      FunctionIdentifier("geodesic_distance"),
      new ExpressionInfo(classOf[GeodesicDistanceToPoint].getName, "geodesic_distance"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "geodesic_distance(lon, lat, lon0, lat0) expects 4 arguments")
        GraftFunctions.requireFoldable(exprs(2), "geodesic_distance", "lon0")
        GraftFunctions.requireFoldable(exprs(3), "geodesic_distance", "lat0")
        GeodesicDistanceToPoint(exprs(0), exprs(1),
          exprs(2).eval().toString.toDouble, exprs(3).eval().toString.toDouble)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "kmv_sketch(hash_bigint, k) expects 2 arguments")
        GraftFunctions.requireFoldable(exprs(1), "kmv_sketch", "k")
        KmvSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
      }))
    e.injectFunction((
      FunctionIdentifier("topk_sketch"),
      new ExpressionInfo(classOf[TopKSketchAgg].getName, "topk_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "topk_sketch(item_string, capacity) expects 2 arguments")
        GraftFunctions.requireFoldable(exprs(1), "topk_sketch", "capacity")
        TopKSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
      }))
    e.injectFunction((
      FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "hll_sketch(bucket_bigint, rho_bigint, m) expects 3 arguments")
        GraftFunctions.requireFoldable(exprs(2), "hll_sketch", "m")
        HllSketchAgg(exprs(0), exprs(1), exprs(2).eval().toString.toInt)
      }))
    e.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "cms_sketch(bucket_array, depth, width) expects 3 arguments")
        GraftFunctions.requireFoldable(exprs(1), "cms_sketch", "depth")
        GraftFunctions.requireFoldable(exprs(2), "cms_sketch", "width")
        CountMinSketchAgg(exprs(0), exprs(1).eval().toString.toInt,
          exprs(2).eval().toString.toInt)
      }))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "sorted_intersect_count(sorted_array_bigint, sorted_array_bigint) expects 2 arguments")
        SortedLongIntersectCount(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "quantile_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "quantile_sketch(rowkey_hash_bigint, value_double, k) expects 3 arguments")
        GraftFunctions.requireFoldable(exprs(2), "quantile_sketch", "k")
        QuantileSketchAgg(exprs(0), exprs(1), exprs(2).eval().toString.toInt)
      }))
  }
}
