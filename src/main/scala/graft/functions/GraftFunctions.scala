package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the engine's custom expressions, so
  * `spark.sql("... geodesic_distance(lon, lat, 12.5, 41.9) ...")` works
  * alongside the Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geodesic_distance",
      exprs => {
        require(exprs.length == 4,
          "geodesic_distance(lon, lat, lon0, lat0) expects 4 arguments")
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
        KmvSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
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
        GeodesicDistanceToPoint(exprs(0), exprs(1),
          exprs(2).eval().toString.toDouble, exprs(3).eval().toString.toDouble)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          "kmv_sketch(hash_bigint, k) expects 2 arguments")
        KmvSketchAgg(exprs(0), exprs(1).eval().toString.toInt)
      }))
  }
}
