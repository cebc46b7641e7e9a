package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Space-Saving heavy-hitters sketch: exact-regime equivalence with
  * groupBy-count, approximate-regime guarantees, and the SQL surface. */
class TopKSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Zipf-ish fixture: item i appears ~N/i times, shuffled
    * deterministically. */
  private def zipfStream(nItems: Int, scale: Int): Seq[String] = {
    val items = for {
      i <- 1 to nItems
      _ <- 1 to math.max(1, scale / i)
    } yield s"w$i"
    new scala.util.Random(7).shuffle(items)
  }

  test("exact regime: capacity >= distinct matches groupBy count across merges") {
    val data = zipfStream(40, 400)
    val df = data.toDF("item").repartition(7) // force the merge path
    val got = Sketches.heavyHitters(df, "item", capacity = 64, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.length == exact.size)
    got.foreach { case (item, count, err) =>
      assert(err == 0L, s"$item err")
      assert(count == exact(item), s"$item count")
    }
  }

  test("approximate regime: presence and error bounds hold") {
    val data = zipfStream(200, 2000)
    val n = data.size.toLong
    val cap = 32
    val df = data.toDF("item").repartition(5)
    val got = Sketches.heavyHitters(df, "item", capacity = cap, minCount = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.size <= cap)
    // any item with true count > N/cap must be present
    exact.filter(_._2 > n / cap).keys.foreach { item =>
      assert(got.contains(item), s"guaranteed heavy hitter $item missing")
    }
    // count - err <= true <= count for every reported item
    got.foreach { case (item, (count, err)) =>
      val t = exact(item)
      assert(t <= count, s"$item undercounted: true $t > est $count")
      assert(count - err <= t, s"$item bound violated: $count - $err > $t")
    }
  }

  test("eval order: count desc, then err asc, then item asc on full ties") {
    graft.functions.GraftFunctions.register(spark)
    // all counts tie at 2 → order must fall back to item ASC (the r6
    // descendingIterator emitted item DESC on ties)
    Seq("b", "c", "a", "a", "c", "b").toDF("s").createOrReplaceTempView("hh_tie")
    val rows = spark.sql("SELECT inline(topk_sketch(s, 8)) FROM hh_tie").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("SQL surface: topk_sketch registered, literal capacity enforced") {
    graft.functions.GraftFunctions.register(spark)
    Seq("a", "b", "a", "c", "a", "b").toDF("s").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      """SELECT inline(topk_sketch(s, 8)) FROM hh_in""").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L), ("c", 1L)))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_sketch(s, length(s)) FROM hh_in").collect()
    }
    assert(err.getMessage.contains("must be a literal"))
  }
}
