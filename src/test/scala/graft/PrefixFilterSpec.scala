package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Prefix-filter set-similarity join: EXACT recall vs brute force, the
  * threshold boundary, and the codegen'd sorted-merge intersect kernel. */
class PrefixFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),   // 5/7 with doc 1
    (3L, "alpha beta gamma delta epsilon zeta"),  // identical to doc 1
    (4L, "one two three four five six"),
    (5L, "one two three four five seven"),        // 5/7 with doc 4
    (6L, "totally different words here now folks"))

  private def brute(tNum: Int, tDen: Int): Set[(Long, Long)] = {
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) intersect sets(b)).size
      u = (sets(a) union sets(b)).size
      if tDen * i >= tNum * u
    } yield (a, b)).toSet
  }

  test("word-token join: exact recall equals brute force at several thresholds") {
    // t = 1/1 is the exact-duplicate boundary: prefix length collapses to
    // p = n − ceil(n) + 1 = 1 (only the single rarest token indexes), so
    // any prefix-selection off-by-one loses recall exactly here
    for ((tn, td) <- Seq((1, 2), (2, 3), (9, 10), (1, 1))) {
      val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", tn, td)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == brute(tn, td), s"mismatch at t=$tn/$td")
    }
  }

  test("token-less docs never pair: Jaccard 0/0 is undefined, not a match") {
    // a whitespace-only (or empty) doc has an empty token set; a naive
    // threshold test td*|∩| >= tn*|∪| reads 0 >= 0 = true and would pair
    // two empty docs. The engine's contract: docs with no tokens never
    // enter the index and never pair — on either join flavor.
    val d = Seq((1L, "   "), (2L, ""), (3L, "alpha beta"))
    assert(Dedup.prefixFilterPairs(d.toDF("doc_id", "text"),
      "text", "doc_id", 1, 2).count() == 0)
    assert(Dedup.prefixFilterJoin(d.toDF("doc_id", "text"),
      d.toDF("doc_id", "text"), "text", "doc_id", 1, 1)
      .select("a", "b").as[(Long, Long)].collect().toSet ==
      Set((3L, 3L)), "only the non-empty doc may pair with itself")
  }

  test("threshold boundary: jaccard exactly t is included (>=)") {
    // docs 1,2: |∩|=5, |∪|=7 → jaccard 5/7 exactly
    val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", 5, 7)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
  }

  test("shingle mode discriminates reordered docs that share all words") {
    val d = Seq((1L, "aaa bbb ccc ddd"), (2L, "ddd ccc bbb aaa"))
    val words = Dedup.prefixFilterPairs(d.toDF("doc_id", "text"),
      "text", "doc_id", 9, 10, shingleK = 0).count()
    val shing = Dedup.prefixFilterPairs(d.toDF("doc_id", "text"),
      "text", "doc_id", 9, 10, shingleK = 6).count()
    assert(words == 1L, "same word set -> word-token join pairs them")
    assert(shing == 0L, "different order -> shingle join keeps them apart")
  }


  test("R-S join: exact cross-corpus recall equals brute force, self-pairs excluded") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'p').map(_.toString)
    val corpus = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(8)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val sets = corpus.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val leftIds = corpus.map(_._1).filter(_ % 3 == 0).toSet
    val left = corpus.filter(c => leftIds(c._1))
    val right = corpus.filterNot(c => leftIds(c._1))
    for ((tn, td) <- Seq((1, 2), (2, 3))) {
      val expect = (for {
        a <- left.map(_._1); b <- right.map(_._1)
        i = (sets(a) intersect sets(b)).size
        u = (sets(a) union sets(b)).size
        if td * i >= tn * u
      } yield (a, b)).toSet
      val got = Dedup.prefixFilterJoin(left.toDF("doc_id", "text"),
          right.toDF("doc_id", "text"), "text", "doc_id", tn, td)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == expect, s"t=$tn/$td")
    }
    // overlapping ids across sides: a names the LEFT doc, b the RIGHT
    val sameDoc = Seq((1L, "alpha beta gamma"))
    val gotSame = Dedup.prefixFilterJoin(sameDoc.toDF("doc_id", "text"),
        sameDoc.toDF("doc_id", "text"), "text", "doc_id", 1, 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(gotSame == Set((1L, 1L)), "identical doc on both sides must pair")
  }

  test("randomized: prefix-filter join equals brute force over generated corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'p').map(_.toString)
    (1 to 3).foreach { trial =>
      val corpus = (1L to 40L).map { id =>
        val n = 3 + rnd.nextInt(8)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val sets = corpus.map { case (id, t) => id -> t.split(" ").toSet }.toMap
      val (tn, td) = Seq((1, 2), (2, 3), (3, 4))(trial - 1)
      val expect = (for {
        a <- sets.keys; b <- sets.keys if a < b
        i = (sets(a) intersect sets(b)).size
        u = (sets(a) union sets(b)).size
        if td * i >= tn * u
      } yield (a, b)).toSet
      val got = Dedup.prefixFilterPairs(corpus.toDF("doc_id", "text"),
          "text", "doc_id", tn, td)
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got == expect, s"trial $trial t=$tn/$td")
    }
  }

  test("topKPerLeft cap: binding keeps the k best by Jaccard (ties by b), " +
       "reports the TRUE match count loudly; non-binding is identical to uncapped") {
    // left doc 1: eight tokens; rights engineered to six distinct
    // qualifying Jaccards at t = 1/2 (1.0, .875, .778, .75, .625, .5)
    val left = Seq((1L, "a b c d e f g h"), (2L, "x y z w"))
    val right = Seq(
      (10L, "a b c d e f g h"),       // 8/8 = 1.0
      (11L, "a b c d e f g q"),       // 7/9 ≈ .778
      (12L, "a b c d e f g"),         // 7/8 = .875
      (13L, "a b c d e f"),           // 6/8 = .75
      (14L, "a b c d e"),             // 5/8 = .625
      (15L, "a b c d"),               // 4/8 = .5 (boundary, included)
      (16L, "a b c"),                 // 3/8 < .5 (excluded)
      (20L, "x y z w"))               // doc 2's single match
    def join(k: Int) = Dedup.prefixFilterJoin(left.toDF("doc_id", "text"),
      right.toDF("doc_id", "text"), "text", "doc_id", 1, 2, topKPerLeft = k)
    // BINDING: k = 3 keeps exactly the three highest-Jaccard rights for
    // doc 1, and every surviving row reports the TRUE total (6 > 3 =
    // loud truncation); doc 2's single match rides through untouched
    val capped = join(3)
      .select($"a", $"b", $"n_matches").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(capped == Seq((1L, 10L, 6L), (1L, 11L, 6L), (1L, 12L, 6L),
      (2L, 20L, 1L)), s"got $capped")
    // NON-BINDING: k = 8 ≥ the true 6 → rows equal the uncapped join
    val uncapped = Dedup.prefixFilterJoin(left.toDF("doc_id", "text"),
        right.toDF("doc_id", "text"), "text", "doc_id", 1, 2)
    assert(!uncapped.columns.contains("n_matches"),
      "uncapped schema must stay unchanged")
    val a = join(8).select("a", "b", "intersection", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val b = uncapped.select("a", "b", "intersection", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b, "non-binding cap changed the answer")
    // Jaccard-tie determinism on the SELF-join: three identical docs,
    // k = 1 → per left id the smallest right id wins
    val tri = Seq((1L, "p q r s"), (2L, "p q r s"), (3L, "p q r s"))
    val got = Dedup.prefixFilterPairs(tri.toDF("doc_id", "text"),
        "text", "doc_id", 1, 2, topKPerLeft = 1)
      .select($"a", $"b", $"n_matches").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 3L, 1L)), s"got $got")
  }

  test("SQL surface: sorted_intersect_count registered") {
    graft.functions.GraftFunctions.register(spark)
    Seq((Seq(1L, 3L, 7L), Seq(3L, 7L, 9L))).toDF("a", "b")
      .createOrReplaceTempView("sic_in")
    assert(spark.sql("SELECT sorted_intersect_count(a, b) FROM sic_in")
      .collect().head.getLong(0) == 2L)
  }

  test("sorted_intersect_count equals array_intersect size on random sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(50).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("i", "a", "b")
    val got = df.select($"i",
        graft.functions.ArrayIntersectCount.sortedIntersectCount($"a", $"b"),
        size(array_intersect($"a", $"b")).cast("long"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"row ${r.getInt(0)}")
    }
    // null propagation
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(graft.functions.ArrayIntersectCount.sortedIntersectCount($"a", $"b"))
      .collect().head
    assert(n.isNullAt(0))
  }
}
