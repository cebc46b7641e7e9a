package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Unigram Viterbi segmentation: vocabulary construction, DP optimality
  * vs brute-force enumeration, and partition independence. */
class UnigramSegmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat", "the cats eat the rat", "a cat ate a mat",
    "rats sat on cats", "the the the cat cat")

  private def df = corpus.toDF("text")

  test("vocabulary: every corpus char present as a single; costs positive") {
    val v = TextAnalysis.unigramVocab(df, "text")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3)))
    val singles = v.filter(_._2 == 1).map(_._1).toSet
    val chars = corpus.mkString(" ").replace(" ", "").toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(singles), s"missing singles: ${chars -- singles}")
    assert(v.forall(_._3 > 0), "all piece costs must be positive")
  }

  test("DP matches brute-force enumeration of all segmentations") {
    val vocab = TextAnalysis.unigramVocab(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def brute(w: String): (Long, Long) = {
      def go(i: Int): Seq[(Long, Long)] =
        if (i == w.length) Seq((0L, 0L))
        else (1 to 3).filter(_ <= w.length - i).flatMap { l =>
          vocab.get(w.substring(i, i + l)).toSeq.flatMap(c =>
            go(i + l).map { case (cost, n) => (cost + c, n + 1) })
        }
      go(0).minBy { case (c, n) => c * 64 + n }
    }
    val got = TextAnalysis.unigramSegmentWords(df, "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val words = corpus.flatMap(_.split(" ")).distinct
    words.foreach { w =>
      assert(got(w) == brute(w), s"word $w: ${got(w)} vs brute ${brute(w)}")
    }
    // frequent short words should segment into few pieces
    assert(got("the")._2 <= 2 && got("cat")._2 <= 2)
  }

  test("result is independent of input partitioning") {
    val a = TextAnalysis.unigramSegmentWords(df.repartition(7), "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = TextAnalysis.unigramSegmentWords(df.repartition(1), "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("length cap: words over maxWordLen are excluded everywhere") {
    val longDf = (corpus :+ "supercalifragilistic word").toDF("text")
    val got = TextAnalysis.unigramSegmentWords(longDf, "text", maxWordLen = 12)
      .collect().map(_.getString(0)).toSet
    assert(!got.contains("supercalifragilistic"))
    assert(got.contains("word"))
  }
}
