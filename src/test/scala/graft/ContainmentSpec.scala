package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Shingle containment: subset duplication that Jaccard dilutes. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("a short doc quoted inside a long one has containment 1 but low jaccard") {
    val quote = "the quick brown fox jumps over the lazy dog"
    val long = s"unrelated preamble text goes here $quote and then a very long tail " +
      "of additional content continues for quite a while with many words"
    val docs = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val r = Dedup.containmentCounts(docs, pairs, "text", "doc_id", shingleK = 8)
      .collect().head
    val (inter, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(inter == na, s"every shingle of the quote must appear in the long doc")
    assert(nb > 2 * na, "fixture must be asymmetric")
    // symmetric jaccard would be inter/(na+nb-inter) << 1
    assert(inter.toDouble / (na + nb - inter) < 0.5)
  }

  test("distinct-set semantics: repeated shingles count once") {
    val docs = Seq((1L, "ababab"), (2L, "ab")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val r = Dedup.containmentCounts(docs, pairs, "text", "doc_id", shingleK = 2)
      .collect().head
    // doc1 distinct 2-shingles: ab, ba -> n_a = 2; doc2: ab -> n_b = 1
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 2L, 1L)))
  }

  test("disjoint docs: containment 0 both ways") {
    val docs = Seq((1L, "aaaa"), (2L, "bbbb")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val r = Dedup.containmentCounts(docs, pairs, "text", "doc_id", shingleK = 3)
      .collect().head
    assert(r.getLong(2) == 0L)
  }
}
