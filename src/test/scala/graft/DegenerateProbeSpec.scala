package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Degenerate-input contracts for the dedup/similarity family: empty
  * corpora, empty/whitespace-only texts, and single-row inputs must
  * flow through every operator without throwing and with the outputs
  * the semantics imply (two token-less docs ARE exact duplicates — they
  * normalize to the same empty string — so the near-dup operators pair
  * them and exact dedup groups them; an empty edge list yields an empty
  * component map on BOTH CC paths). */
class DegenerateProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("empty-text docs, empty corpora, and single rows flow through " +
       "the dedup/similarity family") {
    val mixed = Seq((1L, ""), (2L, "   "), (3L, "alpha beta gamma delta"),
      (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val empty = mixed.limit(0)
    // docs 1,2 normalize to "" (exact duplicates of each other), docs
    // 3,4 are verbatim copies: every flavor finds exactly those 2 units
    assert(Dedup.lshCandidatePairs(mixed, "text", "doc_id").count() == 2)
    assert(Dedup.simHashPairs(mixed, "text", "doc_id").count() == 2)
    assert(Dedup.exactDuplicateGroups(mixed, "text", "doc_id").count() == 2)
    assert(Dedup.lshCandidatePairs(empty, "text", "doc_id").count() == 0)
    // empty edge list: empty component map on both CC paths
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), driverEdgeLimit = 0).count() == 0)
    // a single embedding has no one to pair with
    val vecs = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "vec")
    assert(Similarity.embeddingNearDupPairs(
      vecs, "vec_id", "vec", threshold = 0.9, maxBucketSize = 10).count() == 0)
  }
}
