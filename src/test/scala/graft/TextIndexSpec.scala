package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TextIndex

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixture = Seq(
    (0L, "spark table scan fast table"),
    (1L, "merge table slow"),
    (2L, "scan scan scan"),
    (3L, "nothing relevant here"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("save/load/search: manifest stats, postings pruning, ranking") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti").toString
    try {
      TextIndex.save(fixture, "text", "doc_id", dir, nBuckets = 8)
      val idx = TextIndex.load(spark, dir)
      assert(idx.nDocs == 5)
      // dl: 5 + 3 + 3 + 3 + 1 (null text → one empty token, like bm25)
      assert(idx.sumDl == 15)
      val res = idx.search(Seq("table", "scan"), topK = 10)
      // only the query terms' buckets appear in the physical scan
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("bucket"), "postings scan should carry a bucket filter")
      val got = res.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      // docs 0,1,2 contain a query term; 3 and 4 must be absent
      assert(got.keySet == Set(0L, 1L, 2L))
      // doc 0 has both terms (tf 2+1) and must rank first
      assert(got(0L) == 1)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("append: grown index equals a from-scratch build, exactly") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_ti_a").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ti_b").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", dir1,
        nBuckets = 8)
      val grown = TextIndex.load(spark, dir1)
        .append(fixture.where($"doc_id" >= 2), "text")
      TextIndex.save(fixture, "text", "doc_id", dir2, nBuckets = 8)
      val scratch = TextIndex.load(spark, dir2)
      assert(grown.nDocs == scratch.nDocs && grown.sumDl == scratch.sumDl)
      val a = grown.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val b = scratch.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(a == b)
    } finally {
      graft.sources.BucketFs.deleteRecursive(dir1)
      graft.sources.BucketFs.deleteRecursive(dir2)
    }
  }
}
