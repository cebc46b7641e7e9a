package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** ORC interop: round-trip fidelity and the pruned/pushed plan shape —
  * the second columnar format must keep the same Catalyst integration
  * the Parquet path relies on. */
class OrcInteropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def withOrcDataset(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("orc_spec").toString
    try {
      Seq(
        (1L, "alpha beta", "en", "web", 10L),
        (2L, "gamma", "en", "book", 5L),
        (3L, "delta eps", "de", "web", 9L),
        (4L, "zeta", "fr", "web", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").partitionBy("lang").orc(dir)
      f(dir)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("round trip: values and schema survive ORC write/read") {
    withOrcDataset { dir =>
      val back = spark.read.orc(dir)
      assert(back.columns.toSet ==
        Set("doc_id", "text", "lang", "source", "n_chars"))
      val rows = back.orderBy($"doc_id")
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq == Seq((1L, "alpha beta", "en"),
        (2L, "gamma", "en"), (3L, "delta eps", "de"), (4L, "zeta", "fr")))
    }
  }

  test("partition pruning: a lang filter prunes ORC partition dirs") {
    withOrcDataset { dir =>
      val q = spark.read.orc(dir).where($"lang" === "en")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"lang filter must reach PartitionFilters:\n$plan")
      assert(q.count() == 2)
    }
  }

  test("predicate + projection pushdown reach the ORC scan") {
    withOrcDataset { dir =>
      val q = spark.read.orc(dir).where($"n_chars" > 5L).select($"doc_id")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
        s"n_chars filter must be pushed to the ORC reader:\n$plan")
      assert(plan.contains("ReadSchema") && !plan.contains("text"),
        s"projection must prune the text column from the scan:\n$plan")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    }
  }
}
