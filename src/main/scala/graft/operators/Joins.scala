package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side reduction patterns for corpus-scale equality joins. */
object Joins {

  /** Inner equality join with a broadcast BLOOM pre-filter on the big
    * side: the small side's keys build a Bloom filter (one bounded
    * tree-aggregated job), and the big side drops non-matching rows AT
    * THE SCAN — before any shuffle — through the codegen'd
    * `BloomMightContainLong` probe. False positives survive the filter
    * and are removed by the exact join that follows, so the RESULT is
    * identical to a plain inner join; what changes is the exchanged
    * volume: at 100 TB, rows that can't match never leave the scan
    * stage (the manual analogue of Spark's runtime row-level filtering,
    * but explicit, tunable, and available on any plan shape).
    *
    * Requires distinct-ish key domains small enough to size the filter
    * from (`small` is counted once); fpp trades filter size vs leaked
    * rows, never correctness. */
  def bloomFilteredJoin(big: DataFrame, small: DataFrame,
                        bigKey: String, smallKey: String,
                        fpp: Double = 0.01): DataFrame = {
    val n = small.select(col(smallKey)).distinct().count()
    // Spark's stat.bloomFilter NPEs on an empty frame; an empty small
    // side means an empty join — keep the schema, kill the scan
    val pre =
      if (n == 0L) big.where(lit(false))
      else {
        val bloom = small.select(xxhash64(col(smallKey)).as("__h"))
          .stat.bloomFilter("__h", n, fpp)
        val bc = big.sparkSession.sparkContext.broadcast(bloom)
        big.where(graft.functions.BloomMightContainLong.column(
          xxhash64(col(bigKey)), bc))
      }
    pre.join(small, col(bigKey) === col(smallKey))
  }
}
