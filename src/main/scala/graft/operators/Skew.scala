package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (a single over-dense spatial
  * cell, a power-law user id, …).
  *
  * Spark's AQE already splits skewed *shuffle* partitions for joins and
  * sorts (`spark.sql.adaptive.skewJoin.enabled`); these helpers cover the
  * aggregation shapes AQE does not re-plan.
  */
object Skew {

  /** Two-phase salted aggregation: rows are spread over `saltBuckets`
    * sub-keys, partially aggregated, then merged — the hot key's partial
    * work runs on `saltBuckets` tasks instead of one.
    *
    * `partialAggs` compute the salted partials, `finalAggs` fold partials
    * per real key; both keyed by output column name. For algebraic
    * aggregates the pairs are (sum, sum), (count, sum), (min, min),
    * (max, max); averages decompose into sum+count.
    *
    * Example — skew-proof count+sum of `v` per `k`:
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 32,
    *   partialAggs = Map("cnt" -> count(lit(1)), "sum_v" -> sum($"v")),
    *   finalAggs   = Map("cnt" -> sum($"cnt"),  "sum_v" -> sum($"sum_v")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partialAggs: Map[String, Column],
                      finalAggs: Map[String, Column]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // deterministic salt from a row fingerprint (not rand(): keeps retries
    // and speculative tasks consistent)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head._2.as(partialAggs.head._1),
        partialAggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head._2.as(finalAggs.head._1),
        finalAggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  /** Salted broadcast-side replication join for a skewed fact side: the
    * small side is exploded `saltBuckets`× with a salt column, the fact
    * side gets a deterministic salt, and the join key becomes
    * (key, salt) — the hot key's rows spread over `saltBuckets` tasks.
    * Only needed when the small side can't be broadcast outright. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(saltBuckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
