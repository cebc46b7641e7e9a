package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed generalized suffix array over a document corpus, and the
  * variable-length exact-substring repeat extraction it unlocks — the
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better") exact-substring design, re-expressed as Spark jobs instead
  * of a single-node suffix automaton.
  *
  * Construction is prefix doubling (Manber–Myers; the distributed
  * formulation follows Flick & Aluru, SC'15): round k knows each
  * suffix's rank among all suffixes truncated to k chars; round 2k
  * re-ranks by the pair (rank(pos), rank(pos+k)). Suffixes never cross
  * document boundaries (rank −1 pads past the end, ordering a short
  * suffix before every extension — exactly string order), while the
  * RANKS are global across documents, so the result is the generalized
  * suffix array of the whole corpus.
  *
  * Scale shape, per round (⌈log₂ maxDocLen⌉ rounds total):
  *  - one equi-join on (doc, pos+k) — a hash shuffle of skinny
  *    (doc, pos, rank) rows, no text;
  *  - one dense-rank assignment: DISTINCT (r1, r2) keys, range-
  *    partitioned sort, `zipWithIndex` (two jobs: partition counts +
  *    offset assignment — the standard distributed rank idiom; a global
  *    Window would serialize the corpus through one task), join back.
  *  Text leaves the scan exactly twice: once as single chars feeding
  *  rank₀, once at the end to materialize `cap` chars per SA-adjacent
  *  pair for LCP. Everything in between is three longs per suffix.
  *  This is the honest distributed-SA cost — O(log maxLen) shuffles of
  *  |corpus chars| skinny rows; bound the input (a corpus slice, one
  *  shard of a date-partitioned corpus) rather than the algorithm.
  */
object SuffixArray {

  /** (doc_id, pos, rank): global suffix rank (ties = identical suffixes).
    * `pos` is 1-based. Ranks are dense, 0-based, ordered by suffix
    * string ascending.
    *
    * Round zero ranks `seedLen`-char windows by ONE string sort — a
    * string compare costs the same shuffle as a (long, long) compare and
    * settles log₂(seedLen) doubling rounds at once (seed 64 ≡ six k=1…32
    * rounds), so a 1 kB doc needs 4 numeric rounds instead of 10. No
    * distinct-ranks early exit: real corpora hold duplicated documents,
    * whose equal suffixes keep tied ranks to the very end, so the check
    * would spend a job per round to never fire; k ≥ maxDocLen is the
    * terminator. */
  def suffixRanks(docs: DataFrame, textCol: String, idCol: String,
                  seedLen: Int = 64, fullSortMaxLen: Int = 1024): DataFrame = {
    require(seedLen >= 1, s"seedLen must be >= 1, got $seedLen")
    val spark = docs.sparkSession
    val nd = docs.select(col(idCol).cast("long").as("doc_id"),
      Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__nt"))
    // empty corpus: max(length) is NULL — return the empty rank frame
    // instead of NPEing on the aggregate row
    val maxLenRow = nd.agg(max(length(col("__nt")))).head()
    if (maxLenRow.isNullAt(0))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("pos", LongType), StructField("rank", LongType))))
    val maxLen = maxLenRow.getInt(0)
    // maxLen is known BEFORE round zero, so a short-doc corpus (maxLen
    // <= fullSortMaxLen) sorts its FULL suffixes in the one string sort
    // and skips every doubling round (each round is a distinct+sort+join
    // job chain; at gate scale the rounds, not the sort keys, dominate).
    // Long docs keep the caller's capped seed so round zero never ships
    // multi-KB sort keys; pass fullSortMaxLen = 0 to force the cap
    // unconditionally (e.g. huge corpora of ~1 KB docs, where widening
    // keys 16x costs more shuffle bytes than the saved rounds).
    val effSeed = if (maxLen <= fullSortMaxLen) maxLen else seedLen
    val sfx0 = nd.where(length(col("__nt")) >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(1L), length(col("__nt")).cast("long"))).as("pos"),
        col("__nt"))
      .select(col("doc_id"), col("pos"),
        col("__nt").substr(col("pos").cast("int"), lit(effSeed)).as("__g"))

    // distributed dense rank: DISTINCT keys, range-partitioned sort,
    // zipWithIndex (the standard two-job rank idiom — a global Window
    // would serialize through one task), join back on the key
    def assignRanks(keyed: DataFrame, keyCols: Seq[String],
                    toRow: Row => Seq[Any]): DataFrame = {
      val keys = keyed.select(keyCols.map(col): _*).distinct()
        .orderBy(keyCols.map(col): _*)
      val ranked = keys.rdd.zipWithIndex.map { case (row, i) =>
        Row.fromSeq(toRow(row) :+ i)
      }
      val schema = StructType(
        keyCols.map(c => keys.schema(c)) :+ StructField("rank", LongType))
      val rankDf = spark.createDataFrame(ranked, schema)
      // AQE broadcasts the rank table while it is small; later rounds
      // hash-join — both shapes are |suffixes|-bounded skinny shuffles.
      // localCheckpoint is load-bearing: the rank table is an RDD scan,
      // and without materialization every later round would recompute
      // the whole zipWithIndex chain of every earlier round.
      keyed.join(rankDf, keyCols)
        .select(col("doc_id"), col("pos"), col("rank"))
        .localCheckpoint(true)
    }

    var r = assignRanks(sfx0, Seq("__g"), row => Seq(row.getString(0)))
    var k = effSeed
    while (k < maxLen) {
      val shifted = r.select(col("doc_id"), (col("pos") - k).as("pos"),
        col("rank").as("r2"))
      val paired = r.join(shifted, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rank").as("r1"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      r = assignRanks(paired, Seq("r1", "r2"),
        row => Seq(row.getLong(0), row.getLong(1)))
      k *= 2
    }
    r
  }

  /** Maximal repeated substrings of length ≥ `minLen` (LCP measured up
    * to `cap` chars): every maximal run of SA-adjacent suffixes whose
    * pairwise LCP is ≥ minLen is one repeat — its string is the run's
    * common prefix (the min of those LCPs), its count the run size.
    * Returns (repeat, repeat_len, n_occ), n_occ ≥ 2. Distinct runs have
    * distinct strings (equal strings prefix-share ≥ repeat_len ≥ minLen
    * and would be SA-adjacent, i.e. the same run), so rows are unique.
    *
    * The run grouping is a running-count window over GLOBALLY ordered
    * rows — but the rows are five skinny columns plus a `cap`-char head,
    * |corpus chars| of them; like exact span counting (q126) this is the
    * honest price of exact variable-length semantics. Use a bounded
    * slice (or the winnowed/fixed-window operators) when the corpus is
    * the full 100 TB. */
  def repeatsAtLeast(docs: DataFrame, textCol: String, idCol: String,
                     minLen: Int, cap: Int = 64): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    require(cap >= minLen, s"cap ($cap) must be >= minLen ($minLen)")
    val spark = docs.sparkSession
    val ranks = suffixRanks(docs, textCol, idCol)
    val ordered = ranks.orderBy("rank", "doc_id", "pos")
      .rdd.zipWithIndex.map { case (row, i) =>
        Row(row.getLong(0), row.getLong(1), i)
      }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("pos", LongType), StructField("idx", LongType)))
    val sa = spark.createDataFrame(ordered, schema)
    val nd = docs.select(col(idCol).as("doc_id"),
      Dedup.normalizedText(coalesce(col(textCol), lit(""))).as("__nt"))
    val withTxt = sa.join(nd, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("idx"),
        col("__nt").substr(col("pos").cast("int"), lit(cap)).as("__sfx"))
    val prev = withTxt.select((col("idx") + 1).as("idx"),
      col("__sfx").as("__prev"))
    // LCP with the previous SA entry, in-row over cap-char arrays:
    // first position where the zipped equality goes false (nulls from
    // length mismatch count as false), else the shorter length
    val a = split(col("__sfx"), "")
    val b = split(col("__prev"), "")
    val zipped = zip_with(a, b, (x, y) => coalesce(x === y, lit(false)))
    val fp = array_position(zipped, lit(false))
    val lcp = when(col("__prev").isNull, lit(0L))
      .otherwise(when(fp > 0, fp - 1)
        .otherwise(least(length(col("__sfx")), length(col("__prev"))).cast("long")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rows = withTxt.join(prev, Seq("idx"), "left")
      .withColumn("__lcp", lcp)
      .withColumn("__rid",
        sum(when(col("__lcp") < minLen, 1L).otherwise(0L)).over(w))
    rows.groupBy(col("__rid"))
      .agg(count(lit(1)).as("n_occ"),
        min(when(col("__lcp") >= minLen, col("__lcp"))).as("__replen"),
        min_by(col("__sfx"), col("idx")).as("__head"))
      .where(col("n_occ") >= 2)
      .select(col("__head").substr(lit(1), col("__replen").cast("int")).as("repeat"),
        col("__replen").as("repeat_len"), col("n_occ"))
  }
}
