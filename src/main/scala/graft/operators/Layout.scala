package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Why it matters at 100 TB: parquet min/max stats prune a scan only when
  * a file's value range is narrow on the filtered column. Sorting on
  * (x, y) makes x-ranges tight but leaves y spanning the whole domain
  * inside each file; interleaving the bits of both indices into one sort
  * key gives every file a tight range on BOTH axes, so 2-D predicates
  * (extent queries, point-radius pre-filters) prune on either column.
  * This is the standard lakehouse OPTIMIZE/Z-ORDER layout pass expressed
  * as plain columns — Catalyst sees an ordinary range repartition + sort,
  * and the z computation is codegen'd shift/and/or builtins.
  *
  * Reference anchor: the reference buckets rows into spatial directories
  * (/root/reference/satbucket/partitioning.py) but leaves row order
  * arbitrary inside a partition's files; this is the beyond-reference
  * layout step for stats-based pruning INSIDE large cells.
  */
object Layout {

  /** Morton/Z-value of non-negative integer coordinate columns: bit i of
    * cols(j) lands at output position i*cols.size + j (cols(0) owns the
    * least-significant interleaved bit). `bits` per axis; bits*cols.size
    * must fit a long sign-free (<= 63). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      "need >= 1 column and 1..63 total interleaved bits")
    val dims = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Clamped floor binning of a continuous coordinate onto the 2^bits
    * grid [[zValue]] interleaves: floor((c - lo) · 2^bits / (hi - lo)),
    * clamped to [0, 2^bits - 1]. One definition so the clamp semantics
    * can't drift between call sites. */
  def gridIdx(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && hi > lo, "need bits >= 1 and hi > lo")
    val n = (1L << bits) - 1L
    least(lit(n), greatest(lit(0L),
      floor((c - lit(lo)) * lit((n + 1).toDouble) / lit(hi - lo)).cast("long")))
  }

  /** Hilbert curve index of two non-negative integer coordinates on the
    * 2^bits grid — the locality-tighter alternative to [[zValue]]:
    * consecutive Hilbert codes are ALWAYS grid-adjacent (unit Manhattan
    * step; Z-order jumps across quadrant seams), so a range split of the
    * key never glues together two far-apart regions — file bounding
    * boxes come out tighter for the same [[clusterByZ]] pass. The key is
    * a codegen'd native expression ([[graft.functions.HilbertIndex]]);
    * the iterative reflect/swap walk cannot be an expression tree (its
    * size would double per level). Trade-off vs zValue: ~bits loop
    * iterations per row instead of pure shift/or, and no cheap N-column
    * generalization — use zValue beyond 2 dimensions. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    graft.functions.HilbertIndex.column(x, y, bits)

  /** Range-partition into `numFiles` output tasks by z-value and sort
    * rows within each: one shuffle, and every written file covers a
    * compact z-range — a tight bounding box on every interleaved axis.
    * Boundary sampling is Spark's range partitioner (statistical, not
    * gated); the z key itself is deterministic. The key stays a bare
    * expression — no temp column that could collide with caller columns. */
  def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
