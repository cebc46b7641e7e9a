package graft.queries

/** Shared SQL fragments that transcribe the engine's Column formulas into
  * DuckDB SQL with identical double arithmetic (see QueryModule notes). */
object OracleSql {

  /** Mirror of Binning.binIndex (pd.cut right-closed + include_lowest +
    * null out-of-bounds). */
  def binIdx(v: String, vmin: Double, size: Double, vmax: Double, n: Int): String = {
    val k0 = s"LEAST(GREATEST(CAST(CEIL(($v - $vmin)/$size) AS BIGINT) - 1, 0), ${n - 1})"
    s"""(CASE WHEN $v IS NULL OR isnan($v) OR $v < $vmin OR $v > $vmax THEN NULL
       |  WHEN $k0 > 0 AND $v <= $vmin + $k0*$size THEN $k0 - 1
       |  WHEN $k0 < ${n - 1} AND $v > $vmin + ($k0+1)*$size THEN $k0 + 1
       |  ELSE $k0 END)""".stripMargin
  }

  /** Mirror of Binning.centroidOfIndex for uniform bins (configs used in
    * the gate queries have no short last bin). */
  def centroid(k: String, vmin: Double, size: Double): String =
    s"(($vmin + ($k)*$size) + ($vmin + (($k)+1)*$size))/2"

  /** Mirror of rintCol (round-half-even in float space). */
  def rint(x: String): String =
    s"""(CASE WHEN ($x + 0.5) = FLOOR($x + 0.5) AND FLOOR($x + 0.5) % 2 <> 0
       | THEN FLOOR($x + 0.5) - 1 ELSE FLOOR($x + 0.5) END)""".stripMargin

  /** Mirror of XYPartitioning label formatting for decimals > 0. */
  def label(c: String, decimals: Int): String = {
    val scale = math.pow(10.0, decimals)
    s"CAST(${rint(s"($c)*$scale")}/$scale AS VARCHAR)"
  }

  /** label of the bin containing value v on one axis. */
  def axisLabel(v: String, vmin: Double, size: Double, vmax: Double, n: Int,
                decimals: Int): String =
    label(centroid(binIdx(v, vmin, size, vmax, n), vmin, size), decimals)

  /** deterministic synthetic lon/lat attached to events rows. */
  val synthEvents: String =
    """SELECT *,
      |  CAST(event_id % 3600 AS DOUBLE)/10.0 - 180.0 AS lon,
      |  CAST((event_id*7) % 1800 AS DOUBLE)/10.0 - 90.0 AS lat
      |FROM events""".stripMargin
}
