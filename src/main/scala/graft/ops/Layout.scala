package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys: multi-dimensional clustering for file skipping.
  *
  * A 100 TB table range-partitioned and sorted by ONE column prunes
  * scans on that column only; queries filtering a second dimension
  * read everything. Interleaving the bits of two (or more) dimensions
  * into a single Morton (Z-order) key and `repartitionByRange`-ing +
  * sorting by it gives every file a small bounding box in BOTH
  * dimensions, so min/max file statistics prune scans on either —
  * the layout primitive behind Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order rewrite. The key is a pure per-row integer
  * expression (shifts and masks — whole-stage codegen, no shuffle of
  * its own); the clustering cost is the one range repartition a
  * maintenance rewrite pays anyway.
  */
object Layout {

  /** The Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Pure integer shifts/masks — an oracle
    * reproduces it verbatim, and codegen keeps it in the scan stage.
    */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (DuckDB-compatible), for
    * oracle parity with [[mortonKey]].
    */
  def mortonKeySql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Hilbert-curve index of (x, y) over a 2^bits × 2^bits grid — the
    * stronger locality sibling of [[mortonKey]]: consecutive Hilbert
    * indices are always grid-adjacent (Morton jumps at power-of-two
    * seams), so equal-size file buckets get tighter bounding boxes —
    * measurably better min/max skipping on both dimensions; it is the
    * curve Databricks moved to for liquid clustering. Standard xy2d
    * bit descent: at each level the quadrant bit pair orients the
    * remaining sub-curve (conditional reflect + transpose), which
    * makes the transform inherently sequential in the level index —
    * so it runs as the fused codegen kernel
    * [[graft.functions.HilbertIndex]]: composing it from Column
    * arithmetic would re-reference each level's (x, y) ~5×, and one
    * analyzer transform destroys the sharing, sending the
    * canonicalization walk ~5^bits (heap-exhausting at bits = 8).
    */
  def hilbertKey(xc: Column, yc: Column, bits: Int = 8): Column =
    graft.functions.GraftFunctions.hilbertIndex(
      xc.cast("long"), yc.cast("long"), bits)

  /** The same descent as a chain of SQL CTE levels (the rotation
    * state forces sequencing; chained CTEs keep the SQL linear where
    * a single nested expression would grow ~2^bits). Returns the CTE
    * list to splice after a source CTE exposing `x`/`y`, and the
    * final level's accumulated-index column name.
    *
    * `withHilbertSqlLevels("p", 8)` →
    * (Seq("h7 AS (SELECT *, ... FROM p)", ..., "h0 AS (...)"),
    *  "hd0", "h0").
    */
  def hilbertSqlLevels(srcCte: String, bits: Int = 8)
      : (Seq[String], String, String) = {
    require(bits >= 1 && bits <= 10, "bits in [1, 10]")
    val levels = ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val (px, py, pd, prev) =
        if (i == bits - 1) ("x", "y", "CAST(0 AS BIGINT)", srcCte)
        else (s"hx${i + 1}", s"hy${i + 1}", s"hd${i + 1}", s"h${i + 1}")
      s"""h$i AS (SELECT *,
         |  $pd + $s * $s *
         |    xor(3 * (CASE WHEN ($px & $s) > 0 THEN 1 ELSE 0 END),
         |        CASE WHEN ($py & $s) > 0 THEN 1 ELSE 0 END) AS hd$i,
         |  CASE WHEN ($py & $s) = 0 THEN
         |    CASE WHEN ($px & $s) > 0 THEN ${s - 1} - $py ELSE $py END
         |  ELSE $px END AS hx$i,
         |  CASE WHEN ($py & $s) = 0 THEN
         |    CASE WHEN ($px & $s) > 0 THEN ${s - 1} - $px ELSE $px END
         |  ELSE $py END AS hy$i
         |FROM $prev)""".stripMargin
    }
    (levels, "hd0", "h0")
  }
}
