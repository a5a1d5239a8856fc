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
}
