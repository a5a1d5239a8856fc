package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Planar radius join — "all pairs within distance r" — the 2-D
  * neighbor search under spatial clustering (DBSCAN's ε-neighborhood),
  * geo proximity ("stores near a user"), and 2-D embedding-projection
  * dedup. The 1-D form of this trick is AsOf.timeProximityCount's
  * time-bucket join; here it generalizes to a grid.
  *
  * Grid-bucketed, never all-pairs: with cell size = r, any pair within
  * distance r lands in the SAME or ADJACENT cells (|Δcell| ≤ 1 on each
  * axis, since |Δx| ≤ r spans at most one cell boundary). So the right
  * side is bucketed ONCE by its cell, the left side fans out ×9 to its
  * neighborhood cells, and one equi-join on (cx, cy) + the exact
  * integer distance² filter yields every qualifying pair exactly once
  * (each right point lives in exactly one cell, and a left probe
  * visits that cell exactly once). Work scales with points × local
  * density, not points² — the property that survives 100 TB, where a
  * cross join is fatal and even a 1-D sort-merge interval join
  * degenerates under dense clusters.
  *
  * Coordinates are integers (callers scale to micro-units); distances
  * compare as exact int64 squares, so results hash bit-identically to
  * the oracle's quadratic replay. Floor-division bucketing (via pmod)
  * keeps negative coordinates correct.
  */
object Spatial {

  /** floor(c / d) for integer c of either sign (pmod is always
    * non-negative, so the adjusted numerator is an exact multiple of
    * d; the double division is exact for |c| < 2^52 — micro-unit
    * planar coordinates are far below that). */
  private def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast(LongType)

  /** All (id_a, id_b, dist2) pairs with squared euclidean distance
    * ≤ radius². Inputs carry (idCol, xCol, yCol); output keeps one row
    * per qualifying ordered pair (left id, right id) — callers doing a
    * self-join filter `id_a < id_b` for unordered semantics.
    */
  def radiusJoin(left: DataFrame, right: DataFrame,
                 idCol: String, xCol: String, yCol: String,
                 radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val r2 = radius * radius
    val rt = right.select(
      col(idCol).cast(LongType).as("id_b"),
      col(xCol).cast(LongType).as("xb"),
      col(yCol).cast(LongType).as("yb"))
      .withColumn("cx", floorDiv(col("xb"), radius))
      .withColumn("cy", floorDiv(col("yb"), radius))
    val lt = left.select(
      col(idCol).cast(LongType).as("id_a"),
      col(xCol).cast(LongType).as("xa"),
      col(yCol).cast(LongType).as("ya"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("cx", floorDiv(col("xa"), radius) + col("dx"))
      .withColumn("cy", floorDiv(col("ya"), radius) + col("dy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    lt.join(rt, Seq("cx", "cy"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= r2)
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** DBSCAN over integer planar points — density clustering composed
    * entirely from scale-safe parts: ε-neighborhoods via
    * [[radiusJoin]] (grid-bucketed, never all-pairs), core points by
    * a neighbor-count aggregate, clusters as connected components of
    * the core-core graph via [[Dedup.componentMin]] (bounded-round
    * min-label propagation, one shuffle per round), borders attached
    * to their minimum core-cluster label, the rest noise. Labels are
    * deterministic (min core id of the component) so the result
    * hashes against a SQL replay.
    *
    * Semantics: a point's neighborhood INCLUDES itself (standard
    * DBSCAN |N_ε(p)| ≥ minPts core test); a border point takes the
    * MIN label among its core neighbors (deterministic tie-break of
    * DBSCAN's order-dependent border assignment); `iters` propagation
    * rounds resolve chains up to 2^iters hops — the componentMin
    * contract.
    *
    * Output: (idCol, role ∈ core|border|noise, cluster; -1 = noise).
    */
  def dbscan(points: DataFrame, idCol: String, xCol: String,
             yCol: String, eps: Long, minPts: Int,
             iters: Int = 4): DataFrame = {
    val pts = points.select(col(idCol).cast(LongType).as("id"),
      col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
    // symmetric ordered pairs, self included (dist² = 0) —
    // materialized once; the core census, the core-edge filter, and
    // the border attach all re-read this frame
    val pairs = radiusJoin(pts, pts, "id", "x", "y", eps)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val core = pairs.groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("n_nbr"))
      .filter(col("n_nbr") >= minPts).select(col("id"))
      // read twice (edges, borders) and again per propagation round
      .localCheckpoint()
    val coreEdges = pairs.filter(col("id_a") < col("id_b"))
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(core.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comp = Dedup.componentMin(core, coreEdges, iters)
    val borders = pairs.filter(col("id_a") =!= col("id_b"))
      .join(comp.select(col("id").as("id_b"), col("comp")), Seq("id_b"))
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .groupBy(col("id_a").as("id")).agg(min(col("comp")).as("comp"))
    val coreOut = comp.select(col("id"), lit("core").as("role"),
      col("comp").as("cluster"))
    val borderOut = borders.select(col("id"), lit("border").as("role"),
      col("comp").as("cluster"))
    val noise = pts.select(col("id"))
      .join(core.unionByName(borders.select(col("id"))), Seq("id"),
        "left_anti")
      .select(col("id"), lit("noise").as("role"),
        lit(-1L).as("cluster"))
    coreOut.unionByName(borderOut).unionByName(noise)
      .select(col("id").as(idCol), col("role"), col("cluster"))
  }
}
