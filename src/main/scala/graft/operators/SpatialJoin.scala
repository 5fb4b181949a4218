package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial join as a grid-cell equi-join — the distributed re-expression
  * of the reference's `SpatialJoinNode`/`SpatialJoinOperator`
  * (`presto-main/.../operator/SpatialIndexBuilderOperator.java` builds an
  * in-memory R-tree per driver; a single shared index does not exist on a
  * 1000-executor cluster).
  *
  * `withinRadius` snaps every point to a square grid of cell size =
  * radius. Any pair within the radius is then guaranteed to sit in the
  * same or an adjacent cell (3×3 neighborhood), so candidate generation is
  * a plain equi-join on cell id — shuffle-partitioned, broadcastable when
  * one side is small, never a cross product — followed by the exact
  * distance predicate. This is the same bucket-then-verify shape as the
  * MinHash/LSH dedup operators and scales the same way: candidates grow
  * with local density, not corpus size². Skew caveat: a pathologically hot
  * cell (all points in one place) concentrates one join key; the standard
  * fixes (salt the hot cell, or shrink the cell size) apply — at uniform
  * density candidates per cell stay O(points-per-cell²) and bounded.
  *
  * Only the probe side is replicated 9× (cheap column-only explode before
  * the shuffle); the build side is keyed by its own single cell.
  */
object SpatialJoin {

  private def cellId(x: Column, y: Column, cell: Double): (Column, Column) =
    (floor(x / cell).cast("long"), floor(y / cell).cast("long"))

  /** All pairs (left, right) with planar distance <= radius. Inputs carry
    * point columns `xCol`/`yCol` (doubles); output = left columns +
    * right columns (caller prefixes/renames to avoid collisions) +
    * `dist`. */
  def withinRadius(left: DataFrame, right: DataFrame,
                   xCol: String, yCol: String, radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val (lcx, lcy) = cellId(left(xCol), left(yCol), radius)
    // probe side: explode to the 3x3 neighborhood so the equi-join sees
    // every cell a within-radius partner could occupy
    val probes = left
      .withColumn("__cx0", lcx).withColumn("__cy0", lcy)
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__cx", col("__cx0") + col("__dx"))
      .withColumn("__cy", col("__cy0") + col("__dy"))
      .drop("__cx0", "__cy0", "__dx", "__dy")
    val rightRenamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val (rcx, rcy) =
      cellId(rightRenamed(s"r_$xCol"), rightRenamed(s"r_$yCol"), radius)
    val builds = rightRenamed
      .withColumn("__cx", rcx).withColumn("__cy", rcy)
    val dx = col(xCol) - col(s"r_$xCol")
    val dy = col(yCol) - col(s"r_$yCol")
    probes.join(builds, Seq("__cx", "__cy"))
      .withColumn("dist", sqrt(dx * dx + dy * dy))
      .filter(col("dist") <= radius)
      .drop("__cx", "__cy")
  }

  /** Point-in-convex-polygon as a chain of edge sign tests: the point is
    * inside a counter-clockwise polygon iff every edge's cross product
    * with it is >= 0. Compiles to pure builtin arithmetic (codegen'd, no
    * UDF) — the composition path for ST_Contains on the convex shapes
    * that cover the overwhelming share of analytic geofence queries
    * (reference: GeoFunctions.java ST_Contains over the full Esri model).
    */
  def containsConvex(vertices: Seq[(Double, Double)],
                     x: Column, y: Column): Column = {
    require(vertices.size >= 3, "polygon needs at least 3 vertices")
    vertices.indices.map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % vertices.size)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0
    }.reduce(_ && _)
  }

  /** The same sign-test chain as ANSI SQL, for the DuckDB oracle. */
  def containsConvexSql(vertices: Seq[(Double, Double)],
                        x: String, y: String): String =
    vertices.indices.map { i =>
      val (x1, y1) = vertices(i)
      val (x2, y2) = vertices((i + 1) % vertices.size)
      s"(($x2 - $x1) * ($y - $y1) - ($y2 - $y1) * ($x - $x1)) >= 0"
    }.mkString("(", " AND ", ")")
}
