package graft

import org.apache.spark.sql.functions._

import graft.functions.Registry
import graft.operators.SpatialJoin

/** Grid spatial join vs brute force, convex containment edge cases, and
  * the registry's geo scalar templates. */
class GeoSuite extends GraftSuite {

  import spark.implicits._

  private def one[T](sql: String): T =
    spark.sql(s"SELECT $sql AS v").collect()(0).getAs[T](0)

  test("withinRadius matches brute force, including cross-cell pairs") {
    // deterministic scatter in a 30x30 box; radius 4 makes pairs span
    // neighboring grid cells and includes same-cell + far-apart points
    val pts = (1 to 120).map { i =>
      (i.toLong, (i * 37 % 300) / 10.0, (i * 61 % 300) / 10.0)
    }
    val left = pts.toDF("id", "x", "y")
    val right = pts.map { case (i, x, y) => (i + 1000, x, y) }
      .toDF("id", "x", "y")
    val r = 4.0
    val grid = SpatialJoin.withinRadius(left, right, "x", "y", r)
      .select(col("id"), col("r_id")).as[(Long, Long)].collect().toSet
    val brute = for {
      (i, x1, y1) <- pts
      (j, x2, y2) <- pts
      if math.sqrt((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)) <= r
    } yield (i, j + 1000)
    assert(grid == brute.toSet)
    assert(grid.nonEmpty && grid.size < pts.size * pts.size)
  }

  test("withinRadius includes the exact-boundary pair") {
    val left = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    val right = Seq((2L, 3.0, 4.0), (3L, 3.0, 4.1)).toDF("id", "x", "y")
    val hits = SpatialJoin.withinRadius(left, right, "x", "y", 5.0)
      .select("r_id").as[Long].collect().toSet
    assert(hits == Set(2L)) // dist(1,2) = 5.0 exactly; dist(1,3) > 5
  }

  test("containsConvex: inside, outside, vertex and edge are inside") {
    val quad = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val rows = Seq(
      (5.0, 5.0, true), // interior
      (15.0, 5.0, false), // outside
      (0.0, 0.0, true), // vertex (boundary counts as contained)
      (5.0, 0.0, true), // on edge
      (-0.1, 5.0, false))
      .toDF("x", "y", "want")
      .withColumn("got", SpatialJoin.containsConvex(quad, col("x"), col("y")))
    assert(rows.filter(col("got") =!= col("want")).count() == 0)
  }

  test("registry geo scalars: accessors, WKT round-trip, distances") {
    Registry.install(spark)
    assert(one[Double]("st_x(st_point(3.5, -2.0))") == 3.5)
    assert(one[Double]("st_y(st_point(3.5, -2.0))") == -2.0)
    assert(one[String]("st_astext(st_point(1.5, 2.5))") == "POINT (1.5 2.5)")
    assert(one[Boolean](
      "st_equals(st_geometryfromtext('POINT (-3.5 7.25)'), st_point(-3.5, 7.25))"))
    assert(one[Double]("st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0))")
      == 5.0)
    // quarter of the equator: R * pi/2 with the reference's 6371.01 km
    val quarter = one[Double]("great_circle_distance(0.0, 0.0, 0.0, 90.0)")
    assert(math.abs(quarter - 6371.01 * math.Pi / 2) < 1e-6)
    assert(one[Double]("great_circle_distance(10.0, 20.0, 10.0, 20.0)") == 0.0)
  }

  test("polygon measures: area, centroid, open-path length") {
    Registry.install(spark)
    // unit square, CCW, implicit-closed
    val sq = "array(st_point(0.0,0.0), st_point(1.0,0.0), " +
      "st_point(1.0,1.0), st_point(0.0,1.0))"
    assert(one[Double](s"st_area($sq)") == 1.0)
    assert(one[Double](s"st_x(st_centroid($sq))") == 0.5)
    assert(one[Double](s"st_y(st_centroid($sq))") == 0.5)
    assert(one[Double](s"st_length($sq)") == 3.0) // 3 open-path segments
    // orientation-independent area (CW ring), 3-4-5 triangle ring
    val tri = "array(st_point(0.0,0.0), st_point(0.0,3.0), st_point(4.0,0.0))"
    assert(one[Double](s"st_area($tri)") == 6.0)
    assert(one[Double](s"st_length($tri)") == 8.0) // 3 + 5
  }

  test("spatial join plan is an equi-join (no cartesian product)") {
    val left = (1 to 50).map(i => (i.toLong, i / 2.0, i / 3.0))
      .toDF("id", "x", "y")
    val right = (1 to 50).map(i => (i.toLong, i / 2.5, i / 3.5))
      .toDF("id", "x", "y")
    val plan = SpatialJoin.withinRadius(left, right, "x", "y", 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def oneV[T: org.apache.spark.sql.Encoder](sql: String): T = {
    Registry.install(spark)
    spark.sql(s"SELECT $sql AS v").as[T].head()
  }

  test("st_intersects edge cases: T-touch, shared endpoint, degenerate") {
    def l(w: String) = s"st_linefromtext('LINESTRING ($w)')"
    // T-junction: endpoint of A lies mid-segment on B
    assert(oneV[Boolean](s"st_intersects(${l("2 0, 2 2")}, ${l("0 2, 4 2")})"))
    // V: only the shared endpoint
    assert(oneV[Boolean](s"st_intersects(${l("0 0, 1 1")}, ${l("1 1, 2 0")})"))
    // near miss by epsilon
    assert(!oneV[Boolean](
      s"st_intersects(${l("0 0, 1 1")}, ${l("1.0000001 1, 2 0")})"))
    // degenerate point-vs-point: same and different
    assert(oneV[Boolean](s"st_intersects(${l("3 3")}, ${l("3 3")})"))
    assert(!oneV[Boolean](s"st_intersects(${l("3 3")}, ${l("3 4")})"))
    // disjoint is the exact negation
    assert(oneV[Boolean](s"st_disjoint(${l("3 3")}, ${l("3 4")})"))
  }

  test("line reference ops: clamps, on-vertex, loud fraction guard") {
    def l(w: String) = s"st_linefromtext('LINESTRING ($w)')"
    // beyond the far end clamps to 1.0
    assert(oneV[Double](
      s"line_locate_point(${l("0 0, 10 0")}, st_point(99, 0))") == 1.0)
    // exactly on an interior vertex
    assert(oneV[Double](
      s"line_locate_point(${l("0 0, 2 0, 2 2")}, st_point(2, 0))") == 0.5)
    // interpolate at 0 and 1 hit the endpoints exactly
    assert(oneV[Double](
      s"line_interpolate_point(${l("1 1, 9 1")}, 0.0D).x") == 1.0)
    assert(oneV[Double](
      s"line_interpolate_point(${l("1 1, 9 1")}, 1.0D).x") == 9.0)
    val e = intercept[Exception] {
      oneV[Double](s"line_interpolate_point(${l("0 0, 1 0")}, 1.5D).x")
    }
    assert(e.getMessage.contains("Fraction must be between 0 and 1"))
  }

  test("simplify_geometry: guards, endpoints survive, idempotent") {
    def l(w: String) = s"st_linefromtext('LINESTRING ($w)')"
    val zig = "0 0, 1 0.05, 2 1, 3 0.05, 4 0"
    assert(oneV[Long](s"size(simplify_geometry(${l(zig)}, 0.5D))") == 3L)
    // endpoints always survive, even at huge tolerance
    assert(oneV[Long](s"size(simplify_geometry(${l(zig)}, 1e9D))") == 2L)
    // applying twice changes nothing
    assert(oneV[Boolean](
      s"simplify_geometry(simplify_geometry(${l(zig)}, 0.5D), 0.5D) = " +
        s"simplify_geometry(${l(zig)}, 0.5D)"))
    val e = intercept[Exception] {
      oneV[Long](s"size(simplify_geometry(${l(zig)}, -1.0D))")
    }
    assert(e.getMessage.contains("negative"))
  }
}
