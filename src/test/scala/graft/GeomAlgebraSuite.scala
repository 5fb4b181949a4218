package graft

import org.apache.spark.sql.functions._

import graft.functions.{GeomAlgebra, Registry}

/** Behavioral tests for the convex-hull / clip / segment-relate / WKB
  * algebra (GeomAlgebra.scala) on planted coordinates with exactly
  * computable answers. */
class GeomAlgebraSuite extends GraftSuite {

  import spark.implicits._

  private def pt(x: Double, y: Double) = (x, y)

  test("monotone-chain hull: parabola points survive, interior dropped") {
    // (t, t²) are in convex position; (t, t²+5) for t in 1..8 lie
    // strictly under the chord y=9t → interior
    val pts = (0 to 9).map(t => (t.toDouble, (t * t).toDouble)) ++
      (1 to 8).map(t => (t.toDouble, (t * t + 5).toDouble))
    val flat = pts.flatMap { case (x, y) => Seq(x, y) }.toArray
    val h = GeomAlgebra.hull(flat)
    val verts = h.grouped(2).map(a => (a(0), a(1))).toSeq
    assert(verts == (0 to 9).map(t => (t.toDouble, (t * t).toDouble)))
  }

  test("hull of collinear points is the two extremes; dups collapse") {
    val flat = Array(3.0, 3.0, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0, 5.0, 5.0)
    val h = GeomAlgebra.hull(flat)
    assert(h.toSeq == Seq(1.0, 1.0, 5.0, 5.0))
  }

  test("sutherland-hodgman: square clipped by triangle = exact pentagon") {
    val square = Array(0.0, 0, 10, 0, 10, 10, 0, 10)
    val tri = Array(0.0, 0, 15, 0, 0, 15) // CCW, hypotenuse x+y=15
    val out = GeomAlgebra.clipConvex(square, tri)
    val verts = out.grouped(2).map(a => (a(0), a(1))).toSet
    assert(verts == Set((0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 10.0),
      (0.0, 10.0)))
    // canonical start: lexicographically smallest vertex
    assert((out(0), out(1)) == (0.0, 0.0))
    // disjoint → empty
    val far = Array(100.0, 100, 110, 100, 110, 110)
    assert(GeomAlgebra.clipConvex(square, far).isEmpty)
  }

  test("clip normalizes CW inputs; non-convex clip and holed WKB fail loudly") {
    Registry.install(spark)
    // CW clip triangle: same pentagon as the CCW qm4 case
    val area = spark.sql(
      """SELECT st_area(st_intersection(
        |  array(st_point(0D,0D), st_point(10D,0D), st_point(10D,10D),
        |        st_point(0D,10D)),
        |  array(st_point(0D,0D), st_point(0D,15D), st_point(15D,0D)))) AS a
        |""".stripMargin).collect()(0).getDouble(0)
    assert(area == 87.5)
    val e = intercept[Exception](spark.sql(
      """SELECT st_intersection(
        |  array(st_point(0D,0D), st_point(10D,0D), st_point(10D,10D)),
        |  array(st_point(0D,0D), st_point(10D,0D), st_point(10D,4D),
        |        st_point(4D,4D), st_point(4D,10D), st_point(0D,10D))) AS c
        |""".stripMargin).collect())
    assert(e.getMessage.contains("convex"))
    // WKB polygon with 2 rings (a hole) is rejected, not silently outer-only
    val holed = "0103000000" + "02000000" + "00000000" // header only; parse
    val e2 = intercept[Exception](spark.sql(
      s"SELECT st_geomfrombinary(unhex('$holed'))").collect())
    assert(e2.getMessage.contains("holes unsupported") ||
      e2.getMessage.contains("single-ring"))
  }

  test("non-convex subject routes through Greiner-Hormann; disconnected fails loudly") {
    Registry.install(spark)
    // L-shaped subject clipped by a convex square: one non-convex ring,
    // area 6*4 + 4*2 = 32 — Sutherland-Hodgman alone can't be trusted on
    // a non-convex subject, so this exercises the GeomBoolean route.
    val lShape = "array(st_point(0D,0D), st_point(10D,0D), st_point(10D,4D)," +
      " st_point(4D,4D), st_point(4D,10D), st_point(0D,10D))"
    val clipSq = "array(st_point(-1D,-1D), st_point(6D,-1D)," +
      " st_point(6D,6D), st_point(-1D,6D))"
    val area = spark.sql(
      s"SELECT st_area(st_intersection($lShape, $clipSq)) AS a")
      .collect()(0).getDouble(0)
    assert(area == 32.0)
    // U-shaped subject crossed by a horizontal bar: the true intersection
    // is two disconnected prong slices — must throw, never a single ring
    // joined by zero-width bridges.
    val uShape = "array(st_point(0D,0D), st_point(10D,0D), st_point(10D,10D)," +
      " st_point(8D,10D), st_point(8D,2D), st_point(2D,2D)," +
      " st_point(2D,10D), st_point(0D,10D))"
    val bar = "array(st_point(-1D,5D), st_point(11D,5D), st_point(11D,7D)," +
      " st_point(-1D,7D))"
    val e = intercept[Exception](spark.sql(
      s"SELECT st_intersection($uShape, $bar) AS c").collect())
    assert(e.getMessage.contains("disconnected"))
  }

  test("collinear fold-back spike is invalid (adjacent-segment overlap)") {
    Registry.install(spark)
    // (0,0)->(10,0)->(5,0): zero-area ring whose boundary doubles back
    // over itself — adjacent segments are collinear with opposing
    // directions, which the non-adjacent self-intersection scan skips.
    val spike = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 10D, 'y', 0D), named_struct('x', 5D, 'y', 0D))"
    val row = spark.sql(
      s"""SELECT st_isvalid($spike) AS v, st_isring($spike) AS r,
         |  st_issimple($spike) AS s, geometry_invalid_reason($spike) AS why
         |""".stripMargin).head()
    assert(!row.getBoolean(0) && !row.getBoolean(1) && !row.getBoolean(2))
    assert(row.getString(3).contains("spike"))
    // a straight-through collinear vertex is NOT a spike
    val straight = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 5D, 'y', 0D), named_struct('x', 10D, 'y', 0D), " +
      "named_struct('x', 5D, 'y', 5D))"
    assert(spark.sql(s"SELECT st_isvalid($straight) AS v").head().getBoolean(0))
  }

  test("segment relations: crosses / touches / overlaps disambiguate") {
    Registry.install(spark)
    def seg(x1: Double, y1: Double, x2: Double, y2: Double) =
      s"array(named_struct('x', ${x1}D, 'y', ${y1}D), " +
        s"named_struct('x', ${x2}D, 'y', ${y2}D))"
    def rel(m: String, a: String, b: String): Boolean =
      spark.sql(s"SELECT st_$m($a, $b) AS r").as[Boolean].head()
    val x1 = seg(0, 0, 10, 10); val x2 = seg(0, 10, 10, 0) // proper X
    assert(rel("crosses", x1, x2))
    assert(!rel("touches", x1, x2))
    assert(!rel("overlaps", x1, x2))
    val t1 = seg(0, 0, 5, 5); val t2 = seg(5, 5, 10, 0) // endpoint touch
    assert(rel("touches", t1, t2))
    assert(!rel("crosses", t1, t2))
    val m1 = seg(0, 0, 6, 0); val m2 = seg(4, 0, 10, 0) // collinear partial
    assert(rel("overlaps", m1, m2))
    assert(!rel("touches", m1, m2))
    assert(!rel("crosses", m1, m2))
    val c1 = seg(0, 0, 10, 0); val c2 = seg(2, 0, 8, 0) // containment
    assert(!rel("overlaps", c1, c2))
    val e2e = seg(6, 0, 12, 0) // collinear, meet at one point only
    assert(rel("touches", m1, e2e))
  }

  test("simplicity: bowtie is invalid with a reason; square ring is valid") {
    Registry.install(spark)
    val bowtie = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 10D, 'y', 10D), named_struct('x', 10D, 'y', 0D), " +
      "named_struct('x', 0D, 'y', 10D))"
    val square = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 10D, 'y', 0D), named_struct('x', 10D, 'y', 10D), " +
      "named_struct('x', 0D, 'y', 10D))"
    val row = spark.sql(
      s"""SELECT st_isvalid($bowtie) AS bv, geometry_invalid_reason($bowtie) AS br,
         |  st_isvalid($square) AS sv, geometry_invalid_reason($square) AS sr,
         |  st_isring($square) AS ring, st_issimple($square) AS simple
         |""".stripMargin).head()
    assert(!row.getBoolean(0))
    assert(row.getString(1).startsWith("Self-intersection"))
    assert(row.getBoolean(2) && row.isNullAt(3))
    assert(row.getBoolean(4) && row.getBoolean(5))
  }

  test("holed polygons: orientation-insensitive read, area/contains/centroid") {
    Registry.install(spark)
    // exterior given CW and the hole given CCW — the reader must
    // normalize (ext CCW, holes CW) and the measures must not care
    val wrongHanded = "array(" +
      "array(st_point(0D,0D), st_point(0D,10D), st_point(10D,10D), " +
      "st_point(10D,0D)), " + // CW exterior
      "array(st_point(2D,2D), st_point(5D,2D), st_point(5D,5D), " +
      "st_point(2D,5D)))" // CCW hole
    val row = spark.sql(
      s"""SELECT st_polygon_area(p) AS a,
         |  st_polygon_area(st_polygon_from_binary(
         |    st_polygon_as_binary(p))) AS a_rt,
         |  st_polygon_contains(p, st_point(3D, 3D)) AS hole_pt,
         |  st_polygon_contains(p, st_point(8D, 8D)) AS solid_pt,
         |  st_polygon_centroid(st_polygon_from_binary(
         |    st_polygon_as_binary(p))).x AS cx
         |FROM (SELECT $wrongHanded AS p)""".stripMargin).head()
    assert(row.getDouble(0) == 91.0) // 100 - 9
    assert(row.getDouble(1) == 91.0)
    assert(!row.getBoolean(2) && row.getBoolean(3))
    // centroid x = (100*5 - 9*3.5) / 91
    assert(math.abs(row.getDouble(4) - (500.0 - 31.5) / 91.0) < 1e-12)
    // a hole larger than the exterior is loudly invalid
    val bad = "array(array(st_point(0D,0D), st_point(2D,0D), " +
      "st_point(2D,2D), st_point(0D,2D)), array(st_point(-5D,-5D), " +
      "st_point(15D,-5D), st_point(15D,15D), st_point(-5D,15D)))"
    val e = intercept[Exception](spark.sql(
      s"SELECT st_polygon_area($bad) AS a").collect())
    assert(e.getMessage.contains("exceed"))
    // a degenerate zero-area hole (collinear ring) contributes zero
    // weight — centroid must stay finite, not NaN (ADVICE r6)
    val degenerate = "array(" +
      "array(st_point(0D,0D), st_point(10D,0D), st_point(10D,10D), " +
      "st_point(0D,10D)), " +
      "array(st_point(3D,3D), st_point(4D,3D), st_point(5D,3D)))"
    val dc = spark.sql(
      s"""SELECT st_polygon_centroid($degenerate).x AS cx,
         |  st_polygon_centroid($degenerate).y AS cy,
         |  st_polygon_area($degenerate) AS a""".stripMargin).head()
    assert(dc.getDouble(0) == 5.0 && dc.getDouble(1) == 5.0)
    assert(dc.getDouble(2) == 100.0)
  }

  test("WKB: line round-trips; point and polygon hex parse") {
    Registry.install(spark)
    val line = "array(named_struct('x', 1.5D, 'y', 2.5D), " +
      "named_struct('x', -3D, 'y', 4D))"
    assert(spark.sql(
      s"SELECT st_geomfrombinary(st_asbinary($line)) = $line AS ok")
      .as[Boolean].head())
    // little-endian WKB POINT(1 2), hand-assembled
    val pointHex = "0101000000" + "000000000000F03F" + "0000000000000040"
    val got = spark.sql(
      s"""SELECT st_geomfrombinary(unhex('$pointHex')) AS g""")
      .selectExpr("g[0].x", "g[0].y").as[(Double, Double)].head()
    assert(got == ((1.0, 2.0)))
  }

  test("convex_hull_agg distributed: hull of grouped points, merge-safe") {
    Registry.install(spark)
    val pts = (0 to 9).flatMap(t =>
      Seq((t.toDouble, (t * t).toDouble)) ++
        (if (t >= 1 && t <= 8) Seq((t.toDouble, (t * t + 5).toDouble))
         else Seq.empty))
    val df = pts.toDF("x", "y").repartition(7) // force partial+merge
    val hull = df.select(struct(col("x"), col("y")).as("p"))
      .agg(GeomAlgebra.convexHullAgg(col("p")).as("h"))
      .selectExpr("transform(h, q -> concat(q.x, ':', q.y)) AS s")
      .as[Seq[String]].head()
    assert(hull == (0 to 9).map(t => s"${t.toDouble}:${(t * t).toDouble}"))
  }

  test("structural templates: type/dimension/boundary/buffer/tiles") {
    Registry.install(spark)
    val openLine = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 4D, 'y', 0D), named_struct('x', 4D, 'y', 3D))"
    val closed = "array(named_struct('x', 0D, 'y', 0D), " +
      "named_struct('x', 4D, 'y', 0D), named_struct('x', 4D, 'y', 3D), " +
      "named_struct('x', 0D, 'y', 0D))"
    val row = spark.sql(
      s"""SELECT st_geometrytype($openLine) AS t1, st_dimension($closed) AS d2,
         |  size(st_boundary($openLine)) AS b1, size(st_boundary($closed)) AS b2,
         |  size(st_buffer(st_point(5.0, 5.0), 2.0)) AS nbuf,
         |  round(st_area(st_buffer(st_point(5.0, 5.0), 2.0)), 4) AS abuf,
         |  size(geometry_to_bing_tiles($openLine, 10)) AS ntiles,
         |  st_astext(st_pointn(st_polygon('POLYGON ((1 2, 3 4, 5 0, 1 2))'), 2)) AS wkt2
         |""".stripMargin).head()
    assert(row.getString(0) == "ST_LineString")
    assert(row.getLong(1) == 2L)
    assert(row.getInt(2) == 2 && row.getInt(3) == 0)
    assert(row.getInt(4) == 32)
    // regular 32-gon area = 0.5·n·r²·sin(2π/n)
    assert(math.abs(row.getDouble(5) -
      0.5 * 32 * 4 * math.sin(2 * math.Pi / 32)) < 1e-3)
    assert(row.getInt(6) >= 1)
    assert(row.getString(7) == "POINT (3.0 4.0)")
  }
}
