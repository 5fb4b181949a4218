package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch

/** JVM-level properties of the DDSketch state: relative-error bound,
  * exact mergeability, serialization round-trip. */
class QuantileSketchSuite extends AnyFunSuite {

  private def build(xs: Seq[Double], alpha: Double = 0.01) = {
    val st = new QuantileSketch.State(alpha)
    xs.foreach(st.insert(_))
    st
  }

  test("quantile estimates are within alpha relative error") {
    val xs = (1 to 10000).map(i => i * 0.37 + 1.0)
    val st = build(xs)
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val exact = xs((q * (xs.size - 1)).toInt)
      val est = st.quantile(q)
      assert(math.abs(est - exact) <= exact * 0.011 + 0.4,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("merge of split halves equals direct build, byte for byte") {
    val xs = (1 to 5000).map(i => math.exp(i % 13) + i * 0.01)
    val direct = build(xs)
    val a = build(xs.take(2500))
    val b = build(xs.drop(2500))
    a.mergeWith(b)
    assert(java.util.Arrays.equals(a.serialize(), direct.serialize()))
    assert(a.quantile(0.5) == direct.quantile(0.5))
  }

  test("serialization round-trips") {
    val st = build(Seq(0.0, 0.0, 1.5, 2.5, 1e9, 3e-7))
    val rt = QuantileSketch.deserialize(st.serialize())
    assert(java.util.Arrays.equals(rt.serialize(), st.serialize()))
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(rt.quantile(q) == st.quantile(q))
  }

  test("zeros are exact") {
    val st = build(Seq.fill(90)(0.0) ++ Seq.fill(10)(5.0))
    assert(st.quantile(0.5) == 0.0)
    assert(math.abs(st.quantile(0.95) - 5.0) <= 0.06)
  }

  test("negatives land in the mirrored store with the same error bound") {
    val xs = (-5000 to 5000).map(_ * 0.7)
    val st = build(xs)
    for ((q, exact) <- Seq(0.1 -> -2800.0, 0.5 -> 0.0, 0.9 -> 2800.0)) {
      val est = st.quantile(q)
      assert(math.abs(est - exact) <= math.abs(exact) * 0.011 + 0.8,
        s"q=$q est=$est exact=$exact")
    }
    // merge keeps the mirrored buckets byte-identical to a direct build
    val a = build(xs.take(3000)); val b = build(xs.drop(3000))
    a.mergeWith(b)
    assert(java.util.Arrays.equals(a.serialize(), st.serialize()))
  }

  test("quantile validates q and stays defined on all-zero sketches") {
    val zeros = build(Seq.fill(10)(0.0))
    assert(zeros.quantile(1.0) == 0.0)
    assert(zeros.quantile(0.0) == 0.0)
    for (bad <- Seq(-0.1, 1.5))
      intercept[IllegalArgumentException](zeros.quantile(bad))
    assert(build(Seq.empty).quantile(0.5).isNaN)
  }

  test("cdf: rank within alpha-induced tolerance, signs and edges") {
    val xs = (1 to 1000).map(_.toDouble)
    val st = build(xs)
    assert(math.abs(st.cdf(500.0) - 0.5) <= 0.02)
    assert(st.cdf(0.5) == 0.0) // below every value
    assert(st.cdf(2000.0) == 1.0)
    val mixed = build(Seq(-5.0, -1.0, 0.0, 1.0, 5.0))
    assert(math.abs(mixed.cdf(0.0) - 0.6) <= 0.01) // -5, -1, 0
    assert(math.abs(mixed.cdf(-1.0) - 0.4) <= 0.01) // -5, -1
    assert(build(Seq.empty).cdf(1.0).isNaN)
  }

  test("tdigest: quantiles, cdf inverse, weighted, merge, scale") {
    import graft.functions.TDigest
    // deterministic pseudo-shuffled stream, no Random (replayable)
    val xs = (0 until 20000).map(i => ((i * 7919) % 20000).toDouble)
    val st = new TDigest.State(100.0)
    xs.foreach(st.insert(_))
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val exact = q * 19999.0
      assert(math.abs(st.quantile(q) - exact) <= 19999.0 * 0.01,
        s"q=$q est=${st.quantile(q)} exact=$exact")
    }
    // min/max pinned exactly at the extremes
    assert(st.quantile(0.0) == 0.0 && st.quantile(1.0) == 19999.0)
    // cdf is the approximate inverse of quantile
    for (x <- Seq(1000.0, 10000.0, 19000.0)) {
      assert(math.abs(st.cdf(x) - (x + 1) / 20000.0) <= 0.01)
    }
    // bounded state after compression
    st.compress()
    assert(st.means.length <= 200)
    // weight w behaves like w duplicate inserts
    val a = new TDigest.State(100.0)
    val b = new TDigest.State(100.0)
    (1 to 500).foreach { i => a.insert(i.toDouble, 3.0) }
    (1 to 500).foreach { i => (1 to 3).foreach(_ => b.insert(i.toDouble)) }
    assert(math.abs(a.quantile(0.5) - b.quantile(0.5)) <= 500 * 0.02)
    // merge of disjoint halves covers the union
    val lo = new TDigest.State(100.0)
    val hi = new TDigest.State(100.0)
    (0 until 5000).foreach(i => lo.insert(i.toDouble))
    (5000 until 10000).foreach(i => hi.insert(i.toDouble))
    lo.mergeWith(hi)
    assert(math.abs(lo.quantile(0.5) - 4999.5) <= 9999 * 0.02)
    assert(lo.quantile(1.0) == 9999.0)
    // scale preserves quantiles, multiplies mass
    val sc = st.scale(5.0)
    assert(math.abs(sc.quantile(0.5) - st.quantile(0.5)) <= 1e-9)
    assert(math.abs(sc.total - st.total * 5.0) <= 1e-6)
    // serialization round-trips
    val rt = TDigest.deserialize(st.serialize())
    assert(rt.quantile(0.5) == st.quantile(0.5))
    intercept[IllegalArgumentException](st.quantile(1.5))
    intercept[IllegalArgumentException](st.insert(1.0, -1.0))
  }
}
