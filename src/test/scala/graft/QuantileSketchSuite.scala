package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch

/** JVM-level properties of the DDSketch state: relative-error bound,
  * exact mergeability, serialization round-trip. */
class QuantileSketchSuite extends AnyFunSuite {

  private def build(xs: Seq[Double], alpha: Double = 0.01) = {
    val st = new QuantileSketch.State(alpha)
    xs.foreach(st.insert)
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
}
