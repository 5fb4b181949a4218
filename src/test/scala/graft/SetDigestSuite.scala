package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.LongType

import graft.functions.SetDigest

/** JVM-level properties of the KMV SetDigest state: exactness below
  * saturation, estimator tolerance above it, exact mergeability,
  * serialization canonicality. The query-level surface (SQL names,
  * per-group digests, byte-equal merge) is gated by qh0/qh1. */
class SetDigestSuite extends AnyFunSuite {

  private def build(xs: Seq[Long], k: Int = SetDigest.DefaultK) = {
    val st = new SetDigest.State(k)
    xs.foreach(v => st.offer(XxHash64Function.hash(v, LongType, 0L)))
    st
  }

  test("cardinality is exact below saturation") {
    assert(build((1L to 500L) ++ (1L to 500L)).cardinality == 500L)
    assert(build(Seq.empty).cardinality == 0L)
  }

  test("KMV estimate within 25% at 100x saturation (k=64)") {
    val st = build((1L to 100000L), k = 64)
    val est = st.cardinality
    assert(math.abs(est - 100000L) <= 25000L, s"est=$est")
  }

  test("jaccard and intersection are exact below saturation") {
    val a = build(1L to 300L)
    val b = build(201L to 500L)
    assert(SetDigest.jaccard(a, b) == 100.0 / 500.0)
    assert(SetDigest.intersectionCardinality(a, b) == 100L)
  }

  test("jaccard estimate within 0.1 at saturation (k=256)") {
    val a = build(1L to 20000L, k = 256)
    val b = build(10001L to 30000L, k = 256)
    val j = SetDigest.jaccard(a, b) // true jaccard = 10000/30000
    assert(math.abs(j - 1.0 / 3.0) <= 0.1, s"j=$j")
  }

  test("merge of split halves equals direct build, byte for byte") {
    val xs = (1L to 5000L).map(i => i * 37L % 4001L)
    val direct = build(xs)
    val a = build(xs.take(2500))
    val b = build(xs.drop(2500))
    a.mergeWith(b)
    assert(java.util.Arrays.equals(a.serialize(), direct.serialize()))
  }

  test("merge adopts the coarser precision") {
    val a = build(1L to 100L, k = 1024)
    val b = build(50L to 150L, k = 64)
    a.mergeWith(b)
    assert(a.k == 64)
    assert(a.serialize().length <= 8 + 8 * 64)
  }

  test("serialization round-trips") {
    val st = build(Seq(42L, -7L, Long.MaxValue, Long.MinValue, 0L))
    val rt = SetDigest.deserialize(st.serialize())
    assert(java.util.Arrays.equals(rt.serialize(), st.serialize()))
    assert(rt.cardinality == st.cardinality)
  }

  test("unsigned ordering keeps the k-smallest, not the signed-smallest") {
    // hashes with the sign bit set are unsigned-LARGE; a signed comparator
    // would keep them first and wreck the estimator
    val st = new SetDigest.State(2)
    st.offer(-1L) // unsigned max
    st.offer(1L)
    st.offer(2L)
    st.offer(-2L)
    val kept = st.serialize().drop(8).grouped(8)
      .map(bs => java.nio.ByteBuffer.wrap(bs).getLong).toSet
    assert(kept == Set(1L, 2L))
  }
}
