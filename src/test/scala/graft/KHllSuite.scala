package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.LongType

import graft.functions.{KHll, SetDigest}

/** JVM-level properties of the KHyperLogLog state; the SQL surface and
  * exact-regime answers are gated by qh7. */
class KHllSuite extends AnyFunSuite {

  private def h(v: Long) = XxHash64Function.hash(v, LongType, 0L)

  private def build(pairs: Seq[(Long, Long)], k: Int = KHll.DefaultMaxSize) = {
    val st = new KHll.State(k)
    pairs.foreach { case (x, u) => st.offer(h(x), h(u)) }
    st
  }

  test("exact answers below saturation") {
    // 10 values; value i is seen with i distinct users
    val pairs = for (x <- 1L to 10L; u <- 1L to x) yield (x, u)
    val st = build(pairs)
    assert(st.cardinality == 10L)
    assert(st.reidentificationPotential(3) == 0.3)
    val dist = st.uniquenessDistribution(5)
    assert(dist(1L) == 0.1 && dist(2L) == 0.1)
    assert(dist(5L) == 0.6) // values with >= 5 users clamp to the last bucket
  }

  test("merge of split halves is byte-identical to direct build") {
    val pairs = for (x <- 1L to 500L; u <- 1L to (x % 7 + 1)) yield (x, u)
    val direct = build(pairs)
    val a = build(pairs.take(pairs.size / 2))
    val b = build(pairs.drop(pairs.size / 2))
    a.mergeWith(b)
    assert(java.util.Arrays.equals(a.serialize(), direct.serialize()))
  }

  test("key saturation keeps the k unsigned-smallest x hashes") {
    val st = build((1L to 1000L).map(x => (x, 1L)), k = 64)
    assert(st.cardinality > 500L && st.cardinality < 2000L)
    assert(st.serialize().length < 64 * 64) // bounded state
  }

  test("serialization round-trips and magic disambiguates") {
    val st = build(Seq((1L, 2L), (3L, 4L)))
    val bytes = st.serialize()
    assert(KHll.isKhll(bytes))
    assert(!KHll.isKhll(new SetDigest.State(16).serialize()))
    val rt = KHll.deserialize(bytes)
    assert(java.util.Arrays.equals(rt.serialize(), bytes))
    // the key-set view answers set questions: jaccard with itself is 1
    assert(SetDigest.jaccard(st.keyDigest, rt.keyDigest) == 1.0)
  }
}
