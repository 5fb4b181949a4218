package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashCombinatorics, SpookyHashV2}

/** JVM-level checks for the FNV recurrences (published vectors) and the
  * combinations iterator (order + edge cases). Query-level behavior is
  * gated by qh5/qh4 against DuckDB's independent byte-fold replay. */
class HashCombinatoricsSuite extends AnyFunSuite {

  private def f(s: String, a: Boolean, is32: Boolean) =
    HashCombinatorics.fnv(s.getBytes("UTF-8"), a, is32)

  test("fnv matches the published test vectors") {
    // offset basis for empty input, sign-extended like the reference's
    // int -> bigint widening
    assert(f("", a = false, is32 = true) == 0x811c9dc5.toLong)
    assert(f("", a = true, is32 = true) == 0x811c9dc5.toLong)
    assert(f("", a = false, is32 = false) == 0xcbf29ce484222325L)
    // the classic 'a' vectors (draft-eastlake-fnv, appendix C)
    assert(f("a", a = false, is32 = true) == 0x050c5d7eL)
    assert(f("a", a = true, is32 = true) == 0xe40c292c.toLong)
    assert(f("a", a = true, is32 = false) == 0xaf63dc4c8601ec8cL)
  }

  test("combinations emit in lexicographic index order") {
    val got = combos(Seq("d", "b", "c", "a"), 2)
    assert(got == Seq(Seq("d", "b"), Seq("d", "c"), Seq("d", "a"),
      Seq("b", "c"), Seq("b", "a"), Seq("c", "a")))
  }

  test("combinations edge cases: n = 0, n = len, n > len") {
    assert(combos(Seq("x", "y"), 0) == Seq(Seq()))
    assert(combos(Seq("x", "y"), 2) == Seq(Seq("x", "y")))
    assert(combos(Seq("x"), 2) == Seq())
  }

  private def combos(xs: Seq[String], n: Int): Seq[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      xs.map(UTF8String.fromString).toArray[Any])
    val e = graft.functions.ArrayCombinations(
      Literal.create(arr, ArrayType(StringType)), n)
    val res = e.eval(null).asInstanceOf[ArrayData]
    (0 until res.numElements()).map { i =>
      val inner = res.getArray(i)
      (0 until inner.numElements())
        .map(j => inner.getUTF8String(j).toString)
    }
  }

  test("spooky hash v2 matches the reference's test vectors") {
    // TestVarbinaryFunctions.java:338-341 (seed 0)
    def h32(s: String) = SpookyHashV2.hash32(s.getBytes("UTF-8"))
    def h64(s: String) = SpookyHashV2.hash64(s.getBytes("UTF-8"))
    assert(h32("") == 0x6BF50919)
    assert(h32("hello") == 0xD382E6CA.toInt)
    assert(h64("") == 0x232706FC6BF50919L)
    assert(h64("hello") == 0x3768826AD382E6CAL)
    // hash32 is the low word of hash64 by construction — spot-check the
    // untested tail arms and both block paths (16..191 short, >=192 long)
    for (n <- Seq(1, 4, 8, 12, 15, 16, 31, 32, 33, 100, 191, 192, 200, 500)) {
      val bytes = Array.tabulate(n)(i => (i * 37 + 11).toByte)
      assert(SpookyHashV2.hash32(bytes) == SpookyHashV2.hash64(bytes).toInt)
      // deterministic
      assert(SpookyHashV2.hash64(bytes) == SpookyHashV2.hash64(bytes.clone()))
    }
  }
}
