package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Product quantization (operators/Pq.scala): sub-vector slicing,
  * nearest-codeword assignment semantics, the ADC decomposition
  * identity, and encode determinism. */
class PqSuite extends GraftSuite {

  import spark.implicits._

  test("subVectors slices contiguously and loses nothing") {
    val e = Seq((0L, (1 to 8).map(_.toDouble)),
      (1L, (9 to 16).map(_.toDouble))).toDF("vec_id", "e")
    val subs = Pq.subVectors(e, m = 4, d = 8)
      .orderBy("vec_id", "j").collect()
    assert(subs.length == 8)
    assert(subs.head.getSeq[Double](2) == Seq(1.0, 2.0))
    assert(subs(3).getSeq[Double](2) == Seq(7.0, 8.0))
    assert(subs(4).getSeq[Double](2) == Seq(9.0, 10.0))
    // concatenating a vector's slices reproduces it
    val back = Pq.subVectors(e, 4, 8).groupBy("vec_id")
      .agg(flatten(array_sort(collect_list(struct(col("j"),
        col("sv")))).getField("sv")).as("r"))
      .orderBy("vec_id").collect()
    assert(back(0).getSeq[Double](1) == (1 to 8).map(_.toDouble))
    assert(back(1).getSeq[Double](1) == (9 to 16).map(_.toDouble))
  }

  test("assignment picks the nearest codeword, ties to smallest cid") {
    val subs = Seq((0L, 0, Seq(0.0, 0.0)), (1L, 0, Seq(10.0, 10.0)),
      (2L, 0, Seq(5.0, 5.0))) // equidistant from both codewords
      .toDF("vec_id", "j", "sv")
    val cb = Seq((0, 0L, Seq(0.0, 0.0)), (0, 1L, Seq(10.0, 10.0)))
      .toDF("j", "cid", "cv")
    val a = Pq.assign(subs, cb).orderBy("vec_id").collect()
    assert(a.map(_.getLong(3)).toSeq == Seq(0L, 1L, 0L)) // tie -> cid 0
    assert(a(0).getDouble(4) == 0.0)
    assert(a(2).getDouble(4) == 50.0) // 5^2 + 5^2
  }

  test("ADC reproduces the reconstruction distance exactly") {
    // a 2-subspace toy: the ADC sum over a vector's codes must equal
    // the squared L2 between the probe and the vector's RECONSTRUCTION
    // (the sum of per-subspace codeword distances) — PQ's defining
    // identity
    val subs = Seq((7L, 0, Seq(1.0, 2.0)), (7L, 1, Seq(3.0, 4.0)))
      .toDF("vec_id", "j", "sv")
    val cb = Seq((0, 0L, Seq(0.0, 0.0)), (0, 1L, Seq(1.0, 2.0)),
      (1, 0L, Seq(3.0, 5.0)), (1, 1L, Seq(9.0, 9.0)))
      .toDF("j", "cid", "cv")
    val codes = Pq.encode(subs, cb)
    // nearest codewords: j0 -> cid 1 (exact), j1 -> cid 0 (d2 = 1)
    val c = codes.orderBy("j").collect()
    assert(c.map(_.getLong(2)).toSeq == Seq(1L, 0L))
    val probe = Seq((7L, 0, Seq(2.0, 2.0)), (7L, 1, Seq(3.0, 4.0)))
      .toDF("vec_id", "j", "sv")
    val adc = Pq.adcDistances(codes, Pq.adcTable(probe, cb))
      .head().getDouble(2)
    // probe -> reconstruction [1,2,3,5]: (2-1)^2 + 0 + 0 + (4-5)^2 = 2
    assert(adc == 2.0)
  }

  test("training is deterministic and distortion never rises") {
    val e = spark.range(64).select(col("id").as("vec_id"),
      array((0 until 8).map(i =>
        (col("id") * (i + 3) % 17).cast("double")): _*).as("e"))
    val subs = Pq.subVectors(e, 4, 8)
    val cb = Pq.train(subs, stride = 16, iters = 2)
    val cb2 = Pq.train(subs, stride = 16, iters = 2)
    assert(cb.orderBy("j", "cid").collect().toSeq ==
      cb2.orderBy("j", "cid").collect().toSeq)
    val i0 = Pq.distortion(Pq.assign(subs, Pq.seeds(subs, 16)), "i")
      .head().getDouble(0)
    val i2 = Pq.distortion(Pq.assign(subs, cb), "i").head().getDouble(0)
    assert(i2 <= i0 + 1e-9, s"distortion rose: $i0 -> $i2")
  }
}
