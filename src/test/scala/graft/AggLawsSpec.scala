package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.agg.{LRIn, LinRegAgg}

/** Property tests for the distributed-correctness laws the reference
  * never needed (SURVEY §5): an Aggregator's buffer merge must be
  * commutative and associative, and any partition split must reduce to
  * the same final state as a single sequential pass — exactly the
  * contract Spark's partial aggregation relies on. Deterministic
  * seeded generation (100 cases per law). */
class AggLawsSpec extends AnyFunSuite {

  private val agg = new LinRegAgg(3, 0.0)

  private def rows(rng: scala.util.Random, n: Int): List[LRIn] =
    List.fill(n)(LRIn(
      Seq(rng.nextDouble() * 20 - 10, rng.nextDouble() * 20 - 10, 1.0),
      rng.nextDouble() * 200 - 100, rng.nextDouble() * 4.9 + 0.1))

  private def reduceAll(rs: Seq[LRIn]): Array[Double] =
    rs.foldLeft(agg.zero)((b, r) => agg.reduce(b, r))

  private def approxEq(a: Array[Double], b: Array[Double]): Boolean =
    a.zip(b).forall { case (x, y) =>
      math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)) }

  test("merge(splitA, splitB) == sequential reduce for any split") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val rs = rows(rng, 40)
      val cut = rng.nextInt(41)
      val (l, r) = rs.splitAt(cut)
      assert(approxEq(agg.merge(reduceAll(l), reduceAll(r)),
        reduceAll(rs)))
    }
  }

  test("merge is commutative and associative") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val (a, b, c) = (reduceAll(rows(rng, 10)), reduceAll(rows(rng, 10)),
        reduceAll(rows(rng, 10)))
      def cp(x: Array[Double]) = x.clone()
      assert(approxEq(agg.merge(cp(a), cp(b)), agg.merge(cp(b), cp(a))))
      assert(approxEq(agg.merge(agg.merge(cp(a), cp(b)), cp(c)),
        agg.merge(cp(a), agg.merge(cp(b), cp(c)))))
    }
  }

  test("TopKAgg: any split+merge equals sequential top-k, exactly") {
    val topk = new graft.agg.TopKAgg(5)
    def red(rs: Seq[(Double, Long)]) =
      rs.foldLeft(topk.zero)((b, r) => topk.reduce(b, r))
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 100) {
      // duplicate scores on purpose: ties must resolve identically
      // (score desc, id asc) no matter how the rows were partitioned
      val rs = List.fill(40)((rng.nextInt(6).toDouble, rng.nextLong(1000)))
      val cut = rng.nextInt(41)
      val (l, r) = rs.splitAt(cut)
      val merged = topk.finish(topk.merge(red(l), red(r)))
      val seq = topk.finish(red(rs))
      assert(merged == seq, s"split at $cut: $merged != $seq")
      val shuffled = topk.finish(red(rng.shuffle(rs)))
      assert(shuffled == seq)
    }
  }

  test("finish is stable under row shuffling (partition order)") {
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 50) {
      val rs = rows(rng, 30)
      val shuffled = rng.shuffle(rs)
      val a = agg.finish(reduceAll(rs))
      val b = agg.finish(reduceAll(shuffled))
      a.coeffs.zip(b.coeffs).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(x))) }
    }
  }
}
