package graft.knn

import scala.collection.mutable

/** Immutable kd-tree over row feature vectors, built once on the driver
  * and broadcast to executors (SURVEY §2.10; reference kd-tree
  * src/arkadia/kdt2.rs, median split src/arkadia/utils.rs, box-pruning
  * metric src/arkadia/mod.rs:68-118 — algorithm re-derived here, not
  * translated).
  *
  * Distances: "l1", "l2" (reported as true euclidean), "sql2" (squared
  * euclidean), "inf" (Chebyshev). Internally l2 prunes on squared
  * distance, so no sqrt happens until the final report.
  *
  * Ties on distance break by ascending id, making results deterministic
  * and reproducible across engines (the property the DuckDB oracle
  * needs).
  *
  * Scale note: the tree is O(n·d) doubles; the broadcast design holds to
  * ~10⁷-10⁸ reference points per executor heap. Past that, use the
  * LSH-bucketed path (graft.sim.SimOps) — same API, approximate.
  */
final class KdTree private (
    points: Array[Array[Double]],   // re-ordered copy
    ids: Array[Long],               // external id per point
    left: Array[Int], right: Array[Int],
    axis: Array[Int], mins: Array[Array[Double]], maxs: Array[Array[Double]],
    root: Int, val metric: String) extends Serializable {

  @inline private def elemDist(a: Double): Double = metric match {
    case "l1" | "inf" => math.abs(a)
    case _            => a * a
  }

  /** Accumulated distance between two vectors under the tree metric
    * (squared for l2/sql2). */
  def rawDist(q: Array[Double], p: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < q.length) {
      val d = elemDist(q(i) - p(i))
      if (metric == "inf") { if (d > acc) acc = d } else acc += d
      i += 1
    }
    acc
  }

  /** Min possible raw distance from q to node's bounding box — the
    * pruning bound. */
  private def distToBox(q: Array[Double], n: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < q.length) {
      val v = q(i)
      val lo = mins(n)(i); val hi = maxs(n)(i)
      val gap = if (v < lo) lo - v else if (v > hi) v - hi else 0.0
      val d = elemDist(gap)
      if (metric == "inf") { if (d > acc) acc = d } else acc += d
      i += 1
    }
    acc
  }

  /** Report distance in the metric's user-facing unit. */
  @inline def report(raw: Double): Double =
    if (metric == "l2") math.sqrt(raw) else raw

  /** k nearest neighbors of q (excluding ids in `exclude`), as
    * (id, rawDist) sorted by (dist, id). maxBound caps the search
    * radius (raw units); epsilon enables approximate pruning. */
  def knn(q: Array[Double], k: Int, exclude: Long = Long.MinValue,
          maxBound: Double = Double.PositiveInfinity,
          epsilon: Double = 0.0): Array[(Long, Double)] = {
    if (root < 0 || k <= 0) return Array.empty
    // max-heap on (dist desc, id desc) so the worst candidate pops first
    implicit val ord: Ordering[(Long, Double)] =
      Ordering.by[(Long, Double), (Double, Long)](t => (t._2, t._1))
    val heap = mutable.PriorityQueue.empty[(Long, Double)]
    def bound: Double =
      if (heap.size < k) maxBound else math.min(maxBound, heap.head._2)
    def visit(n: Int): Unit = {
      if (n < 0) return
      if (distToBox(q, n) * (1.0 + epsilon) > bound) return
      val d = rawDist(q, points(n))
      val id = ids(n)
      if (id != exclude && (d < bound ||
          (heap.size < k && d <= maxBound) ||
          (heap.nonEmpty && d == heap.head._2 && id < heap.head._1))) {
        heap.enqueue((id, d))
        if (heap.size > k) heap.dequeue()
      }
      val ax = axis(n)
      val goLeft = q(ax) <= points(n)(ax)
      visit(if (goLeft) left(n) else right(n))
      visit(if (goLeft) right(n) else left(n))
    }
    visit(root)
    heap.dequeueAll.reverse.toArray
  }

  /** All ids within raw-distance r of q (excluding `exclude`), sorted by
    * (dist, id). */
  def rangeQuery(q: Array[Double], r: Double,
                 exclude: Long = Long.MinValue): Array[(Long, Double)] = {
    val out = mutable.ArrayBuffer.empty[(Long, Double)]
    def visit(n: Int): Unit = {
      if (n < 0 || distToBox(q, n) > r) return
      val d = rawDist(q, points(n))
      if (d <= r && ids(n) != exclude) out += ((ids(n), d))
      visit(left(n)); visit(right(n))
    }
    if (root >= 0) visit(root)
    out.sortBy(t => (t._2, t._1)).toArray
  }

  /** Count of points within raw-distance r (cheaper than materializing). */
  def countRange(q: Array[Double], r: Double,
                 exclude: Long = Long.MinValue): Int = {
    var cnt = 0
    def visit(n: Int): Unit = {
      if (n < 0 || distToBox(q, n) > r) return
      if (rawDist(q, points(n)) <= r && ids(n) != exclude) cnt += 1
      visit(left(n)); visit(right(n))
    }
    if (root >= 0) visit(root)
    cnt
  }

  def size: Int = ids.length
}

object KdTree {

  /** Build with cycling-axis median split (reference default
    * SplitMethod::MEDIAN, src/arkadia/utils.rs). Build happens once on
    * the driver, then the tree is broadcast.
    *
    * r13: the per-node full sort (O(n log² n) with boxed-tuple
    * comparators — the dominant cost of every broadcast-tree query's
    * fit step) is replaced by an in-place (value, id) quickselect on
    * primitive parallel arrays, O(n log n) expected with zero
    * allocation. The tree is IDENTICAL: the median element of a range
    * under the total (value, id) order is unique, so selecting it in
    * place picks the same point the full sort picked, and each child
    * range holds the same SET of points (order within a range never
    * matters — the next level re-partitions by its own axis). KnnSpec's
    * brute-force parity and tie-break tests pin the equivalence. */
  def build(data: Array[(Long, Array[Double])], metric: String = "l2")
      : KdTree = {
    // fail loud on a bad metric string instead of silently ranking
    // under a default (the reference raises too, test_many.py:1616)
    require(Set("l1", "l2", "sql2", "inf").contains(metric),
      s"KdTree: unknown metric '$metric' (l1|l2|sql2|inf)")
    val n = data.length
    val dim = if (n > 0) data(0)._2.length else 0
    val pts = new Array[Array[Double]](n)
    val idArr = new Array[Long](n)
    val left = Array.fill(n)(-1); val right = Array.fill(n)(-1)
    val axisArr = new Array[Int](n)
    val mins = Array.ofDim[Double](n, dim)
    val maxs = Array.ofDim[Double](n, dim)
    var cursor = 0
    val wVec = new Array[Array[Double]](n)
    val wId = new Array[Long](n)
    var p = 0
    while (p < n) { wVec(p) = data(p)._2; wId(p) = data(p)._1; p += 1 }

    @inline def less(i: Int, j: Int, ax: Int): Boolean = {
      val a = wVec(i)(ax); val b = wVec(j)(ax)
      a < b || (a == b && wId(i) < wId(j))
    }
    @inline def swap(i: Int, j: Int): Unit = {
      val tv = wVec(i); wVec(i) = wVec(j); wVec(j) = tv
      val ti = wId(i); wId(i) = wId(j); wId(j) = ti
    }
    /** Place the k-th smallest (by (value@ax, id)) of [lo, hi) at k —
      * iterative Hoare quickselect, median-of-3 pivot. */
    def select(lo0: Int, hi0: Int, k: Int, ax: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (hi - lo > 1) {
        // median-of-3 pivot to index lo
        val mid = lo + (hi - lo) / 2
        val last = hi - 1
        if (less(mid, lo, ax)) swap(mid, lo)
        if (less(last, lo, ax)) swap(last, lo)
        if (less(last, mid, ax)) swap(last, mid)
        swap(lo, mid) // pivot (median of 3) now at lo
        val piv = lo
        var i = lo + 1
        var j = last
        while (i <= j) {
          while (i <= j && less(i, piv, ax)) i += 1
          while (i <= j && less(piv, j, ax)) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // pivot into its final slot j
        swap(piv, j)
        if (k == j) return
        else if (k < j) hi = j
        else lo = i
      }
    }

    def rec(lo: Int, hi: Int, depth: Int): Int = {
      if (lo >= hi) return -1
      val ax = depth % dim
      val mid = lo + (hi - lo) / 2
      select(lo, hi, mid, ax)
      val me = cursor; cursor += 1
      pts(me) = wVec(mid)
      idArr(me) = wId(mid)
      axisArr(me) = ax
      var i = 0
      while (i < dim) {
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var j = lo
        while (j < hi) {
          val v = wVec(j)(i)
          if (v < mn) mn = v
          if (v > mx) mx = v
          j += 1
        }
        mins(me)(i) = mn; maxs(me)(i) = mx
        i += 1
      }
      left(me) = rec(lo, mid, depth + 1)
      right(me) = rec(mid + 1, hi, depth + 1)
      me
    }

    val root = rec(0, n, 0)
    new KdTree(pts, idArr, left, right, axisArr, mins, maxs, root, metric)
  }
}
