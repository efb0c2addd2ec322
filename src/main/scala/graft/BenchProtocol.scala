package graft

/** Pure decision logic for [[Bench]]'s regression tripwire — factored
  * out so the protocol is unit-testable against synthetic drift
  * (r13 verdict ask #3: 28 single-shot trips that round, the largest
  * refuted by two fresh JVMs, and the calibration canary itself
  * swinging 1.6× between back-to-back JVMs — single-shot numbers plus
  * a single-shot canary cannot adjudicate).
  *
  * The protocol has three legs:
  *   1. BAND-AWARE thresholds: a measurement trips only if it exceeds
  *      both 1.5× the committed MEDIAN and 1.25× the committed spread
  *      HI (the close merge records median-of-≥3-fresh-JVMs plus the
  *      [min,max] band), scaled by the session factor — so a query
  *      whose committed band is honestly wide doesn't trip on its own
  *      in-band variance.
  *   2. CONSERVATIVE session factor: best-of-N canary over committed
  *      canary, clamped [0.8, 2.5]. Interference inflates timings and
  *      never deflates them, so the MINIMUM probe is the clean
  *      estimate of box speed; using the max would let a noisy canary
  *      normalize real regressions away.
  *   3. SECOND-JVM adjudication: a trip that survives the in-JVM
  *      retry is re-measured in a FRESH JVM (a fresh SparkSession is
  *      not enough — the r13 swings were JVM/box state) before being
  *      recorded; the recorded value is the min across measurements.
  */
object BenchProtocol {

  /** Committed per-query baseline: the close-merge median plus the
    * high edge of its [min, max] spread band (callers pass
    * `hi = median` when no band was recorded — single-run detail
    * files — which degrades to the pure-median rule). */
  final case class Band(median: Double, hi: Double)

  /** Session speed factor: best-of-probes over the committed canary,
    * clamped to [0.8, 2.5] (outside that the probe itself is suspect
    * and the raw comparison is safer). ≤ 0 / empty inputs → 1. */
  def sessionFactor(calProbes: Seq[Double], committedCal: Double)
      : Double =
    if (committedCal <= 0 || calProbes.isEmpty) 1.0
    else math.max(0.8, math.min(2.5, calProbes.min / committedCal))

  /** The canary's own spread ratio (max/min over the probes); 1 when
    * fewer than two probes exist. */
  def canarySpread(calProbes: Seq[Double]): Double =
    if (calProbes.size < 2) 1.0
    else calProbes.max / math.max(calProbes.min, 1e-9)

  /** A canary swinging more than 1.3× within one session is too noisy
    * for its factor to excuse anything — trips must be adjudicated in
    * a second JVM, never normalized away. (The factor above is
    * already min-based, so this flag is reported, not used to widen
    * thresholds.) */
  def canaryNoisy(calProbes: Seq[Double]): Boolean =
    canarySpread(calProbes) > 1.3

  def tripThreshold(b: Band, factor: Double): Double =
    math.max(b.median * 1.5, b.hi * 1.25) * factor

  /** Does measurement `t` trip against the committed band at this
    * session factor? */
  def isTrip(t: Double, b: Band, factor: Double): Boolean =
    t > tripThreshold(b, factor)

  /** One canary probe with its session-relative timestamp (seconds
    * since bench start). r15 (verdict ask #6): probes are interleaved
    * through the query loop — front-loaded probes cannot see a box
    * that drifts mid-session, and the r14 driver session measured a
    * 2.12× canary spread with all three probes taken up front. */
  final case class Probe(at: Double, sec: Double)

  /** r16 verdict ask #7 (carrying r15 item 8): each probe POINT runs
    * the canary TWICE back-to-back and keeps the MIN — a single
    * interference-inflated run can no longer masquerade as box speed
    * at that point. Returns the min-probe plus the pair's own spread
    * ratio (max/min, ≥ 1), which the bench records so a point whose
    * two runs disagree wildly is visible in the baseline. The min
    * direction matches [[sessionFactor]]: interference only ever
    * inflates a timing. */
  def pairProbe(at: Double, run1: Double, run2: Double)
      : (Probe, Double) = {
    val lo = math.min(run1, run2)
    val hi = math.max(run1, run2)
    (Probe(at, lo), hi / math.max(lo, 1e-9))
  }

  /** Latest-probe speed over earliest-probe speed (by timestamp):
    * > 1 means the box got SLOWER across the session. 1 when fewer
    * than two probes exist. */
  def driftRatio(probes: Seq[Probe]): Double =
    if (probes.size < 2) 1.0
    else {
      val s = probes.sortBy(_.at)
      s.last.sec / math.max(s.head.sec, 1e-9)
    }

  /** Did the box drift more than 1.3× (either direction) between the
    * first and last probe? When true, trips should be judged against
    * [[factorAt]] (the probe nearest the measurement) instead of one
    * session-wide factor. */
  def drifted(probes: Seq[Probe]): Boolean = {
    val r = driftRatio(probes)
    r > 1.3 || r < 1.0 / 1.3
  }

  /** Session factor local to time `at`: the probe nearest in time
    * over the committed canary, clamped like [[sessionFactor]].
    * Conservative direction is preserved: the factor is still bounded
    * [0.8, 2.5], still reported, and a trip excused by a drifted-tail
    * factor was measured on a box demonstrably that much slower — the
    * alternative (a front-loaded factor) burned the r14 adjudication
    * budget on box drift instead of code. */
  def factorAt(probes: Seq[Probe], committedCal: Double, at: Double)
      : Double =
    if (committedCal <= 0 || probes.isEmpty) 1.0
    else {
      // min of the TWO nearest probes (r15 ADVICE): one interference-
      // inflated probe could otherwise locally excuse a genuine
      // regression measured near it — the same direction the min-based
      // session factor guards against.
      val near = probes.sortBy(p => math.abs(p.at - at)).take(2)
        .map(_.sec).min
      math.max(0.8, math.min(2.5, near / committedCal))
    }
}
