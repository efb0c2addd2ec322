package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-drift tests of the bench tripwire decision logic (r13
  * verdict ask #3): the protocol must absorb uniform session slowdown
  * and in-band variance without tripping, while a genuine per-query
  * regression still trips — and a noisy canary must not be able to
  * normalize one away. */
class BenchProtocolSpec extends AnyFunSuite {
  import BenchProtocol._

  test("uniform 1.6x session slowdown with a clean canary trips nothing") {
    // committed: median 1.0, band [0.9, 1.2], canary 0.7
    val b = Band(1.0, 1.2)
    // session runs everything 1.6x slower, canary probes agree
    val probes = Seq(1.12, 1.15, 1.18) // best 1.12 -> factor 1.6
    val f = sessionFactor(probes, 0.7)
    assert(math.abs(f - 1.6) < 1e-9)
    assert(!isTrip(1.6, b, f), "uniformly slowed in-band value tripped")
    assert(!canaryNoisy(probes))
  }

  test("in-band variance on a wide committed band does not trip") {
    // a query whose committed spread is honestly wide: median 1.0,
    // band [0.6, 2.0]; a measurement at 2.3 is within 1.25x the hi
    val b = Band(1.0, 2.0)
    assert(!isTrip(2.3, b, 1.0))
    // but the old bare-median rule would have flagged it at 1.5x
    assert(2.3 > 1.0 * 1.5)
  }

  test("a genuine 3x regression trips even through session scaling") {
    val b = Band(1.0, 1.2)
    val f = sessionFactor(Seq(0.75, 0.8), 0.7) // ~1.07x session
    assert(isTrip(3.0, b, f))
  }

  test("a noisy canary cannot normalize a regression away: the factor " +
      "uses the BEST probe, not the worst") {
    val b = Band(1.0, 1.2)
    // canary swings 0.64 -> 1.04 (the r13 observation); committed 0.7.
    // max-based factor would be 1.49 and threshold 2.24 — a 2.2x
    // regression would slip through. Min-based factor stays ~0.91.
    val probes = Seq(0.64, 1.04)
    assert(canaryNoisy(probes))
    val f = sessionFactor(probes, 0.7)
    assert(f < 1.0)
    assert(isTrip(2.2, b, f), "noisy canary normalized a regression")
  }

  test("factor clamps to [0.8, 2.5] and degrades to 1 without data") {
    assert(sessionFactor(Seq(0.1), 1.0) == 0.8)
    assert(sessionFactor(Seq(10.0), 1.0) == 2.5)
    assert(sessionFactor(Nil, 1.0) == 1.0)
    assert(sessionFactor(Seq(1.0), 0.0) == 1.0)
  }

  test("band degrades to the pure-median rule when hi == median") {
    val b = Band(1.0, 1.0)
    assert(!isTrip(1.49, b, 1.0))
    assert(isTrip(1.51, b, 1.0))
  }

  test("canarySpread is 1 for fewer than two probes") {
    assert(canarySpread(Nil) == 1.0)
    assert(canarySpread(Seq(0.5)) == 1.0)
    assert(math.abs(canarySpread(Seq(0.5, 0.75)) - 1.5) < 1e-9)
  }

  // ---- r15 (verdict ask #6): interleaved probes + drift ----

  test("mid-session slowdown is flagged as drift and the drifted tail " +
      "is judged against the nearest (late) probe") {
    // box at speed 0.7 early, 1.4 late (2x drift): committed canary
    // 0.7, committed band median 1.0 hi 1.2
    val probes = Seq(Probe(0.0, 0.7), Probe(10.0, 0.72),
      Probe(300.0, 1.35), Probe(600.0, 1.4))
    assert(drifted(probes))
    assert(math.abs(driftRatio(probes) - 2.0) < 1e-9)
    val b = Band(1.0, 1.2)
    // a query measured at t=580 on the slowed box reads 2.0 s — the
    // global min-based factor (1.0) would trip it (2.0 > 1.5), but
    // the factor at the tail absorbs it. r16 (r15 ADVICE): the local
    // factor is the MIN of the TWO nearest probes (1.35 and 1.4), so
    // one interference-inflated probe can never locally excuse a
    // regression — here min(1.35, 1.4)/0.7.
    val fLate = factorAt(probes, 0.7, 580.0)
    assert(math.abs(fLate - 1.35 / 0.7) < 1e-9)
    assert(!isTrip(2.0, b, fLate), "box drift misread as regression")
    // the same 2.0 s measured EARLY (t=5, box fast) still trips:
    // drift-aware factors stay local, they don't widen the whole run
    val fEarly = factorAt(probes, 0.7, 5.0)
    assert(math.abs(fEarly - 1.0) < 1e-9)
    assert(isTrip(2.0, b, fEarly),
      "early regression excused by late drift")
  }

  test("a genuine regression in the drifted tail still trips at the " +
      "local factor") {
    val probes = Seq(Probe(0.0, 0.7), Probe(600.0, 1.05)) // 1.5x drift
    assert(drifted(probes))
    val b = Band(1.0, 1.2)
    // local factor at the tail is 1.5; a 3x regression reads 4.5 s on
    // the slowed box and must still trip (threshold 1.5*1.5 = 2.25)
    assert(isTrip(4.5, b, factorAt(probes, 0.7, 590.0)))
  }

  test("steady box: no drift flag, factorAt agrees with sessionFactor") {
    val probes = Seq(Probe(0.0, 0.8), Probe(300.0, 0.84),
      Probe(600.0, 0.82))
    assert(!drifted(probes))
    assert(math.abs(driftRatio(probes) - 0.82 / 0.8) < 1e-9)
    val global = sessionFactor(probes.map(_.sec), 0.8)
    for (at <- Seq(0.0, 250.0, 599.0))
      assert(math.abs(factorAt(probes, 0.8, at) - global) < 0.06)
  }

  test("a box that speeds UP mid-session also flags drift (a too-fast " +
      "tail must not hide behind a slow early factor)") {
    val probes = Seq(Probe(0.0, 1.4), Probe(600.0, 0.7))
    assert(drifted(probes))
    assert(driftRatio(probes) < 1.0)
    // late factor is 1.0 (0.7/0.7): a 2x regression measured late
    // trips even though the early probe would have excused it at 2x
    assert(isTrip(2.0, Band(1.0, 1.2), factorAt(probes, 0.7, 600.0)))
  }

  test("drift helpers degrade safely on empty/singleton probes") {
    assert(!drifted(Nil))
    assert(!drifted(Seq(Probe(0.0, 1.0))))
    assert(driftRatio(Nil) == 1.0)
    assert(factorAt(Nil, 0.7, 100.0) == 1.0)
    assert(factorAt(Seq(Probe(0.0, 1.4)), 0.0, 100.0) == 1.0)
  }

  test("pairProbe keeps the min of back-to-back runs and reports the " +
      "pair spread (r16 ask #7)") {
    // an interference-inflated first run cannot masquerade as box speed
    val (p1, s1) = pairProbe(12.0, 2.4, 0.8)
    assert(p1 == Probe(12.0, 0.8))
    assert(math.abs(s1 - 3.0) < 1e-12)
    // order-independent
    val (p2, s2) = pairProbe(12.0, 0.8, 2.4)
    assert(p2 == p1 && math.abs(s2 - s1) < 1e-12)
    // clean pair: spread 1, min is either run
    val (p3, s3) = pairProbe(0.0, 1.0, 1.0)
    assert(p3.sec == 1.0 && math.abs(s3 - 1.0) < 1e-12)
    // the min-kept probe feeds the same conservative factor math: a
    // genuine 3x regression still trips at the pair-min factor
    val f = sessionFactor(Seq(p1.sec), 0.8)
    assert(isTrip(3.0, Band(1.0, 1.0), f))
  }
}
