package graft.dp

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's mechanism test ideas
  * (StreamingDPMechanismTest.java:27-394): zero-noise exactness, the μ gate,
  * carried-forward histograms, unique-user dedup (sensitivity 1), and noise
  * statistics. */
class StreamingDpMechanismSpec extends AnyFunSuite {

  private def zeroNoiseMech(t: Int, mu: Long = 0L) =
    new StreamingDpMechanism(DpParams.zeroNoise(t, mu), (_, _) => NoiseSource.Zero)

  test("sigma=0, mu=0: single key, counts are exact and carried forward") {
    val m = zeroNoiseMech(10)
    m.addContribution("u1", "apple", 1.0)
    m.addContribution("u2", "apple", 2.0)
    assert(m.snapshot() === Seq(("apple", 3L)))
    // silent epoch: histogram carried forward unchanged
    assert(m.snapshot() === Seq(("apple", 3L)))
    m.addContribution("u3", "apple", 4.0)
    assert(m.snapshot() === Seq(("apple", 7L)))
  }

  test("sigma=0, mu=0: multiple keys, sorted desc by count then key") {
    val m = zeroNoiseMech(10)
    m.addContribution("u1", "a", 1.0)
    m.addContribution("u2", "b", 5.0)
    m.addContribution("u3", "c", 5.0)
    assert(m.snapshot() === Seq(("b", 5L), ("c", 5L), ("a", 1L)))
  }

  test("sigma=0, mu gate: key released only once unique users reach mu") {
    val m = zeroNoiseMech(10, mu = 3)
    m.addContribution("u1", "k", 1.0)
    m.addContribution("u2", "k", 1.0)
    assert(m.snapshot().isEmpty) // 2 unique users < 3
    m.addContribution("u2", "k", 1.0) // duplicate user: does not count again
    assert(m.snapshot().isEmpty)
    m.addContribution("u3", "k", 1.0)
    // 3 unique users: released with the full buffered sum 1+1+1+1
    assert(m.snapshot() === Seq(("k", 4L)))
  }

  test("sigma=0: unique-user dedup keeps selection statistic at distinct-count (sensitivity 1)") {
    val m = zeroNoiseMech(10, mu = 5)
    for (_ <- 0 until 100) m.addContribution("sameUser", "k", 1.0)
    assert(m.snapshot().isEmpty) // 1 unique user despite 100 contributions
  }

  test("sigma=0: selection round resets after release (users re-count next round)") {
    val m = zeroNoiseMech(10, mu = 2)
    m.addContribution("u1", "k", 1.0)
    m.addContribution("u2", "k", 1.0)
    assert(m.snapshot() === Seq(("k", 2L)))
    // next round needs mu NEW unique contributions again; u1 alone not enough
    m.addContribution("u1", "k", 1.0)
    assert(m.snapshot() === Seq(("k", 2L))) // carried forward, not updated
    m.addContribution("u2", "k", 1.0)
    // u1 (prev epoch) + u2 now = 2 unique this round: release with buffer 1+1
    assert(m.snapshot() === Seq(("k", 4L)))
  }

  test("sigma=0: negatives clamp to zero in released histogram") {
    val m = zeroNoiseMech(10)
    m.addContribution("u1", "k", -5.0)
    assert(m.snapshot() === Seq(("k", 0L)))
  }

  test("stops processing after maxTimeSteps") {
    val m = zeroNoiseMech(2)
    m.addContribution("u1", "k", 1.0)
    assert(m.snapshot() === Seq(("k", 1L)))
    m.addContribution("u2", "k", 1.0)
    assert(m.snapshot() === Seq(("k", 2L)))
    // budget exhausted: further contributions ignored, histogram frozen
    m.addContribution("u3", "k", 7.0)
    assert(m.snapshot() === Seq(("k", 2L)))
  }

  test("noisy: released sums are unbiased over repeated runs") {
    val runs = 200
    val trueSum = 50.0
    var total = 0.0
    for (r <- 0 until runs) {
      val params = DpParams(1.0, 2.0, Stats.inverseNormalCdf(1.0 - 0.05), 4, 0L, 32)
      val m = new StreamingDpMechanism(params, (k, p) => NoiseSource.seeded(NoiseSource.seedFor(r.toLong, k, p)))
      for (u <- 0 until 50) m.addContribution(s"u$u", "k", 1.0)
      val hist = m.snapshot()
      // mu=0 with modest noise: key essentially always released
      total += hist.headOption.map(_._2.toDouble).getOrElse(0.0)
    }
    val mean = total / runs
    assert(math.abs(mean - trueSum) < 1.5, s"mean=$mean")
  }

  test("noisy key selection: hot keys release, cold keys mostly don't") {
    val params = DpParams(sigmaKey = 1.0, sigmaHist = 2.0,
      thresholdQuantile = Stats.inverseNormalCdf(1.0 - 0.01), maxTimeSteps = 4, mu = 5, maxContributionsPerUser = 32)
    var hotReleased = 0
    var coldReleased = 0
    for (r <- 0 until 100) {
      val m = new StreamingDpMechanism(params, (k, p) => NoiseSource.seeded(NoiseSource.seedFor(1000L + r, k, p)))
      for (u <- 0 until 100) m.addContribution(s"u$u", "hot", 1.0)
      m.addContribution("u1", "cold", 1.0)
      val hist = m.snapshot().toMap
      if (hist.contains("hot")) hotReleased += 1
      if (hist.contains("cold")) coldReleased += 1
    }
    assert(hotReleased === 100, s"hot released $hotReleased/100")
    assert(coldReleased <= 5, s"cold released $coldReleased/100")
  }

  test("Algorithm 3: positive-drift selection tree triggers predicted release on a silent epoch") {
    // Construct noise so the selection prefix-sum grows with time even with no
    // data: a large positive root estimate makes future prefix sums cross the
    // gate at the final steps. We use a deterministic seeded source and scan
    // seeds until one yields a prediction, then assert the release fires with
    // no further data.
    val quantile = Stats.inverseNormalCdf(1.0 - 0.4) // loose gate
    var seed = 0L
    var fired = false
    while (!fired && seed < 300) {
      val params = DpParams(sigmaKey = 5.0, sigmaHist = 0.0, thresholdQuantile = quantile,
        maxTimeSteps = 16, mu = 2, maxContributionsPerUser = 32)
      val m = new StreamingDpMechanism(params, (k, p) => NoiseSource.seeded(NoiseSource.seedFor(seed, k, p)))
      m.addContribution("u1", "k", 3.0)
      val first = m.snapshot()
      if (first.isEmpty) {
        // not selected at t=0; if Algo 3 predicted a release, stepping silent
        // epochs must eventually emit the buffered value via noise alone
        var hist: Seq[(String, Long)] = Seq.empty
        for (_ <- 1 until 16) { val h = m.snapshot(); if (hist.isEmpty && h.nonEmpty) hist = h }
        if (hist.nonEmpty) {
          fired = true
          assert(hist.head._1 === "k")
          assert(hist.head._2 === 3L) // sigmaHist=0: released sum is the exact buffer
        }
      }
      seed += 1
    }
    assert(fired, "no seed in range produced a noise-alone predicted release; Algo 3 path never exercised")
  }
}
