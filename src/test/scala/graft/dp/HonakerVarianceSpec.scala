package graft.dp

import org.scalatest.funsuite.AnyFunSuite

/** Statistical pins ported from the reference's mechanism tests
  * (StreamingDPMechanismTest.java:182-221): the empirical variance of the
  * tree's prefix-sum estimate must track the theoretical Honaker variance,
  * and the Honaker estimator must beat the naive canonical-node sum. */
class HonakerVarianceSpec extends AnyFunSuite {

  test("empirical prefix-sum variance matches the precomputed Honaker variance") {
    val t = 100
    val sigma = 4.0
    val leaf = 77 // prefix over an awkward (multi-node) decomposition
    val runs = 4000
    var sum = 0.0
    var sumSq = 0.0
    for (r <- 0 until runs) {
      val tree = BinaryAggregationTree(t, sigma, NoiseSource.seeded(1000L + r))
      val v = tree.getTotalSum(leaf) // no data: pure noise estimate
      sum += v
      sumSq += v * v
    }
    val mean = sum / runs
    val empVar = sumSq / runs - mean * mean
    val theory = BinaryAggregationTree(t, sigma, NoiseSource.Zero).getHonakerVariance(leaf)
    assert(math.abs(mean) < 3 * math.sqrt(theory / runs) * 2, s"mean=$mean")
    assert(math.abs(empVar - theory) / theory < 0.15, s"empirical=$empVar theory=$theory")
  }

  test("Honaker estimate has lower variance than the naive canonical-node sum") {
    val t = 64
    val sigma = 3.0
    val leaf = 62 // decomposition touches several subtree roots
    val runs = 3000
    var honakerSq = 0.0
    var naiveSq = 0.0
    for (r <- 0 until runs) {
      val noise = NoiseSource.seeded(5000L + r)
      val tree = BinaryAggregationTree(t, sigma, noise)
      val h = tree.getTotalSum(leaf)
      honakerSq += h * h
      // naive estimator: sum the canonical nodes' raw stored values — what
      // Algorithm 4 would do WITHOUT Appendix C; same decomposition walk
      val naive = new NaiveTree(t, i => noise.standardGaussian(i) * sigma)
      val s = naive.getTotalSumRaw(leaf)
      naiveSq += s * s
    }
    val honakerVar = honakerSq / runs
    val naiveVar = naiveSq / runs
    assert(honakerVar < naiveVar, s"honaker=$honakerVar naive=$naiveVar")
  }
}
