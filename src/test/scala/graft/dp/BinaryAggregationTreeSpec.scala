package graft.dp

import org.scalatest.funsuite.AnyFunSuite

/** Naive level-scan Honaker estimator, behaviorally identical to the
  * reference's BinaryAggregationTree.java:131-249 — used as the oracle for
  * the O(log n) incremental implementation, mirroring the reference's own
  * optimized-vs-naive equivalence test (BinaryAggregationTreeTest.java:28-73).
  */
final class NaiveTree(n: Int, noiseValues: Int => Double) {
  val height: Int = if (n == 1) 0 else 32 - Integer.numberOfLeadingZeros(n - 1)
  val numLeaves: Int = 1 << height
  val tree: Array[Double] = Array.tabulate(2 * numLeaves - 1)(noiseValues)

  def addToTree(i: Int, x: Double): Unit = {
    var index = numLeaves - 1 + i
    while (index > 0) { tree(index) += x; index = (index - 1) / 2 }
    tree(0) += x
  }

  private def honakerEstimate(nodeIndex: Int, k: Int): Double = {
    var level = List(nodeIndex)
    var estimate = 0.0
    for (j <- 0 until k) {
      val sumLevel = level.map(tree(_)).sum
      val cj = (1.0 / (1L << j)) / (2.0 * (1.0 - 1.0 / (1L << k)))
      estimate += cj * sumLevel
      if (j < k - 1) level = level.flatMap(idx => List(2 * idx + 1, 2 * idx + 2))
    }
    estimate
  }

  /** Canonical prefix decomposition with a pluggable per-node estimator
    * ((nodeIndex, kappa) → estimate), so the Honaker and raw-node variants
    * share one bit-walk. */
  def getTotalSumWith(i: Int)(nodeEstimate: (Int, Int) => Double): Double = {
    val indexBinary = i + 1
    var nodeIndex = 0
    var sPriv = 0.0
    for (j <- 0 to height) {
      val levelBit = (indexBinary >> (height - j)) & 1
      if (levelBit == 1) {
        val leftSibling =
          if (nodeIndex == 0) 0
          else if (nodeIndex % 2 == 0) nodeIndex - 1
          else nodeIndex
        sPriv += nodeEstimate(leftSibling, height - j + 1)
      }
      if (j < height) {
        val pathBit = (i >> (height - 1 - j)) & 1
        nodeIndex = if (pathBit == 0) 2 * nodeIndex + 1 else 2 * nodeIndex + 2
      }
    }
    sPriv
  }

  def getTotalSum(i: Int): Double = getTotalSumWith(i)(honakerEstimate)

  /** Naive canonical sum: raw stored node values, no variance reduction. */
  def getTotalSumRaw(i: Int): Double = getTotalSumWith(i)((node, _) => tree(node))
}

class BinaryAggregationTreeSpec extends AnyFunSuite {

  test("sigma=0: prefix sums are exact for sequential adds") {
    for (n <- Seq(1, 2, 3, 5, 8, 100)) {
      val t = BinaryAggregationTree(n, 0.0, NoiseSource.Zero)
      val xs = Array.tabulate(n)(i => (i + 1).toDouble)
      var prefix = 0.0
      for (i <- 0 until n) {
        t.addToTree(i, xs(i))
        prefix += xs(i)
        assert(math.abs(t.getTotalSum(i) - prefix) < 1e-9, s"n=$n i=$i")
      }
    }
  }

  test("sigma=0: non-sequential adds accumulate at the same leaf") {
    val t = BinaryAggregationTree(10, 0.0, NoiseSource.Zero)
    t.addToTree(3, 5.0); t.addToTree(3, 2.5); t.addToTree(7, 1.0)
    assert(t.getTotalSum(2) === 0.0)
    assert(t.getTotalSum(3) === 7.5)
    assert(t.getTotalSum(6) === 7.5)
    assert(t.getTotalSum(9) === 8.5)
  }

  test("matches naive level-scan oracle with noise, across sizes and indices") {
    val gen = new java.util.Random(20260812L)
    for (_ <- 0 until 60) {
      val n = 1 + gen.nextInt(70)
      val seed = gen.nextLong()
      val noise = NoiseSource.seeded(seed)
      val sigma = 3.0
      val fast = BinaryAggregationTree(n, sigma, noise)
      val naive = new NaiveTree(n, idx => noise.standardGaussian(idx) * sigma)
      val rnd = new java.util.Random(seed)
      for (_ <- 0 until 20) {
        val leaf = rnd.nextInt(fast.numLeaves)
        val x = rnd.nextDouble() * 10 - 5
        fast.addToTree(leaf, x)
        naive.addToTree(leaf, x)
      }
      for (i <- 0 until fast.numLeaves) {
        val a = fast.getTotalSum(i)
        val b = naive.getTotalSum(i)
        assert(math.abs(a - b) < 1e-8 * math.max(1.0, math.abs(b)), s"n=$n i=$i fast=$a naive=$b")
      }
    }
  }

  test("Honaker variance: leaf-only prefix has variance sigma^2 (kappa=1 term)") {
    val sigma = 2.0
    val t = BinaryAggregationTree(8, sigma, NoiseSource.Zero)
    // prefix [0..0] decomposes to the single leaf: kappa=1 ⇒ sigma^2/(2(1-1/2)) = sigma^2
    assert(math.abs(t.getHonakerVariance(0) - sigma * sigma) < 1e-12)
    // full prefix [0..7] is the root estimate: kappa=height+1=4 ⇒ sigma^2/(2(1-1/16))
    val expected = sigma * sigma / (2.0 * (1.0 - 1.0 / 16.0))
    assert(math.abs(t.getHonakerVariance(7) - expected) < 1e-12)
  }

  test("variance is monotone non-increasing in subtree size per canonical node count") {
    val t = BinaryAggregationTree(128, 1.0, NoiseSource.Zero)
    // prefix of 2^k leaves uses a single canonical node whose variance shrinks with k
    val v1 = t.getHonakerVariance(0)    // 1 leaf
    val v2 = t.getHonakerVariance(1)    // 2 leaves, one node kappa=2
    val v128 = t.getHonakerVariance(127)
    assert(v2 < v1 && v128 < v2)
  }

  test("seeded noise is reproducible; secure noise is not degenerate") {
    val a = BinaryAggregationTree(16, 1.0, NoiseSource.seeded(42L))
    val b = BinaryAggregationTree(16, 1.0, NoiseSource.seeded(42L))
    val c = BinaryAggregationTree(16, 1.0, NoiseSource.seeded(43L))
    assert(a.getTotalSum(7) === b.getTotalSum(7))
    assert(a.getTotalSum(7) !== c.getTotalSum(7))
    val s = BinaryAggregationTree(16, 1.0)
    assert(s.getTotalSum(7) !== 0.0)
  }

  test("seeded standard gaussians have plausible moments") {
    val noise = NoiseSource.seeded(7L)
    val n = 200000
    var sum = 0.0
    var sumSq = 0.0
    for (i <- 0 until n) { val g = noise.standardGaussian(i); sum += g; sumSq += g * g }
    val mean = sum / n
    val variance = sumSq / n - mean * mean
    assert(math.abs(mean) < 0.01, s"mean=$mean")
    assert(math.abs(variance - 1.0) < 0.02, s"var=$variance")
  }
}
