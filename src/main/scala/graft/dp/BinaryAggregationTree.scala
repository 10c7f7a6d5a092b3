package graft.dp

/** Noisy binary aggregation tree for differentially private prefix sums —
  * Algorithm 4 of "Differentially Private Stream Processing at Scale"
  * (arXiv:2303.18086) with bottom-up Honaker variance reduction (Appendix C).
  *
  * Semantics match the reference implementation
  * (confidentialstorm/enclave/.../dp/BinaryAggregationTree.java:17-321):
  *
  *   - complete binary tree over `L = 2^ceil(log2(n))` leaves, one per time
  *     step; every node pre-seeded with independent `N(0, σ²)` noise;
  *   - `addToTree(i, x)` adds `x` to every node on the leaf-i → root path;
  *   - `getTotalSum(i)` returns the DP prefix sum over leaves `[0..i]` via the
  *     canonical dyadic decomposition, estimating each canonical node with the
  *     Honaker bottom-up weighted estimate
  *     `Σ_{j=0..k-1} c_j · (sum of node values at subtree level j)`,
  *     `c_j = 2^{-j} / (2 (1 − 2^{-k}))`, `k` = number of subtree levels;
  *   - the prefix-sum variance is `Σ σ² / (2 (1 − 2^{-κ}))` over the canonical
  *     nodes, cached per leaf.
  *
  * == Implementation: O(log n) per operation ==
  *
  * The reference recomputes each Honaker estimate with a full level scan of
  * the subtree (O(subtree size), so O(n) per `getTotalSum`). We instead store
  * the *estimate itself* per node and maintain it incrementally:
  *
  * Let `g(v) = Σ_{j≥0} 2^{-j} S_j(v)` where `S_j(v)` is the sum of stored node
  * values at level `j` below `v`. Then `g(leaf) = value(leaf)` and
  * `g(v) = value(v) + (g(left) + g(right)) / 2`, so the initial noise-only `g`
  * is computable bottom-up in O(n). The Honaker estimate is
  * `est(v) = g(v) / norm(k)` with `norm(k) = Σ_{j=0..k-1} 2^{-j} = 2(1−2^{-k})`.
  *
  * `addToTree(i, x)` adds `x` to one node per level of every ancestor's
  * subtree path, contributing `x · norm(k)` to `g(ancestor)` — i.e. exactly
  * `+x` to `est(ancestor)`. So updates are an O(log n) path walk over the
  * estimate array, and `getTotalSum` is an O(log n) walk over the canonical
  * decomposition. Output is bit-for-bit the same estimator as the reference's
  * level scans (verified against a ported naive oracle in
  * BinaryAggregationTreeSpec).
  */
final class BinaryAggregationTree private (
    val numSteps: Int,
    val sigma: Double,
    /** est(v): Honaker estimate per node, heap layout (root = 0). */
    private val est: Array[Double],
    private val varianceCache: Array[Double],
    val height: Int,
    val numLeaves: Int)
    extends Serializable {

  /** Adds `x` at leaf `i`: every ancestor's Honaker estimate grows by exactly
    * `x` (see class doc), which is the whole path update. */
  def addToTree(i: Int, x: Double): Unit = {
    require(i >= 0 && i < numLeaves, s"leaf index $i out of [0, $numLeaves)")
    if (x != 0.0) {
      var index = numLeaves - 1 + i
      while (index > 0) {
        est(index) += x
        index = (index - 1) / 2
      }
      est(0) += x
    }
  }

  /** DP prefix sum over leaves [0..i]: walk the root→leaf path; whenever the
    * (i+1) bit says the prefix covers a completed left subtree, add that
    * subtree root's Honaker estimate. Mirrors the reference's decomposition
    * (BinaryAggregationTree.java:131-185) node-for-node. */
  def getTotalSum(i: Int): Double = {
    require(i >= 0 && i < numLeaves, s"leaf index $i out of [0, $numLeaves)")
    val indexBinary = i + 1
    var nodeIndex = 0
    var sPriv = 0.0
    var j = 0
    while (j <= height) {
      val levelBit = (indexBinary >> (height - j)) & 1
      if (levelBit == 1) {
        val leftSibling =
          if (nodeIndex == 0) 0
          else if (nodeIndex % 2 == 0) nodeIndex - 1
          else nodeIndex
        sPriv += est(leftSibling)
      }
      if (j < height) {
        val pathBit = (i >> (height - 1 - j)) & 1
        val leftChild = 2 * nodeIndex + 1
        nodeIndex = if (pathBit == 0) leftChild else leftChild + 1
      }
      j += 1
    }
    sPriv
  }

  /** Total Honaker variance of the prefix-sum estimate at leaf `i`. */
  def getHonakerVariance(i: Int): Double = varianceCache(i)
}

object BinaryAggregationTree {

  /** Builds a tree over `n` time steps with per-node noise `σ · N(0,1)` drawn
    * from `noise` (defaults to `SecureRandom`, reference parity). */
  def apply(n: Int, sigma: Double, noise: NoiseSource = NoiseSource.secure()): BinaryAggregationTree = {
    require(n >= 1, s"n must be >= 1; got $n")
    val height = if (n == 1) 0 else 32 - Integer.numberOfLeadingZeros(n - 1) // ceil(log2 n)
    val numLeaves = 1 << height
    val size = 2 * numLeaves - 1

    // Raw noise per node, then fold bottom-up into g and normalize into the
    // per-node Honaker estimates (class doc).
    val est = new Array[Double](size)
    if (sigma != 0.0) {
      var v = 0
      while (v < size) { est(v) = noise.standardGaussian(v) * sigma; v += 1 }
      // g(v) = value(v) + (g(left)+g(right))/2, computed leaves-first.
      v = numLeaves - 2
      while (v >= 0) {
        est(v) += (est(2 * v + 1) + est(2 * v + 2)) / 2.0
        v -= 1
      }
      // est(v) = g(v) / norm(levels below v)
      var levelStart = 0
      var nodesAtLevel = 1
      var depth = 0
      while (depth <= height) {
        val k = height - depth + 1 // subtree levels incl. the node itself
        val norm = 2.0 * (1.0 - 1.0 / (1L << k))
        var i = levelStart
        val end = levelStart + nodesAtLevel
        while (i < end) { est(i) /= norm; i += 1 }
        levelStart = end
        nodesAtLevel *= 2
        depth += 1
      }
    }

    val varianceCache = precomputeVariances(sigma, height, numLeaves)
    new BinaryAggregationTree(n, sigma, est, varianceCache, height, numLeaves)
  }

  /** Per-leaf prefix-sum variance: for each canonical node of the prefix
    * decomposition, σ² / (2 (1 − 2^{-κ})) (reference :285-319). */
  private def precomputeVariances(sigma: Double, height: Int, numLeaves: Int): Array[Double] = {
    val cache = new Array[Double](numLeaves)
    var i = 0
    while (i < numLeaves) {
      val indexBinary = i + 1
      var totalVariance = 0.0
      var j = 0
      while (j <= height) {
        val levelBit = (indexBinary >> (height - j)) & 1
        if (levelBit == 1) {
          val kappa = height - j + 1
          totalVariance += (sigma * sigma) / (2.0 * (1.0 - 1.0 / (1L << kappa)))
        }
        j += 1
      }
      cache(i) = totalVariance
      i += 1
    }
    cache
  }
}
