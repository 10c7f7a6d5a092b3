package graft.dp

/** Zipf–Mandelbrot sampler over {1..N} with P(k) ∝ 1/(k+q)^s, via inverse-
  * transform sampling on a precomputed CDF with binary search — the synthetic
  * workload generator of DP-SQLP §5.1. Behavioral port of
  * examples/synthetic-benchmark-confidential/host/.../util/ZipfMandelbrotDistribution.java:16-116.
  *
  * The CDF is O(N) doubles; at paper scale (N = 1e6) that is 8 MB — build one
  * per executor/partition (e.g. inside `mapPartitions`), not per row.
  */
final class ZipfMandelbrot(val n: Int, val q: Double, val s: Double) extends Serializable {
  require(n > 0, "N must be positive")
  require(q >= 0, "q must be >= 0")
  require(s > 0, "s must be > 0")

  /** Generalized harmonic number H_{N,q,s} = Σ_{i=1..N} 1/(i+q)^s. */
  private def harmonic(exponent: Double): Double = {
    var h = 0.0
    var i = 1
    while (i <= n) { h += 1.0 / math.pow(i + q, exponent); i += 1 }
    h
  }

  private val hNqs: Double = harmonic(s)

  /** CDF over ranks 1..N; last entry pinned to exactly 1.0. */
  lazy val cdf: Array[Double] = {
    val out = new Array[Double](n)
    var running = 0.0
    var k = 1
    while (k <= n) {
      running += 1.0 / math.pow(k + q, s)
      out(k - 1) = running / hNqs
      k += 1
    }
    out(n - 1) = 1.0
    out
  }

  /** Probability mass of rank k. */
  def pmf(k: Int): Double = {
    require(k >= 1 && k <= n, s"rank $k out of [1, $n]")
    1.0 / math.pow(k + q, s) / hNqs
  }

  /** Inverse-transform sample: rank in [1, N] for uniform u in [0, 1). */
  def sample(u: Double): Int = {
    val c = cdf
    var left = 0
    var right = n - 1
    while (left < right) {
      val mid = (left + right) / 2
      if (c(mid) < u) left = mid + 1 else right = mid
    }
    left + 1
  }

  def sample(random: java.util.Random): Int = sample(random.nextDouble())

  /** Theoretical mean (H_{N,q,s−1} / H_{N,q,s}) − q. */
  def mean: Double = harmonic(s - 1) / hNqs - q
}
