package graft.dp

import org.scalatest.funsuite.AnyFunSuite

class ZipfMandelbrotSpec extends AnyFunSuite {

  test("pmf sums to 1 and is monotone decreasing") {
    val z = new ZipfMandelbrot(1000, 26.0, 6.738)
    val total = (1 to 1000).map(z.pmf).sum
    assert(math.abs(total - 1.0) < 1e-9)
    for (k <- 1 until 1000) assert(z.pmf(k) >= z.pmf(k + 1))
  }

  test("cdf is monotone and ends at exactly 1.0") {
    val z = new ZipfMandelbrot(500, 1000.0, 1.4)
    val c = z.cdf
    for (i <- 1 until c.length) assert(c(i) >= c(i - 1))
    assert(c.last === 1.0)
  }

  test("sampling is deterministic under a seed and matches inverse transform") {
    val z = new ZipfMandelbrot(100, 10.0, 2.0)
    val r1 = new java.util.Random(42L)
    val r2 = new java.util.Random(42L)
    val s1 = (0 until 1000).map(_ => z.sample(r1))
    val s2 = (0 until 1000).map(_ => z.sample(r2))
    assert(s1 === s2)
    assert(s1.forall(k => k >= 1 && k <= 100))
  }

  test("empirical mean approaches theoretical mean") {
    val z = new ZipfMandelbrot(1000, 26.0, 3.0)
    val rnd = new java.util.Random(7L)
    val n = 100000
    var sum = 0.0
    for (_ <- 0 until n) sum += z.sample(rnd)
    val empirical = sum / n
    assert(math.abs(empirical - z.mean) / z.mean < 0.05, s"empirical=$empirical theory=${z.mean}")
  }

  test("paper parameters: key distribution is heavily skewed") {
    val z = new ZipfMandelbrot(100000, 1000.0, 1.4)
    // head rank should dominate deep tail rank
    assert(z.pmf(1) > z.pmf(50000) * 100)
  }
}
