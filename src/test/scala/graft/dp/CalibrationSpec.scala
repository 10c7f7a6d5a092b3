package graft.dp

import org.scalatest.funsuite.AnyFunSuite

/** Pins the calibration pipeline to the reference's committed numbers
  * (BASELINE.md; benchmark/utility/benchmark_T100_20260610_010459.csv and
  * benchmark_T1000_20260613_114037.csv cols 11-17): ε=6, δ=1e-9 split as
  * ε_k=ε_h=3, δ_k=2δ/3, δ_h=δ/3; C=32, L_m=1, α=0.5, ZCDP_LINEAR. */
class CalibrationSpec extends AnyFunSuite {

  private val epsK = 3.0
  private val deltaK = 2.0 / 3.0 * 1e-9
  private val epsH = 3.0
  private val deltaH = 1.0 / 3.0 * 1e-9

  test("ZCDP_LINEAR rho is the exact linear share: C rounds compose to the total budget") {
    val lin = Calibration.keySelectionRoundBudget(CompositionMode.ZcdpLinear, epsK, deltaK, 32, 0.5)
    val total = Calibration.cdpRho(epsK, deltaK)
    assert(math.abs(32 * lin.rho - total) < 1e-12, s"32*rho=${32 * lin.rho} total=$total")
    // the CSV-compat mode over-recovers rho (that is WHY it is quarantined)
    val csv = Calibration.keySelectionRoundBudget(CompositionMode.ZcdpLinearCsvCompat, epsK, deltaK, 32, 0.5)
    assert(csv.rho > lin.rho)
    // eps/delta round (and hence beta/threshold) are shared between the modes
    assert(csv.epsilon === lin.epsilon && csv.delta === lin.delta)
  }

  test("T=100 ZCDP_LINEAR (sound linear share): sigma_key 30.79, same threshold") {
    val cal = Calibration.calibrate(CompositionMode.ZcdpLinear, epsK, deltaK, epsH, deltaH,
      c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal.sigmaKey - 30.7901) < 0.01, s"sigmaKey=${cal.sigmaKey}")
    assert(math.abs(cal.sigmaHist - 177.1696) < 0.01, s"sigmaHist=${cal.sigmaHist}")
    assert(math.abs(cal.thresholdQuantile - 6.8506) < 0.001, s"quantile=${cal.thresholdQuantile}")
    val cal1000 = Calibration.calibrate(CompositionMode.ZcdpLinear, epsK, deltaK, epsH, deltaH,
      c = 32, t = 1000, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal1000.sigmaKey - 36.8012) < 0.01, s"sigmaKey(T=1000)=${cal1000.sigmaKey}")
  }

  test("T=100 CSV-compat matches committed baseline: sigma_key, sigma_hist, quantile, eps/delta round") {
    val cal = Calibration.calibrate(CompositionMode.ZcdpLinearCsvCompat, epsK, deltaK, epsH, deltaH,
      c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal.sigmaKey - 27.8508) < 0.01, s"sigmaKey=${cal.sigmaKey}")
    assert(math.abs(cal.sigmaHist - 177.1696) < 0.01, s"sigmaHist=${cal.sigmaHist}")
    assert(math.abs(cal.thresholdQuantile - 6.8506) < 0.001, s"quantile=${cal.thresholdQuantile}")
    assert(math.abs(cal.epsilonKeyRound - 0.6064) < 0.001, s"epsRound=${cal.epsilonKeyRound}")
    assert(math.abs(cal.deltaKeyRound - 2.083e-11) / 2.083e-11 < 0.01, s"deltaRound=${cal.deltaKeyRound}")
  }

  test("T=100: diagnostic tau-at-last-step matches committed 358.35") {
    val cal = Calibration.calibrate(CompositionMode.ZcdpLinearCsvCompat, epsK, deltaK, epsH, deltaH,
      c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    // CSV diagnostic (UtilityBenchmarkTest.java:476-478): kappa full-subtree
    // Honaker node variances, tau = sqrt(kappa · sigma²/(2(1−2^−kappa))) · quantile
    val kappa = 7.0
    val nodeVar = cal.sigmaKey * cal.sigmaKey / (2.0 * (1.0 - math.pow(2.0, -kappa)))
    val tauT = math.sqrt(kappa * nodeVar) * cal.thresholdQuantile
    assert(math.abs(tauT - 358.35) < 0.5, s"tau(T)=$tauT")
  }

  test("T=1000 CSV-compat matches committed baseline") {
    val cal = Calibration.calibrate(CompositionMode.ZcdpLinearCsvCompat, epsK, deltaK, epsH, deltaH,
      c = 32, t = 1000, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal.sigmaKey - 33.2881) < 0.01, s"sigmaKey=${cal.sigmaKey}")
    assert(math.abs(cal.sigmaHist - 211.7581) < 0.01, s"sigmaHist=${cal.sigmaHist}")
    val kappa = 10.0
    val nodeVar = cal.sigmaKey * cal.sigmaKey / (2.0 * (1.0 - math.pow(2.0, -kappa)))
    val tauT = math.sqrt(kappa * nodeVar) * cal.thresholdQuantile
    assert(math.abs(tauT - 510.17) < 0.5, s"tau(T)=$tauT")
  }

  test("cdpRho/cdpDelta are inverse-consistent and monotone") {
    val rho = Calibration.cdpRho(1.0, 1e-6)
    assert(rho > 0 && rho < 1)
    assert(Calibration.cdpDelta(rho, 1.0) <= 1e-6 * 1.001)
    assert(Calibration.cdpRho(2.0, 1e-6) > rho)
    assert(Calibration.cdpRho(1.0, 1e-9) < rho)
  }

  test("composition modes order: ZCDP_LINEAR rho >= KOV rho >= Dwork rho (tightness)") {
    val zcdp = Calibration.keySelectionRoundBudget(CompositionMode.ZcdpLinear, epsK, deltaK, 32, 0.5)
    val kov = Calibration.keySelectionRoundBudget(CompositionMode.OptimalKov, epsK, deltaK, 32, 0.5)
    val dwork = Calibration.keySelectionRoundBudget(CompositionMode.DworkAnalytical, epsK, deltaK, 32, 0.5)
    assert(zcdp.rho >= kov.rho, s"zcdp=${zcdp.rho} kov=${kov.rho}")
    assert(kov.rho >= dwork.rho * 0.999, s"kov=${kov.rho} dwork=${dwork.rho}")
  }

  test("C=1 short-circuits composition") {
    val b = Calibration.keySelectionPerRoundBudget(2.0, 1e-8, 1)
    assert(b.epsilon === 2.0 && b.delta === 1e-8)
  }

  test("thresholdQuantile matches commons-math3 inverse CDF") {
    assert(math.abs(Calibration.thresholdQuantile(1e-5) - 4.2649) < 0.001)
    assert(math.abs(Calibration.thresholdQuantile(0.5)) < 1e-9)
  }
}
