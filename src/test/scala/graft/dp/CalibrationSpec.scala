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

  test("T=100 DWORK_ANALYTICAL matches the reference's committed mode-sweep row") {
    // benchmark/utility/old/benchmark_T100_20260607_170841.csv, DWORK rows:
    // eps_round=7.525603e-2, delta_round=1.031494e-11, sigma_key=215.584038,
    // beta=2.481748e-12, quantile=6.906614, tau_at_last_step=2796.526408.
    val cal = Calibration.calibrate(CompositionMode.DworkAnalytical, epsK, deltaK, epsH, deltaH,
      c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal.epsilonKeyRound - 0.07525603) < 1e-5, s"epsRound=${cal.epsilonKeyRound}")
    assert(math.abs(cal.deltaKeyRound - 1.031494e-11) / 1.031494e-11 < 0.01, s"deltaRound=${cal.deltaKeyRound}")
    assert(math.abs(cal.sigmaKey - 215.584038) < 0.05, s"sigmaKey=${cal.sigmaKey}")
    assert(math.abs(cal.sigmaHist - 177.1696) < 0.01, s"sigmaHist=${cal.sigmaHist}")
    assert(math.abs(cal.beta - 2.481748e-12) / 2.481748e-12 < 0.01, s"beta=${cal.beta}")
    assert(math.abs(cal.thresholdQuantile - 6.906614) < 0.001, s"quantile=${cal.thresholdQuantile}")
    val tau = graft.tools.UtilityGrid.tauAtLastStep(cal.sigmaKey, cal.thresholdQuantile, 100)
    assert(math.abs(tau - 2796.526408) < 1.0, s"tau=$tau")
  }

  test("T=100 OPTIMAL_KOV matches the reference's committed mode-sweep row") {
    // Same CSV, OPTIMAL_KOV rows: eps_round=9.375e-2, delta_round=
    // 2.081299e-11, sigma_key=170.976426, beta=4.959523e-12,
    // quantile=6.807674, tau_at_last_step=2186.110502.
    val cal = Calibration.calibrate(CompositionMode.OptimalKov, epsK, deltaK, epsH, deltaH,
      c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = 0.5)
    assert(math.abs(cal.epsilonKeyRound - 0.09375) < 1e-5, s"epsRound=${cal.epsilonKeyRound}")
    assert(math.abs(cal.deltaKeyRound - 2.081299e-11) / 2.081299e-11 < 0.01, s"deltaRound=${cal.deltaKeyRound}")
    assert(math.abs(cal.sigmaKey - 170.976426) < 0.05, s"sigmaKey=${cal.sigmaKey}")
    assert(math.abs(cal.beta - 4.959523e-12) / 4.959523e-12 < 0.01, s"beta=${cal.beta}")
    assert(math.abs(cal.thresholdQuantile - 6.807674) < 0.001, s"quantile=${cal.thresholdQuantile}")
    val tau = graft.tools.UtilityGrid.tauAtLastStep(cal.sigmaKey, cal.thresholdQuantile, 100)
    assert(math.abs(tau - 2186.110502) < 1.0, s"tau=$tau")
  }

  test("alpha sweep: beta scales linearly with alpha; sigma_key responds only under (eps,delta) modes") {
    // Per the privacy-tight pre-allocation, beta = alpha·delta_round/(e^eps+1)
    // in every mode; the Gaussian share (1−alpha)·delta_round moves sigma_key
    // only for DWORK/KOV (ZCDP_LINEAR's rho is the pure linear share,
    // independent of alpha — Calibration.scala:228-236).
    for (mode <- Seq(CompositionMode.DworkAnalytical, CompositionMode.OptimalKov,
        CompositionMode.ZcdpLinear)) {
      val cals = Seq(0.25, 0.5, 0.75).map(a =>
        Calibration.calibrate(mode, epsK, deltaK, epsH, deltaH,
          c = 32, t = 100, perRecordClamp = 1.0, thresholdFailureFraction = a))
      assert(math.abs(cals(1).beta / cals(0).beta - 2.0) < 1e-9, s"$mode beta not linear in alpha")
      assert(math.abs(cals(2).beta / cals(0).beta - 3.0) < 1e-9, s"$mode beta not linear in alpha")
      mode match {
        case CompositionMode.ZcdpLinear =>
          assert(cals.map(_.sigmaKey).distinct.size == 1, s"ZCDP sigma_key moved with alpha")
        case _ =>
          // more alpha -> less Gaussian delta share -> larger sigma_key
          assert(cals(0).sigmaKey < cals(1).sigmaKey && cals(1).sigmaKey < cals(2).sigmaKey,
            s"$mode sigma_key not increasing in alpha: ${cals.map(_.sigmaKey)}")
      }
    }
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
