package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.health._

/** Exact-formula checks of the health calculus (base_analyzer.py:52-101) +
  * ScalaCheck invariants the reference never pinned. */
class HealthScoreSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("perfect table scores 100 / healthy") {
    val m = DeltaAnalyzerMetrics(numberOfWrites = 10, numberOfOptimizes = 1)
    val (score, status) = HealthScore.compute(m)
    assert(score === 100.0)
    assert(status === HealthStatus.Healthy)
  }

  test("component formulas match the reference bit-for-bit") {
    val m = DeltaAnalyzerMetrics(
      numberOfWrites = 4, numberOfOptimizes = 1, needsVacuum = true,
      skewnessMax = 0.15, smallFilesCount = 3, hasOrphanFiles = true)
    val c = HealthScore.components(m)
    assert(c.dataFreshness === math.min(4.0 / 10 * 25, 25))        // 10.0
    assert(c.maintenance === math.min(1.0 / 4 * 10 * 12.5, 12.5))  // 12.5 + vacuum 0
    assert(c.dataBalance === 25.0 - math.min(0.15 * 100, 25))      // 10.0
    assert(c.storageEfficiency === 25.0 - math.min(3.0 / 8 * 12.5, 12.5) - 12.5)
    assert(HealthScore.compute(m)._1 === c.total)
  }

  test("skew_metrics value takes precedence over the flat field (base_analyzer.py:76)") {
    val m = DeltaAnalyzerMetrics(skewnessMax = 0.9,
      skewMetrics = Some(SkewMetrics(skewnessMax = 0.0)))
    assert(HealthScore.components(m).dataBalance === 25.0)
  }

  test("status bands: >=80 healthy, >=50 unhealthy, else very_unhealthy") {
    assert(HealthStatus.ofScore(80) === HealthStatus.Healthy)
    assert(HealthStatus.ofScore(79.99) === HealthStatus.Unhealthy)
    assert(HealthStatus.ofScore(50) === HealthStatus.Unhealthy)
    assert(HealthStatus.ofScore(49.99) === HealthStatus.VeryUnhealthy)
  }

  test("property: score always within [0, 100]") {
    val gen = for {
      w <- Gen.chooseNum(0L, 10000L)
      o <- Gen.chooseNum(0L, 10000L)
      s <- Gen.chooseNum(0L, 10000L)
      skew <- Gen.chooseNum(0.0, 1.0)
      nv <- Gen.oneOf(true, false)
      orph <- Gen.oneOf(true, false)
    } yield DeltaAnalyzerMetrics(numberOfWrites = w, numberOfOptimizes = o,
      smallFilesCount = s, skewnessMax = skew, needsVacuum = nv,
      hasOrphanFiles = orph)
    check(Prop.forAll(gen) { m =>
      val (score, _) = HealthScore.compute(m)
      score >= 0.0 && score <= 100.0
    })
  }
}
