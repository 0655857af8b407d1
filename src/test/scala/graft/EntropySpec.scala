package graft

/** The micro-nat fixed-point safety margin the ta_entropy oracle relies
  * on: Spark and DuckDB both compute ln() within 1 ulp; rounding
  * round(ln(c)·10⁶) can only diverge if some count c lands within ~1e-8
  * of a .5 boundary. Prove the margin for every plausible count.
  */
class EntropySpec extends org.scalatest.funsuite.AnyFunSuite {

  test("round(ln(c)*1e6) is far from every .5 boundary for c up to 200k") {
    var minMargin = Double.MaxValue
    var argmin = 0
    var c = 2
    while (c <= 200000) {
      val x = math.log(c.toDouble) * 1e6
      val margin = math.abs(x - math.floor(x) - 0.5)
      if (margin < minMargin) { minMargin = margin; argmin = c }
      c += 1
    }
    // a 1-ulp ln() disagreement shifts x by at most ulp(ln 200000)·10⁶ ≈
    // 1.8e-9 at these magnitudes; the observed minimum margin is 3.6e-7
    // (at c=132979) — 200× headroom. Assert two orders above the drift.
    assert(minMargin > 1e-7, s"count $argmin sits $minMargin from a rounding boundary")
  }

  test("entropy terms: ln(1) contributes exactly zero") {
    assert(math.round(math.log(1.0) * 1e6) == 0L)
  }
}
