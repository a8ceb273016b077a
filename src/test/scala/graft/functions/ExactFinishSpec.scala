package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The fast 128-bit finish must be BIT-IDENTICAL to the BigInteger
  * chain it replaces — correctly-rounded conversion is unique, so any
  * divergence is a bug, not a tolerance. Pinned over adversarial
  * magnitudes, both regimes of the fast/fallback switch, and the
  * rounding boundaries (guard/sticky/nearest-even carry).
  */
class ExactFinishSpec extends AnyFunSuite {

  private def refDouble(hi: Long, lo: Long): Double =
    new JBigDecimal(PearsonArrays.big(hi, lo)).doubleValue()

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("toDouble128 == BigDecimal.doubleValue on every magnitude regime") {
    val rnd = new Random(61)
    def check(hi: Long, lo: Long): Unit =
      assert(bits(PearsonArrays.toDouble128(hi, lo)) ==
        bits(refDouble(hi, lo)), s"(hi=$hi, lo=$lo)")
    // fixed edges: zero, ±1, int64 boundaries, powers of two ± 1 around
    // the 53-bit mantissa, values needing the nearest-even carry
    Seq((0L, 0L), (0L, 1L), (-1L, -1L), (0L, Long.MaxValue),
      (-1L, Long.MinValue), (0L, Long.MinValue), (1L, 0L), (-2L, 0L),
      (1L, 1L), (Long.MaxValue, -1L), (Long.MinValue + 1, 1L))
      .foreach { case (h, l) => check(h, l) }
    for (_ <- 1 to 200000) {
      // random bit width 1..127, random sign — uniform over widths so
      // the >64-bit shift branches get equal coverage
      val w = 1 + rnd.nextInt(127)
      var hi = 0L
      var lo = rnd.nextLong()
      if (w <= 64) lo &= (if (w == 64) -1L else (1L << w) - 1)
      else { hi = rnd.nextLong() & ((1L << (w - 64)) - 1); }
      if (rnd.nextBoolean()) { // negate
        val nLo = ~lo + 1
        val nHi = ~hi + (if (nLo == 0) 1 else 0)
        hi = nHi; lo = nLo
      }
      check(hi, lo)
      // and the half-ulp adversary: force trailing patterns around the
      // round bit (…1000…, …0111…) that exercise sticky/even ties
      check(hi, lo & ~((1L << (rnd.nextInt(16))) - 1))
    }
  }

  test("finishRhoSlots == the BigInteger finish, both regimes") {
    val rnd = new Random(62)
    for (trial <- 1 to 20000) {
      // realistic accumulation: n slots of quantized values at a random
      // magnitude scale — small scales stay in the fast path, the
      // largest (≳2^45 per value at n up to 4000) push n·sxx past 2^126
      // and must take the BigInteger fallback with the same answer
      val n = 2 + rnd.nextInt(if (trial % 10 == 0) 4000 else 300)
      val scaleBits = 10 + rnd.nextInt(44) // |q| < 2^54 envelope
      val sx = new Array[Long](2); val sy = new Array[Long](2)
      val sxx = new Array[Long](2); val syy = new Array[Long](2)
      val sxy = new Array[Long](2)
      var i = 0
      while (i < n) {
        val x = (rnd.nextLong() >> (63 - scaleBits))
        val y = if (rnd.nextInt(4) == 0) x
                else (rnd.nextLong() >> (63 - scaleBits))
        PearsonArrays.add128(sx, 0, x >> 63, x)
        PearsonArrays.add128(sy, 0, y >> 63, y)
        PearsonArrays.add128(sxx, 0, Math.multiplyHigh(x, x), x * x)
        PearsonArrays.add128(syy, 0, Math.multiplyHigh(y, y), y * y)
        PearsonArrays.add128(sxy, 0, Math.multiplyHigh(x, y), x * y)
        i += 1
      }
      val fast = PearsonArrays.finishRhoSlots(n,
        sx(0), sx(1), sy(0), sy(1), sxx(0), sxx(1), syy(0), syy(1),
        sxy(0), sxy(1))
      val ref = PearsonArrays.finishRho(n,
        PearsonArrays.big(sx(0), sx(1)), PearsonArrays.big(sy(0), sy(1)),
        PearsonArrays.big(sxx(0), sxx(1)),
        PearsonArrays.big(syy(0), syy(1)),
        PearsonArrays.big(sxy(0), sxy(1)))
      assert((fast == null) == (ref == null),
        s"null mismatch at n=$n scale=$scaleBits: fast=$fast ref=$ref")
      if (fast != null)
        assert(bits(fast) == bits(ref),
          s"bit mismatch at n=$n scale=$scaleBits: fast=$fast ref=$ref")
    }
  }

  test("finishRhoSlots constant-side and degenerate guards match") {
    // constant x: vx exactly 0 -> null in both paths
    val n = 5L
    val x = 123456L
    val sxx = Array(Math.multiplyHigh(x, x) * 0, 0L)
    PearsonArrays.add128(sxx, 0, 0L, x * x * n) // n identical squares
    val sx = Array(0L, x * n)
    val fast = PearsonArrays.finishRhoSlots(n, sx(0), sx(1), 0L, 15L,
      sxx(0), sxx(1), 0L, 55L, 0L, x * 15L)
    assert(fast == null)
  }
}
