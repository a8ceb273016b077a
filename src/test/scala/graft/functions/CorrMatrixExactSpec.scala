package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Laws for the EXACT integer co-moment matrix aggregate — the property
  * e1b's full-precision grading rests on: the output doubles are a pure
  * function of the input MULTISET, bit for bit, no matter how Spark
  * splits rows into partials or in which order it merges them. Run
  * directly on the Aggregator (no session), like CorrMatrixSpec.
  */
class CorrMatrixExactSpec extends AnyFunSuite {

  private val k = 4
  private def agg = new CorrMatrixExactAgg(k)
  private val trials = 200

  // 6-dp-quantized values (what Exact.davg / ffill hand every corr
  // consumer), magnitude ~100 — the engine's real input shape
  private def randRows(rnd: Random): List[Seq[Double]] =
    List.fill(rnd.nextInt(31))(Seq.fill(k)(
      if (rnd.nextInt(5) == 0) Double.NaN
      else math.round((rnd.nextDouble() * 200 - 100) * 1e6) / 1e6))

  private def run(rows: Seq[Seq[Double]]): Seq[CorrCell] = {
    val a = agg
    a.finish(rows.foldLeft(a.zero)((b, r) => a.reduce(b, r.toArray)))
  }

  private def bits(o: Option[Double]): Option[Long] =
    o.map(java.lang.Double.doubleToLongBits)

  test("BIT-identical under any partition split and any merge order") {
    val rnd = new Random(52)
    for (_ <- 1 to trials) {
      val rows = randRows(rnd)
      val single = run(rows)
      // split into up to 5 partials at random cuts, merge in a shuffled
      // order — the degrees of freedom the task scheduler actually has
      val nParts = 1 + rnd.nextInt(5)
      val parts = Array.fill(nParts)(List.newBuilder[Seq[Double]])
      rows.foreach(r => parts(rnd.nextInt(nParts)) += r)
      val a = agg
      val partials = rnd.shuffle(parts.toList.map(_.result()))
        .map(_.foldLeft(a.zero)((b, r) => a.reduce(b, r.toArray)))
      val merged = a.finish(partials.reduceLeft(a.merge))
      merged.zip(single).foreach { case (m, s) =>
        assert(m.i == s.i && m.j == s.j && bits(m.rho) == bits(s.rho),
          s"pair (${m.i},${m.j}): merged ${m.rho} vs single ${s.rho}")
      }
    }
  }

  test("BIT-identical to the PearsonArrays kernel on every pair") {
    val rnd = new Random(53)
    for (_ <- 1 to trials) {
      val rows = randRows(rnd)
      val cells = run(rows)
      for (i <- 0 until k; j <- i + 1 until k) {
        // the kernel skips a slot when EITHER side is null — mirror the
        // aggregate's either-NaN skip by nulling both slots of the pair
        def side(c: Int, o: Int): GenericArrayData = new GenericArrayData(
          rows.map(r => if (r(c).isNaN || r(o).isNaN) null
            else java.lang.Double.valueOf(r(c))).toArray[Any])
        val kr = Option(PearsonArrays.rho(side(i, j), side(j, i)))
          .map(_.doubleValue())
        val ar = cells.find(c => c.i == i && c.j == j).get.rho
        assert(bits(kr) == bits(ar), s"pair ($i,$j): kernel $kr agg $ar")
      }
    }
  }

  test("matches the double-state aggregate within quantization noise") {
    val rnd = new Random(54)
    val dAgg = new CorrMatrixAgg(k)
    for (_ <- 1 to trials) {
      val rows = randRows(rnd)
      val exact = run(rows)
      val dbl = dAgg.finish(
        rows.foldLeft(dAgg.zero)((b, r) => dAgg.reduce(b, r.toArray)))
      exact.zip(dbl).foreach { case (e, d) =>
        (e.rho, d.rho) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-7,
            s"pair (${e.i},${e.j}): exact $x double $y")
          case (None, None) =>
          case (x, y) => fail(s"pair (${e.i},${e.j}): exact $x double $y")
        }
      }
    }
  }

  test("undefined cells: n < 2 and quantized-constant sides are None") {
    assert(run(Seq(Seq(1.0, 2.0, 3.0, 4.0))).forall(_.rho.isEmpty))
    // column 0 constant AT THE 1e-6 QUANTUM (raw doubles differ by 1e-9):
    // exactly-zero integer variance, None — not cancellation garbage
    val sub = Seq(Seq(5.0, 1.0, 0.0, 0.0), Seq(5.000000001, 2.0, 1.0, 0.0))
    assert(run(sub).find(c => c.i == 0 && c.j == 1).get.rho.isEmpty)
  }

  test("envelope trap: a value quantizing past 2^53 throws loudly") {
    val ex = intercept[ArithmeticException] {
      run(Seq(Seq(1e10, 1.0, 0.0, 0.0), Seq(2e10, 2.0, 0.0, 0.0)))
    }
    assert(ex.getMessage.contains("2^53"))
  }
}
