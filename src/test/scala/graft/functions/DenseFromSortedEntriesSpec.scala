package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Direct pins for the [[DenseFromSortedEntries]] merge — equivalence
  * with the element_at map probe it replaced (reconstructed here as the
  * reference implementation), on exactly the gapped-bucket shapes the
  * streaming panel assembly feeds it.
  */
class DenseFromSortedEntriesSpec extends SparkTestBase {
  import spark.implicits._

  private val universe = Seq(2L, 5L, 7L, 11L, 30L, 31L)

  /** The pre-round-14 probe: map_from_entries + per-series element_at +
    * coalesce(NaN) — kept verbatim as the semantic reference.
    */
  private def probeVals(es: org.apache.spark.sql.Column) = {
    val probe = map_from_entries(transform(es,
      e => struct(e.getField("k"), e.getField("v"))))
    array(universe.map(u =>
      coalesce(element_at(probe, lit(u)), lit(Double.NaN))): _*)
  }

  private def bothWays(entries: Seq[(Long, Double)])
      : (Seq[Double], Seq[Double]) = {
    val df = Seq(Tuple1(entries)).toDF("raw")
      .select(array_sort(transform(col("raw"),
        e => struct(e.getField("_1").as("k"),
          e.getField("_2").as("v")))).as("es"))
    val row = df.select(
      call_function("dense_from_sorted_entries", col("es"),
        typedLit(universe)).as("merge"),
      probeVals(col("es")).as("probe")).head()
    (row.getSeq[Double](0), row.getSeq[Double](1))
  }

  private def sameVec(a: Seq[Double], b: Seq[Double]): Boolean =
    a.size == b.size && a.zip(b).forall { case (x, y) =>
      (x.isNaN && y.isNaN) || x == y }

  test("merge equals the map probe on gapped, full, empty, and " +
    "NaN-valued buckets") {
    val cases = Seq(
      // gapped: subset of the universe, unsorted input (array_sort fixes)
      Seq(7L -> 1.5, 2L -> -3.25, 30L -> 9.0),
      // full bucket
      Seq(2L -> 1.0, 5L -> 2.0, 7L -> 3.0, 11L -> 4.0, 30L -> 5.0,
        31L -> 6.0),
      // empty
      Seq.empty[(Long, Double)],
      // NaN values ride through as NaN slots (the caller's coalesce
      // output), indistinguishable from absent — exactly the probe
      Seq(5L -> Double.NaN, 11L -> 2.5),
      // adjacent universe ids (30, 31) both present
      Seq(30L -> 1.0, 31L -> 2.0),
      // single entry at each universe boundary
      Seq(2L -> 42.0), Seq(31L -> 42.0))
    cases.foreach { entries =>
      val (m, p) = bothWays(entries)
      assert(sameVec(m, p), s"$entries: merge $m vs probe $p")
      assert(m.size == universe.size)
    }
  }

  test("entries outside the universe are skipped, before, between, " +
    "and after its ids") {
    val (m, p) = bothWays(Seq(1L -> 9.0, 5L -> 1.0, 6L -> 9.0,
      12L -> 9.0, 31L -> 2.0, 99L -> 9.0))
    assert(sameVec(m, p), s"merge $m vs probe $p")
    assert(m(1) == 1.0 && m(5) == 2.0)
    assert(m.zipWithIndex.count(!_._1.isNaN) == 2)
  }

  test("randomized gapped buckets: merge ≡ probe across densities") {
    val rng = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val present = universe.filter(_ => rng.nextBoolean())
      val noise = Seq.fill(rng.nextInt(3))(rng.nextInt(40).toLong)
        .distinct.filterNot(universe.contains)
      val entries = rng.shuffle(present ++ noise)
        .map(id => id -> (rng.nextDouble() * 200 - 100))
      val (m, p) = bothWays(entries)
      assert(sameVec(m, p), s"$entries: merge $m vs probe $p")
    }
  }
}
