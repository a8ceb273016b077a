// Dev tool: ORGANIC stress run of the pruned-corr VECTOR tier (VERDICT
// r15 task 5). PanelRhoSpec proves the selector flips past
// BroadcastVerifyMaxCells; nothing before this measured the vector
// verify at real width. This harness synthesizes a k×dims panel that
// exceeds the ceiling ORGANICALLY (k=2000 series × 10,080 one-minute
// grid positions = 2.0×10⁷ cells > the 1.6×10⁷ ceiling — no forced
// parameter), runs graft.SparkEntry.panelRho end to end through the
// REAL selector, asserts the kernel plan (pearson_arrays appears
// EXACTLY once — the exactly-once barrier at width), and prints
// wall/shuffle numbers for SCALE.md.
//
//   sbt "runMain graft.tools.Stress [k] [days] [bits]"   (2000 7 11)
//
// Synthetic panel shape: 50 groups of correlated series — series u's
// value is a shared per-group SMOOTH signal (a sinusoid at the group's
// own integer frequency: distinct frequencies are orthogonal over the
// span, so cross-group rho ≈ 0 by Fourier orthogonality) plus small
// per-series hash noise, giving within-group rho ≈ 0.99. The signal
// must be SMOOTH, not hash-white: each series' ticks carry its own
// sub-bucket jitter, so after the 60 s resample+ffill two same-group
// series are misaligned by up to one tick — white noise at lag 1 is
// uncorrelated (a first cut measured rho ≈ 0 and found zero edges),
// while the sinusoid's lag-1 autocorrelation is ~0.9995. The expected
// edge set is the ~50·C(40,2) ≈ 39k within-group pairs at the 0.9
// threshold, so the verify stage's cost is dominated by TRUE
// structure, not LSH noise — provided bits scales with k (see
// panelRho's geometry note; at the fixture default 8×5 the 2M random
// pairs would collide ~25% and feed the verify ~500k junk candidates).
package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}

object Stress {

  def main(args: Array[String]): Unit = {
    val k = args.lift(0).map(_.toInt).getOrElse(2000)
    val days = args.lift(1).map(_.toInt).getOrElse(7)
    val bits = args.lift(2).map(_.toInt).getOrElse(11)
    // optional 4th arg: the candidateRhoVectors barrier ("fence"
    // default; "none" = the unfenced control, whose multiplied kernel
    // evaluation is priced AT WIDTH here — at fixture dims the
    // re-evaluation is invisible, so this harness is where the fence's
    // asymptotic claim is actually measured)
    val barrier = args.lift(3).getOrElse(graft.ops.CorrPrune.DefaultBarrier)
    val spark = Sessions.build("graft-stress")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_").toString
    // cleanup in finally: a failed gate (plan-site, universe or edge
    // count) must not leak the ~60 MB scratch fixture per run — and
    // the gates are `require`, not elidable `assert`
    try {

    // --- synthesize the wide panel's source events -------------------
    val jan1 = SparkEntry.jan1
    val end = jan1 + days * 86400L
    val tickStep = 600L // one tick per 10 min per series; 60 s resample
    val nTicks = (end - jan1) / tickStep
    val dims = ((end - jan1) / 60L).toInt
    // micros annotation so Catalog's footer sniff classifies the
    // scratch fixture exactly like a shipped one
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    val ev = spark.range(k).select(col("id").as("user_id"))
      .crossJoin(spark.range(nTicks).select(col("id").as("t")))
      .select(
        (col("user_id") * nTicks + col("t")).as("event_id"),
        expr(s"timestamp_seconds($jan1 + t * $tickStep + " +
          "pmod(xxhash64('j', user_id, t), 599))").as("ts"),
        col("user_id"),
        lit("tick").as("event_type"),
        (lit(100.0) +
          lit(30.0) * sin(lit(2 * math.Pi) *
            (col("user_id") % 50 + 3) * col("t") / nTicks.toDouble) +
          pmod(xxhash64(lit("n"), col("user_id"), col("t")),
            lit(1000L)).cast("double") / 200.0).as("value"),
        lit("{}").as("metadata"))
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    println(s"[stress] fixture: k=$k days=$days dims=$dims " +
      s"cells=${k.toLong * dims} (ceiling " +
      s"${graft.ops.CorrPrune.BroadcastVerifyMaxCells}) at $dir")

    // --- stage-level shuffle accounting -------------------------------
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val peakStageWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peakStageWrite.getAndUpdate(p =>
            math.max(p, m.shuffleWriteMetrics.bytesWritten))
        }
      }
    })

    // --- the real selector, end to end --------------------------------
    val t0 = System.nanoTime()
    val (users, edges) = SparkEntry.panelRho(spark, dir, k, jan1, end, 60,
      roundThenFilter = Some((4, 0.9)), bands = 8, bits = bits,
      barrier = barrier)
    edges.write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9

    // --- plan + result assertions --------------------------------------
    // DISTINCT kernel call sites, not raw string hits — see
    // graft.plans.PlanText.distinctSites (shared with PlanGuardSpec
    // and the Profile barrier A/B)
    val kernelSites = graft.plans.PlanText.distinctSites(
      edges.queryExecution.executedPlan.toString, "pearson_arrays")
    // every real barrier yields exactly one site; the "none" control is
    // EXPECTED at >= 2 (that multiplied evaluation is what it prices)
    require(if (barrier == "none") kernelSites.size >= 2
            else kernelSites.size == 1,
      s"barrier=$barrier: unexpected kernel site count " +
        s"${kernelSites.size}:\n${kernelSites.mkString("\n")}")
    require(users.size == k, s"universe ${users.size} != $k")
    val nEdges = edges.count()
    // every within-group pair has rho ≈ 0.99 >> 0.9; LSH recall at this
    // angle is ≥ 0.99 — demand at least 90% of the 50·C(k/50, 2) truth
    val expected = 50L * (k / 50) * (k / 50 - 1) / 2
    require(nEdges >= expected * 9 / 10 && nEdges <= expected * 11 / 10,
      s"edge count $nEdges vs expected ~$expected within-group pairs")
    println(f"[stress] panelRho vector tier: barrier=$barrier k=$k dims=$dims " +
      f"edges=$nEdges (expected ~$expected) wall=$wall%.1f s " +
      f"shuffle_write=${shufWrite.get / 1e6}%.0f MB " +
      f"shuffle_read=${shufRead.get / 1e6}%.0f MB " +
      f"peak_stage_write=${peakStageWrite.get / 1e6}%.0f MB " +
      f"kernel_sites_in_plan=${kernelSites.size}")
    spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }
}
