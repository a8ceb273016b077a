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
// Round-18 sibling modes (each with its own scaladoc below):
//   Stress dedup [nClusters] [cSize] [nBackground]  — organic d2→d6
//     width stress: planted near-dup cliques, recall/fp/rounds/shuffle
//     gates (22×-50× fixture corpus);
//   Stress dedupdelta [nClusters] [cSize] [nBackground] [nDeltaCliques]
//     [nNovel] — the incremental tier (d8/ingest gate) at width: a
//     delta probes the persisted bucketed lake; gates = delta recall,
//     novel-all-new, and DELTA-sized probe shuffle vs the corpus
//     self-pass baseline;
//   Stress dedupskew [nBoiler] [nBackground] [nClusters] — LSH band
//     self-join hot-bucket straggler, FOUR arms: baseline vs aqe
//     (skew-join floored aggressive — can't split it) vs aqeforce
//     (forceOptimizeSkewedJoin=true — still can't) vs cap
//     (Text.capBandKeys), per-task time distributions;
//   Stress statestore [days] [runs] — heap vs RocksDB vs
//     RocksDB+changelog pricing of the corr-chain drain;
//   Stress statestore growth [nBatches] [keysPerBatch] — corpus-sized
//     dedup state growth: per-batch commit times + checkpoint
//     artifact sizes under the three providers (changelog commit cost
//     flat while snapshot cost grows).
//
// Round-19 sibling mode:
//   Stress ann [nBackground1] [nBackground2] [nProbes] [nNbr]
//     [nprobe] — the ANN tier at TWO corpus widths, both families
//     through their graded probe bodies: banded-LSH (e2/e3 via
//     Similarity.annTopK — planted recall, bits-ladder bucket
//     population, candidates-per-probe sublinearity, probe shuffle
//     candidate-sized vs a live corpus-shuffle control, small-width
//     brute-force truth control) and inverted-file IVF (e4b via
//     Similarity.ivfLakeTopK at C=√N — recall, cell-bounded scan
//     fraction, partition pruning physically engaged, sublinear probe
//     shuffle).
//
// Round-20 sibling modes:
//   Stress ann trained [nBackground1] [nBackground2] [nProbes] [nNbr]
//     [nprobe] — the TRAINED index tier at two widths: k-means
//     training (Lloyd shuffle aggregate-sized vs a live corpus-shaped
//     control round, collects bounded by C·dims), the trained-IVF
//     lake probe (e7b's body: recall, static pruning, the naive
//     e7-shape re-score control kept live), and IVF-PQ/ADC serving
//     (e11b's body: codes-sized lake, cell-pruned ADC + rerank reads);
//   Stress ann crossover [nBackground1] [nBackground2] [nProbes]
//     [nNbr] [nprobe] — the IVF lake's batch-probe amortization
//     curve: physical rows read vs probe-batch size at two widths,
//     printing where pruned-scan serving stops beating one full-scan
//     batch pass (~1.6·C/nprobe probes);
//   Stress statestore corrwidth [k...] — the streaming corr chain's
//     O(k²) co-moment state priced at panel widths (heap vs
//     RocksDB+changelog): per-batch state rows / memory / commit /
//     changelog artifact bytes, gated on superlinear growth and
//     identical finalized-span counts across providers.
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
import org.apache.spark.sql.streaming.Trigger
import graft.{Sessions, SparkEntry}

object Stress {

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("dedup") => dedupMain(args.drop(1))
    case Some("dedupdelta") => dedupDeltaMain(args.drop(1))
    case Some("dedupskew") => dedupSkewMain(args.drop(1))
    case Some("statestore") if args.lift(1).contains("growth") =>
      stateStoreGrowthMain(args.drop(2))
    case Some("statestore") if args.lift(1).contains("corrwidth") =>
      stateStoreCorrWidthMain(args.drop(2))
    case Some("statestore") => stateStoreMain(args.drop(1))
    case Some("ann") if args.lift(1).contains("trained") =>
      annTrainedMain(args.drop(2))
    case Some("ann") if args.lift(1).contains("crossover") =>
      annCrossoverMain(args.drop(2))
    case Some("ann") => annMain(args.drop(1))
    case _ => corrMain(args)
  }

  /** Total/peak shuffle accounting over a measured scope — the
    * register/measure/drain dance the stress modes all need, factored
    * so each scope gets its OWN isolated listener window (the delta
    * mode measures three scopes in one JVM: lake build, corpus
    * self-pair pass, delta probe).
    */
  private final class ShuffleMeter(
      sc: org.apache.spark.SparkContext) {
    private val write = new AtomicLong
    private val read = new AtomicLong
    private val stages = new AtomicLong
    private val inRecords = new AtomicLong
    private val listener = new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          inRecords.addAndGet(m.inputMetrics.recordsRead)
          stages.incrementAndGet()
          ()
        }
      }
    }
    sc.addSparkListener(listener)
    /** Source records read in the measured scope (valid after
      * [[finish]]) — the ann IVF arm's physical-pruning gate: a probe
      * whose lake scan was NOT partition-pruned reads ≥ corpus rows.
      */
    def inputRecords: Long = inRecords.get
    /** Drain (poll until the stage count is stable), detach, and
      * return (shuffleWriteBytes, shuffleReadBytes).
      */
    def finish(): (Long, Long) = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var prev = -1L
      var cur = stages.get
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur; Thread.sleep(200); cur = stages.get
      }
      sc.removeSparkListener(listener)
      (write.get, read.get)
    }
  }

  private def corrMain(args: Array[String]): Unit = {
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

  // =========================================================== dedup

  // Corpus generator + planted truth live in [[DedupFixture]] — ONE
  // definition shared with the CI-scale suite gates (DedupStressSpec,
  // CapPlumbSpec) so the geometry the suite asserts recall against is
  // the geometry this harness measures at width.
  private def synthDocs(spark: org.apache.spark.sql.SparkSession,
      nClusters: Int, cSize: Int, nBackground: Int,
      nBoiler: Int): org.apache.spark.sql.DataFrame =
    DedupFixture.synthDocs(spark, nClusters, cSize, nBackground, nBoiler)

  private def plantedPairs(spark: org.apache.spark.sql.SparkSession,
      nClusters: Int, cSize: Int): org.apache.spark.sql.DataFrame =
    DedupFixture.plantedPairs(spark, nClusters, cSize)

  /** Per-stage task-duration recorder. Writes land on the listener-bus
    * thread and the driver reads after the action returns, so every
    * access synchronizes on `this` — the lock is the happens-before
    * edge (a bare removeSparkListener + fixed sleep has neither
    * visibility nor drain guarantees). Callers should
    * [[TaskStats.awaitQuiesce]] before reading: the bus drains
    * asynchronously (its waitUntilEmpty is private[spark]), so the
    * honest public-API wait is polling the recorded task count until
    * it stops changing rather than hoping a fixed sleep was enough on
    * a loaded host.
    */
  private final class TaskStats
      extends org.apache.spark.scheduler.SparkListener {
    private val byStage =
      scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.ArrayBuffer[Long]]
    private val recsByStage =
      scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.ArrayBuffer[Long]]
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) synchronized {
        byStage.getOrElseUpdate(t.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) +=
          t.taskInfo.duration
        if (t.taskMetrics != null)
          recsByStage.getOrElseUpdate(t.stageId,
            scala.collection.mutable.ArrayBuffer.empty[Long]) +=
            t.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    private def taskCount: Int =
      synchronized { byStage.valuesIterator.map(_.size).sum }
    /** Poll until the recorded task count is stable across two reads
      * `settleMs` apart (bounded by `maxWaitMs`) — the drain guarantee
      * the old fixed 1 s sleep only approximated.
      */
    def awaitQuiesce(settleMs: Long = 200, maxWaitMs: Long = 15000): Unit = {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var prev = -1
      var cur = taskCount
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur
        Thread.sleep(settleMs)
        cur = taskCount
      }
    }
    def dump(tag: String): Unit = synchronized {
      byStage.toSeq.sortBy(_._1).foreach { case (sid, ds) =>
        val sorted = ds.sorted
        val recs = recsByStage.getOrElse(sid, Nil).toSeq
        println(f"[stress-skew]   $tag stage=$sid%4d tasks=${ds.size}%3d " +
          f"max=${sorted.last}%6d ms med=${sorted(ds.size / 2)}%6d ms " +
          f"maxShufRecs=${if (recs.isEmpty) 0L else recs.max}%9d")
      }
    }
    /** (maxTaskMs, medianTaskMs, nTasks) of the stage holding the
      * single slowest task AMONG multi-task stages — where a join
      * straggler lives (single-task stages like the final count
      * trivially read max == median and would mask it).
      */
    def straggler: (Long, Long, Int, Long) = synchronized {
      val multi = byStage.filter(_._2.size >= 8)
      val (sid, ds) = (if (multi.nonEmpty) multi else byStage)
        .maxBy(_._2.max)
      val sorted = ds.sorted
      val recs = recsByStage.getOrElse(sid, Nil).toSeq
      (sorted.last, sorted(sorted.size / 2), sorted.size,
        if (recs.isEmpty) 0L else recs.max)
    }
  }

  /** ORGANIC dedup-tier stress (VERDICT r17 task 3): what corrMain does
    * for the corr tier, for d2 -> d6 — a 20-50x-fixture corpus with
    * planted near-dup cliques runs the REAL pipeline
    * (hashedShingles -> signatureTables -> verifiedPairs ->
    * connectedComponents) against scratch lake tables, and the gates
    * are recall on planted pairs, zero false positives, pointer-jump
    * round count, candidate-set size (edge-sized, never corpus^2), and
    * total shuffle bytes (corpus-LINEAR).
    *
    *   sbt "runMain graft.tools.Stress dedup [nClusters] [cSize] [nBackground]"
    *                                          (2500)      (4)     (100000)
    */
  private def dedupMain(args: Array[String]): Unit = {
    val nClusters = args.lift(0).map(_.toInt).getOrElse(2500)
    val cSize = args.lift(1).map(_.toInt).getOrElse(4)
    val nBackground = args.lift(2).map(_.toInt).getOrElse(100000)
    val spark = Sessions.build("graft-stress-dedup")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_dedup_").toString
    try {
      val nDocs = nClusters.toLong * cSize + nBackground
      synthDocs(spark, nClusters, cSize, nBackground, 0)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"[stress-dedup] corpus: $nDocs docs " +
        s"($nClusters cliques x $cSize + $nBackground background) at $dir")

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

      // --- the real pipeline, organically, on scratch lake tables ---
      val t0 = System.nanoTime()
      val docs = spark.read
        .schema(graft.Catalog.schemas("documents"))
        .parquet(s"$dir/documents.parquet")
      val sh = graft.queries.LlmQueries.hashedShingles(docs).cache()
      val (sets, bands) =
        try {
          val (se, ba) = graft.queries.LlmQueries.signatureTables(sh)
          se.write.mode("overwrite").parquet(s"$dir/sets")
          ba.write.mode("overwrite").parquet(s"$dir/bands")
          (spark.read.parquet(s"$dir/sets"),
           spark.read.parquet(s"$dir/bands"))
        } finally { sh.unpersist(); () }
      val tSig = (System.nanoTime() - t0) / 1e9

      // candidate count measured separately (same shape as
      // verifiedPairs's first join) — the edge-sized-not-corpus^2 gate
      val cand = bands.select(col("band"), col("bkey"),
          col("doc_id").as("i"))
        .join(bands.select(col("band"), col("bkey"),
          col("doc_id").as("j")), Seq("band", "bkey"))
        .where(col("i") < col("j"))
        .select("i", "j").distinct()
      val nCand = cand.count()

      val t1 = System.nanoTime()
      graft.queries.LlmQueries.verifiedPairs(bands, bands, sets)
        .write.mode("overwrite").parquet(s"$dir/pairs")
      val pairs = spark.read.parquet(s"$dir/pairs")
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t1) / 1e9

      val t2 = System.nanoTime()
      val comp = graft.ops.Components
        .connectedComponents(pairs.select("i", "j"), "i", "j")
        .cache()
      val nNodes = comp.count()
      val rounds = graft.ops.Components.lastRounds
      val tComp = (System.nanoTime() - t2) / 1e9
      val wall = (System.nanoTime() - t0) / 1e9

      // --- gates ---
      val truth = plantedPairs(spark, nClusters, cSize).cache()
      val nTruth = truth.count()
      val hit = pairs.join(truth, Seq("i", "j")).count()
      val recall = hit.toDouble / nTruth
      // zero false positives: exact-Jaccard verification means every
      // emitted pair must be a planted within-cluster pair (background
      // overlap tops out far below 0.95)
      val fp = pairs.join(truth, Seq("i", "j"), "left_anti").count()
      // components never cross clusters, and nearly every planted doc
      // landed in one (a doc goes missing only if ALL its incident
      // pairs were missed — p ~ 0.04^(cSize-1))
      val crossed = comp
        .where((col("id") / cSize).cast("long") =!=
          (col("component") / cSize).cast("long")).count()
      require(fp == 0, s"$fp false-positive pairs")
      require(crossed == 0, s"$crossed docs in cross-cluster components")
      require(recall >= 0.90,
        f"planted-pair recall $recall%.4f < 0.90 ($hit of $nTruth)")
      require(nNodes >= (nClusters.toLong * cSize * 98) / 100,
        s"only $nNodes of ${nClusters * cSize} planted docs in components")
      require(rounds <= 6,
        s"pointer-jump took $rounds rounds on clique components")
      require(nCand <= nTruth * 3 / 2 + 1000,
        s"candidate set $nCand not edge-sized (planted $nTruth)")
      val shufTotal = shufWrite.get / 1e6
      require(shufTotal < 5000,
        f"total shuffle write $shufTotal%.0f MB is not corpus-linear")
      comp.unpersist(); truth.unpersist()
      println(f"[stress-dedup] docs=$nDocs cand=$nCand pairs=$nPairs " +
        f"recall=$recall%.4f (hit=$hit/$nTruth) fp=0 " +
        f"ccRounds=$rounds nodes=$nNodes")
      println(f"[stress-dedup] wall=$wall%.1f s (sig=$tSig%.1f " +
        f"pairs=$tPairs%.1f cc=$tComp%.1f) " +
        f"shuffle_write=${shufWrite.get / 1e6}%.0f MB " +
        f"shuffle_read=${shufRead.get / 1e6}%.0f MB " +
        f"peak_stage_write=${peakStageWrite.get / 1e6}%.0f MB")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** Incremental tier (d8 / the streaming ingest gate) at WIDTH
    * (VERDICT r19 task 2): the r18 stress executed the d2→d6 corpus
    * self-dedup at 22×/50× fixture, but the per-batch production form
    * — a delta probing a PERSISTED corpus lake — had only
    * fixture-scale evidence for its "O(|delta|·bucket), never
    * corpus-sized" shuffle claim. This mode builds the corpus's REAL
    * bucketed signature lake ([[graft.queries.LlmQueries.dedupBands]]/
    * `dedupSets` — the exact tables d8's graded plan probes), measures
    * the corpus SELF-pair pass's shuffle as the baseline, then probes
    * the lake with a delta of (a) one NEW member per existing clique
    * (planted into the corpus's cliques — the recall truth) and (b)
    * novel docs nothing resembles (the false-positive truth), through
    * the SAME `deltaVerdicts` probe the graded query and the streaming
    * ingest gate run. The delta's signature tables are persisted
    * before probing (what the streaming form's lake maintenance does
    * for every batch), so the probe plans against real scan
    * statistics.
    *
    * The probe runs TWICE: the production split form
    * ([[graft.queries.LlmQueries.deltaVerdictsSplit]] — corpus lake
    * relations un-unioned) and the naive union form (`deltaVerdicts`
    * over corpus ∪ delta, the shape the streaming gate used through
    * r18) as the measured control — the union destroys the lake's
    * bucketing and shuffles the corpus-sized set table per batch
    * (first run of this harness: 174 MB vs a 22 MB bucketed
    * self-pass).
    *
    * Gates: delta recall ≥ 0.90 (verdict dup_of_corpus with the
    * match_id inside the planted clique — a wrong-clique match fails),
    * every novel doc verdicts `new`, zero `dup_of_delta` (deltas land
    * in distinct cliques), split verdicts == union verdicts exactly,
    * and the split probe's shuffle is DELTA-sized: < 10× the delta's
    * pro-rata per-doc share of the lake build's shuffle AND > 10×
    * under the union control's.
    *
    *   sbt "runMain graft.tools.Stress dedupdelta [nClusters] [cSize]
    *        [nBackground] [nDeltaCliques] [nNovel]"
    *        (2500 4 100000 1000 1000)
    */
  private def dedupDeltaMain(args: Array[String]): Unit = {
    val nClusters = args.lift(0).map(_.toInt).getOrElse(2500)
    val cSize = args.lift(1).map(_.toInt).getOrElse(4)
    val nBackground = args.lift(2).map(_.toInt).getOrElse(100000)
    val nDeltaCliques = args.lift(3).map(_.toInt).getOrElse(1000)
    val nNovel = args.lift(4).map(_.toInt).getOrElse(1000)
    require(nDeltaCliques <= nClusters,
      s"nDeltaCliques $nDeltaCliques > nClusters $nClusters")
    val spark = Sessions.build("graft-stress-dedupdelta")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_delta_").toString
    try {
      val nDocs = nClusters.toLong * cSize + nBackground
      val nDelta = nDeltaCliques.toLong + nNovel
      DedupFixture.synthDocs(spark, nClusters, cSize, nBackground, 0)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"[stress-delta] corpus: $nDocs docs " +
        s"($nClusters cliques x $cSize + $nBackground background); " +
        s"delta: $nDeltaCliques clique members + $nNovel novel")

      // --- 1. the real bucketed lake ---------------------------------
      val mLake = new ShuffleMeter(spark.sparkContext)
      val t0 = System.nanoTime()
      val corpusBands = graft.queries.LlmQueries.dedupBands(spark, dir)
      val corpusSets = graft.queries.LlmQueries.dedupSets(spark, dir)
      val tLake = (System.nanoTime() - t0) / 1e9
      val (lakeW, _) = mLake.finish()

      // --- 2. corpus self-pair pass: the shuffle baseline ------------
      val mCorpus = new ShuffleMeter(spark.sparkContext)
      val t1 = System.nanoTime()
      graft.queries.LlmQueries
        .verifiedPairs(corpusBands, corpusBands, corpusSets)
        .write.format("noop").mode("overwrite").save()
      val tCorpus = (System.nanoTime() - t1) / 1e9
      val (corpusW, _) = mCorpus.finish()

      // --- 3. the delta batch: signatures persisted, lake probed -----
      val idStart = nDocs
      val th = nDocs
      DedupFixture.deltaMembers(spark, nDeltaCliques, cSize, nNovel,
          idStart)
        .write.mode("overwrite").parquet(s"$dir/delta.parquet")
      val deltaDocs = spark.read
        .schema(graft.Catalog.schemas("documents"))
        .parquet(s"$dir/delta.parquet")
      val mDelta = new ShuffleMeter(spark.sparkContext)
      val t2 = System.nanoTime()
      val sh = graft.queries.LlmQueries.hashedShingles(deltaDocs).cache()
      try {
        val (dSets, dBands) =
          graft.queries.LlmQueries.signatureTables(sh)
        dSets.write.mode("overwrite").parquet(s"$dir/delta_sets")
        dBands.write.mode("overwrite").parquet(s"$dir/delta_bands")
      } finally { sh.unpersist(); () }
      val dSets = spark.read.parquet(s"$dir/delta_sets")
      val dBands = spark.read.parquet(s"$dir/delta_bands")
      val verdicts = graft.queries.LlmQueries.deltaVerdictsSplit(
          corpusBands, corpusSets, dBands, dSets,
          deltaDocs.select("doc_id"), th)
        .cache()
      val nVerdicts = verdicts.count()
      val tDelta = (System.nanoTime() - t2) / 1e9
      val (deltaW, _) = mDelta.finish()

      // --- the union-shape control: what the probe MUST NOT cost ----
      // deltaVerdicts over corpus ∪ delta unions is the naive form the
      // streaming gate used through r18 — the union destroys the
      // lake's bucketing and the set-attachment join shuffles the
      // corpus-sized set table. Measured here every run so the split
      // form's advantage stays a live number (and a Spark version
      // that learns to push bucketing through unions fails loudly,
      // like the AQE-skew requires)
      val mNaive = new ShuffleMeter(spark.sparkContext)
      val t3 = System.nanoTime()
      val naive = graft.queries.LlmQueries.deltaVerdicts(
          corpusBands.unionByName(dBands), dBands,
          corpusSets.unionByName(dSets),
          deltaDocs.select("doc_id"), th)
        .cache()
      naive.count()
      val tNaive = (System.nanoTime() - t3) / 1e9
      val (naiveW, _) = mNaive.finish()

      // the decomposition is EXACT: split == union, verdict for
      // verdict, at width
      val diff = verdicts.exceptAll(naive).count() +
        naive.exceptAll(verdicts).count()
      require(diff == 0,
        s"split probe disagrees with the union shape on $diff verdicts")
      naive.unpersist()

      // --- gates ------------------------------------------------------
      require(nVerdicts == nDelta, s"$nVerdicts verdicts for $nDelta docs")
      val planted = verdicts
        .where(col("doc_id") < idStart + nDeltaCliques)
      val recalled = planted.where(col("verdict") === "dup_of_corpus")
      val nRecalled = recalled.count()
      val recall = nRecalled.toDouble / nDeltaCliques
      // a recalled delta's match must sit INSIDE its planted clique:
      // delta doc (idStart + cid) matches docs [cid*cSize, (cid+1)*cSize)
      val wrongClique = recalled.where(
        (col("match_id") / cSize).cast("long") =!=
          (col("doc_id") - idStart)).count()
      val novelNotNew = verdicts
        .where(col("doc_id") >= idStart + nDeltaCliques)
        .where(col("verdict") =!= "new").count()
      val dupOfDelta = verdicts
        .where(col("verdict") === "dup_of_delta").count()
      require(recall >= 0.90,
        f"delta recall $recall%.4f < 0.90 ($nRecalled of $nDeltaCliques)")
      require(wrongClique == 0,
        s"$wrongClique delta docs matched OUTSIDE their planted clique")
      require(novelNotNew == 0,
        s"$novelNotNew novel docs not verdicted new")
      require(dupOfDelta == 0,
        s"$dupOfDelta dup_of_delta verdicts (deltas are clique-disjoint)")
      val corpusMb = corpusW / 1e6
      val lakeMb = lakeW / 1e6
      val deltaMb = deltaW / 1e6
      val naiveMb = naiveW / 1e6
      // DELTA-sized, two ways: within 10x the delta's pro-rata
      // per-doc share of the corpus LAKE BUILD's shuffle (the
      // honest corpus-linear baseline — the bucketed self-pair pass
      // is itself nearly shuffle-free by design), and an order of
      // magnitude under the naive union shape's corpus-sized cost
      require(deltaMb < lakeMb * nDelta / nDocs * 10,
        f"split probe shuffled $deltaMb%.1f MB — over 10x the " +
          f"pro-rata lake share ${lakeMb * nDelta / nDocs}%.1f MB")
      require(naiveMb > deltaMb * 10,
        f"union-shape control shuffled $naiveMb%.1f MB, not >10x the " +
          f"split probe's $deltaMb%.1f MB — did bucketing start " +
          "surviving unions? update deltaVerdictsSplit's scaladoc")
      verdicts.unpersist()
      println(f"[stress-delta] lake build: $tLake%.1f s " +
        f"shuffle=$lakeMb%.0f MB; corpus self-pass: " +
        f"$tCorpus%.1f s shuffle=$corpusMb%.0f MB")
      println(f"[stress-delta] split probe ($nDelta docs): $tDelta%.1f s " +
        f"shuffle=$deltaMb%.1f MB (pro-rata lake share " +
        f"${lakeMb * nDelta / nDocs}%.1f MB); union-shape control: " +
        f"$tNaive%.1f s shuffle=$naiveMb%.0f MB " +
        f"(${naiveMb / math.max(deltaMb, 0.001)}%.0fx the split probe)")
      println(f"[stress-delta] recall=$recall%.4f " +
        f"($nRecalled/$nDeltaCliques) novel_new=$nNovel/$nNovel " +
        f"dup_of_delta=0 split==union verdicts")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** LSH band-join SKEW evidence (VERDICT r17 task 4): plant a
    * boilerplate hot bucket (nBoiler docs sharing ONE text => one
    * (band, bkey) carrying nBoiler rows per side => quadratic join
    * output in one task) and measure the candidate join's per-task
    * time distribution under three arms:
    *   baseline — default confs: the straggler task;
    *   aqe      — AQE skew-join forced aggressive (threshold/advisory
    *              floored to 64 KB, factor 1): shows how far
    *              input-byte-keyed splitting can and cannot help an
    *              output-quadratic hot key;
    *   aqeforce — the aqe arm plus forceOptimizeSkewedJoin=true, so
    *              the split is attempted even where it would add a
    *              shuffle for the downstream distinct's distribution —
    *              the hot bucket STILL rides one task (gated by its
    *              own require below, like aqe's);
    *   cap      — [[graft.ops.Text.capBandKeys]] maxDf=64: the
    *              structural guard; planted-pair candidates must
    *              survive intact while the boilerplate bucket
    *              disappears.
    *
    *   sbt "runMain graft.tools.Stress dedupskew [nBoiler] [nBackground] [nClusters]"
    *                                              (2000)    (30000)       (300)
    */
  private def dedupSkewMain(args: Array[String]): Unit = {
    val nBoiler = args.lift(0).map(_.toInt).getOrElse(2000)
    val nBackground = args.lift(1).map(_.toInt).getOrElse(30000)
    val nClusters = args.lift(2).map(_.toInt).getOrElse(300)
    val cSize = 4
    val spark = Sessions.build("graft-stress-dedupskew")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_skew_").toString
    try {
      synthDocs(spark, nClusters, cSize, nBackground, nBoiler)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val docs = spark.read
        .schema(graft.Catalog.schemas("documents"))
        .parquet(s"$dir/documents.parquet")
      val sh = graft.queries.LlmQueries.hashedShingles(docs).cache()
      try {
        val (_, ba) = graft.queries.LlmQueries.signatureTables(sh)
        ba.write.mode("overwrite").parquet(s"$dir/bands")
      } finally { sh.unpersist(); () }
      println(s"[stress-skew] corpus: ${nClusters * cSize} planted + " +
        s"$nBackground background + $nBoiler boilerplate (ONE text)")

      def candCount(bands: org.apache.spark.sql.DataFrame): Long = {
        val df = bands.select(col("band"), col("bkey"),
            col("doc_id").as("i"))
          .join(bands.select(col("band"), col("bkey"),
            col("doc_id").as("j")), Seq("band", "bkey"))
          .where(col("i") < col("j"))
          .select("i", "j").distinct()
        // count() executes its OWN aggregate plan — print THAT one
        // post-execution, or the adaptive plan reads isFinalPlan=false
        val cnt = df.groupBy().count()
        val n = cnt.collect().head.getLong(0)
        if (sys.env.contains("GRAFT_SKEW_DEBUG"))
          println(cnt.queryExecution.executedPlan.toString
            .linesIterator.take(80).mkString("\n"))
        n
      }

      val truth = plantedPairs(spark, nClusters, cSize)
      val nTruth = truth.count()
      val arms = Seq("baseline", "aqe", "aqeforce", "cap")
      val results = arms.map { arm =>
        val confs = Map(
          // coalescing off and size-based broadcasts off in EVERY arm:
          // at this scratch scale AQE folds the whole ~5 MB shuffle
          // into one partition and the planner broadcasts the tiny
          // bands table (first observed: the whole candidate join ran
          // as ONE scan task, skew invisible) — at 100 TB the bands
          // relation is corpus-sized, never broadcast, and the join
          // runs shuffled on many partitions with the hot bucket as
          // one task among thousands; the 32-partition uncoalesced
          // SMJ is that shape (same conf the cluster-shape
          // correctness sweep pins)
          "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.skewJoin.enabled" ->
            (arm != "baseline").toString,
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
            (if (arm.startsWith("aqe")) "1" else "5.0"),
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
            (if (arm.startsWith("aqe")) "65536" else "256m"),
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
            (if (arm.startsWith("aqe")) "65536" else "64m"),
          // aqeforce: also force the split when it would add a shuffle
          // (the default heuristic declines a split whose output no
          // longer satisfies a downstream distribution requirement —
          // here the distinct above the join)
          "spark.sql.adaptive.forceOptimizeSkewedJoin" ->
            (arm == "aqeforce").toString)
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val stats = new TaskStats
        spark.sparkContext.addSparkListener(stats)
        val bands = spark.read.parquet(s"$dir/bands")
        val input =
          if (arm == "cap") graft.ops.Text.capBandKeys(bands, 64)
          else bands
        val t0 = System.nanoTime()
        val n = candCount(input)
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously: poll until the
        // recorded task count stops changing (a fixed sleep can
        // under-wait on a loaded host and make the gates flaky)
        stats.awaitQuiesce()
        spark.sparkContext.removeSparkListener(stats)
        if (sys.env.contains("GRAFT_SKEW_DEBUG")) stats.dump(arm)
        val (maxMs, medMs, nTasks, maxRecs) = stats.straggler
        println(f"[stress-skew] arm=$arm%-8s cand=$n%9d " +
          f"wall=$wall%6.1f s straggler stage: max_task=$maxMs%6d ms " +
          f"median_task=$medMs%4d ms tasks=$nTasks " +
          f"max/median=${maxMs.toDouble / math.max(medMs, 1)}%.1f " +
          f"max_task_shuffle_records=$maxRecs%d")
        (arm, n, maxMs, medMs, maxRecs)
      }
      confsReset(spark)
      val base = results.find(_._1 == "baseline").get
      val aqe = results.find(_._1 == "aqe").get
      val aqeForce = results.find(_._1 == "aqeforce").get
      val cap = results.find(_._1 == "cap").get
      val boilerPairs = nBoiler.toLong * (nBoiler - 1) / 2
      // the straggler is real in the baseline: the slowest task is a
      // clear multiple of the median AND it is the task carrying the
      // hot bucket's quadratic pair output (i < j halves the square)
      require(base._3 >= 2 * math.max(base._4, 1),
        s"baseline straggler not visible: max ${base._3} ms vs " +
          s"median ${base._4} ms")
      require(base._5 >= boilerPairs * 9 / 10,
        s"baseline straggler task carries ${base._5} records, " +
          s"expected ~$boilerPairs — wrong stage identified?")
      // the measured AQE finding the cap's scaladoc cites: even with
      // threshold/advisory floored, the hot key's OUTPUT still rides
      // one task (input-byte-keyed splitting cannot see an
      // output-quadratic key whose input is a few hundred KB)
      require(aqe._5 >= boilerPairs * 9 / 10,
        s"AQE split the hot key's output (${aqe._5} records max-task) " +
          "— the capBandKeys scaladoc's measured claim needs updating")
      require(aqeForce._5 >= boilerPairs * 9 / 10,
        s"forceOptimizeSkewedJoin split the hot key's output " +
          s"(${aqeForce._5} records max-task) — the capBandKeys " +
          "scaladoc's measured claim needs updating")
      // the cap removes the straggler structurally...
      require(cap._3 <= 2 * math.max(cap._4, 1),
        s"cap arm still has a straggler: max ${cap._3} ms vs " +
          s"median ${cap._4} ms")
      // ...and the quadratic bucket, without touching planted pairs
      require(base._2 >= boilerPairs,
        s"baseline cand ${base._2} < boilerplate $boilerPairs")
      require(cap._2 < boilerPairs / 10 && cap._2 >= nTruth * 9 / 10,
        s"cap cand ${cap._2}: expected ~planted ($nTruth) without " +
          s"the $boilerPairs boilerplate pairs")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  private def confsReset(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq("spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .foreach(spark.conf.unset)

  /** Honest fixture-scale PRICING of the state-store provider swap
    * (the fence lesson: never sell a scale feature as a fixture-wall
    * win — measure what it costs where its benefit is invisible).
    * Runs the deepest streaming chain (windowedCorr: three stateful
    * operators) end to end — fresh input/checkpoint per run, identical
    * staged ticks — under the default heap provider, RocksDB, and
    * RocksDB + changelog checkpointing, `runs`x each in one JVM, and
    * prints per-drain wall seconds plus an output-equality sanity
    * count. At fixture state sizes (tens of rows) RocksDB's off-heap
    * machinery is pure overhead; its value is state CAPACITY —
    * corpus-sized dedup keys, span-sized co-moment buffers — which no
    * fixture can show.
    *
    *   sbt "runMain graft.tools.Stress statestore [days] [runs]"  (5 3)
    */
  private def stateStoreMain(args: Array[String]): Unit = {
    val days = args.lift(0).map(_.toInt).getOrElse(5)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.build("graft-stress-statestore")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_ss_").toString
    try {
      val base = 1700006400L
      val users = Seq(0L, 1L, 2L)
      val rows = for {
        t <- 0L until (86400L * days) by 300L
        u <- users
      } yield org.apache.spark.sql.Row(t * 10 + u,
        java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(base + t)),
        u, "tick",
        u.toDouble + 0.001 * t + ((t / 300 + 7 * u) % 13).toDouble, "{}")
      val in = s"$dir/in"
      Files.createDirectories(java.nio.file.Paths.get(in))
      spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
          graft.Catalog.schemas("events"))
        .coalesce(1).write.mode("overwrite").parquet(in)
      println(s"[stress-ss] ${rows.size} ticks over $days days, " +
        s"$runs drains per provider")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val logKey = "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled"
      val rocks = "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"
      var counts = Set.empty[Long]
      Seq(("heap", None, false), ("rocksdb", Some(rocks), false),
          ("rocksdb+changelog", Some(rocks), true)).foreach {
        case (label, prov, changelog) =>
          prov.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
          spark.conf.set(logKey, changelog.toString)
          val secs = (1 to runs).map { i =>
            val out = s"$dir/out_${label}_$i"
            val ck = s"$dir/ck_${label}_$i"
            val t0 = System.nanoTime()
            graft.streaming.Streams.windowedCorr(spark, in, out, ck,
              users, bucket = "10 minutes", span = "1 day",
              watermark = "1 hour")
            val w = (System.nanoTime() - t0) / 1e9
            counts += spark.read.parquet(out).count()
            w
          }
          println(f"[stress-ss] provider=$label%-18s " +
            f"drains=${secs.map(x => f"$x%.1f").mkString("/")} s " +
            f"min=${secs.min}%.1f s")
          spark.conf.unset(provKey)
          spark.conf.unset(logKey)
      }
      require(counts.size == 1,
        s"providers disagree on emitted row count: $counts")
      println(s"[stress-ss] all providers emitted ${counts.head} rows")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** Corpus-sized STATE GROWTH under the three providers (VERDICT r19
    * task 5): the provider matrix proved semantics and priced
    * fixture-scale wall time, but the actual benefit claim — commit
    * cost stops scaling with state size under changelog checkpointing
    * — was prose. This drives the w21-form dedup state
    * (`dropDuplicates`, unbounded first-seen-wins — the shape whose
    * state is CORPUS-sized in production) through `nBatches`
    * micro-batches of `keysPerBatch` NEW keys each (state grows
    * linearly to nBatches·keysPerBatch rows) under heap, RocksDB, and
    * RocksDB+changelog, and records per batch: numRowsTotal, the
    * state commit time (StateOperatorProgress.commitTimeMs), and the
    * per-version checkpoint artifacts by extension (heap writes a
    * full-state .snapshot cadence over .delta files; RocksDB without
    * changelog uploads a .zip per version whose size tracks the full
    * state; with changelog it uploads a flat per-batch .changelog and
    * only occasional maintenance snapshots).
    *
    * Gates: every provider ends at nBatches·keysPerBatch state rows;
    * the non-changelog RocksDB .zip grows with state (last ≥ 3× the
    * early versions); the changelog mode's per-version .changelog
    * stays FLAT (max ≤ 2× min) — the structural signature of
    * commit-cost-independent-of-state-size. Commit latencies are
    * printed for SCALE.md, not gated: wall-clock on this host is
    * ambient-shaped, artifact bytes are not.
    *
    *   sbt "runMain graft.tools.Stress statestore growth [nBatches] [keysPerBatch]"
    *                                                      (20)        (50000)
    */
  /** The streaming corr chain's STATE at panel width (VERDICT r19 task
    * 4): `statestore growth` priced flat-record dedup state; w17/w18's
    * [[graft.streaming.Streams.windowedCorrPlan]] carries a different
    * growth law — each OPEN span holds one corr-UDAF buffer of
    * 6·k(k−1)/2 doubles (k=500 ⇒ ~3 MB/span, k=2000 ⇒ ~96 MB/span) —
    * so the heap provider's capacity wall arrives at panel WIDTH, not
    * key count. This drives the graded plan (three chained stateful
    * aggregates, 1 h spans over 10 min buckets, 1 h watermark) through
    * `nSpans` one-file micro-batches at each k under heap vs
    * RocksDB+changelog, and records per batch: state rows, operator
    * memoryUsedBytes, commit latency, and the per-version changelog
    * artifact bytes.
    *
    * Gates: (1) peak state memory grows SUPERLINEARLY in k on the heap
    * arm (≥ 2.5× per 2× k step — the k² co-moment term dominating the
    * k-linear panel/cell state), (2) both arms emit identical
    * finalized-span counts (the provider cannot change semantics), and
    * (3) the changelog arm writes per-version changelogs, not
    * per-commit snapshots (the growth mode's structural signature, at
    * corr-buffer value sizes).
    *
    *   sbt "runMain graft.tools.Stress statestore corrwidth [k...]"
    *        (500 1000 2000)
    */
  private def stateStoreCorrWidthMain(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(500, 1000, 2000)
    val nSpans = 5
    val buckets = 6 // 1 h span / 10 min bucket
    val spark = Sessions.build("graft-stress-ss-corrwidth")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_sscw_").toString
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val logKey = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val base = SparkEntry.jan1
    try {
      case class ArmRes(k: Int, label: String, memPeak: Long,
          commitMed: Long, commitMax: Long, rowsEnd: Long,
          outSpans: Long, logMax: Long)
      val arms = Seq(("heap", None, false),
        ("rocksdb+changelog", Some(rocks), true))
      val results = ks.flatMap { k =>
        val src = s"$dir/in_$k"
        // one file per span: k users × 6 buckets, deterministic
        // hash-shaped values (the state size is what's under test)
        (0 until nSpans).foreach { s =>
          spark.range(k.toLong * buckets).select(
              expr(s"timestamp_seconds($base + $s * 3600 + " +
                s"(id % $buckets) * 600)").as("ts"),
              (col("id") / buckets).cast("long").as("user_id"),
              (pmod(xxhash64(lit("v"), col("id"), lit(s)), lit(1000L))
                .cast("double") / 100.0).as("value"))
            .coalesce(1)
            .write.mode(if (s == 0) "overwrite" else "append")
            .parquet(src)
        }
        val users = (0L until k.toLong).toSeq
        arms.map { case (label, prov, changelog) =>
          prov.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
          spark.conf.set(logKey, changelog.toString)
          val ck = s"$dir/ck_${k}_${label.replace('+', '_')}"
          val out = s"$dir/out_${k}_${label.replace('+', '_')}"
          val events = spark.readStream
            .schema("ts TIMESTAMP, user_id LONG, value DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
          val q = graft.streaming.Streams
            .windowedCorrPlan(events, users, "10 minutes", "1 hour",
              Some("1 hour"))
            .writeStream
            .trigger(Trigger.AvailableNow())
            .outputMode("append")
            .option("checkpointLocation", ck)
            .format("parquet")
            .option("path", out)
            .start()
          q.awaitTermination()
          spark.conf.unset(provKey)
          spark.conf.unset(logKey)
          val progress = q.recentProgress.toSeq
            .filter(_.stateOperators.nonEmpty).sortBy(_.batchId)
          // per-VERSION commit artifact bytes under ck/state — the
          // serialized state rows themselves (heap writes <v>.delta,
          // the changelog arm <v>.changelog), so their size carries the
          // 6·k(k−1)/2-double buffer growth directly and durably.
          // (The heap provider's memoryUsedBytes reported a flat ~4 KB
          // for this chain on Spark 4.1 — measured here — so the
          // artifact bytes, not that metric, are the growth signal.)
          val logSizes = {
            val root = java.nio.file.Paths.get(ck, "state")
            if (!Files.exists(root)) Seq.empty[Long]
            else {
              val acc = scala.collection.mutable.ArrayBuffer[Long]()
              Files.walk(root).forEach { p =>
                val nm = p.getFileName.toString
                if (Files.isRegularFile(p) &&
                    (nm.endsWith(".changelog") || nm.endsWith(".delta")))
                  acc += Files.size(p)
              }
              acc.toSeq
            }
          }
          def cm(p: org.apache.spark.sql.streaming
              .StreamingQueryProgress, key: String): Long =
            p.stateOperators.map(so => Option(so.customMetrics)
              .map(_.getOrDefault(key, 0L).longValue()).getOrElse(0L))
              .sum
          println(s"[stress-sscw] k=$k provider=$label")
          progress.foreach { p =>
            val mem = math.max(
              p.stateOperators.map(_.memoryUsedBytes).sum,
              cm(p, "stateOnCurrentVersionSizeBytes"))
            val rows = p.stateOperators.map(_.numRowsTotal).sum
            val commit = p.stateOperators.map(_.commitTimeMs).max
            println(f"[stress-sscw]   batch=${p.batchId}%2d " +
              f"stateRows=$rows%6d commitMs=$commit%6d " +
              f"memUsed=${mem / 1024}%8dKB")
          }
          val memPeak = progress.map(p => math.max(
            p.stateOperators.map(_.memoryUsedBytes).sum,
            cm(p, "stateOnCurrentVersionSizeBytes"))).max
          val commits = progress
            .map(_.stateOperators.map(_.commitTimeMs).max).sorted
          val rowsEnd = progress.lastOption
            .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
          val outSpans = spark.read.parquet(out)
            .select("window_start").distinct().count()
          val r = ArmRes(k, label, memPeak,
            commits(commits.size / 2), commits.last, rowsEnd, outSpans,
            if (logSizes.isEmpty) 0L else logSizes.max)
          println(f"[stress-sscw] k=$k $label%-18s memPeak=" +
            f"${r.memPeak / 1024}%8dKB commitMed=${r.commitMed}%5d ms " +
            f"commitMax=${r.commitMax}%5d ms finalizedSpans=" +
            f"${r.outSpans}%d changelogMax=${r.logMax / 1024}%dKB")
          r
        }
      }
      // --- gates ---
      // 1. provider-independent semantics: identical finalized spans
      //    per k, and both arms emitted SOMETHING
      ks.foreach { k =>
        val spans = results.filter(_.k == k).map(_.outSpans).distinct
        require(spans.size == 1 && spans.head > 0,
          s"k=$k: arms disagree on finalized spans ($spans)")
      }
      // 2. state grows superlinearly in k on BOTH arms — the k²
      //    co-moment term dominating the k-linear panel/cell state,
      //    read from the per-version commit artifact bytes
      results.groupBy(_.label).foreach { case (label, rs) =>
        rs.sortBy(_.k).sliding(2).foreach {
          case Seq(a, b) =>
            val kRatio = b.k.toDouble / a.k
            val artRatio = b.logMax.toDouble / math.max(a.logMax, 1L)
            require(artRatio >= kRatio * 1.25,
              f"$label per-version state artifact grew only " +
                f"$artRatio%.2fx across a $kRatio%.1fx k step — " +
                "expected the k^2 co-moment buffers to dominate")
          case _ => ()
        }
      }
      // 3. the changelog arm commits changelog artifacts even at
      //    corr-buffer value sizes
      require(results.filter(_.label != "heap").forall(_.logMax > 0),
        "rocksdb+changelog arm wrote no changelog artifacts")
      val wall = results.filter(_.label == "heap").sortBy(_.k).map(h =>
        f"k=${h.k}: ${h.logMax / 1048576.0}%.1f MB/version").mkString(", ")
      println(s"[stress-sscw] GATES passed; heap per-version state " +
        s"artifact $wall — the executor-memory wall extrapolates as " +
        "~24*k^2 bytes per open span (see SCALE.md)")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  private def stateStoreGrowthMain(args: Array[String]): Unit = {
    val nBatches = args.lift(0).map(_.toInt).getOrElse(20)
    val keysPerBatch = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = Sessions.build("graft-stress-ss-growth")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_ssg_").toString
    try {
      // one batch = one file = keysPerBatch NEVER-seen keys with a
      // 64-char payload (state rows must have real width for artifact
      // sizes to mean anything)
      val src = s"$dir/in"
      (0 until nBatches).foreach { b =>
        spark.range(keysPerBatch.toLong).select(
            (col("id") + b.toLong * keysPerBatch).as("key"),
            concat(lit("payload_"), col("id"),
              lit("x" * 64)).as("payload"))
          .coalesce(1)
          .write.mode(if (b == 0) "overwrite" else "append").parquet(src)
      }
      println(s"[stress-ssg] $nBatches batches x $keysPerBatch new keys " +
        s"-> ${nBatches.toLong * keysPerBatch} state rows at drain end")

      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val logKey = "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled"
      val rocks = "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"

      // per-version artifact bytes by extension under ck/state, plus
      // non-versioned totals (RocksDB's incremental SST uploads carry
      // content-addressed names — the version zip is metadata-sized,
      // the data bytes live in the .sst files)
      def artifacts(ck: String)
          : (Map[(String, Long), Long], Map[String, Long]) = {
        val root = java.nio.file.Paths.get(ck, "state")
        if (!Files.exists(root)) (Map.empty, Map.empty)
        else {
          val acc = scala.collection.mutable.Map
            .empty[(String, Long), Long]
          val other = scala.collection.mutable.Map.empty[String, Long]
          Files.walk(root).forEach { p =>
            if (Files.isRegularFile(p)) {
              val n = p.getFileName.toString
              n.split('.') match {
                case Array(v, ext)
                    if v.forall(_.isDigit) &&
                      Seq("zip", "changelog", "delta", "snapshot")
                        .contains(ext) =>
                  val k = (ext, v.toLong)
                  acc(k) = acc.getOrElse(k, 0L) + Files.size(p)
                case parts =>
                  val ext = parts.last
                  other(ext) = other.getOrElse(ext, 0L) + Files.size(p)
              }
            }
          }
          (acc.toMap, other.toMap)
        }
      }

      case class Arm(label: String, prov: Option[String],
                     changelog: Boolean)
      val arms = Seq(Arm("heap", None, changelog = false),
        Arm("rocksdb", Some(rocks), changelog = false),
        Arm("rocksdb+changelog", Some(rocks), changelog = true))
      val summary = arms.map { arm =>
        arm.prov.fold(spark.conf.unset(provKey))(
          spark.conf.set(provKey, _))
        spark.conf.set(logKey, arm.changelog.toString)
        val ck = s"$dir/ck_${arm.label.replace('+', '_')}"
        val q = spark.readStream
          .schema("key LONG, payload STRING")
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
          .dropDuplicates("key")
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ck)
          .format("noop")
          .start()
        q.awaitTermination()
        val progress = q.recentProgress.toSeq
          .filter(_.stateOperators.nonEmpty)
          .sortBy(_.batchId)
        spark.conf.unset(provKey)
        spark.conf.unset(logKey)

        val (art, other) = artifacts(ck)
        def extSeries(ext: String): Seq[(Long, Long)] =
          art.collect { case ((e, v), b) if e == ext => (v, b) }
            .toSeq.sortBy(_._1)
        println(s"[stress-ssg] provider=${arm.label}")
        def cm(p: org.apache.spark.sql.streaming
            .StreamingQueryProgress, key: String): Long =
          Option(p.stateOperators.head.customMetrics)
            .map(_.getOrDefault(key, 0L).longValue()).getOrElse(0L)
        progress.foreach { p =>
          val so = p.stateOperators.head
          val v = p.batchId + 1 // state version committed by batch N
          val perExt = Seq("delta", "snapshot", "zip", "changelog")
            .flatMap(e => art.get((e, v)).map(b =>
              f"$e=${b / 1024}%dKB"))
            .mkString(" ")
          val sst = cm(p, "rocksdbSstFileSize")
          val sync = cm(p, "rocksdbCommitFileSyncLatencyMs")
          val extra = if (sst > 0 || sync > 0)
            f" sstTotal=${sst / 1024}%dKB fileSyncMs=$sync%d" else ""
          println(f"[stress-ssg]   batch=${p.batchId}%2d " +
            f"rowsTotal=${so.numRowsTotal}%8d " +
            f"commitMs=${so.commitTimeMs}%6d " +
            f"memUsed=${so.memoryUsedBytes / 1024}%7dKB $perExt$extra")
        }
        val rowsEnd = progress.lastOption
          .map(_.stateOperators.head.numRowsTotal).getOrElse(0L)
        require(rowsEnd == nBatches.toLong * keysPerBatch,
          s"${arm.label}: final state rows $rowsEnd != " +
            s"${nBatches.toLong * keysPerBatch}")
        val commits = progress.map(_.stateOperators.head.commitTimeMs)
        println(f"[stress-ssg]   commitMs first5=" +
          commits.take(5).mkString("/") + " last5=" +
          commits.takeRight(5).mkString("/") +
          s" ckTotalByExt=" + other.toSeq.sortBy(-_._2).take(3)
            .map { case (e, b) => s"$e=${b / 1024}KB" }.mkString(","))
        val sstSeries = progress.map(cm(_, "rocksdbSstFileSize"))
        val memSeries = progress
          .map(_.stateOperators.head.memoryUsedBytes)
        (arm.label, extSeries("zip"), extSeries("changelog"),
          sstSeries, memSeries, commits)
      }

      // gates on the structural shapes (sizes, not wall-clock: commit
      // LATENCY on this host is ambient-shaped and is printed above
      // for the record, while artifact/footprint bytes are exact)
      // 1. heap: the full state lives in executor memory and grows
      //    linearly — the capacity wall RocksDB exists to remove
      val heap = summary.find(_._1 == "heap").get
      require(heap._5.last >= 3L * math.max(heap._5.take(3).max, 1),
        s"heap memoryUsedBytes did not grow with state: " +
          s"${heap._5.take(3).max} -> ${heap._5.last}")
      // 2. rocksdb (no changelog): a full-checkpoint upload EVERY
      //    version (zip per version), and the SST footprint grows
      //    with state
      val rocksArm = summary.find(_._1 == "rocksdb").get
      require(rocksArm._2.size >= nBatches - 2,
        s"rocksdb arm wrote ${rocksArm._2.size} version zips for " +
          s"$nBatches batches — per-version full checkpointing not " +
          "engaged")
      val sstEarly = rocksArm._4.take(3).max
      val sstLate = rocksArm._4.last
      require(sstLate >= 3L * math.max(sstEarly, 1),
        s"rocksdb SST footprint did not grow with state: " +
          s"$sstEarly B -> $sstLate B")
      // 3. changelog: per-version upload is a FLAT changelog (commit
      //    cost independent of state size — the claim under test),
      //    with full snapshots only at the background maintenance
      //    cadence, not per commit
      val logArm = summary.find(_._1 == "rocksdb+changelog").get
      val logs = logArm._3
      require(logs.size >= nBatches - 2,
        s"changelog arm wrote ${logs.size} changelogs for $nBatches " +
          "batches — changelog checkpointing not engaged")
      val logSizes = logs.map(_._2)
      require(logSizes.max <= 2L * math.max(logSizes.min, 1),
        s"changelog per-version bytes not flat: min ${logSizes.min} " +
          s"max ${logSizes.max}")
      require(logArm._2.size <= nBatches / 2,
        s"changelog arm uploaded ${logArm._2.size} full zips over " +
          s"$nBatches batches — snapshots should be maintenance-" +
          "cadence, not per-commit")
      println(f"[stress-ssg] GATES: heap mem " +
        f"${heap._5.take(3).max / 1024}%dKB -> " +
        f"${heap._5.last / 1024}%dKB (>=3x); rocksdb " +
        f"${rocksArm._2.size} zips/$nBatches batches, SST " +
        f"${sstEarly / 1024}%dKB -> ${sstLate / 1024}%dKB (>=3x); " +
        f"changelog flat ${logSizes.min / 1024}%d..." +
        f"${logSizes.max / 1024}%dKB per commit, " +
        f"${logArm._2.size} zips (maintenance only)")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** Per-width measurements of the banded-LSH ANN probe. */
  private final case class AnnWidth(
      n: Long, bits: Int, bands: Int, embBytes: Long,
      wMeanBucket: Double, nCand: Long, recall: Double,
      tIndex: Double, tProbe: Double, indexW: Long, probeW: Long,
      naiveW: Long, tNaive: Double, ivf: AnnIvf)

  /** Per-width measurements of the inverted-file IVF probe (e4b's
    * graded shape at production C ≈ √N).
    */
  private final case class AnnIvf(
      c: Int, nprobe: Int, recall: Double, nCand: Long,
      tIndex: Double, tProbe: Double, probeW: Long, inputRec: Long,
      oneProbeRec: Long)

  /** The ANN tier (e2/e3's banded hyperplane LSH — the production
    * probe body, [[graft.ops.Similarity.annTopK]]) at WIDTH (round
    * 19): the tier's 100 TB posture was a geometric argument — the
    * bits ladder holds bucket population ≈ 64 regardless of N, the
    * band ramp holds recall as buckets narrow, so per-probe work is
    * O(bands·64) ≈ O(log N) — but nothing had EXECUTED it past the
    * 5k-vector fixture. This mode synthesizes an embedding corpus
    * with planted near neighbors ([[AnnFixture]]: nNbr neighbors per
    * probe at cosine ≈ 0.95, background near-orthogonal) at TWO
    * widths, builds the persisted bucket lake, probes it through the
    * SAME `annTopK` the graded e2 runs, and gates:
    *
    *   1. planted recall ≥ 0.95 at both widths (the band ramp holds);
    *   2. size-weighted mean bucket occupancy ≤ 4× the 64 target at
    *      both widths (the bits ladder holds on organic hash data);
    *   3. the ladder actually STEPS across the width ratio
    *      (bits₂ > bits₁ — a 5× corpus must not reuse the small
    *      geometry);
    *   4. candidates per probe grow ≤ 2× across the 5× width step
    *      (per-probe work ~O(bands·64), not O(N));
    *   5. the probe phase's shuffle is candidate-sized: grows ≤ 2× the
    *      candidate ratio across the 5× step AND < 1/3 of the live
    *      corpus-shuffle control (the pre-fix plain-equi-join
    *      re-score, measured every run — it read 141 → 420 MB where
    *      the lake-bucketed probe reads 3.3 → 10.8);
    *   6. small-width brute-force control: the exact top-nNbr equals
    *      the planted set pair-for-pair — the recall gate grades
    *      against the true answer, not a convenient one.
    *
    * The IVF arm runs e4b's inverted-file shape at production
    * C = ⌈√N⌉ (the fixture grades C=16): sampled centroids from the
    * background region, the assignment lake persisted
    * partitionBy("cell"), probes via [[graft.ops.Similarity
    * .ivfLakeTopK]] — and gates (7) planted recall ≥ 0.90,
    * (8) scanned fraction ≤ 3× nprobe/C (cells bound the probe),
    * (9) the SINGLE-probe read is ~nprobe·(N/C) rows, never the
    * corpus (partition pruning physically engaged; the 100-probe
    * batch legitimately covers most cells — that scan is the
    * amortized batch form), and (10) probe shuffle ≤ 3× across the
    * width step (~√(width ratio) expected when C = √N).
    *
    *   sbt "runMain graft.tools.Stress ann [nBackground1]
    *        [nBackground2] [nProbes] [nNbr] [nprobe]"
    *        (200000 1000000 100 3 64)
    */
  private def annMain(args: Array[String]): Unit = {
    val nBg1 = args.lift(0).map(_.toLong).getOrElse(200000L)
    val nBg2 = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nProbes = args.lift(2).map(_.toInt).getOrElse(100)
    val nNbr = args.lift(3).map(_.toInt).getOrElse(3)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(64)
    require(nBg2 > nBg1, s"width 2 ($nBg2) must exceed width 1 ($nBg1)")
    // the bits-ladder "steps across the width ratio" gate below is only
    // meaningful when the two corpus sizes land on DIFFERENT bitsFor
    // rungs — fail the ARGUMENTS up front (exact corpus sizes, probes
    // and planted included) instead of failing a finished run on a gate
    // the chosen widths could never satisfy (e.g. 300k vs 500k both
    // land on bits=13 while every real gate would pass)
    locally {
      val n1 = nBg1 + nProbes.toLong * (1 + nNbr)
      val n2 = nBg2 + nProbes.toLong * (1 + nNbr)
      require(graft.ops.Similarity.bitsFor(n1) <
          graft.ops.Similarity.bitsFor(n2),
        s"widths $n1 and $n2 land on the same bitsFor rung " +
          s"(${graft.ops.Similarity.bitsFor(n1)}) — choose widths " +
          "that cross a bits-ladder rung so the ladder gate can grade")
    }
    val spark = Sessions.build("graft-stress-ann")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_ann_").toString

    def runWidth(tag: String, nBackground: Long,
                 bruteControl: Boolean): AnnWidth = {
      val wdir = s"$dir/$tag"
      AnnFixture.synthEmbeddings(spark, nProbes, nNbr, nBackground)
        .write.mode("overwrite").parquet(s"$wdir/embeddings.parquet")
      val embL = spark.read
        .schema(graft.Catalog.schemas("embeddings"))
        .parquet(s"$wdir/embeddings.parquet")
      val embBytes = Files.walk(
          java.nio.file.Paths.get(s"$wdir/embeddings.parquet"))
        .filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
      val n = embL.count()
      val bits = graft.ops.Similarity.bitsFor(n)
      val bands = graft.ops.Similarity.bandsFor(bits)
      val signs = graft.ops.Similarity.planeSigns(bands, bits,
        AnnFixture.Dims)

      // --- index build: the persisted band lake + the vector lake ---
      // production persists BOTH at index time: the band table the
      // probe joins, and the quantized-vector table the re-score
      // fetches targets from — BUCKETED by vec_id, so the re-score's
      // target join plans zero exchanges on the lake side and only the
      // candidate relation ever shuffles (the d8 lake posture)
      val mIndex = new ShuffleMeter(spark.sparkContext)
      val t0 = System.nanoTime()
      graft.ops.Similarity.bandBucketsFromSigns(
          graft.ops.Similarity.withSqNorm(embL, "vec_id"),
          "vec_id", signs)
        .write.mode("overwrite").parquet(s"$wdir/bk")
      val vecTbl = s"ann_vecs_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $vecTbl")
      graft.ops.Similarity.withSqNorm(embL, "vec_id")
        .write.mode("overwrite")
        .bucketBy(32, "vec_id").sortBy("vec_id")
        .option("path", s"$wdir/vecs")
        .format("parquet").saveAsTable(vecTbl)
      val tIndex = (System.nanoTime() - t0) / 1e9
      val (indexW, _) = mIndex.finish()
      val bkL = spark.read.parquet(s"$wdir/bk")

      // size-weighted mean bucket occupancy — the expected bucket size
      // a PROBE lands in (Σs²/Σs), the number that prices per-band
      // probe cost; the plain mean rewards empty-heavy distributions
      val bs = bkL.groupBy("band", "bucket").count()
        .agg(sum(col("count") * col("count")).as("ss"),
          sum(col("count")).as("s"))
        .head()
      val wMean = bs.getLong(0).toDouble / bs.getLong(1)

      // --- the probe, via the ONE shared body (annTopK) -------------
      val qL = spark.table(vecTbl)
      val probes = bkL.where(col("vec_id") < nProbes)
        .select(col("vec_id").as("qid"), col("band"), col("bucket"))
      val mProbe = new ShuffleMeter(spark.sparkContext)
      val t1 = System.nanoTime()
      val top = graft.ops.Similarity.annTopK(bkL, probes, qL, nNbr)
        .cache()
      top.count()
      val tProbe = (System.nanoTime() - t1) / 1e9
      val (probeW, _) = mProbe.finish()

      // candidate volume (un-metered second pass, same probe joins)
      val nCand = graft.ops.Similarity.annCandidates(bkL, probes).count()

      // the corpus-shuffle control: re-score through plain equi-joins
      // against the UNBUCKETED vector projection — the shape annTopK
      // shipped with until this harness measured it (141 → 420 MB
      // probe shuffle across the 5× step, corpus-bound) — kept live
      // so the structural fix's advantage stays a number, and a Spark
      // version that learns to broadcast its way out fails loudly
      val mNaive = new ShuffleMeter(spark.sparkContext)
      val t2 = System.nanoTime()
      val plainVecs = graft.ops.Similarity.withSqNorm(embL, "vec_id")
      graft.ops.Similarity.topK(
          graft.ops.Similarity.cosineOf(
            graft.ops.Similarity.annCandidates(bkL, probes),
            plainVecs, "qid", "tid"), nNbr)
        .write.format("noop").mode("overwrite").save()
      val tNaive = (System.nanoTime() - t2) / 1e9
      val (naiveW, _) = mNaive.finish()

      val truth = AnnFixture.plantedNeighbors(spark, nProbes, nNbr)
      val nTruth = nProbes.toLong * nNbr
      val hits = top.join(truth, Seq("qid", "tid")).count()
      val recall = hits.toDouble / nTruth

      if (bruteControl) {
        // exact top-nNbr per probe == the planted set, pair for pair:
        // ties the recall gate's truth to the true answer, and prices
        // the brute-force scan the probe replaces
        val t2 = System.nanoTime()
        val pr = qL.where(col("vec_id") < nProbes)
          .select(col("vec_id").as("qid"), col("q").as("qa"),
            col("sq").as("qsq"))
        val cos = qL.select(col("vec_id").as("tid"), col("q"), col("sq"))
          .crossJoin(broadcast(pr))
          .where(col("tid") =!= col("qid"))
          .select(col("qid"), col("tid"),
            (graft.ops.Similarity.dotq(col("q"), col("qa"))
              .cast("double") /
              sqrt(col("sq").cast("double") * col("qsq").cast("double")))
              .as("cosine"))
        val exact = graft.ops.Similarity.topK(cos, nNbr).cache()
        val nExact = exact.count()
        val tBrute = (System.nanoTime() - t2) / 1e9
        val agree = exact.join(truth, Seq("qid", "tid")).count()
        require(nExact == nTruth && agree == nTruth,
          s"brute-force control: exact top-$nNbr has $nExact rows, " +
            s"$agree planted of $nTruth — the planted truth is NOT " +
            "the exact answer on this corpus")
        exact.unpersist()
        println(f"[stress-ann] $tag brute-force control: exact == " +
          f"planted ($nTruth pairs), wall $tBrute%.1f s vs probe " +
          f"$tProbe%.1f s")
      }
      top.unpersist()

      // --- the IVF arm: e4b's inverted-file lake at C ≈ √N ----------
      // centroids sampled from the background region (probes/planted
      // excluded — a centroid that IS a probe would distort the cell
      // geometry around exactly the vectors under test)
      val ivfC = math.ceil(math.sqrt(n.toDouble)).toInt
      val bg0 = nProbes.toLong * (1 + nNbr)
      val cents = graft.ops.Similarity.sampledCents(qL, bg0, ivfC)
      val mIvfIdx = new ShuffleMeter(spark.sparkContext)
      val t3 = System.nanoTime()
      // clustered write: one shuffle of n rows groups each cell's rows
      // into one task, so the partitioned lake is ≤ C files, not
      // tasks × C
      qL.select(col("vec_id"), col("q"), col("sq"),
          graft.ops.Similarity.ivfAssign(cents).as("cell"))
        .repartition(32, col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$wdir/ivf")
      val tIvfIdx = (System.nanoTime() - t3) / 1e9
      // the only index-build shuffle is the write-clustering
      // repartition above — n rows, corpus-linear, printed so the
      // build cost stays a number
      val (ivfIdxW, _) = mIvfIdx.finish()
      val lakeL = spark.read.parquet(s"$wdir/ivf")
      val probesV = qL.where(col("vec_id") < nProbes)
        .select(col("vec_id").as("qid"), col("q").as("qa"),
          col("sq").as("qsq"))
      val cells = graft.ops.Similarity.ivfProbeCells(qL, cents,
        nProbes, nprobe)
      val mIvfPr = new ShuffleMeter(spark.sparkContext)
      val t4 = System.nanoTime()
      val ivfTop = graft.ops.Similarity.ivfLakeTopK(lakeL, probesV,
          cells, nNbr)
        .cache()
      ivfTop.count()
      val tIvfPr = (System.nanoTime() - t4) / 1e9
      val (ivfProbeW, _) = mIvfPr.finish()
      val ivfInputRec = mIvfPr.inputRecords
      // per-probe scanned volume: lake rows landing in probed cells
      val ivfCand = lakeL
        .join(broadcast(cells), Seq("cell"))
        .where(col("vec_id") =!= col("qid")).count()
      val ivfHits = ivfTop.join(truth, Seq("qid", "tid")).count()
      val ivfRecall = ivfHits.toDouble / nTruth
      ivfTop.unpersist()

      // the SINGLE-probe physical-pruning read (the serving case): a
      // batch of 100 probes × nprobe cells covers nearly every cell,
      // so the batch scan's input volume legitimately approaches the
      // lake (the union IS the work, amortized across the batch —
      // same as the LSH band-lake scan). One probe must read ~nprobe
      // cells, i.e. ~nprobe/C of the corpus — the dynamic partition
      // pruning engaging physically, not just in the plan
      // probe-0's cells and vector are collected BEFORE the meter opens
      // and re-enter as LocalRelations (no file scan, no input metrics):
      // the meter's inputRecords must read the LAKE scan alone — with
      // the auxiliary relations metered too, a regression in row-group
      // pushdown on the bucketed vector table would fail this gate for
      // a reason unrelated to partition pruning
      val cells0 = cells.where(col("qid") === 0)
      val cells0L = spark.createDataFrame(
        java.util.Arrays.asList(cells0.collect(): _*), cells0.schema)
      val probe0 = probesV.where(col("qid") === 0)
      val probe0L = spark.createDataFrame(
        java.util.Arrays.asList(probe0.collect(): _*), probe0.schema)
      val m1p = new ShuffleMeter(spark.sparkContext)
      graft.ops.Similarity.ivfLakeTopK(lakeL, probe0L, cells0L, nNbr)
        .write.format("noop").mode("overwrite").save()
      m1p.finish()
      val oneProbeRec = m1p.inputRecords

      println(f"[stress-ann] $tag n=$n bits=$bits bands=$bands " +
        f"wMeanBucket=$wMean%.1f cand=$nCand " +
        f"(${nCand.toDouble / nProbes}%.0f/probe) " +
        f"recall=$recall%.4f ($hits/$nTruth) " +
        f"index=$tIndex%.1f s probe=$tProbe%.1f s " +
        f"(naive control $tNaive%.1f s) " +
        f"indexShuffle=${indexW / 1e6}%.1f MB " +
        f"probeShuffle=${probeW / 1e6}%.1f MB " +
        f"naiveShuffle=${naiveW / 1e6}%.1f MB " +
        f"embBytes=${embBytes / 1e6}%.1f MB")
      println(f"[stress-ann] $tag IVF C=$ivfC nprobe=$nprobe " +
        f"recall=$ivfRecall%.4f ($ivfHits/$nTruth) " +
        f"scanned/probe=${ivfCand.toDouble / nProbes}%.0f " +
        f"(${ivfCand.toDouble / (nProbes.toLong * n)}%.4f of corpus; " +
        f"nprobe/C=${nprobe.toDouble / ivfC}%.4f) " +
        f"index=$tIvfIdx%.1f s (indexShuffle=${ivfIdxW / 1e6}%.1f MB, " +
        f"the n-row write-clustering repartition) probe=$tIvfPr%.1f s " +
        f"probeShuffle=${ivfProbeW / 1e6}%.1f MB " +
        f"batchInputRecords=$ivfInputRec " +
        f"oneProbeInputRecords=$oneProbeRec (corpus $n)")
      AnnWidth(n, bits, bands, embBytes, wMean, nCand, recall,
        tIndex, tProbe, indexW, probeW, naiveW, tNaive,
        AnnIvf(ivfC, nprobe, ivfRecall, ivfCand, tIvfIdx, tIvfPr,
          ivfProbeW, ivfInputRec, oneProbeRec))
    }

    try {
      val w1 = runWidth("w1", nBg1, bruteControl = true)
      val w2 = runWidth("w2", nBg2, bruteControl = false)
      val widthRatio = w2.n.toDouble / w1.n
      val candRatio =
        (w2.nCand.toDouble / nProbes) / (w1.nCand.toDouble / nProbes)
      val probeShufRatio = w2.probeW.toDouble / math.max(w1.probeW, 1L)
      // --- gates ---
      require(w1.recall >= 0.95 && w2.recall >= 0.95,
        f"planted recall ${w1.recall}%.4f / ${w2.recall}%.4f < 0.95")
      require(w1.wMeanBucket <= 256 && w2.wMeanBucket <= 256,
        f"weighted mean bucket ${w1.wMeanBucket}%.0f / " +
          f"${w2.wMeanBucket}%.0f past 4x the 64 target — the bits " +
          "ladder is not holding bucket population")
      require(w2.bits > w1.bits,
        s"bits ladder did not step (${w1.bits} -> ${w2.bits}) across " +
          f"a $widthRatio%.1fx width step")
      require(candRatio <= 2.0,
        f"candidates/probe grew $candRatio%.2fx across a " +
          f"$widthRatio%.1fx width step — probe cost is not " +
          "O(bands x bucket)")
      // probe shuffle must track CANDIDATES, not the corpus: bytes per
      // candidate may not double across the step (at the measured 3-11
      // MB absolutes a fixed ratio would gate encoding noise — id
      // entropy, partition-count effects — instead of plan shape; the
      // per-width naive-control gate below catches a corpus-shaped
      // re-score regardless)
      require(probeShufRatio <= 2.0 * candRatio,
        f"probe shuffle grew $probeShufRatio%.2fx against a " +
          f"$candRatio%.2fx candidate step (limit 2x) across the " +
          f"$widthRatio%.1fx width step — shuffle is not " +
          "candidate-bound")
      require(w1.probeW * 3 < w1.naiveW && w2.probeW * 3 < w2.naiveW,
        f"probe shuffle ${w1.probeW / 1e6}%.1f/${w2.probeW / 1e6}%.1f " +
          f"MB is not < 1/3 of the corpus-shuffle control " +
          f"(${w1.naiveW / 1e6}%.1f/${w2.naiveW / 1e6}%.1f MB)")
      println(f"[stress-ann] GATES: recall ${w1.recall}%.4f/" +
        f"${w2.recall}%.4f (>=0.95), wMeanBucket " +
        f"${w1.wMeanBucket}%.0f/${w2.wMeanBucket}%.0f (<=256), bits " +
        f"${w1.bits}->${w2.bits} (stepped), cand/probe x$candRatio%.2f" +
        f" (<=2.0 at x$widthRatio%.1f width), probe shuffle " +
        f"x$probeShufRatio%.2f (<=2x cand step), probe vs naive " +
        f"control " +
        f"${w1.probeW / 1e6}%.1f vs ${w1.naiveW / 1e6}%.1f / " +
        f"${w2.probeW / 1e6}%.1f vs ${w2.naiveW / 1e6}%.1f MB (<1/3)")

      // --- IVF gates (e4b's inverted-file shape at C ≈ √N) ---------
      val sf1 = w1.ivf.nCand.toDouble / (nProbes.toDouble * w1.n)
      val sf2 = w2.ivf.nCand.toDouble / (nProbes.toDouble * w2.n)
      val ivfShufRatio =
        w2.ivf.probeW.toDouble / math.max(w1.ivf.probeW, 1L)
      require(w1.ivf.recall >= 0.90 && w2.ivf.recall >= 0.90,
        f"IVF recall ${w1.ivf.recall}%.4f / ${w2.ivf.recall}%.4f " +
          "< 0.90")
      require(sf1 <= 3.0 * nprobe / w1.ivf.c &&
          sf2 <= 3.0 * nprobe / w2.ivf.c,
        f"IVF scanned fraction $sf1%.4f / $sf2%.4f past 3x nprobe/C " +
          f"(${nprobe.toDouble / w1.ivf.c}%.4f / " +
          f"${nprobe.toDouble / w2.ivf.c}%.4f) — cells are not " +
          "bounding the probe")
      // physical pruning is gated on the SINGLE-probe read (a batch of
      // 100 probes × nprobe cells covers nearly every cell, so the
      // batch read legitimately approaches the lake — amortized): one
      // probe must read ~nprobe·(N/C) rows, never the corpus
      def onePruned(w: AnnWidth): Boolean =
        w.ivf.oneProbeRec < 3L * w.ivf.nprobe * (w.n / w.ivf.c) &&
          w.ivf.oneProbeRec < w.n / 2
      require(onePruned(w1) && onePruned(w2),
        s"single-probe read ${w1.ivf.oneProbeRec} / " +
          s"${w2.ivf.oneProbeRec} rows against corpora ${w1.n} / " +
          s"${w2.n} — the lake scan was not partition-pruned")
      require(ivfShufRatio <= 3.0,
        f"IVF probe shuffle grew $ivfShufRatio%.2fx across the width " +
          f"step — expected ~sqrt(width ratio) with C = sqrt(N)")
      println(f"[stress-ann] IVF GATES: recall ${w1.ivf.recall}%.4f/" +
        f"${w2.ivf.recall}%.4f (>=0.90), scanned $sf1%.4f/$sf2%.4f " +
        f"(<=3x nprobe/C), one-probe read ${w1.ivf.oneProbeRec}/" +
        f"${w2.ivf.oneProbeRec} rows vs corpora ${w1.n}/${w2.n} " +
        f"(pruned), probe shuffle x$ivfShufRatio%.2f (<=3.0)")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** Per-width measurements of the TRAINED vector-index tier. */
  private final case class TrainedWidth(
      n: Long, c: Int, tTrain: Double, trainW: Long, ctlW: Long,
      ivfRecall: Double, ivfCand: Long, tIvfPr: Double, ivfProbeW: Long,
      oneProbeRec: Long, naiveW: Long, tNaive: Double,
      tPqTrain: Double, pqTrainW: Long, pqRecall: Double,
      codesBytes: Long, lakeBytes: Long, tPqPr: Double, pqProbeW: Long,
      onePqRec: Long)

  /** The TRAINED vector-index tier at width (VERDICT r19 task 1): e6's
    * k-means training, e7b's trained-IVF lake probe, and e11b's
    * IVF-PQ/ADC serving path — the production index forms — executed
    * at two corpus widths through the graded operator bodies
    * ([[graft.ops.Kmeans.train]]/[[graft.ops.Kmeans.trainProduct]]/
    * [[graft.ops.Kmeans.assign]]/[[graft.ops.Similarity.ivfLakeTopK]]/
    * [[graft.ops.Similarity.ivfPqTopK]]), with the live corpus-shaped
    * controls the round-19 LSH/IVF width runs established. Both r19
    * executions caught fixture-green corpus-shaped plans; this owes the
    * same audit to the only index family still arguing from plan gates.
    *
    * Gates, per width and across the width step:
    *   1. TRAINING shuffle is aggregate-sized: THREE full Lloyd rounds
    *      together shuffle less than ONE corpus-shaped control round —
    *      the same (cell,pos) rollup with map-side combine defeated by
    *      an explicit row-level repartition (n·dims rows through the
    *      wire: what the update costs if partial aggregation is lost).
    *      The only training collects are the first-C init (C rows) and
    *      the per-round (cell,pos) stats (≤ C·dims rows) — the
    *      codebook-collect pattern, bounds printed.
    *   2. training shuffle grows strictly sublinearly (≤ 0.8× the
    *      width ratio) across the width step — the aggregate is
    *      tasks·C·dims-sized with C = √N, and the task count itself
    *      grows with input splits past the core floor, so the honest
    *      cross-width claim is sublinear-in-corpus, not pure √.
    *   3. trained-IVF lake probe (e7b's body): planted recall ≥ 0.90,
    *      scanned fraction ≤ 3× nprobe/C, SINGLE-probe read ~
    *      nprobe·(N/C) rows (static pruning physically engaged —
    *      probe-0's cells/vector enter as LocalRelations so the meter
    *      reads the lake scan alone), probe shuffle ≤ 3× across the
    *      width step.
    *   4. the corpus-shuffle control, live: e7's graded re-score shape
    *      (cosineOf's plain equi-joins against the full vector
    *      relation — fixture-green because the candidate side
    *      broadcasts there) run on the SAME candidates; the lake
    *      probe's shuffle must be < 1/3 of it.
    *   5. IVF-PQ serving probe (e11b's body, both lakes
    *      cell-partitioned): planted recall ≥ 0.90 after the ADC →
    *      exact-rerank chain, the code lake ≤ 1/2 the vector lake's
    *      bytes ON DISK (the codes-sized claim — 3 small ints vs dims
    *      longs per row, parquet-encoded), SINGLE-probe input ≤
    *      3 × nprobe·(N/C)·(M+1) rows (M code rows + 1 rerank vector
    *      row per candidate — both scans cell-pruned), probe shuffle
    *      ≤ 3× across the width step.
    *
    *   sbt "runMain graft.tools.Stress ann trained [nBackground1]
    *        [nBackground2] [nProbes] [nNbr] [nprobe]"
    *        (200000 1000000 100 3 64)
    *
    * Width selection: both widths must put the vector relation past
    * the broadcast threshold, or gate 4's naive control is not
    * corpus-shaped — at 100k vectors Spark broadcasts the corpus into
    * the e7-shape joins and the control legitimately measures ~0 MB
    * (observed live: 0.2 MB at 100k vs 901 MB at 200k). That is the
    * correct production answer for small corpora, but it makes the
    * <1/3-of-control gate vacuous; the defaults are chosen past it.
    */
  private def annTrainedMain(args: Array[String]): Unit = {
    val nBg1 = args.lift(0).map(_.toLong).getOrElse(200000L)
    val nBg2 = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nProbes = args.lift(2).map(_.toInt).getOrElse(100)
    val nNbr = args.lift(3).map(_.toInt).getOrElse(3)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(64)
    require(nBg2 > nBg1, s"width 2 ($nBg2) must exceed width 1 ($nBg1)")
    val spark = Sessions.build("graft-stress-ann-trained")
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_annt_").toString
    val KmIters = 3
    val PqM = 8
    val PqK = 16
    val PqIters = 2
    val PqRerank = 20
    val subd = AnnFixture.Dims / PqM

    def du(p: String): Long =
      Files.walk(java.nio.file.Paths.get(p))
        .filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    def localized(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)

    def runWidth(tag: String, nBackground: Long): TrainedWidth = {
      val wdir = s"$dir/$tag"
      AnnFixture.synthEmbeddings(spark, nProbes, nNbr, nBackground)
        .write.mode("overwrite").parquet(s"$wdir/emb")
      val embL = spark.read
        .schema(graft.Catalog.schemas("embeddings"))
        .parquet(s"$wdir/emb")
      // persist the quantized form once — training scans it 3+ times,
      // and re-deriving it per round would meter the derivation, not
      // the training
      graft.ops.Similarity.withSqNorm(embL, "vec_id")
        .write.mode("overwrite").parquet(s"$wdir/vecs")
      val qL = spark.read.parquet(s"$wdir/vecs")
      val n = qL.count()
      val c = math.ceil(math.sqrt(n.toDouble)).toInt

      // --- e6 at width: 3 Lloyd rounds, C = sqrt(N) ------------------
      val mTrain = new ShuffleMeter(spark.sparkContext)
      val t0 = System.nanoTime()
      val cents = graft.ops.Kmeans.train(qL, "vec_id", c, KmIters)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val (trainW, _) = mTrain.finish()
      // corpus-shaped control: ONE update round with map-side combine
      // defeated — the row-level (cell,pos) relation crosses the wire
      val mCtl = new ShuffleMeter(spark.sparkContext)
      graft.ops.Kmeans.assign(qL, cents)
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .repartition(col("cell"), col("pos"))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
      val (ctlW, _) = mCtl.finish()
      println(f"[stress-annt] $tag n=$n C=$c train=$tTrain%.1f s " +
        f"(${KmIters} rounds) trainShuffle=${trainW / 1e6}%.1f MB vs " +
        f"one corpus-shaped round ${ctlW / 1e6}%.1f MB; collects: " +
        f"init C=$c rows, per-round stats <= ${c * AnnFixture.Dims} " +
        "(C*dims) rows")

      // --- e7b at width: the trained inverted-file lake + probe ------
      val tL0 = System.nanoTime()
      graft.ops.Kmeans.assign(qL, cents)
        .select(col("vec_id"), col("q"), col("sq"), col("cell"))
        .repartition(32, col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$wdir/ivf")
      val tLake = (System.nanoTime() - tL0) / 1e9
      val lakeL = spark.read.parquet(s"$wdir/ivf")
      val lakeBytes = du(s"$wdir/ivf")
      val probeCells = graft.ops.Kmeans
        .nearestCells(qL.where(col("vec_id") < nProbes), "vec_id",
          cents, nprobe)
        .select(col("vec_id").as("qid"), col("cell"))
      val probesV = qL.where(col("vec_id") < nProbes)
        .select(col("vec_id").as("qid"), col("q").as("qa"),
          col("sq").as("qsq"))
      val truth = AnnFixture.plantedNeighbors(spark, nProbes, nNbr)
      val nTruth = nProbes.toLong * nNbr
      val mPr = new ShuffleMeter(spark.sparkContext)
      val t1 = System.nanoTime()
      val ivfTop = graft.ops.Similarity.ivfLakeTopK(lakeL, probesV,
        probeCells, nNbr).cache()
      ivfTop.count()
      val tIvfPr = (System.nanoTime() - t1) / 1e9
      val (ivfProbeW, _) = mPr.finish()
      val ivfHits = ivfTop.join(truth, Seq("qid", "tid")).count()
      val ivfRecall = ivfHits.toDouble / nTruth
      ivfTop.unpersist()
      val ivfCand = lakeL.join(broadcast(probeCells), Seq("cell"))
        .where(col("vec_id") =!= col("qid")).count()
      // single-probe physical pruning (probe-0 relations pre-collected
      // into LocalRelations so the meter reads the lake scan alone)
      val cells0L = localized(probeCells.where(col("qid") === 0))
      val probe0L = localized(probesV.where(col("qid") === 0))
      val m1p = new ShuffleMeter(spark.sparkContext)
      graft.ops.Similarity.ivfLakeTopK(lakeL, probe0L, cells0L, nNbr)
        .write.format("noop").mode("overwrite").save()
      m1p.finish()
      val oneProbeRec = m1p.inputRecords
      // the corpus-shuffle control: e7's graded re-score shape (plain
      // equi-joins against the full vector relation) on the SAME
      // candidate set — fixture-green (candidates broadcast there),
      // corpus-shaped at width; kept live so the lake probe's advantage
      // stays a number
      val candE7 = graft.ops.Kmeans.assign(qL, cents)
        .select(col("vec_id").as("tid"), col("cell"))
        .join(broadcast(probeCells), Seq("cell"))
        .where(col("tid") =!= col("qid"))
        .select("qid", "tid")
      val mNaive = new ShuffleMeter(spark.sparkContext)
      val t2 = System.nanoTime()
      graft.ops.Similarity.topK(
          graft.ops.Similarity.cosineOf(candE7, qL, "qid", "tid"), nNbr)
        .write.format("noop").mode("overwrite").save()
      val tNaive = (System.nanoTime() - t2) / 1e9
      val (naiveW, _) = mNaive.finish()
      println(f"[stress-annt] $tag IVF(trained) C=$c nprobe=$nprobe " +
        f"recall=$ivfRecall%.4f ($ivfHits/$nTruth) lake=$tLake%.1f s " +
        f"(${lakeBytes / 1e6}%.1f MB) probe=$tIvfPr%.1f s " +
        f"probeShuffle=${ivfProbeW / 1e6}%.1f MB " +
        f"scanned/probe=${ivfCand.toDouble / nProbes}%.0f " +
        f"oneProbeRec=$oneProbeRec (nprobe*N/C=" +
        f"${nprobe.toLong * (n / c)}) naive(e7-shape) $tNaive%.1f s " +
        f"${naiveW / 1e6}%.1f MB")

      // --- e11b at width: PQ training, the code lake, the ADC probe -
      val subVecs = (0 until PqM).map(m =>
          qL.select(col("vec_id"), lit(m).as("sub"),
            slice(col("q"), m * subd + 1, subd).as("q")))
        .reduce(_.union(_))
      val mPqT = new ShuffleMeter(spark.sparkContext)
      val t3 = System.nanoTime()
      val pqC = graft.ops.Kmeans.trainProduct(subVecs, "vec_id", PqM,
        PqK, PqIters)
      val tPqTrain = (System.nanoTime() - t3) / 1e9
      val (pqTrainW, _) = mPqT.finish()
      // the code lake rides the coarse cell (read from the ivf lake so
      // the C-literal coarse assignment is not re-evaluated 8×)
      val t4 = System.nanoTime()
      (0 until PqM).map { m =>
          graft.ops.Kmeans.assign(
              lakeL.select(col("vec_id"), col("cell").as("ccell"),
                slice(col("q"), m * subd + 1, subd).as("q")), pqC(m))
            .select(col("vec_id"), lit(m).as("sub"),
              col("cell").as("code"), col("ccell").as("cell"))
        }.reduce(_.union(_))
        .repartition(32, col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$wdir/pq_codes")
      val tCodes = (System.nanoTime() - t4) / 1e9
      val codesLakeL = spark.read.parquet(s"$wdir/pq_codes")
      val codesBytes = du(s"$wdir/pq_codes")
      val centT = (for (m <- 0 until PqM; k <- pqC(m).indices)
          yield (m, k, pqC(m)(k), pqC(m)(k).map(x => x * x).sum))
        .toDF("sub", "code", "cq", "csq")
      val probeSubs = (0 until PqM).map(m =>
          qL.where(col("vec_id") < nProbes)
            .select(col("vec_id").as("qid"), lit(m).as("sub"),
              slice(col("q"), m * subd + 1, subd).as("qs")))
        .reduce(_.union(_))
      val lut = probeSubs.join(broadcast(centT), Seq("sub"))
        .select(col("qid"), col("sub"), col("code"),
          graft.ops.Similarity.dotq(col("qs"), col("cq")).as("pdot"),
          col("csq"))
      val mPq = new ShuffleMeter(spark.sparkContext)
      val t5 = System.nanoTime()
      val pqTop = graft.ops.Similarity.ivfPqTopK(codesLakeL, lakeL,
        lut, probeCells, probesV, PqRerank, nNbr).cache()
      pqTop.count()
      val tPqPr = (System.nanoTime() - t5) / 1e9
      val (pqProbeW, _) = mPq.finish()
      val pqHits = pqTop.join(truth, Seq("qid", "tid")).count()
      val pqRecall = pqHits.toDouble / nTruth
      pqTop.unpersist()
      // single-probe ADC read: both pruned scans (codes + rerank
      // vectors), probe-0 relations local
      val lut0L = localized(lut.where(col("qid") === 0))
      val m1pq = new ShuffleMeter(spark.sparkContext)
      graft.ops.Similarity.ivfPqTopK(codesLakeL, lakeL, lut0L,
          cells0L, probe0L, PqRerank, nNbr)
        .write.format("noop").mode("overwrite").save()
      m1pq.finish()
      val onePqRec = m1pq.inputRecords
      println(f"[stress-annt] $tag IVF-PQ M=$PqM K=$PqK " +
        f"pqTrain=$tPqTrain%.1f s (${pqTrainW / 1e6}%.1f MB shuffle) " +
        f"codes=$tCodes%.1f s recall=$pqRecall%.4f ($pqHits/$nTruth) " +
        f"codesLake=${codesBytes / 1e6}%.1f MB vs " +
        f"vecLake=${lakeBytes / 1e6}%.1f MB probe=$tPqPr%.1f s " +
        f"probeShuffle=${pqProbeW / 1e6}%.1f MB onePqRec=$onePqRec " +
        f"(3x(M+1)*nprobe*N/C=" +
        f"${3L * (PqM + 1) * nprobe * (n / c)})")
      TrainedWidth(n, c, tTrain, trainW, ctlW, ivfRecall, ivfCand,
        tIvfPr, ivfProbeW, oneProbeRec, naiveW, tNaive, tPqTrain,
        pqTrainW, pqRecall, codesBytes, lakeBytes, tPqPr, pqProbeW,
        onePqRec)
    }

    try {
      val w1 = runWidth("w1", nBg1)
      val w2 = runWidth("w2", nBg2)
      val widthRatio = w2.n.toDouble / w1.n
      // 1. training shuffle aggregate-sized, per width: 3 rounds < 1
      //    corpus-shaped round
      require(w1.trainW < w1.ctlW && w2.trainW < w2.ctlW,
        f"training shuffle (${w1.trainW / 1e6}%.1f / " +
          f"${w2.trainW / 1e6}%.1f MB over $KmIters rounds) is not " +
          f"under ONE corpus-shaped round (${w1.ctlW / 1e6}%.1f / " +
          f"${w2.ctlW / 1e6}%.1f MB) — the Lloyd update is shuffling " +
          "row-level data")
      // 2. training shuffle STRICTLY SUBLINEAR across the width step.
      // The partial-aggregate volume is tasks · C · dims: C = √N
      // contributes √widthRatio, but the scan task count also grows
      // with input size once past the core floor (the first 200k/1M
      // run measured 13.1 → 46.5 MB = 3.56× against √5 = 2.24×, the
      // extra ~1.6× being task growth), so a pure-√ threshold
      // mis-fires on exactly the widths this harness exists to run.
      // The row-level-vs-aggregate claim is gate 1 (per width, 3
      // rounds ≪ ONE corpus-shaped round); across widths the scale
      // claim is that the wire cost grows strictly slower than the
      // corpus — gate at 0.8 × widthRatio.
      val trainRatio = w2.trainW.toDouble / math.max(w1.trainW, 1L)
      require(trainRatio <= 0.8 * widthRatio,
        f"training shuffle grew $trainRatio%.2fx across a " +
          f"$widthRatio%.1fx width step — not sublinear in the " +
          "corpus (tasks·C·dims should grow ~tasks·sqrt)")
      // 3. trained-IVF probe gates (e7b's body)
      require(w1.ivfRecall >= 0.90 && w2.ivfRecall >= 0.90,
        f"trained-IVF recall ${w1.ivfRecall}%.4f / " +
          f"${w2.ivfRecall}%.4f < 0.90")
      val sf1 = w1.ivfCand.toDouble / (nProbes.toDouble * w1.n)
      val sf2 = w2.ivfCand.toDouble / (nProbes.toDouble * w2.n)
      require(sf1 <= 3.0 * nprobe / w1.c && sf2 <= 3.0 * nprobe / w2.c,
        f"trained-IVF scanned fraction $sf1%.4f / $sf2%.4f past 3x " +
          "nprobe/C")
      def onePruned(w: TrainedWidth): Boolean =
        w.oneProbeRec < 3L * nprobe * (w.n / w.c) &&
          w.oneProbeRec < w.n / 2
      require(onePruned(w1) && onePruned(w2),
        s"single-probe read ${w1.oneProbeRec} / ${w2.oneProbeRec} " +
          s"rows against corpora ${w1.n} / ${w2.n} — the trained lake " +
          "scan was not partition-pruned")
      val ivfShufRatio =
        w2.ivfProbeW.toDouble / math.max(w1.ivfProbeW, 1L)
      require(ivfShufRatio <= 3.0,
        f"trained-IVF probe shuffle grew $ivfShufRatio%.2fx across " +
          "the width step")
      // 4. the live corpus-shuffle control
      require(w1.ivfProbeW * 3 < w1.naiveW && w2.ivfProbeW * 3 < w2.naiveW,
        f"lake probe shuffle ${w1.ivfProbeW / 1e6}%.1f/" +
          f"${w2.ivfProbeW / 1e6}%.1f MB is not < 1/3 of the " +
          f"corpus-shuffle control (${w1.naiveW / 1e6}%.1f/" +
          f"${w2.naiveW / 1e6}%.1f MB)")
      // 5. IVF-PQ serving gates (e11b's body)
      require(w1.pqRecall >= 0.90 && w2.pqRecall >= 0.90,
        f"IVF-PQ recall ${w1.pqRecall}%.4f / ${w2.pqRecall}%.4f < 0.90")
      require(w1.codesBytes * 2 < w1.lakeBytes &&
          w2.codesBytes * 2 < w2.lakeBytes,
        f"code lake ${w1.codesBytes / 1e6}%.1f/" +
          f"${w2.codesBytes / 1e6}%.1f MB is not codes-sized vs the " +
          "vector lake " +
          f"${w1.lakeBytes / 1e6}%.1f/${w2.lakeBytes / 1e6}%.1f MB")
      def onePqPruned(w: TrainedWidth): Boolean =
        w.onePqRec < 3L * (PqM + 1) * nprobe * (w.n / w.c) &&
          w.onePqRec < w.n.toLong * PqM / 2
      require(onePqPruned(w1) && onePqPruned(w2),
        s"single-probe ADC read ${w1.onePqRec} / ${w2.onePqRec} rows " +
          "— the code/vector lake scans were not both pruned")
      val pqShufRatio = w2.pqProbeW.toDouble / math.max(w1.pqProbeW, 1L)
      require(pqShufRatio <= 3.0,
        f"IVF-PQ probe shuffle grew $pqShufRatio%.2fx across the " +
          "width step")
      println(f"[stress-annt] GATES: train shuffle " +
        f"${w1.trainW / 1e6}%.1f/${w2.trainW / 1e6}%.1f MB < control " +
        f"${w1.ctlW / 1e6}%.1f/${w2.ctlW / 1e6}%.1f MB, xwidth " +
        f"x$trainRatio%.2f (<= 0.8x width $widthRatio%.1f); " +
        f"IVF recall ${w1.ivfRecall}%.4f/" +
        f"${w2.ivfRecall}%.4f, scanned $sf1%.4f/$sf2%.4f, one-probe " +
        f"${w1.oneProbeRec}/${w2.oneProbeRec} rows (pruned), shuffle " +
        f"x$ivfShufRatio%.2f, vs naive ${w1.ivfProbeW / 1e6}%.1f<" +
        f"${w1.naiveW / 1e6}%.1f / ${w2.ivfProbeW / 1e6}%.1f<" +
        f"${w2.naiveW / 1e6}%.1f MB; PQ recall ${w1.pqRecall}%.4f/" +
        f"${w2.pqRecall}%.4f, codes ${w1.codesBytes / 1e6}%.1f/" +
        f"${w2.codesBytes / 1e6}%.1f MB vs vecs " +
        f"${w1.lakeBytes / 1e6}%.1f/${w2.lakeBytes / 1e6}%.1f MB, " +
        f"one-probe ADC ${w1.onePqRec}/${w2.onePqRec} rows, shuffle " +
        f"x$pqShufRatio%.2f")
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }

  /** The IVF lake's batch-probe amortization curve (VERDICT r19 task
    * 5): e4b's static pruning is gated on the SINGLE-probe read, while
    * a 100-probe batch legitimately touches most cells — somewhere in
    * between, pruned-scan serving stops beating one full-scan batch
    * pass. This measures that crossover: at each width, the sampled-
    * codebook IVF lake (e4b's build) is probed with batches of
    * 1..nProbes probes (probe relations pre-collected into
    * LocalRelations, so the meter reads the lake scan alone) and the
    * physical rows read are printed against the corpus — the
    * operational knob (batch size ↔ serving mode) a 100 TB deployment
    * actually turns.
    *
    *   sbt "runMain graft.tools.Stress ann crossover [nBackground1]
    *        [nBackground2] [nProbes] [nNbr] [nprobe]"
    *        (200000 1000000 100 3 64)
    */
  private def annCrossoverMain(args: Array[String]): Unit = {
    val nBg1 = args.lift(0).map(_.toLong).getOrElse(200000L)
    val nBg2 = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nProbes = args.lift(2).map(_.toInt).getOrElse(100)
    val nNbr = args.lift(3).map(_.toInt).getOrElse(3)
    val nprobe = args.lift(4).map(_.toInt).getOrElse(64)
    val spark = Sessions.build("graft-stress-ann-xover")
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_stress_annx_").toString
    def localized(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    try {
      Seq(("w1", nBg1), ("w2", nBg2)).foreach { case (tag, nBackground) =>
        val wdir = s"$dir/$tag"
        AnnFixture.synthEmbeddings(spark, nProbes, nNbr, nBackground)
          .write.mode("overwrite").parquet(s"$wdir/emb")
        val embL = spark.read
          .schema(graft.Catalog.schemas("embeddings"))
          .parquet(s"$wdir/emb")
        graft.ops.Similarity.withSqNorm(embL, "vec_id")
          .write.mode("overwrite").parquet(s"$wdir/vecs")
        val qL = spark.read.parquet(s"$wdir/vecs")
        val n = qL.count()
        val c = math.ceil(math.sqrt(n.toDouble)).toInt
        val bg0 = nProbes.toLong * (1 + nNbr)
        val cents = graft.ops.Similarity.sampledCents(qL, bg0, c)
        qL.select(col("vec_id"), col("q"), col("sq"),
            graft.ops.Similarity.ivfAssign(cents).as("cell"))
          .repartition(32, col("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$wdir/ivf")
        val lakeL = spark.read.parquet(s"$wdir/ivf")
        val cells = graft.ops.Similarity.ivfProbeCells(qL, cents,
          nProbes, nprobe)
        val probesV = qL.where(col("vec_id") < nProbes)
          .select(col("vec_id").as("qid"), col("q").as("qa"),
            col("sq").as("qsq"))
        // pre-collect ALL probe relations once; per-batch slices are
        // driver-side filters of the collected arrays
        val cellRows = cells.collect()
        val probeRows = probesV.collect()
        val batches = Seq(1, 2, 4, 8, 16, 32, 64, nProbes)
          .filter(_ <= nProbes).distinct
        println(s"[stress-annx] $tag n=$n C=$c nprobe=$nprobe " +
          s"corpusRows=$n")
        var crossed = false
        batches.foreach { b =>
          val bCells = spark.createDataFrame(java.util.Arrays.asList(
            cellRows.filter(_.getLong(0) < b): _*), cells.schema)
          val bProbes = spark.createDataFrame(java.util.Arrays.asList(
            probeRows.filter(_.getLong(0) < b): _*), probesV.schema)
          val nCells = cellRows.filter(_.getLong(0) < b)
            .map(_.getInt(1)).distinct.length
          val m = new ShuffleMeter(spark.sparkContext)
          val t0 = System.nanoTime()
          graft.ops.Similarity.ivfLakeTopK(lakeL, bProbes, bCells, nNbr)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          m.finish()
          val rec = m.inputRecords
          if (b == 1) require(rec < n / 2,
            s"single-probe read $rec rows vs corpus $n — pruning " +
              "not engaged")
          if (!crossed && rec >= (n * 8) / 10) {
            crossed = true
            println(s"[stress-annx] $tag CROSSOVER at batch=$b: " +
              s"pruned read $rec >= 80% of corpus $n — a full-scan " +
              "batch pass wins from here")
          }
          println(f"[stress-annx] $tag batch=$b%3d cells=$nCells%4d/" +
            f"$c%d rowsRead=$rec%9d (${rec.toDouble / n}%.3f of " +
            f"corpus) wall=$wall%.1f s")
        }
      }
      spark.stop()
    } finally {
      import scala.util.Try
      Files.walk(java.nio.file.Paths.get(dir)).sorted(
          java.util.Comparator.reverseOrder())
        .forEach(p => { Try(Files.delete(p)); () })
    }
  }
}
