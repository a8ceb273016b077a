package graft
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at the env-selected scale
  * factor and emits ONE JSON line on stdout (plus a copy at
  * `$SPARK_GRAFT_BENCH_OUT` if set, so the result survives stdout noise).
  *
  * Methodology: each query is fully materialized through a `noop`-format
  * write — unlike `.count()`, the noop sink cannot let Catalyst drop sorts
  * or prune the output projection, so the measured time is the real cost of
  * producing every output row. A failing query is reported loudly on stderr
  * and recorded as -1 so a time-to-crash never pollutes the total.
  *
  * Host-state instrumentation (see SCALE.md's measurement section):
  * endpoint canaries + load_avg bracket the sweep; a per-query micro
  * canary lands in `canary_q`, and `suspect` lists every query whose
  * micro canary ran ≥2× the sweep's own floor (`canary_floor`) — the
  * per-line contamination signal endpoint canaries cannot provide.
  * Flagged lines are re-measured at end of sweep in up to five passes,
  * each bracketed by a leading AND trailing micro canary and adopted
  * only when both read clean (`retimed` lists adoptions,
  * `retime_passes` the passes run); the loop ends when the suspect set
  * empties or stops changing — lines still flagged after that are
  * genuinely untrustworthy.
  */
object Bench {

  /** Fixed load canary: a pure-CPU job (hash + sum over a distributed
    * range) that never touches the query code or the fixtures, timed
    * min-of-3. Its value on a given host depends only on ambient load /
    * CPU state, so two sweeps of DIFFERENT code can be load-normalized
    * by their canary ratio — round 10's "2-3× small-query drift" turned
    * out to be exactly this (identical commits measured 0.22 s vs
    * 0.66 s for w1 on differently-loaded hosts; see SCALE.md).
    */
  private def canarySec(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // pmod bounds the addends so the ANSI-mode sum cannot overflow
      spark.range(0L, 500000000L, 1L)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h"))
        .agg(sum(col("h"))).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Micro canary (~1/5 the endpoint canary's range): interleaved after
    * EVERY query so each per-query time carries its own host-state
    * reading. Endpoint canaries proved blind to mid-sweep contention
    * twice (r12's a3d and r13's e1b both recorded multi-× phantoms
    * between clean endpoints); this closes that gap.
    *
    * MIN of three readings, each after a forced full GC + settle: the
    * canary must read the HOST's state, not the preceding query's JVM
    * residue. Round 14's single-shot readings correlated 0.55 with the
    * preceding query's own seconds — heavy queries left enough GC debt,
    * live cache blocks, and ContextCleaner broadcast-cleanup work to
    * inflate the one reading ≥2× the sweep floor deterministically,
    * which is exactly why the same lines came back suspect in every
    * sweep and no retime could heal them: the detector was reading
    * allocator state and calling it load. CanaryProbe measured the
    * residue's shape — first reading after t10/g1 0.43-0.46 s, third
    * ~0.14 s, while ambient load elevates ALL readings — so the min of
    * three is immune to the residue yet still catches every sustained
    * spike that could actually have contaminated a multi-second 3-run
    * median (a sub-second transient the min misses could not have).
    * Costs ~0.5-1 s per query — the price of a contamination signal
    * that means what it claims.
    */
  /** One GC'd micro-canary reading — shared with
    * [[graft.tools.CanaryProbe]], which calibrates this exact workload
    * (a probe measuring a different job would calibrate nothing).
    */
  private[graft] def microCanaryReading(
      spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    System.gc()
    // let async cache-block drops and the GC's concurrent phases
    // settle so neither bleeds into the reading
    Thread.sleep(50)
    val t0 = System.nanoTime()
    spark.range(0L, 100000000L, 1L)
      .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h"))
      .agg(sum(col("h"))).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def microCanarySec(spark: org.apache.spark.sql.SparkSession): Double =
    (1 to 3).map(_ => microCanaryReading(spark)).min

  /** REPO-ANCHORED artifact dir: the nearest ancestor of `start` (self
    * included, all the way to the filesystem root — the walk is a few
    * stat calls, and a depth cap just re-creates the mis-stamping
    * failure one level further out) holding build.sbt — run from a
    * subdir or a driver-chosen cwd, the artifacts still land in the
    * repo instead of a silently mis-stamped file wherever the JVM
    * started. Falls back to `start` with a loud stderr note
    * (unit-tested in BenchAnchorSpec; factored out exactly so the
    * fallback is testable without a sweep).
    */
  private[graft] def artifactBase(start: java.nio.file.Path): java.nio.file.Path =
    Iterator.iterate(start)(_.getParent)
      .takeWhile(_ != null)
      .find(p => Files.exists(p.resolve("build.sbt")))
      .getOrElse {
        System.err.println("[bench] no build.sbt above cwd — writing " +
          "artifacts to the cwd itself")
        start
      }

  /** Start-load ceiling for a trustworthy sweep. Round 19's committed
    * driver sweep started at load_avg 8.86 (vs 2.89 the round before)
    * and embedded a3d=13.24 s against an idle-anchor 1.55 s — an honest
    * artifact (load recorded) that still mis-reads as a regression in
    * any round-over-round comparison. Above this ceiling the sweep
    * still RUNS (the driver's round artifact must exist), but both
    * JSON lines carry `"loaded_window": true` and stderr says so
    * loudly, so no future reader can mistake ambient load for a code
    * delta. 4.0 sits between every clean recorded start (≤ 2.9) and
    * the known-contaminated one (8.86) on this 32-thread host.
    */
  private val LoadedWindowCeiling = 4.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadLaunch = loadAvg
    val spark = Sessions.build("graft-bench")
    var failures = 0
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    // Untimed warm pass: steady-state throughput is the comparable
    // number — without it the alphabetically-first query absorbs all
    // one-time cost (JIT, codegen compilation, parquet footers, OS page
    // cache) and per-query times are incomparable across rounds.
    sorted.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // canary AFTER the warm pass (JIT/codegen steady state) and again
    // after the sweep: their pair brackets the host's load over the run
    val loadStart = loadAvg
    // the loaded-window stamp reads the WORSE of launch and post-warm
    // load: the warm pass itself drives load_avg up, so loadStart alone
    // would flag every sweep, while loadLaunch alone would miss a spike
    // arriving during warmup on an idle-launched host
    val loadedWindow =
      math.min(loadLaunch, loadStart) > LoadedWindowCeiling
    if (loadedWindow)
      System.err.println(f"[bench] LOADED WINDOW: load_avg at launch " +
        f"$loadLaunch%.2f / post-warm $loadStart%.2f exceeds " +
        f"$LoadedWindowCeiling%.1f — per-query times in this sweep are " +
        "not comparable across rounds; adjudicate against idle twin " +
        "anchors instead")
    val canaryStart = canarySec(spark)
    // warm the micro canary's own codegen once, or the alphabetically
    // first query inherits a false suspect flag from ITS warmup
    microCanarySec(spark)
    // Median of 3 timed runs per query: single-shot times swung 2-4× in
    // both directions between rounds on byte-identical code (GC, JIT
    // recompilation, page-cache state), so no per-round perf delta is
    // credible without a robust per-query statistic. Queries that cache
    // intermediates register plans in the CacheManager, which matches
    // structurally — cleared before EVERY timed run, not just once after
    // the warm pass, because queries that share a cached subtree (the
    // resample panel, the shingle explode) would otherwise reuse a cache
    // a previous run populated and understate their own cost.
    val Runs = 3
    // (median, min) per query: the median is the headline statistic;
    // the min is the load-spike-resistant floor — a median 2× its own
    // min means the HOST was busy during the sweep, not that the code
    // regressed (observed repeatedly across rounds; see SCALE.md).
    val results = sorted.map { case (name, fn) =>
      val times = (1 to Runs).flatMap { _ =>
        // release registered panel caches too — clearCache frees the
        // blocks but the registry would otherwise accumulate plan
        // references for the whole sweep
        graft.ops.Time.unpersistPanels()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      if (times.size < Runs) failures += 1
      // the micro canary reads the host state THIS query just ran
      // under — recorded per query so a mid-sweep load spike is visible
      // on the line it contaminated, not just at the endpoints.
      // Release the query's registered caches FIRST: live cache blocks
      // survive the canary's System.gc() (referenced storage memory),
      // and a near-full heap makes the canary pay the query's GC
      // pressure — the r15 first-cut sweep flagged exactly the
      // cache-registering queries (g1/g3/g4/a3*/s6b…) as suspect on an
      // otherwise idle host through that mechanism
      graft.ops.Time.unpersistPanels()
      spark.catalog.clearCache()
      val micro = microCanarySec(spark)
      if (times.size == Runs)
        name -> (times.sorted.apply(Runs / 2), times.min, micro)
      else name -> (-1.0, -1.0, micro)
    }
    // self-calibrating suspect flag: the sweep's fastest micro canary is
    // the host's clean floor for THIS run; any query whose micro canary
    // ran ≥2× that floor executed under materially different host
    // conditions, so its per-query seconds are not comparable across
    // rounds (the r12/r13 phantom regressions were 2.4-3.4×). A fully
    // contaminated sweep self-reports through the ENDPOINT canaries
    // instead — the two signals are complementary.
    // self-healing loop: a transient spike usually ends before the sweep
    // does, so flagged lines are re-measured at the end — in up to
    // MaxRetimePasses rounds, each line bracketed by a LEADING and a
    // TRAILING micro canary and adopted only when BOTH read clean (a
    // trailing-only bracket let a spike that ended mid-retime
    // contaminate the adopted median yet read clean). Every canary
    // reading — first pass and both brackets — feeds the floor, so a
    // sweep loaded end-to-end gets an honest lower floor as soon as the
    // host goes idle, its inflated lines flip to suspect, and the next
    // pass re-measures them; the loop ends when the suspect set is
    // empty or stops changing, so a persistently busy host costs
    // bounded extra time and still reports its suspects honestly.
    val best = scala.collection.mutable.LinkedHashMap(results: _*)
    val retimed = scala.collection.mutable.ArrayBuffer[String]()
    var microFloor = results.map(_._2._3).min
    def suspectsOf: Seq[String] = best.iterator.toSeq.collect {
      case (k, (med, _, m)) if med >= 0 && m >= 2.0 * microFloor => k
    }
    val MaxRetimePasses = 5
    var passes = 0
    var prevSuspects: Set[String] = null
    var sus = suspectsOf
    while (passes < MaxRetimePasses && sus.nonEmpty &&
           (prevSuspects == null || sus.toSet != prevSuspects)) {
      prevSuspects = sus.toSet
      sus.take(20).foreach { name =>
        val fn = SparkEntry.queries(name)
        // both brackets read on a cache-free heap, like the main pass
        graft.ops.Time.unpersistPanels()
        spark.catalog.clearCache()
        val lead = microCanarySec(spark)
        val times = (1 to Runs).flatMap { _ =>
          graft.ops.Time.unpersistPanels()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        }
        graft.ops.Time.unpersistPanels()
        spark.catalog.clearCache()
        val trail = microCanarySec(spark)
        microFloor = math.min(microFloor, math.min(lead, trail))
        if (times.size == Runs && math.max(lead, trail) < 2.0 * microFloor) {
          // record the WORSE bracket reading as the line's canary: the
          // adopted median ran somewhere between the two
          best(name) =
            (times.sorted.apply(Runs / 2), times.min, math.max(lead, trail))
          if (!retimed.contains(name)) { retimed += name; () }
        }
      }
      passes += 1
      sus = suspectsOf
    }
    val results2 = best.toSeq
    val good = results2.filter(_._2._1 >= 0)
    val qs = results2.map { case (k, v) => "\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val qsMin = results2.map { case (k, v) => "\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val qsCanary = results2.map { case (k, v) => "\"" + k + "\":" + v._3 }
      .mkString("{", ",", "}")
    // the REPORTED suspect set is suspectsOf — the same definition the
    // retime loop used (med >= 0 included): a FAILED query is reported
    // through `failures`/its -1 entry, not as a suspect it was never
    // eligible to retime out of
    val suspects = suspectsOf
    val suspectJson =
      suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retimedJson =
      retimed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = good.map(_._2._1).sum
    val totalMin = good.map(_._2._2).sum
    val canaryEnd = canarySec(spark)
    val loadEnd = loadAvg
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$qsMin,"canary_q":$qsCanary,"suspect":$suspectJson,"retimed":$retimedJson,"retime_passes":$passes,"canary_floor":$microFloor,"total_min":$totalMin,"sf":"$sfDir","failures":$failures,"loaded_window":$loadedWindow,"canary_sec":{"start":$canaryStart,"end":$canaryEnd},"load_avg":{"launch":$loadLaunch,"start":$loadStart,"end":$loadEnd}}"""
    println(line)
    val baseDir = artifactBase(Paths.get("").toAbsolutePath)
    // the driver's stdout capture truncates long lines from the front,
    // losing the alphabetically-early per-query times — always persist
    // the complete artifact next to the run as well
    Files.writeString(baseDir.resolve("bench_full.json"), line + "\n")
    // ...and to a round-stamped committed path, so every round's driver
    // sweep parses standalone: SPARK_GRAFT_BENCH_OUT when set, else
    // bench_r{N}_driver.json with N = 1 + the highest BENCH_r{NN}.json
    // already committed (the round currently in progress — the driver
    // writes its own BENCH_r{N}.json only after this run). No committed
    // BENCH_r artifact at the anchor is loudly suspicious (mis-located
    // repo), not a silent r1 restamp.
    val roundStamped = {
      val rx = "BENCH_r(\\d+)\\.json".r
      val prior = Option(baseDir.toFile.list()).toSeq.flatten
        .collect { case rx(n) => n.toInt }
      if (prior.isEmpty)
        System.err.println(s"[bench] no BENCH_r*.json under $baseDir — " +
          "stamping r1; set SPARK_GRAFT_BENCH_OUT if this is not round 1")
      s"bench_r${if (prior.isEmpty) 1 else prior.max + 1}_driver.json"
    }
    val stampedPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").map(Paths.get(_))
      .getOrElse(baseDir.resolve(roundStamped))
    Files.writeString(stampedPath, line + "\n")
    // LAST line of stdout: a compact summary that FITS the driver's
    // ~2 KB tail capture (the full line is ~12 KB at 131 queries, so
    // BENCH_r{N}.json has read `parsed: null` since the query count
    // outgrew the buffer — the per-query data was only safe in the
    // committed twin above). Headline numbers + a pointer; a consumer
    // of the captured artifact parses THIS and follows `full_artifact`
    // for per-query detail.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","n_queries":${results2.size},"failures":$failures,"total_min":$totalMin,"canary_floor":$microFloor,"suspect":$suspectJson,"loaded_window":$loadedWindow,"canary_sec":{"start":$canaryStart,"end":$canaryEnd},"load_avg":{"launch":$loadLaunch,"start":$loadStart,"end":$loadEnd},"full_artifact":"${stampedPath.getFileName}"}"""
    println(compact)
    spark.stop()
  }
}
