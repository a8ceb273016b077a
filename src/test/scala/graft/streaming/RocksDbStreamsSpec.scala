package graft.streaming

/** The full streaming tier on the RocksDB state store — the provider a
  * 100 TB deployment actually runs: w21/w22's first-seen dedup state is
  * corpus-sized and w17/w18's open co-moment matrices are span-sized,
  * which is exactly what RocksDB's off-heap, spill-to-disk store (plus
  * changelog checkpointing) exists for; the default HDFS-backed
  * provider holds ALL of that on the executor heap. Every test below
  * re-runs a [[StreamRecipes]] oracle under
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider`, so the contracts [[StreamsSpec]] pins on
  * the heap store are proven provider-independent — including one
  * kill-and-redrain restart (open corr-UDAF state merging across a
  * checkpoint) and, separately, the same restart under RocksDB's
  * changelog checkpointing mode.
  *
  * Provider engagement is asserted, not assumed: RocksDB checkpoints
  * state as `version.zip` snapshots (+ `version.changelog` deltas when
  * changelog checkpointing is on), never the HDFS provider's
  * `version.delta` — the artifact shape in the checkpoint is pinned on
  * both ends of the matrix.
  */
class RocksDbStreamsSpec extends StreamRecipes {

  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def underRocks(body: => Unit): Unit =
    withStateProvider(Rocks)(body)

  test("rocksdb: windowedMeans matches batch, state lands as RocksDB " +
    "artifacts") {
    underRocks {
      val ck = checkWindowedMeans()
      val arts = StreamsSpec.stateArtifacts(ck)
      assert(arts.nonEmpty, "no state files under the checkpoint")
      assert(!arts.exists(_.endsWith(".delta")),
        s"HDFS-provider .delta files under a RocksDB run: " +
          s"${arts.filter(_.endsWith(".delta")).take(3)}")
      assert(arts.exists(a => a.endsWith(".zip") || a.endsWith(".changelog")),
        s"no RocksDB snapshot/changelog artifacts, got: ${arts.take(5)}")
    }
  }

  test("rocksdb: sessionStream matches batch") {
    underRocks { checkSessionStream() }
  }

  test("rocksdb: clickViewJoin matches the batch interval join") {
    underRocks { checkClickViewJoin() }
  }

  test("rocksdb: dedupStream keeps exactly one row per event_id") {
    underRocks { checkDedupStream() }
  }

  test("rocksdb: incrementalDedupStream verdicts equal d8's batch form") {
    underRocks { checkIncrementalDedup() }
  }

  test("rocksdb: resampleFfillStream filled grid equals batch on the " +
    "finalized prefix") {
    underRocks { checkResampleFfill() }
  }

  test("rocksdb: windowedCorr matrices equal the batch chain") {
    underRocks { checkWindowedCorr() }
  }

  test("rocksdb: filled corr chain equals the batch FILLED chain") {
    underRocks { checkFilledCorrChain() }
  }

  test("rocksdb: kill-and-redrain mid-span — open corr-UDAF state " +
    "merges across the checkpoint") {
    underRocks {
      val ck = checkCorrRestartMidSpan()
      val arts = StreamsSpec.stateArtifacts(ck)
      assert(arts.exists(_.endsWith(".zip")),
        s"restart ran without RocksDB snapshots: ${arts.take(5)}")
    }
  }

  test("rocksdb: dedupStreamBounded — within-watermark drops and the " +
    "post-eviction re-emit hold, exercising state REMOVAL on the " +
    "provider") {
    underRocks { checkDedupBounded() }
  }

  test("rocksdb: dedupStream restart — the corpus-sized first-seen " +
    "user state restores from RocksDB snapshots") {
    underRocks {
      val ck = checkDedupRestart()
      val arts = StreamsSpec.stateArtifacts(ck)
      assert(arts.exists(_.endsWith(".zip")) &&
        !arts.exists(_.endsWith(".delta")),
        s"dedup restart did not run on RocksDB: ${arts.take(5)}")
    }
  }

  test("rocksdb + changelog checkpointing: the same mid-span restart " +
    "holds, and the checkpoint carries version.changelog files") {
    // changelog mode is the 100 TB posture: each commit uploads only the
    // delta (version.changelog), snapshots (version.zip) upload async in
    // the background — commit latency stops scaling with total state
    // size. The restart contract must be byte-identical to snapshot
    // mode, and the artifact shape proves the mode engaged.
    val key =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try underRocks {
      val ck = checkCorrRestartMidSpan()
      val arts = StreamsSpec.stateArtifacts(ck)
      assert(arts.exists(_.endsWith(".changelog")),
        s"changelog checkpointing produced no .changelog files: " +
          s"${arts.take(5)}")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
