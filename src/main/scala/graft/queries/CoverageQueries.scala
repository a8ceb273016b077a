package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Catalog, SparkEntry}
import graft.ops.Exact.davg

/** Remaining SURVEY §2 inventory rows that deserve their own graded
  * query: the partition-pruned scan layout (S3), deterministic first/last
  * picks (A4), and date arithmetic (F7).
  */
object CoverageQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.load(s, dir, name)

  // S3: per-day partition layout + pruned scan. The reference dispatches
  // on per-day TABLE NAMES (taqmsec.complete_nbbo_YYYYMMDD,
  // correlation_matrix_exporter.py:89); the engine's equivalent is a
  // date-partitioned lake layout where the day predicate prunes at the
  // directory level before any IO. The query materializes that layout
  // (one write per call into a fresh temp dir), then reads one day back
  // through a partition filter; PartitionPruningSpec asserts the pruned
  // scan reads exactly one of the seven directories.
  private val qS3 = Q("s3_partition_pruned_scan",
    (s, d) => {
      // the partitioned layout is fixture state (the graded op is the
      // pruned READ) — written once per JVM at a fixed path, no temp
      // leak across repeated Verify/Bench executions
      val out = graft.sources.Materialize.value(d, "s3_layout") {
        val p = graft.sources.Materialize.path(d, "s3_layout")
        T(s, d, "events")
          .where(col("ts") >= SparkEntry.tsLit(SparkEntry.jan1) &&
                 col("ts") < SparkEntry.tsLit(SparkEntry.jan8))
          .withColumn("date", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("date").parquet(p)
        p
      }
      // declared schema (partition column included): the partition value
      // reads back as the declared STRING (no dir-value type inference),
      // and an all-pruned or empty layout reads as an empty relation
      // instead of failing schema inference — the reference's
      // swallow-and-continue per-window contract (SURVEY §2.11)
      val layoutSchema = org.apache.spark.sql.types.StructType(
        Catalog.schemas("events").fields.toSeq :+
          org.apache.spark.sql.types.StructField("date",
            org.apache.spark.sql.types.StringType))
      s.read.schema(layoutSchema).parquet(out)
        .where(col("date") === "2024-01-03")
        .groupBy("date", "event_type")
        .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
        .orderBy("date", "event_type")
    },
    Some("""SELECT strftime(ts, '%Y-%m-%d') AS date, event_type,
        count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              / count(value), 6) AS avg_value
      FROM events
      WHERE strftime(ts, '%Y-%m-%d') = '2024-01-03'
      GROUP BY 1, 2 ORDER BY date, event_type"""))

  // A4: deterministic first/last element pick per group (the reference's
  // .iloc[0] / sorted head(1), pyg_graphs.py:171-192) via min_by/max_by
  // on a unique scalar order key — one hash aggregate, no window sort.
  // The key is (ts, event_id) packed into a DECIMAL(38,0): a long-typed
  // key would collide once event_id outgrows the multiplier, making the
  // tie-break engine-dependent; decimal128 keeps it collision-free for
  // any event_id < 10^10 with exact cross-engine comparison.
  private val qA4 = Q("a4_first_last",
    (s, d) => T(s, d, "events")
      .withColumn("ordkey",
        unix_timestamp(col("ts")).cast(DecimalType(38, 0)) *
          lit(10000000000L) + col("event_id"))
      .groupBy("user_id")
      .agg(min_by(col("value"), col("ordkey")).as("first_value"),
        max_by(col("value"), col("ordkey")).as("last_value"),
        count(lit(1)).as("n"))
      .orderBy("user_id"),
    Some(s"""SELECT user_id,
        arg_min(value, CAST(${SparkEntry.EP} AS HUGEINT) * 10000000000
          + event_id) AS first_value,
        arg_max(value, CAST(${SparkEntry.EP} AS HUGEINT) * 10000000000
          + event_id) AS last_value,
        count(*) AS n
      FROM events GROUP BY user_id ORDER BY user_id"""))

  // W15: OHLC bars — pandas `.resample('1h').ohlc()`, the other half of
  // the reference's tick-resampling surface (taq_chunks.py resamples to
  // means; every consumer of that pipeline also bars prices). ONE hash
  // aggregate per (user, bucket): open/close via min_by/max_by on a4's
  // collision-free DECIMAL(38,0) (ts, event_id) order key, high/low as
  // plain min/max — no window sort, no self-join; the 100 TB plan is
  // the same single exchange on the group key.
  private val qW15 = Q("w15_ohlc_bars",
    (s, d) => T(s, d, "events")
      .where(col("ts") >= SparkEntry.tsLit(SparkEntry.jan2) &&
             col("ts") < SparkEntry.tsLit(SparkEntry.jan3))
      .withColumn("bucket",
        expr("unix_timestamp(ts) div 3600 * 3600"))
      .withColumn("ordkey",
        unix_timestamp(col("ts")).cast(DecimalType(38, 0)) *
          lit(10000000000L) + col("event_id"))
      .groupBy("user_id", "bucket")
      .agg(min_by(col("value"), col("ordkey")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ordkey")).as("close"),
        count(lit(1)).as("n_ticks"))
      .orderBy("user_id", "bucket"),
    Some(s"""SELECT user_id, ${SparkEntry.EP}//3600*3600 AS bucket,
        arg_min(value, CAST(${SparkEntry.EP} AS HUGEINT) * 10000000000
          + event_id) AS open,
        max(value) AS high, min(value) AS low,
        arg_max(value, CAST(${SparkEntry.EP} AS HUGEINT) * 10000000000
          + event_id) AS close,
        count(*) AS n_ticks
      FROM events
      WHERE ts >= ${SparkEntry.tsSql(SparkEntry.jan2)}
        AND ts < ${SparkEntry.tsSql(SparkEntry.jan3)}
      GROUP BY 1, 2 ORDER BY user_id, bucket"""))

  // F7: date arithmetic — day offsets and clamped month arithmetic
  // (pyg_graphs.py:159-160 `day - timedelta(days=1)`, year-1 swap).
  private val qF7 = Q("f7_date_arith",
    (s, d) => T(s, d, "orders")
      .select(col("o_orderkey"),
        date_format(date_sub(col("o_orderdate").cast("date"), 30),
          "yyyy-MM-dd").as("minus_30d"),
        date_format(add_months(col("o_orderdate").cast("date"), -12),
          "yyyy-MM-dd").as("prev_year"),
        date_format(last_day(col("o_orderdate").cast("date")),
          "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS DATE) - INTERVAL 30 DAY, '%Y-%m-%d')
          AS minus_30d,
        strftime(CAST(o_orderdate AS DATE) - INTERVAL 12 MONTH, '%Y-%m-%d')
          AS prev_year,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
          AS month_end
      FROM orders ORDER BY o_orderkey"""))

  // A8 (scale hardening): group-by mean over a HOT key — event_type has
  // only 5 values across ~10⁶ rows at sf0.1, the shape where a plain
  // groupBy pins 5 reducers while the rest idle — executed through the
  // two-phase salted aggregation [[graft.ops.Skew.saltedAgg]]: spread
  // each key over 32 salts, partially aggregate (count + exact decimal
  // sum), then combine the partials per key. The oracle is the plain
  // GROUP BY — a green row proves the salted decomposition is exactly
  // the unsalted aggregate.
  private val qA8 = Q("a8_salted_skew",
    (s, d) => graft.ops.Skew.saltedAgg(
        T(s, d, "events").select("event_type", "value"),
        Seq("event_type"), 32,
        Seq(count(lit(1)).as("c"), count(col("value")).as("cv"),
          sum(col("value").cast(DecimalType(18, 6))).as("sv")),
        Seq(sum(col("c")).as("n"),
          round(try_divide(sum(col("sv")).cast("double"), sum(col("cv"))), 6)
            .as("avg_value")))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              / count(value), 6) AS avg_value
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // A9: exact interpolated percentiles per group. Spark's `percentile`
  // and DuckDB's `quantile_cont` share the same linear-interpolation
  // definition, so 6-dp rounding is engine-stable. percentile_approx is
  // deliberately NOT used here: approximate sketches differ across
  // engines by construction; where an approximate answer is acceptable
  // the exact one is still the correctness anchor. At scale the exact
  // percentile sorts within each group's partition — fine for bounded
  // per-group cardinality; cross-group parallelism is the win.
  private val qA9 = Q("a9_percentiles",
    (s, d) => T(s, d, "events")
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS p50,
        round(quantile_cont(value, 0.95), 6) AS p95,
        round(quantile_cont(value, 0.99), 6) AS p99
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // A10: grouping sets — per-(lang, source) counts with ROLLUP subtotals
  // and a grand total, one pass. lang/source are non-null in the fixture
  // so the 'ALL' coalesce is unambiguous; with nullable group keys the
  // grouping() marker would disambiguate instead.
  private val qA10 = Q("a10_rollup",
    (s, d) => T(s, d, "documents")
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_chars"))
      .orderBy("lang", "source"),
    Some("""SELECT coalesce(lang, 'ALL') AS lang,
        coalesce(source, 'ALL') AS source,
        count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY ROLLUP(lang, source)
      ORDER BY lang, source"""))

  // A11: approximate distinct counts, graded through a pinned-tolerance
  // pattern. HLL++ is deterministic for a given dataset (merge is
  // order-independent), so `within_2pct` is a stable fact, not a flaky
  // assertion: the oracle computes the exact distinct count and PINS the
  // tolerance flag at 1 — if Spark's sketch ever drifts past 2% on this
  // data, the hash comparison fails. The exact count is graded exactly
  // alongside. This is how an approximate operator earns a place in a
  // hash-compared suite; emitting the raw sketch value never could.
  private val qA11 = Q("a11_approx_distinct",
    // pre-distinct (event_type, user_id) instead of countDistinct-
    // alongside-approx in one agg: mixing a distinct and a non-distinct
    // aggregate makes the planner Expand every input row (2× rows into
    // the shuffle); the explicit distinct gets a map-side partial
    // combine down to ~|keys×users| rows, and HLL over the distinct
    // pairs is REGISTER-IDENTICAL to HLL over the raw stream (duplicate
    // values touch the same register), so n_approx is unchanged.
    // Measured at sf0.1 (32 threads): 2.6 s → 1.4 s median.
    // DataSketches HLL (lgK=14, ~0.8% standard error — the same
    // accuracy class as the previous approx_count_distinct rsd=0.01)
    // instead of HLL++: the HLL++ aggregate's fixed per-sketch cost at
    // p=14 measured ~0.5 s at sf0.1 INDEPENDENT of row count, where
    // the DataSketches aggregate is ~0.2 s for the whole query
    // (Scratch A/B, OPTIMIZATION_r21.md). Same determinism argument:
    // register-max merges are order-independent, so within_2pct stays
    // a stable fact (estimates are exactly 1500/150/15 on the
    // fixtures, far inside the pinned 2%).
    (s, d) => T(s, d, "events")
      .select("event_type", "user_id").distinct()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
          .as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) * 50 <= col("n_exact"))
          .cast("int").as("within_2pct"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
        count(DISTINCT user_id) AS n_exact,
        1 AS within_2pct
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // A12: approximate percentiles, graded through a11's pinned-tolerance
  // pattern. percentile_approx (GK quantile summaries, accuracy 10⁴ →
  // rank error ≤ 10⁻⁴) is the operator you actually run at 100 TB where
  // a9's exact per-group sort is too expensive; the exact percentile is
  // graded exactly alongside (hash-compared to DuckDB's quantile_cont
  // at 6 dp), and the oracle PINS the sketch-quality flags at 1. The
  // flags live in GK's OWN guarantee domain — rank error: the exact
  // rank of each sketch edge (count of values ≤ it, via one broadcast
  // join back over the stream) must sit within N/1000 + 1 of its
  // q·N target. A value-domain "within 2% of exact" flag (rounds 10-14)
  // was N-SENSITIVE: GK returns a data element while the exact
  // percentile interpolates, and at N≈200/group (sf0.001) adjacent
  // order statistics can sit more than 2% apart — the flag failed on a
  // correct sketch. Rank error is what GK promises; it is scale-free.
  private val qA12 = Q("a12_approx_percentile",
    (s, d) => {
      val ev = T(s, d, "events")
      val cuts = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
          round(expr("percentile(value, 0.95)"), 6).as("p95_exact"),
          expr("percentile_approx(value, 0.5, 10000)").as("a50"),
          expr("percentile_approx(value, 0.95, 10000)").as("a95"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .groupBy("event_type")
        .agg(first("p50_exact").as("p50_exact"),
          first("p95_exact").as("p95_exact"),
          count(lit(1)).as("n"),
          sum((col("value") < col("a50")).cast("long")).as("r50lt"),
          sum((col("value") <= col("a50")).cast("long")).as("r50le"),
          sum((col("value") < col("a95")).cast("long")).as("r95lt"),
          sum((col("value") <= col("a95")).cast("long")).as("r95le"))
        .select(col("event_type"), col("p50_exact"), col("p95_exact"),
          // GK promises SOME order statistic whose rank is within
          // N/1000 + 1 of q·N equals the returned value. Under ties
          // count(≤) is the tie run's MAX rank and count(<) its MIN —
          // bound from BOTH sides (min-rank ≤ target + tol ∧ max-rank ≥
          // target − tol) so a tie run straddling the target cannot
          // fail a correct sketch. All-integer arithmetic (scale by
          // 1000 — no truncating division shrinking the tolerance).
          (col("r50lt") * 1000 <= col("n") * 500 + col("n") + 1000 &&
            col("r50le") * 1000 >= col("n") * 500 - col("n") - 1000)
            .cast("int").as("p50_rank_ok"),
          (col("r95lt") * 1000 <= col("n") * 950 + col("n") + 1000 &&
            col("r95le") * 1000 >= col("n") * 950 - col("n") - 1000)
            .cast("int").as("p95_rank_ok"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
        round(quantile_cont(value, 0.5), 6) AS p50_exact,
        round(quantile_cont(value, 0.95), 6) AS p95_exact,
        1 AS p50_rank_ok, 1 AS p95_rank_ok
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Count-min sketch geometry: CmsD independent hash rows × CmsW
    * buckets — the frequency member of the sketch family next to a11's
    * HLL (cardinality) and a12's GK (quantiles).
    */
  private val CmsD = 4
  private val CmsW = 512L

  // A13: count-min frequency estimates — word counts over the corpus
  // compressed into a CmsD×CmsW counter matrix. The relational form IS
  // the sketch: groupBy (row, bucket) has ≤ D·W groups, so map-side
  // partial aggregation reduces every partition to a bounded sketch and
  // the shuffle moves D·W rows per partition regardless of corpus size —
  // the mergeable-sketch property, expressed as partial aggregation.
  // Unlike a11/a12's pinned-tolerance grading, the CMS is DETERMINISTIC
  // (md5-derived bucket hashes, counter sums, min over rows), so the
  // oracle replays the sketch bit-for-bit: estimates, collisions, and
  // each probe's one-sided overcount are all hash-graded. Probes are the
  // exact top-20 words (heavy hitters), whose estimate the CMS bounds
  // from above.
  private val qA13 = Q("a13_cms_counts",
    (s, d) => {
      import graft.ops.Text
      // ONE corpus pass: aggregate exact per-word counts first, then
      // build the sketch from the word-count dimension — summing counts
      // into (j, bucket) cells yields the IDENTICAL sketch to hashing
      // every occurrence, but the 4 md5 hashes are paid per DISTINCT
      // word instead of per occurrence (~60x fewer at fixture shape,
      // and the same factor at corpus scale), and the cached relation
      // shared by the sketch build and the top-20 probe is the bounded
      // word-count table, not the exploded corpus
      val wc = graft.ops.Time.registerCached(
        T(s, d, "documents")
          .select(explode(Text.words(col("text"))).as("word"))
          .groupBy("word").agg(count(lit(1)).as("n_exact"))
          .cache())
      val jcol = explode(sequence(lit(0), lit(CmsD - 1))).as("j")
      val bucket = Text.hash60(concat_ws(":", col("j"), col("word"))) % CmsW
      val cms = wc.select(col("word"), col("n_exact"), jcol)
        .groupBy(col("j"), bucket.as("bucket"))
        .agg(sum("n_exact").as("cnt"))
      val probes = wc
        .orderBy(col("n_exact").desc, col("word")).limit(20)
      probes.select(col("word"), col("n_exact"), jcol)
        .withColumn("bucket", bucket)
        .join(broadcast(cms), Seq("j", "bucket"))
        .groupBy("word", "n_exact")
        .agg(min("cnt").as("n_cms"))
        .select(col("word"), col("n_exact"), col("n_cms"),
          (col("n_cms") - col("n_exact")).as("overcount"))
        .transform(Q.sortedSmall(_, "word"))
    },
    Some(s"""WITH w AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      js AS (SELECT unnest(range(0, $CmsD)) AS j),
      cms AS (
        SELECT j, CAST(concat('0x', substr(md5(concat(j, ':', word)),
            1, 15)) AS BIGINT) % $CmsW AS bucket, count(*) AS cnt
        FROM w, js GROUP BY 1, 2),
      wc AS (SELECT word, count(*) AS n_exact FROM w GROUP BY 1),
      probes AS (
        SELECT word, n_exact FROM wc
        ORDER BY n_exact DESC, word LIMIT 20),
      pj AS (
        SELECT word, n_exact, j,
          CAST(concat('0x', substr(md5(concat(j, ':', word)),
            1, 15)) AS BIGINT) % $CmsW AS bucket
        FROM probes, js)
      SELECT word, n_exact, min(cnt) AS n_cms,
        min(cnt) - n_exact AS overcount
      FROM pj JOIN cms USING (j, bucket)
      GROUP BY word, n_exact ORDER BY word"""))

  // A14: equi-depth histogram / quantile binning (the feature-
  // bucketization pass of an ML pipeline): exact deciles per group via
  // ntile over a deterministic total order (value, event_id), rolled up
  // to per-bucket count and bounds. Same honest funnel as c8's exact
  // rank cut: few groups ⇒ one reducer per group in the exact form; the
  // 100 TB path replaces the exact ntile with a12's sketch quantiles as
  // bucket edges plus a map-only width assignment.
  private val qA14 = Q("a14_ntile_histogram",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("value", "event_id")
      T(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("decile", ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("n"), min("value").as("lo"),
          max("value").as("hi"))
        .orderBy("event_type", "decile")
    },
    Some("""SELECT event_type, decile, count(*) AS n,
        min(value) AS lo, max(value) AS hi
      FROM (SELECT event_type, value,
          ntile(10) OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS decile
        FROM events)
      GROUP BY 1, 2 ORDER BY event_type, decile"""))

  // A14b (round 15): the 100 TB path a14's scaladoc documents, made
  // real — equi-depth binning with SKETCH edges instead of the exact
  // ntile's one-reducer-per-group sort. Edges are percentile_approx's
  // GK summaries (accuracy 10⁴ → rank error ≤ 10⁻⁴) at the nine
  // interior deciles — a constant-size mergeable aggregate with
  // map-side partials — and assignment is MAP-ONLY against the
  // broadcast per-group edge arrays (a 9-slot filter per row: no sort,
  // no window, no per-group reducer — the shape that survives a group
  // holding 10 TB, where a14's exact ntile funnels the group through
  // one task — and unlike a12, NO exact percentile runs anywhere: this
  // is the pure scale path). Graded the way a12 grades GK — exact,
  // DuckDB-computable quantities plus pinned sketch-quality flags —
  // but the tolerance is pinned in the sketch's OWN guarantee domain,
  // rank error, which the bin counts expose exactly: GK at accuracy 10⁴
  // promises |rank(edge_k) − k·N/10| ≤ 10⁻⁴·N (a value-domain bound
  // like a12's 2% is ill-posed here at small N, where adjacent order
  // statistics sit further than 2% apart). Under TIES an edge's "rank"
  // is a run [count(< e), count(≤ e)], so both rank and depth flags are
  // bounded TWO-SIDEDLY (min-rank against the upper tolerance, max-rank
  // against the lower; per-bin depth via the rank runs of its two
  // edges) — a tie run straddling a target cannot fail a correct
  // sketch. The oracle replays the per-group totals and bin count
  // (n_bins = 10 assumes a continuous value domain — on tie-heavy data
  // a correct sketch may legitimately return duplicate edges and empty
  // bins; the fixtures' values are continuous doubles) and pins two
  // flags at 1: every edge's rank within N/1000 + 1 of its target, and
  // every bin's depth within N/500 + 2 of N/10 (two rank errors plus
  // integer divisibility). A sketch drifting past either bound, or a
  // row lost/duplicated by the broadcast join, fails the hash compare.
  private val qA14b = Q("a14b_sketch_histogram",
    (s, d) => {
      val ev = T(s, d, "events")
      val qs = (1 to 9).map(q => s"0.$q").mkString(", ")
      val edges = ev.groupBy("event_type")
        .agg(expr(s"percentile_approx(value, array($qs), 10000)")
          .as("edges"))
      // Both rank forms fold into ONE codegen'd aggregate pass (r17:
      // the r16 tie-safety hardening had doubled the per-row filter()
      // lambdas and pre-grouped on (bin, bin_lt), costing ~2× — but
      // the bins were never needed as rows at all): with edges sorted
      // ascending (duplicates included), bin ≤ k ⟺ at most k−1 edges
      // < value ⟺ value ≤ edge_k, and bin_lt ≤ k ⟺ value < edge_k —
      // so every max-rank run endpoint rle_k = count(value ≤ edge_k)
      // and min-rank endpoint rlt_k = count(value < edge_k) is a
      // direct sum(when(...)) against an element_at slot: 18 scalar
      // comparisons per row inside whole-stage codegen, zero HOF
      // lambdas (each filter() lambda paid µs-scale interpreted cost
      // per slot), zero intermediate grouping. Map-side partials as
      // before; the broadcast edge join is unchanged.
      // NON-NULL precondition (alongside the continuous-domain note):
      // this equivalence to the old explicit-bin form assumes `value`
      // has no nulls. The old form binned a null value into bin 1
      // (counted by every rle_k); here a null fails every
      // when(value <= edge_k) yet still counts in n_total, so n_bins
      // and depth_within_tol would diverge on null-bearing data. The
      // fixture's events.value is non-null; revisit both forms
      // together if that ever changes.
      val rankAggs = (1 to 9).flatMap(k => Seq(
        sum(when(col("value") <= element_at(col("edges"), k), 1L)
          .otherwise(0L)).as(s"rle$k"),
        sum(when(col("value") < element_at(col("edges"), k), 1L)
          .otherwise(0L)).as(s"rlt$k")))
      val out = ev.join(broadcast(edges), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"), rankAggs: _*)
      // rank runs with the k=0 and k=10 boundary pins
      def rle(k: Int) =
        if (k == 0) lit(0L)
        else if (k == 10) col("n_total") else col(s"rle$k")
      def rlt(k: Int) =
        if (k == 0) lit(0L)
        else if (k == 10) col("n_total") else col(s"rlt$k")
      out.select(col("event_type"), col("n_total"),
          // n_bins = occupied bins in the max-rank form, recovered from
          // the rank runs (bin k holds rle(k) − rle(k−1) rows) — the
          // countDistinct the pre-grouped shape needed is free here
          (1 to 10).map(k => when(rle(k) - rle(k - 1) > 0, 1)
              .otherwise(0)).reduce(_ + _).cast("int").as("n_bins"),
          // |rank(edge_k) − k·N/10| ≤ N/1000 + 1 for all k, two-sided
          // over the tie run, integer arithmetic scaled by 1000
          (1 to 9).map(k =>
              rlt(k) * 1000 <= col("n_total") * (k * 100) +
                col("n_total") + 1000 &&
              rle(k) * 1000 >= col("n_total") * (k * 100) -
                col("n_total") - 1000)
            .reduce(_ && _).cast("int").as("edge_ranks_within_tol"),
          // |n_k − N/10| ≤ N/500 + 2 for every bin k = 1..10, depth
          // taken over the rank runs of the bin's two edges (upper:
          // max-rank(k) − min-rank(k−1); lower: min-rank(k) −
          // max-rank(k−1)) — equal to the plain bin count when no row
          // ties an edge: ·500 ≤ 51·N + 1000 ∧ ·500 ≥ 49·N − 1000
          (1 to 10).map(k =>
              (rle(k) - rlt(k - 1)) * 500 <= col("n_total") * 51 + 1000 &&
              (rlt(k) - rle(k - 1)) * 500 >= col("n_total") * 49 - 1000)
            .reduce(_ && _).cast("int").as("depth_within_tol"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n_total, 10 AS n_bins,
        1 AS edge_ranks_within_tol, 1 AS depth_within_tol
      FROM events GROUP BY 1 ORDER BY event_type"""))

  // A15: quantile winsorization — the outlier clamp every quant/feature
  // pipeline runs before aggregating heavy-tailed values: clamp each
  // group's values to its [p01, p99] and report the before/after means.
  // The thresholds are the exact interpolated percentiles ROUNDED TO
  // 6 DP in both engines (a9 proves 6-dp equality of the interpolation),
  // so every clamp decision compares a 6-dp value to a 6-dp threshold —
  // no fp-boundary flake surface — and the winsorized mean is the exact
  // decimal average of 6-dp inputs. Plan: one percentile aggregate per
  // group (group-count-sized), broadcast back onto the stream, one
  // map-side clamp + one rollup — two shuffles at any scale.
  private val qA15 = Q("a15_winsorize",
    (s, d) => {
      val ev = T(s, d, "events")
      val cuts = ev.groupBy("event_type")
        .agg(round(expr("percentile(value, 0.01)"), 6).as("lo"),
          round(expr("percentile(value, 0.99)"), 6).as("hi"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .select(col("event_type"), col("value"), col("lo"), col("hi"),
          greatest(col("lo"), least(col("hi"), col("value"))).as("w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum((col("value") < col("lo")).cast("long")).as("n_clamped_lo"),
          sum((col("value") > col("hi")).cast("long")).as("n_clamped_hi"),
          davg(col("value")).as("mean_raw"),
          davg(col("w")).as("mean_winsorized"))
        .orderBy("event_type")
    },
    Some("""WITH cuts AS (
        SELECT event_type,
          round(quantile_cont(value, 0.01), 6) AS lo,
          round(quantile_cont(value, 0.99), 6) AS hi
        FROM events GROUP BY 1),
      cl AS (
        SELECT e.event_type, e.value, c.lo, c.hi,
          greatest(c.lo, least(c.hi, e.value)) AS w
        FROM events e JOIN cuts c USING (event_type))
      SELECT event_type, count(*) AS n,
        CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clamped_lo,
        CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clamped_hi,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
              / count(value), 6) AS mean_raw,
        round(CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
              / count(w), 6) AS mean_winsorized
      FROM cl GROUP BY event_type ORDER BY event_type"""))

  // W10: time-BASED rolling frames (RANGE BETWEEN) — w7's row-count
  // frames answer "the last 20 events"; this answers "the last hour",
  // the form quant features actually want. RANGE frames on the epoch-
  // second order key include every row whose key falls in [u-3600, u] —
  // including ties at the boundary, identically in both engines, so no
  // tie-break column is needed. Same scale shape as w7: one shuffle by
  // entity key, every frame computed in the sort pass.
  private val qW10 = Q("w10_range_frames",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("u").rangeBetween(-3600L, 0L)
      T(s, d, "events")
        .where(col("event_type") === "purchase" &&
          col("ts") >= SparkEntry.tsLit(SparkEntry.jan1) &&
          col("ts") < SparkEntry.tsLit(SparkEntry.jan8))
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("u"), col("value"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(try_divide(
            sum(col("value").cast(DecimalType(18, 6))).over(w)
              .cast("double"),
            count(col("value")).over(w)), 6).as("mean_1h"))
        .orderBy("event_id")
    },
    Some(s"""SELECT user_id, event_id,
        count(*) OVER w AS n_1h,
        round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
              / count(value) OVER w, 6) AS mean_1h
      FROM (
        SELECT user_id, event_id, ${SparkEntry.EP} AS u, value
        FROM events
        WHERE event_type = 'purchase'
          AND ts >= ${SparkEntry.tsSql(SparkEntry.jan1)}
          AND ts < ${SparkEntry.tsSql(SparkEntry.jan8)})
      WINDOW w AS (PARTITION BY user_id ORDER BY u
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  // W11: gap-based sessionization in BATCH — the batch twin of the
  // streaming `session_window` (Streams.sessionStream): a new session
  // starts where the gap since the user's previous event exceeds 30
  // minutes; the session id is the running count of session starts
  // (lag + cumulative sum over ONE shuffle by user). This is the
  // standard sessionization idiom — no UDF, no per-user loop; both
  // windows share the (user_id, u, event_id) sort so Spark reuses the
  // exchange.
  private val qW11 = Q("w11_gap_sessions",
    (s, d) => {
      val wo = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("u", "event_id")
      T(s, d, "events")
        .where(col("ts") >= SparkEntry.tsLit(SparkEntry.jan1) &&
          col("ts") < SparkEntry.tsLit(SparkEntry.jan8))
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("u"))
        .withColumn("new_sess",
          (coalesce(col("u") - lag(col("u"), 1).over(wo), lit(Long.MaxValue))
            > 1800L).cast("long"))
        .withColumn("sid", sum("new_sess").over(wo))
        .groupBy("user_id", "sid")
        .agg(min("u").as("sess_start"), max("u").as("sess_end"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id", "sid")
    },
    Some(s"""WITH e AS (
        SELECT user_id, event_id, ${SparkEntry.EP} AS u
        FROM events
        WHERE ts >= ${SparkEntry.tsSql(SparkEntry.jan1)}
          AND ts < ${SparkEntry.tsSql(SparkEntry.jan8)}),
      g AS (
        SELECT user_id, event_id, u,
          CASE WHEN u - lag(u) OVER w IS NULL
                 OR u - lag(u) OVER w > 1800 THEN 1 ELSE 0 END AS ns
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id)),
      sess AS (
        SELECT user_id, u,
          sum(ns) OVER (PARTITION BY user_id ORDER BY u, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM g)
      SELECT user_id, CAST(sid AS BIGINT) AS sid,
        min(u) AS sess_start, max(u) AS sess_end, count(*) AS n_events
      FROM sess GROUP BY 1, 2 ORDER BY user_id, sid"""))

  // A16: cohort retention — the product-analytics rollup: each user's
  // cohort is their first active day, and the (cohort, day-offset) cell
  // counts users still active that many days later. Two aggregates
  // (per-user first day, then the cohort×offset rollup over the
  // distinct user-day relation); output is calendar-bounded
  // (days × days cells) at any user count.
  private val qA16 = Q("a16_cohort_retention",
    (s, d) => {
      val ud = T(s, d, "events")
        .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
        .distinct()
      val cohort = ud.groupBy("user_id").agg(min("day").as("cohort_day"))
      ud.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day"))
          .as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },
    Some(s"""WITH ud AS (
        SELECT DISTINCT user_id, ${SparkEntry.EP}//86400 AS day
        FROM events),
      c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
      SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
        count(*) AS n_users
      FROM ud JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""))

  // A17: ordered funnel — per user-day, the strict view → click →
  // purchase sequence (each stage's timestamp must FOLLOW the previous
  // stage's first occurrence; a click before the first view does not
  // count). Three stage aggregates chained by (user, day) equi-joins —
  // every relation is user-day-sized, the sequencing constraint is a
  // residual predicate on the join, and no per-user event scan or UDF
  // exists at any scale. The final rollup counts survivors per day.
  private val qA17 = Q("a17_funnel",
    (s, d) => {
      val ev = T(s, d, "events")
        .where(col("ts") >= SparkEntry.tsLit(SparkEntry.jan1) &&
          col("ts") < SparkEntry.tsLit(SparkEntry.jan31))
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("u"),
          expr("unix_timestamp(ts) div 86400").as("day"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id", "day").agg(min("u").as("t1"))
      val c = ev.where(col("event_type") === "click")
        .join(v, Seq("user_id", "day")).where(col("u") > col("t1"))
        .groupBy("user_id", "day").agg(min("u").as("t2"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, Seq("user_id", "day")).where(col("u") > col("t2"))
        .groupBy("user_id", "day").agg(min("u").as("t3"))
      v.join(c, Seq("user_id", "day"), "left")
        .join(p, Seq("user_id", "day"), "left")
        .groupBy("day")
        .agg(count("t1").as("n_view"),
          count("t2").as("n_view_click"),
          count("t3").as("n_full_funnel"))
        .orderBy("day")
    },
    Some(s"""WITH e AS (
        SELECT user_id, event_type, ${SparkEntry.EP} AS u,
          ${SparkEntry.EP}//86400 AS day
        FROM events
        WHERE ts >= ${SparkEntry.tsSql(SparkEntry.jan1)}
          AND ts < ${SparkEntry.tsSql(SparkEntry.jan31)}),
      v AS (SELECT user_id, day, min(u) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY 1, 2),
      c AS (SELECT e.user_id, e.day, min(e.u) AS t2
        FROM e JOIN v USING (user_id, day)
        WHERE e.event_type = 'click' AND e.u > v.t1 GROUP BY 1, 2),
      p AS (SELECT e.user_id, e.day, min(e.u) AS t3
        FROM e JOIN c USING (user_id, day)
        WHERE e.event_type = 'purchase' AND e.u > c.t2 GROUP BY 1, 2)
      SELECT v.day, count(v.t1) AS n_view, count(c.t2) AS n_view_click,
        count(p.t3) AS n_full_funnel
      FROM v LEFT JOIN c USING (user_id, day)
             LEFT JOIN p USING (user_id, day)
      GROUP BY 1 ORDER BY day"""))

  val all: Seq[Q] = Seq(qS3, qA4, qF7, qA8, qA9, qA10, qA11, qA12, qA13,
    qA14, qA14b, qA15, qA16, qA17, qW10, qW11, qW15)
}
