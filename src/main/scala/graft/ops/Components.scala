package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the step that turns a
  * near-duplicate PAIR list (d2/d3/d4/d5's output) into canonical
  * dedup CLUSTERS: every document in a component keeps/drops together,
  * keyed by the component's minimum id.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the minimum of
  * its label and its neighbors' labels; stop when a round changes
  * nothing. Rounds needed = the graph diameter — for near-dup clusters
  * (dense cliques by construction: if a≈b and b≈c then a≈c at high
  * thresholds) that is 1-2, and each round is one shuffle-keyed
  * join + min-aggregate, so the whole thing is a handful of bounded
  * stages. For adversarial long-path graphs the round count grows with
  * the path length; the standard fix at that extreme is the
  * large-star/small-star contraction, which this module's loop
  * structure accommodates but the dedup use case never needs.
  *
  * Each round `localCheckpoint`s the label relation: an iterative
  * DataFrame loop otherwise accretes one join per round into a plan
  * whose analysis/codegen cost grows quadratically, and a failed-stage
  * recomputation would replay every round. Truncating lineage per round
  * is the documented pattern for DataFrame iteration (GraphX does the
  * equivalent internally).
  */
object Components {

  /** Distributed rounds the LAST [[connectedComponents]] call took —
    * instrumentation for the stress harness's O(log diameter)
    * convergence gate (tools read it right after the call returns in
    * single-query use; it is not part of the operator contract and two
    * concurrent calls race benignly on it).
    */
  @volatile private[graft] var lastRounds: Int = 0

  /** (id, component) for every node of the undirected edge list;
    * `component` is the minimum node id reachable. Deterministic for
    * any partitioning — min is associative/commutative and the
    * iteration runs to a fixpoint.
    */
  /** `labelBudget` is the per-partition label target of the loop tier
    * (and, via `labelParts == 1`, the small-tier cutoff): the default
    * ~100k labels/partition is the production knob; specs pass 1 to
    * force the distributed loop on small graphs.
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
                          dstCol: String,
                          labelBudget: Long = 100000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // cache the raw edge projection FIRST: phase 0 and the node universe
    // both consume it, and for callers whose edge list is itself an
    // expensive plan (d6 feeds d2's whole near-dup pipeline in) an
    // uncached reuse re-executes that plan per consumer — measured as
    // more than half of d6's runtime
    val e0 = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .cache()
    // Phase 0 — local aggregation before any shuffle: a per-partition
    // union-find (with path compression) contracts every within-
    // partition path to a star and emits one (node, local root) edge per
    // node. The star graph has the same components (a node seen in two
    // partitions links both local roots through itself) but at most
    // #nodes-per-partition edges and near-zero within-partition
    // diameter, so the distributed loop below runs on a much smaller
    // relation for fewer rounds. This is the same map-side-combine
    // instinct as partial aggregation, applied to connectivity.
    val star = e0.as[(Long, Long)].mapPartitions { it =>
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != r) {
          val n = parent(c); parent(c) = r; c = n
        }
        r
      }
      it.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val ks = parent.keysIterator.toArray
      ks.iterator.map(k => (k, find(k)))
    }.toDF("a", "b")
    // no distinct: duplicate edges cannot change a min-aggregate, so
    // deduplicating here would spend a full shuffle to save join width
    val sym = star
      .unionByName(star.select(col("b").as("a"), col("a").as("b")))
      .cache()
    val nNodes = sym.select("a").distinct().count()
    // label-relation partitioning for the loop below: the relation is
    // node-count-sized, and tiny partitions cost more in per-task +
    // checkpoint overhead than they buy, so target ~100k labels per
    // partition — 1 at fixture scale, growing with the node count on a
    // cluster (the knob the old hard-coded coalesce(1) lacked)
    val labelParts = Relational.boundedPartitions(nNodes, labelBudget)
    // Small-graph tier: when the label relation fits the loop's ONE
    // coalesced partition anyway (labelParts == 1 — every round below
    // would already funnel the full label set through a single task),
    // finish the contraction in one union-find task over the star
    // edges instead of O(log diameter) distributed rounds: phase 0
    // already shrank the edge relation to ≤ one (node, local root)
    // edge per node per partition, so this single task sees STRICTLY
    // less data than each loop round's coalesce(1) checkpoint did,
    // and the 2-jobs-per-round latency (checkpoint + convergence
    // count) collapses to one job. Same output bit-for-bit: min-root
    // union-find converges to component = min reachable id, the
    // loop's fixpoint (ComponentsSpec pins tier equality).
    if (labelParts == 1) {
      val solved = star.as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a)
          val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val ks = parent.keysIterator.toArray
        ks.iterator.map(k => (k, find(k)))
      }.toDF("id", "component")
        // materialize BEFORE the unpersists: the star plan reads the
        // cached edge projection, and an uncached consumer would re-run
        // the caller's whole edge plan (d6 feeds d2's pipeline in)
        .localCheckpoint()
      sym.unpersist(false)
      e0.unpersist(false)
      lastRounds = 0
      return solved
    }
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= 64,
        "connectedComponents: convergence should take O(log diameter) " +
          "rounds; 64 means a bug, not a graph")
      // each node's best neighbor label this round
      val prop = sym.join(labels, col("a") === col("id"))
        .groupBy(col("b").as("id")).agg(min("lbl").as("nlbl"))
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nl"))
      // checkpoint BEFORE the pointer jump: the jump self-joins the
      // round's label relation, and without truncation both sides would
      // re-execute the neighbor join + aggregate
      val base = next.coalesce(labelParts).localCheckpoint()
      // pointer jump: follow the fresh label to ITS fresh label — path
      // lengths halve per round, so convergence is O(log diameter)
      // instead of O(diameter). Labels only ever hold node ids and only
      // decrease, so the self-join is total and monotone; measured on
      // the sf0.1 near-dup graph (diameter ≈ 10): 11 rounds → 5.
      val j1 = base.join(
          base.select(col("id").as("pid"), col("nl").as("pl")),
          col("nl") === col("pid"))
        .select(col("id"), col("lbl"), col("pl").as("nl"))
      // second jump (path quartering): j1 is a pair of small joins over
      // the checkpointed base, so re-deriving it inside the join is
      // cheap and saves a full neighbor round
      val jumped = j1.join(
          j1.select(col("id").as("pid2"), col("nl").as("pl2")),
          col("nl") === col("pid2"))
        .select(col("id"), col("lbl"), col("pl2").as("nl"))
      changed = jumped.where(col("nl") < col("lbl")).count()
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] round $rounds changed=$changed " +
          s"t=${System.nanoTime() / 1e9}")
      labels = jumped.select(col("id"), col("nl").as("lbl"))
    }
    sym.unpersist(false)
    e0.unpersist(false)
    lastRounds = rounds
    labels.select(col("id"), col("lbl").as("component"))
  }
}
