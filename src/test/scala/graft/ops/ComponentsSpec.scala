package graft.ops

import graft.SparkTestBase

class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    // union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  // labelBudget = 1 forces the distributed pointer-jump loop, which the
  // small-graph union-find tier otherwise takes over at spec scale
  private def runLoop(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
        labelBudget = 1L)
      .as[(Long, Long)].collect().toMap

  test("golden: two triangles plus a bridge and an isolated pair") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), // triangle 1-2-3
      (10, 11), (11, 12), (12, 10),                       // triangle 10-12
      (3, 10),                                            // bridge merges them
      (20, 21))                                           // separate pair
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      12L -> 1L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges (diameter rounds)") {
    val edges = (1L until 40L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.values.toSet == Set(1L))
    assert(got.size == 40)
  }

  test("loop tier (forced) and small-graph union-find tier agree") {
    val rnd = new scala.util.Random(13)
    val edges = ((1L until 40L).map(i => (i, i + 1)) ++
      Seq.fill(80)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)))
      .filter(e => e._1 != e._2)
    val small = run(edges)
    val loop = runLoop(edges)
    assert(Components.lastRounds > 0) // the forced run took the loop
    assert(small == loop)
    assert(small == reference(edges))
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val edges = Seq.fill(120)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == reference(edges))
    }
  }
}
