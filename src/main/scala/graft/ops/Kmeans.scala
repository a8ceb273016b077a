package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic quantized k-means (Lloyd iterations) over the integer-
  * micros embedding form — the trained coarse quantizer the IVF tier
  * (e4) stubs with its first-C-vectors initializer.
  *
  * Every quantity is integer-exact, so training is reproducible in ANY
  * engine and the DuckDB oracle replays the identical iterations:
  * distances are Σ(xq−cq)² over long micros (bounded: |xq| ≤ ~10⁷ and
  * 64 dims keep the sum < 10¹⁶ ≪ 2⁶³); assignment ties break to the
  * lowest cell id; the centroid update is the per-dimension TRUNCATING
  * integer mean `Σxq / n` — the same semantics as DuckDB's `//` and
  * Scala's Long division — and an empty cell keeps its previous
  * centroid. Floating-point k-means cannot be graded this way (sum
  * order changes cell boundaries); quantized k-means loses nothing at
  * micro resolution and gains bit-exact reproducibility.
  *
  * Scale shape: assignment is map-only (centroids broadcast as
  * expression literals — C·dims longs, dimension metadata); the update
  * is one (cell, pos)-keyed aggregate per iteration whose output is
  * C·dims rows, collected to the driver exactly like a3b's key set.
  * Iterations are a small constant (production k-means at 100 TB runs
  * the same loop, usually on a sample).
  */
object Kmeans {

  /** Exact squared L2 distance between the quantized array column `q`
    * and a centroid literal — the [[graft.functions.SqDistLongs]]
    * kernel (one primitive loop per (row, centroid); the previous
    * `aggregate(zip_with(...))` form paid the CodegenFallback lambda
    * interpreter per element × C centroids per row — see
    * LongArrayMath's scaladoc for the bit-equivalence contract).
    */
  private def distSq(q: Column, cent: Seq[Long]): Column =
    call_function("sqdist_longs", q, typedLit(cent))

  /** Map-only cell assignment: index of the nearest centroid, first
    * (lowest) index on exact ties.
    */
  def assign(embq: DataFrame, cents: Seq[Seq[Long]]): DataFrame = {
    val dists = array(cents.map(c => distSq(col("q"), c)): _*)
    embq.withColumn("cell",
      (array_position(dists, array_min(dists)) - 1).cast("int"))
  }

  /** [[assign]] plus the exact squared distance to the chosen centroid
    * (`qerr`) — the per-subspace quantization error a product quantizer
    * grades and monitors. Same map-only shape and tie-break as assign.
    */
  def assignWithDist(embq: DataFrame, cents: Seq[Seq[Long]]): DataFrame = {
    val dists = array(cents.map(c => distSq(col("q"), c)): _*)
    embq.withColumn("qerr", array_min(dists))
      .withColumn("cell",
        (array_position(dists, array_min(dists)) - 1).cast("int"))
  }

  /** The `n` nearest cells per vector by the same exact distance and
    * tie-break as [[assign]] — the nprobe fan-out of an IVF search.
    * Windowed (one shuffle by vector id); callers probe a bounded query
    * set, so the window input is probe-sized, not corpus-sized.
    */
  def nearestCells(embq: DataFrame, idCol: String, cents: Seq[Seq[Long]],
                   n: Int): DataFrame = {
    val dists = array(cents.map(c => distSq(col("q"), c)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("dist"), col("cell"))
    embq.select(col(idCol), posexplode(dists).as(Seq("cell", "dist")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .select(col(idCol), col("cell").cast("int").as("cell"))
  }

  /** Train all `m` product-quantizer codebooks in ONE distributed pass
    * per Lloyd round: input is the long sub-vector form (idCol, sub, q)
    * with sub in [0, m); each round is one assignment projection (an
    * m-way dispatch over broadcast centroid literals) + one
    * (sub, cell, pos)-keyed aggregate, so the corpus is read once per
    * round no matter how many codebooks train — versus m independent
    * [[train]] loops reading it m times (measured: the 16 sequential
    * Lloyd jobs dominated e8/e9 at fixture scale). Per-subspace
    * semantics are IDENTICAL to [[train]]: same first-C init, exact
    * distances, lowest-cell ties, truncating integer mean, empty cells
    * inheriting (asserted equal in KmeansSpec).
    */
  def trainProduct(subVecs: DataFrame, idCol: String, m: Int, c: Int,
                   iters: Int): IndexedSeq[Seq[Seq[Long]]] = {
    val cached = subVecs.select(col(idCol), col("sub"), col("q")).cache()
    val initRows = cached.where(col(idCol) < c)
      .select(col("sub"), col(idCol), col("q")).collect()
    var cents: IndexedSeq[Seq[Seq[Long]]] = (0 until m).map { s =>
      initRows.filter(_.getInt(0) == s).sortBy(_.getLong(1))
        .map(_.getSeq[Long](2).toSeq).toSeq
    }
    def distsCol(cs: IndexedSeq[Seq[Seq[Long]]]): Column =
      (0 until m).foldLeft(lit(null).cast("array<bigint>")) { (acc, s) =>
        when(col("sub") === s,
          array(cs(s).map(cc => distSq(col("q"), cc)): _*)).otherwise(acc)
      }
    (1 to iters).foreach { _ =>
      val dists = distsCol(cents)
      val stats = cached
        .withColumn("cell",
          (array_position(dists, array_min(dists)) - 1).cast("int"))
        .select(col("sub"), col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("sub", "cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      cents = (0 until m).map { s =>
        val byCell = stats.filter(_.getInt(0) == s).groupBy(_.getInt(1))
        cents(s).indices.map { cid =>
          byCell.get(cid) match {
            case Some(rows) => rows.sortBy(_.getInt(2))
              .map(r => r.getLong(3) / r.getLong(4)).toSeq
            case None => cents(s)(cid)
          }
        }
      }
    }
    cached.unpersist(false)
    cents
  }

  /** `iters` Lloyd rounds from the deterministic first-C-vectors
    * initializer; returns the trained centroids.
    */
  def train(embq: DataFrame, idCol: String, c: Int,
            iters: Int): Seq[Seq[Long]] = {
    val cached = embq.select(col(idCol), col("q")).cache()
    var cents: Seq[Seq[Long]] = cached.where(col(idCol) < c)
      .orderBy(idCol).select("q")
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    (1 to iters).foreach { _ =>
      val stats = assign(cached, cents)
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum("x").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = stats.groupBy(_.getInt(0))
      cents = cents.indices.map { cid =>
        byCell.get(cid) match {
          case Some(rows) => rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2) / r.getLong(3)).toSeq
          case None => cents(cid) // empty cell keeps its centroid
        }
      }
    }
    cached.unpersist(false)
    cents
  }
}
