package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  // three well-separated planted clusters in quantized micros space
  private def planted() = {
    val rnd = new scala.util.Random(11)
    val centers = Seq(Seq(0L, 0L, 0L), Seq(5000000L, 0L, 0L),
      Seq(0L, 5000000L, 5000000L))
    val rows = for (i <- 0 until 90) yield {
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextInt(200001) - 100000))
    }
    (rows.toDF("vec_id", "q"), rows)
  }

  test("train recovers planted clusters and assignment is deterministic") {
    val (df, rows) = planted()
    val cents = Kmeans.train(df, "vec_id", 3, 4)
    val got = Kmeans.assign(df, cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    // every planted cluster maps to exactly one cell, each cell 30 strong
    val byPlant = rows.groupBy(_._1 % 3)
      .map { case (p, rs) => p -> rs.map(r => got(r._1)).distinct }
    assert(byPlant.values.forall(_.size == 1), byPlant)
    assert(byPlant.values.flatten.toSet.size == 3)
    // repartitioning cannot change a single assignment
    val got2 = Kmeans.assign(df.repartition(7), cents)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(got == got2)
  }

  test("trainProduct matches independent per-subspace training") {
    val (df, _) = planted()
    // two "subspaces": the planted vectors and a shifted variant, so the
    // codebooks genuinely differ per subspace
    val subVecs = df.select(col("vec_id"), lit(0).as("sub"), col("q"))
      .union(df.select(col("vec_id"), lit(1).as("sub"),
        transform(col("q"), x => x + 1234567L).as("q")))
    val joint = Kmeans.trainProduct(subVecs, "vec_id", 2, 3, 4)
    val solo0 = Kmeans.train(df, "vec_id", 3, 4)
    val solo1 = Kmeans.train(
      df.select(col("vec_id"),
        transform(col("q"), x => x + 1234567L).as("q")),
      "vec_id", 3, 4)
    assert(joint(0) == solo0)
    assert(joint(1) == solo1)
  }

  test("training does not increase total within-cell distance") {
    val (df, _) = planted()
    def sse(cents: Seq[Seq[Long]]): Double =
      Kmeans.assign(df, cents)
        .select(posexplode(col("q")).as(Seq("pos", "x")), col("cell"))
        .join(cents.zipWithIndex.flatMap { case (cq, cid) =>
            cq.zipWithIndex.map { case (v, p) => (cid, p, v) } }
          .toDF("cell", "pos", "cq"), Seq("cell", "pos"))
        .select(pow(col("x") - col("cq"), 2).as("d2"))
        .agg(sum("d2")).head().getDouble(0)
    val init = Kmeans.train(df, "vec_id", 3, 0)
    val trained = Kmeans.train(df, "vec_id", 3, 3)
    assert(sse(trained) <= sse(init))
  }
}
