// Scratch A/B harness for the r22 corrCandidates reshape (deleted
// before the round closes): times candidate generation and the full
// verify at a3d's REAL geometry (k≈262, dims=144) for both the shipped
// shape and inline variants, so the regression source is attributable.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, SparkEntry}
import graft.ops.{CorrPrune, Similarity, Stats}

object DbgCorr {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  private def clear(s: SparkSession): Unit = {
    graft.ops.Time.unpersistPanels(); s.catalog.clearCache()
  }
  private def t(s: SparkSession, label: String)(f: => DataFrame): Unit =
    (1 to 3).foreach { i =>
      clear(s)
      val t0 = System.nanoTime()
      noop(f)
      println(f"[d] $label%-34s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

  // the OLD (r21) candidate shape, verbatim
  private def oldCandidates(panel: DataFrame, keyCol: String,
      posCol: String, valueCol: String, dims: Int, bands: Int,
      bits: Int): DataFrame = {
    val ex = panel.select(col(keyCol), col(posCol).as("pos"),
        round(col(valueCol) * 1e6, 0).cast("long").as("xq"))
      .where(col("xq").isNotNull)
    val stats = ex.groupBy(keyCol)
      .agg(sum("xq").as("sx"), count(lit(1)).as("nx"))
    val planes = broadcast(
      Similarity.hyperplanes(panel.sparkSession, bands, bits, dims))
    val projAggs = (0 until bits).flatMap(b => Seq(
      sum(when(col("bit") === b, col("s") * col("xq")).otherwise(0L))
        .as(s"p$b"),
      sum(when(col("bit") === b, col("s")).otherwise(0L)).as(s"q$b")))
    val bk = ex.join(planes, Seq("pos"))
      .groupBy(col(keyCol), col("band"))
      .agg(projAggs.head, projAggs.tail: _*)
      .join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col("band"),
        (0 until bits).map(b =>
          when(col("nx") * col(s"p$b") - col("sx") * col(s"q$b") > 0,
            lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("bucket"))
    bk.select(col("band"), col("bucket"), col(keyCol).as("i"))
      .join(bk.select(col("band"), col("bucket"), col(keyCol).as("j")),
        Seq("band", "bucket"))
      .where(col("i") < col("j"))
      .select("i", "j").distinct()
  }

  private def verify(panel: DataFrame, cand: DataFrame): DataFrame = {
    val nn = panel.where(col("value").isNotNull)
    val a = nn.select(col("user_id").as("i"), col("pos"),
      col("value").as("va"))
    val b = nn.select(col("user_id").as("j"), col("pos"),
      col("value").as("vb"))
    cand.join(broadcast(a), Seq("i")).join(broadcast(b), Seq("j", "pos"))
      .groupBy("i", "j")
      .agg(Stats.pearson(col("va"), col("vb")).as("rho"))
      .where(col("rho").isNotNull)
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.build("graft-dbg")
    val jan1 = SparkEntry.jan1
    val jan2 = SparkEntry.sec("2024-01-02T00:00:00")
    def panel = SparkEntry.resampled(s, d, 300, jan1, jan2, 600)
      .withColumn("pos", ((col("bucket") - jan1) / 600 + 1).cast("int"))
    // warmup
    noop(SparkEntry.queries("a3d_corr_pruned")(s, d))
    t(s, "cand NEW (grouped pairs)")(
      CorrPrune.corrCandidates(panel, "user_id", "pos", "value", 144, 8, 5))
    t(s, "cand OLD (self-join)")(
      oldCandidates(panel, "user_id", "pos", "value", 144, 8, 5))
    t(s, "cand+verify NEW")(
      CorrPrune.candidateRho(panel, "user_id", "pos", "value", 144, 8, 5))
    t(s, "cand+verify OLD")(verify(panel,
      oldCandidates(panel, "user_id", "pos", "value", 144, 8, 5)))
    s.stop()
  }
}
