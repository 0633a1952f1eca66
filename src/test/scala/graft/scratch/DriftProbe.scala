package graft.scratch

import graft.SparkSpec
import graft.ops.{IvfIndex, Tables}
import graft.streaming.IndexStreams
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scratch calibration main (not a suite member): sweeps drift-wave
  * transforms and nprobe to pick the s44 fixture + floors.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._
    import graft.functions.VectorFunctions.cosine_similarity

    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         mode <- Seq("antipodal", "cone")) {
      val emb = Tables.t(spark, sfDir, "embeddings")
      val idxDir = Files.createTempDirectory("graft-drift-probe").toString
      IvfIndex.build(emb, idxDir, k = 16, iters = 2)
      val cents = IvfIndex.loadCentroids(spark, idxDir)
      val waveExpr = mode match {
        case "antipodal" => expr("transform(embedding, x -> -x)")
        case "cone" => expr("transform(embedding, x -> CAST(CAST(1.0D + 0.35D * x AS FLOAT) AS FLOAT))")
      }
      val wave = emb.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), waveExpr.as("embedding"))
      IndexStreams.upsertBatch(wave, 0L, idxDir, cents)
      IndexStreams.tombstoneBatch(spark, Seq(100004L, 100008L, 5L), 1L, idxDir)
      val x0 = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
      val qe = mode match {
        case "antipodal" => x0.map(x => -x)
        case "cone" => x0.map(x => (1.0 + 0.35 * x).toFloat)
      }
      val corpus = emb.select("vec_id", "embedding").unionByName(wave)
        .filter(!col("vec_id").isin(100004L, 100008L, 5L))
      val exactTop = corpus.filter(col("vec_id") =!= 100000L)
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), array(qe.toSeq.map(lit): _*)), 6).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(10)
        .select(col("vec_id").as("k_id")).localCheckpoint(true)
      def recall(np: Int) = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10,
        nprobe = np, excludeId = Some(100000L))
        .join(exactTop, col("vec_id") === col("k_id")).count()
      val pre = Seq(4, 6, 8).map(np => np -> recall(np))
      IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2)
      val post = Seq(4, 6, 8).map(np => np -> recall(np))
      println(s"PROBE $sfDir $mode pre=$pre post=$post")
      val fs = new org.apache.hadoop.fs.Path(idxDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
    }
    spark.stop()
  }
}
