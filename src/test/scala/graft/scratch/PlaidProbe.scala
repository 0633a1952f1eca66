package graft.scratch

import graft.SparkSpec
import graft.ops.{IvfIndex, RetrievalOps, Tables}
import org.apache.spark.sql.functions._

/** Scratch calibration: PLAID recall@10 vs (kCells, nCand, nprobe) at the gate SFs — the sweep behind r17's operating point (64 cells, top-40, nprobe=8). */
object PlaidProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    import spark.implicits._
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         kCells <- Seq(16, 32, 64)) {
      val emb = Tables.t(spark, sfDir, "embeddings")
      val cents = IvfIndex.train(emb, k = kCells, iters = 2)
      val qvecs = emb.filter(col("vec_id") < 16)
        .select(expr("vec_id div 8").as("qdoc"), expr("vec_id % 8").as("qtok"), col("embedding"))
        .as[(Long, Long, Seq[Float])].collect().toSeq.sortBy(v => (v._1, v._2))
      val exact = RetrievalOps.maxSimScored(
        emb.select(expr("vec_id div 8").as("doc_id"), col("embedding")), qvecs)
        .localCheckpoint(true)
      val top10 = exact.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("qdoc").orderBy(col("maxsim").desc, col("doc_id"))))
        .filter(col("rk") <= 10)
        .select(col("qdoc").as("kq"), col("doc_id").as("k_id"))
        .localCheckpoint(true)
      for (nc <- Seq(24, 32, 40, 48); np <- Seq(4, 8, 16)) {
        val (topk, cand) = RetrievalOps.plaidMaxSim(emb, qvecs, cents, nCand = nc, k = 10, nprobe = np)
        val rec = topk.join(top10, col("query_doc") === col("kq") && col("doc_id") === col("k_id"))
          .groupBy("query_doc").count().as[(Long, Long)].collect().toMap
        val nCandTotal = cand.count()
        println(s"PLAID $sfDir kCells=$kCells nCand=$nc nprobe=$np recall=${rec.toSeq.sortBy(_._1)} candPairs=$nCandTotal")
      }
    }
    spark.stop()
  }
}
