package graft.scratch

import graft.SparkSpec
import graft.ops.RetrievalOps
import org.apache.spark.sql.functions._

/** Scratch calibration for r19: weight magnitudes, score spread, and
  * whether the reranked order actually moves vs the RRF order.
  */
object RerankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val feat = RetrievalOps.rerankCandidates(spark, dir).localCheckpoint()
      println(s"PROBE $dir candidates=${feat.count()} positives=" +
        feat.agg(sum(col("y"))).head().get(0))
      for (lrExp <- Seq(41, 42, 44)) {
        val hist = RetrievalOps.denseLogregFit(feat, lrDiv = math.pow(2, lrExp))
        println(s"PROBE $dir lr=2^$lrExp weights=${hist.last.mkString(",")}")
      }
      val rows = graft.SparkEntry.queries("r19_learned_rerank")(spark, dir).collect()
      println(s"PROBE $dir result:")
      rows.foreach(r => println(s"  $r"))
    }
    spark.stop()
  }
}
