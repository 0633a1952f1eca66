package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pins for the NSW graph ANN (s22): the soundness booleans
  * must actually hold on this corpus, the exact column must agree with
  * an independent DataFrame-side brute force, and the walk must be
  * deterministic run to run (fixed graph, fixed entries — no RNG).
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run() = graft.SparkEntry.queries("s22_nsw_ann")(spark, sfDir).collect()
    .map(r => (r.getAs[Long]("query_id"), r.getAs[Double]("exact_top1_cos"),
      r.getAs[Boolean]("top1_sound"), r.getAs[Boolean]("recall_floor_ok")))

  test("s22: every query clears the recall floor and never beats the exact optimum") {
    val rows = run()
    assert(rows.length == 20)
    assert(rows.forall(_._3), s"a walk 'beat' the brute-force optimum: ${rows.filterNot(_._3).toSeq}")
    assert(rows.forall(_._4), s"recall floor missed: ${rows.filterNot(_._4).toSeq}")
  }

  test("s22: the exact_top1 column agrees with an independent DataFrame brute force") {
    val rows = run().map(r => r._1 -> r._2).toMap
    val emb = Tables.t(spark, sfDir, "embeddings")
    val panel = emb.filter(col("vec_id") < 256)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val expect = emb.filter(col("vec_id") >= 256 && col("vec_id") < 276)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(panel))
      .select(col("query_id"),
        round(graft.functions.VectorFunctions.cosine_similarity(col("qe"), col("pe")), 6).as("c"))
      .groupBy("query_id").agg(max(col("c")).as("m"))
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("m")).toMap
    assert(rows.keySet == expect.keySet)
    rows.foreach { case (q, c) =>
      assert(math.abs(c - expect(q)) < 1e-9, s"query $q: $c vs DataFrame brute force ${expect(q)}")
    }
  }

  test("s22: the walk is deterministic (identical output across runs)") {
    assert(run().toSeq == run().toSeq)
  }
}
