package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[SimilarityOps.kCenterCoreset]] — greedy farthest-point selection.
  * Contracts: the seed is the lowest vec_id; centers are distinct; the
  * live coverage radius is NON-INCREASING round over round (adding a
  * center can only shrink max-min distance); round 1's center equals an
  * independent brute-force argmax of distance-to-seed; deterministic
  * across runs.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("greedy invariants hold and round 1 matches a brute-force argmax") {
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.t(spark, dir, "embeddings")
      val rows = SimilarityOps.kCenterCoreset(emb, k = 6)
        .orderBy("round").collect()
      assert(rows.length == 6, s"$dir: expected 6 rounds")
      val centers = rows.map(_.getLong(1))
      assert(centers.distinct.length == centers.length, s"$dir: duplicate centers")
      val minId = emb.agg(min(col("vec_id"))).head().getLong(0)
      assert(centers.head == minId, s"$dir: seed must be the lowest vec_id")
      val radii = rows.map(_.getDouble(2))
      assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
        s"$dir: coverage radius must be non-increasing: ${radii.toSeq}")
      // independent brute force for round 1: farthest vector from the seed
      val seedVec = emb.filter(col("vec_id") === minId)
        .select("embedding").as[Array[Float]].head()
      val want = emb
        .select(col("vec_id"),
          (lit(1.0) - round(graft.functions.VectorFunctions.cosine_similarity(
            col("embedding"), array(seedVec.toSeq.map(lit): _*)), 6)).as("d"))
        .orderBy(col("d").desc, col("vec_id")).limit(1).head().getLong(0)
      assert(centers(1) == want, s"$dir: round-1 center ${centers(1)} != brute-force $want")
      // determinism
      val again = SimilarityOps.kCenterCoreset(emb, k = 6)
        .orderBy("round").collect().map(_.toString).toSeq
      assert(again == rows.map(_.toString).toSeq, s"$dir: non-deterministic selection")
    }
  }
}
