package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.cosine_similarity

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer scale path next to sign-LSH: k-means centroids partition the
  * corpus into cells; a query exactly scans only its `nprobe` nearest
  * cells instead of everything.
  *
  * Training is Lloyd's algorithm as Spark jobs: assignment is a broadcast
  * join against the k centroids (k rows — always broadcastable), the
  * update step is a posexplode + per-(cluster, dim) average (one shuffle
  * keyed on k*dim cells, never on the corpus). Deterministic: centroids
  * initialise from the k lowest vec_ids and iterate a fixed number of
  * rounds, so the index is identical across runs and cluster layouts.
  *
  * At 100 TB the assignment table `(vec_id, cluster)` is written
  * partitioned by cluster; queries touch nprobe/k of the data. Here the
  * index is built on the fly per query invocation (corpus is small); the
  * split into train/assign/search mirrors the real deployment.
  */
object IvfIndex {

  /** Element-wise mean of the member vectors per cluster. */
  private def centroidUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(avg(col("v")).as("m"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("centroid"))

  /** Assign each vector to its nearest (max-cosine) centroid. */
  private def assign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cluster"))
    emb
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id"),
        col("embedding"),
        col("cluster"),
        cosine_similarity(col("embedding"), col("centroid")).as("sim")
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cluster")
  }

  /** Train k centroids with `iters` Lloyd rounds (deterministic init from
    * the k lowest vec_ids). Returns (cluster int, centroid array<float>).
    */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = emb
      .orderBy("vec_id")
      .limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cluster"), col("embedding").as("centroid"))
      .persist()
    centroids.count()
    for (_ <- 1 to iters) {
      val next = centroidUpdate(assign(emb, centroids)).persist()
      next.count()
      centroids.unpersist()
      centroids = next
    }
    centroids
  }

  /** Exact search restricted to the query's `nprobe` nearest cells. */
  def search(emb: DataFrame, centroids: DataFrame, queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val assigned = assign(emb, centroids)
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val probeCells = centroids
      .crossJoin(broadcast(q))
      .select(col("cluster"), cosine_similarity(col("centroid"), col("qe")).as("sim"))
      .orderBy(col("sim").desc, col("cluster"))
      .limit(nprobe)
      .select("cluster")
    assigned
      .join(broadcast(probeCells), "cluster")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** End-to-end: train + probe in one call (the `queries` entry shape). */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    val emb = Tables.t(spark, dir, "embeddings").persist()
    val centroids = train(emb, k = 16, iters = 3)
    search(emb, centroids, queryId, k, nprobe = 4)
  }
}
