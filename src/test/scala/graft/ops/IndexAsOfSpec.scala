package graft.ops

import graft.SparkSpec
import graft.streaming.IndexStreams
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[IvfIndex.searchIndexAsOf]] — time-travel on the serving index.
  * Contracts:
  *
  *  1. as-of(gen) equals the brute-force top-k over that generation's
  *     corpus state (every cell probed ⇒ exact), and as-of(live)
  *     equals the normal search;
  *  2. GEOMETRY time-travels with the data: after a retrain between
  *     generations, gen 1 resolves the build-time centroids and gen 2
  *     the retrained ones;
  *  3. vacuum expiry fails loudly naming vacuum, a future generation
  *     fails loudly naming the live one.
  */
class IndexAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fixture(): (String, Array[Float]) = {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-asof-spec").toString
    IvfIndex.build(emb.filter(col("vec_id") >= 100), idxDir, k = 16, iters = 2)
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") < 100), 0L, idxDir, cents)
    IndexStreams.tombstoneBatch(spark, Seq(2L, 3L, 105L), 1L, idxDir)
    IvfIndex.compactLiveIndex(spark, idxDir) // gen 1
    IndexStreams.tombstoneBatch(spark, Seq(7L), 2L, idxDir)
    IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2) // gen 2, new geometry
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    (idxDir, qe)
  }

  private def bruteTop10(idxDir: String, gen: Long, qe: Array[Float]): Seq[(Long, Double)] = {
    import graft.functions.VectorFunctions.cosine_similarity
    spark.read.parquet(IvfIndex.liveBaseDir(idxDir, gen))
      .filter(col("vec_id") =!= 0L)
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), array(qe.toSeq.map(lit): _*)), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("as-of equals brute force per generation; live as-of equals the normal search; geometry time-travels") {
    val (idxDir, qe) = fixture()
    for (gen <- Seq(1L, 2L)) {
      val got = IvfIndex.searchIndexAsOf(spark, idxDir, gen, qe, k = 10, nprobe = 16,
        excludeId = Some(0L)).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === bruteTop10(idxDir, gen, qe), s"gen $gen as-of diverged from brute force")
    }
    // the two generations serve DIFFERENT corpus states (7 died at gen 2)
    val g1 = IvfIndex.searchIndexAsOf(spark, idxDir, 1L, qe, 500, 16, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val g2 = IvfIndex.searchIndexAsOf(spark, idxDir, 2L, qe, 500, 16, Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(g1.contains(7L) && !g2.contains(7L))
    // live as-of == the normal (static) search post-compaction
    val live = IvfIndex.searchIndex(spark, idxDir, qe, 10, 16, Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val asOfLive = IvfIndex.searchIndexAsOf(spark, idxDir, 2L, qe, 10, 16, Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(asOfLive === live)
    // geometry time-travel: gen 1 resolves the build-time (gen-0)
    // geometry, gen 2 the retrained sidecar
    assert(IvfIndex.geometryGen(spark, idxDir, "centroids", 1L) === 0L)
    assert(IvfIndex.geometryGen(spark, idxDir, "centroids", 2L) === 2L)
    new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }

  test("vacuum expiry and future generations fail loudly") {
    val (idxDir, qe) = fixture()
    val e1 = intercept[IllegalArgumentException] {
      IvfIndex.searchIndexAsOf(spark, idxDir, 5L, qe, 10, 4)
    }
    assert(e1.getMessage.contains("does not exist yet"), e1.getMessage)
    IvfIndex.vacuumLiveIndex(spark, idxDir, retainGenerations = 1)
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.searchIndexAsOf(spark, idxDir, 1L, qe, 10, 4)
    }
    assert(e2.getMessage.contains("vacuum"), e2.getMessage)
    // the live generation still serves
    assert(IvfIndex.searchIndexAsOf(spark, idxDir, 2L, qe, 10, 16, Some(0L)).count() === 10L)
    new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }
}
