package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, NswIndex}

/** ANN RECALL at scale — the measurement the time-only scale fixtures
  * (`bench_scale.json`) cannot make: recall@10 for the flat per-cell
  * NSW walk (s23's index), the layered HNSW variant (s25's), and the
  * IVF probe CEILING (exact search restricted to the probed cells —
  * the best any in-cell walk can do at this nprobe) on whatever
  * corpus `SPARK_GRAFT_SF_DIR` points at. Run it at the 10x/30x
  * blow-ups to answer the question the gate SFs can't: do nprobe=4 /
  * ef=48 still clear the recall floor once cells hold thousands of
  * vectors instead of ~30?
  *
  * Query panel: vec_ids 0..15 — present at every SF (the blow-up
  * fixtures jitter COPIES under fresh ids and leave the originals in
  * place), so the panel is comparable across scales. Ground truth is
  * the brute-force exact top-10 per query (16 queries x one corpus
  * scan each — the cheap side of the measurement). Index parameters
  * are EXACTLY the s23/s25 queries' (k=16 cells, m=8, efC=32,
  * nprobe=4, ef=48), so the numbers speak for those entries.
  *
  * Decomposition: ceiling − walk = what the graph walk loses; 10 −
  * ceiling = what the coarse quantizer loses at this nprobe. The knob
  * each one indicts is different (ef vs nprobe), which is why the
  * ceiling column exists.
  *
  * Prints ONE JSON line:
  * `{"sf":…,"n_vectors":…,"recall_at10":{"flat":{…},"layered":{…},
  * "ivf_ceiling":{…}},"per_query":{…}}`.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/tmp/scale30 SPARK_GRAFT_CPUS=32
  *       sbt "runMain graft.ScaleRecall"`
  */
object ScaleRecall {
  private val K = 10
  private val NProbe = 4
  private val Ef = 48
  private val QueryIds: Seq[Long] = 0L until 16L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.VectorFunctions.cosine_similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nVectors = emb.count()

    val flatDir = java.nio.file.Files.createTempDirectory("graft-recall-flat").toString
    val layeredDir = java.nio.file.Files.createTempDirectory("graft-recall-hnsw").toString
    // identical train params + deterministic k-means => identical centroids,
    // so the ceiling column applies to both indexes
    val cents = NswIndex.build(emb, flatDir, k = 16, iters = 2, m = 8, efC = 32)
    NswIndex.buildLayered(emb, layeredDir, k = 16, iters = 2, m = 8, efC = 32)

    // one pass over the corpus per query for ground truth; the panel is
    // 16 queries, so this stays trivially cheap at any fixture size
    val queryVecs: Map[Long, Array[Float]] = emb
      .filter(col("vec_id").isin(QueryIds.map(x => x: Any): _*))
      .as[(Long, Array[Float])].collect().toMap
    val assignments = IvfIndex.assignments(emb, cents).localCheckpoint()

    def ids(df: DataFrame): Set[Long] = df.select("vec_id").as[Long].collect().toSet

    def exactTopK(qid: Long, qe: Array[Float], within: DataFrame): Set[Long] =
      ids(within
        .filter(col("vec_id") =!= qid)
        .select(col("vec_id"), cosine_similarity(col("embedding"), array(qe.toSeq.map(lit): _*)).as("s"))
        .orderBy(col("s").desc, col("vec_id"))
        .limit(K))

    // IVF+SQ8 (s29): same centroids (shared deterministic train), codes
    // quantized by the corpus-trained scalar quantizer, rerank=50. Its
    // recall question at scale is DIFFERENT from the walks': cells keep
    // growing, so does the byte distortion push an exact-within-probes
    // top-10 item below the fixed rerank horizon?
    val sqParams = graft.ops.Sq8Index.train(emb)
    val sqDir = java.nio.file.Files.createTempDirectory("graft-recall-sq8").toString
    graft.ops.Sq8Index.buildIvf(emb, sqDir, sqParams, kCells = 16, iters = 2)
    // the rerank horizon is the SQ8 knob that must scale with cell size
    // (measured: fixed 50 loses 1 recall point on 3/16 queries at 30x)
    val sqRerank = sys.env.getOrElse("SPARK_GRAFT_SQ8_RERANK", "50").toInt

    val rows = QueryIds.map { qid =>
      val qe = queryVecs(qid)
      val truth = exactTopK(qid, qe, emb)
      val probes = IvfIndex.probeCells(cents, qe, NProbe)
      val ceiling = exactTopK(qid, qe,
        assignments.filter(col("cluster").isin(probes.map(x => x: Any): _*))
          .select("vec_id", "embedding"))
      val flat = ids(NswIndex.searchFrame(spark, flatDir, cents, qe, qid, K, NProbe, Ef))
      val layered = ids(NswIndex.searchFrameLayered(spark, layeredDir, cents, qe, qid, K, NProbe, Ef))
      val sq8 = ids(graft.ops.Sq8Index.searchIvf(spark, sqDir, cents, emb, sqParams,
        qe, qid, K, NProbe, rerank = sqRerank))
      (qid, (truth & flat).size, (truth & layered).size, (truth & ceiling).size,
        (truth & sq8).size)
    }

    def stats(f: ((Long, Int, Int, Int, Int)) => Int): (Double, Int) = {
      val xs = rows.map(f)
      (math.round(xs.sum.toDouble / xs.length * 100.0) / 100.0, xs.min)
    }
    val (fMean, fMin) = stats(_._2)
    val (lMean, lMin) = stats(_._3)
    val (cMean, cMin) = stats(_._4)
    val (qMean, qMin) = stats(_._5)
    def arr(f: ((Long, Int, Int, Int, Int)) => Int): String = rows.map(f).mkString("[", ",", "]")
    println(
      s"""{"sf":"$sfDir","n_vectors":$nVectors,"k":$K,"nprobe":$NProbe,"ef":$Ef,""" +
      s""""recall_at10":{"flat":{"mean":$fMean,"min":$fMin},""" +
      s""""layered":{"mean":$lMean,"min":$lMin},""" +
      s""""ivf_ceiling":{"mean":$cMean,"min":$cMin},""" +
      s""""ivf_sq8_rerank$sqRerank":{"mean":$qMean,"min":$qMin}},""" +
      s""""per_query":{"flat":${arr(_._2)},"layered":${arr(_._3)},"ivf_ceiling":${arr(_._4)},"ivf_sq8_rerank$sqRerank":${arr(_._5)}}}""")
    spark.stop()
  }
}
