package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Multi-vector late-interaction (r15): the engine's MaxSim ranking
  * agrees row-for-row with an independent in-JVM brute force (per-pair
  * rounded cosines, per-token maxima, fixed-order sum), the whole
  * panel reads the corpus in ONE scan, and the query is deterministic.
  */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Array[Float], b: Array[Float]): Double = NswIndex.cos(a, b)

  test("r15 agrees with an independent brute-force MaxSim, one corpus scan, " +
    "deterministic") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("r15_maxsim")(spark, sfDir)
    // exactly ONE parquet scan: the panel's 16 cosine columns and the
    // pivoted maxima all ride a single pass over the embeddings
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.split("\n").filter(_.contains("Scan parquet"))
    assert(scans.length == 1, s"expected one corpus scan, got ${scans.length}:\n${scans.toSeq}")
    val got = df.collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("maxsim"))).toSeq
    // independent replay: collected vectors, grouped into docs of 8
    val all = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val docs: Map[Long, Seq[(Long, Array[Float])]] =
      all.groupBy(_._1 / 8).view.mapValues(_.toSeq.sortBy(_._1)).toMap
    val want = Seq(0L, 1L).flatMap { qdoc =>
      val qtoks = docs(qdoc) // 8 (vec_id, vector) pairs in token order
      val scoredDocs = docs.keys.filter(_ != qdoc).map { d =>
        val score = r6(qtoks.map { case (_, qv) =>
          docs(d).map(t => r6(cos(t._2, qv))).max
        }.sum)
        (d, score)
      }.toSeq
      scoredDocs.sortBy { case (d, sc) => (-sc, d) }.take(10).zipWithIndex
        .map { case ((d, sc), i) => (qdoc, i + 1, d, sc) }
    }
    assert(got == want, s"engine drifted from brute force\nengine: $got\nbrute:  $want")
    val again = graft.SparkEntry.queries("r15_maxsim")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_doc"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("maxsim"))).toSeq
    assert(again == got, "r15 must be deterministic")
  }

  test("MaxSim semantics on a planted micro-corpus: a doc holding the query's own " +
    "tokens scores the per-token-count maximum and outranks partial matches") {
    // query tokens (doc 0): e1, e2; doc 1 = {e1, e2} (perfect), doc 2 =
    // {e1, -e2} (one token aligned), doc 3 = {-e1, -e2} (anti-aligned)
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    def neg(v: Array[Float]) = v.map(x => -x)
    val docs = Map(
      1L -> Seq(e1, e2), 2L -> Seq(e1, neg(e2)), 3L -> Seq(neg(e1), neg(e2)))
    val q = Seq(e1, e2)
    val scores = docs.view.mapValues { toks =>
      q.map(qv => toks.map(t => r6(cos(t, qv))).max).sum
    }.toMap
    assert(scores(1L) == 2.0, s"perfect match must score |q| = 2: ${scores(1L)}")
    assert(scores(2L) == 1.0, s"half match must score 1: ${scores(2L)}")
    // the anti-aligned doc scores 0, not -2: each query token's MAX over
    // the doc's tokens picks the orthogonal 0 over the antipodal -1 —
    // the max is what makes late interaction forgiving of bad tokens
    assert(scores(3L) == 0.0, s"anti-aligned must score 0: ${scores(3L)}")
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L))
  }
}
