package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[RetrievalOps.plaidMaxSim]] — the centroid front-end ahead of the
  * exact late-interaction kernel. Contracts:
  *
  *  1. candidate budget: stage 2 returns at most `nCand` docs per
  *     query doc, and every returned top-k doc is a candidate (the
  *     exact kernel never resurrects a pruned doc);
  *  2. exact-on-candidates: every returned doc's maxsim equals the
  *     UNPRUNED kernel's score for that (qdoc, doc) elementwise — the
  *     prune changes WHICH docs are scored, never what a score is.
  *     Pinned at a deliberately tight budget (nCand=16) where recall
  *     visibly drops, so the equality is not vacuous;
  *  3. the r17 query's soundness rows hold at both gate SFs;
  *  4. self-exclusion: a query doc never appears in its own ranking.
  */
class PlaidSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def fixture() = {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cents = IvfIndex.train(emb, k = 64, iters = 2)
    val qvecs = emb.filter(col("vec_id") < 16)
      .select(expr("vec_id div 8").as("qdoc"), expr("vec_id % 8").as("qtok"), col("embedding"))
      .as[(Long, Long, Seq[Float])].collect().toSeq.sortBy(v => (v._1, v._2))
    (emb, cents, qvecs)
  }

  test("candidate budget holds and the ranking only draws from candidates") {
    import spark.implicits._
    val (emb, cents, qvecs) = fixture()
    val (topk, cand) = RetrievalOps.plaidMaxSim(emb, qvecs, cents, nCand = 16, k = 10)
    val candPairs = cand.as[(Long, Long)].collect().toSet
    val perQdoc = candPairs.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perQdoc.values.forall(_ <= 16), s"candidate budget exceeded: $perQdoc")
    val returned = topk.select(col("query_doc"), col("doc_id")).as[(Long, Long)].collect()
    assert(returned.forall(candPairs.contains), "a returned doc was never a candidate")
    assert(returned.forall { case (qd, d) => qd != d }, "query doc ranked itself")
  }

  test("returned scores equal the unpruned exact kernel elementwise, even at a budget that hurts recall") {
    import spark.implicits._
    val (emb, cents, qvecs) = fixture()
    val (topk, _) = RetrievalOps.plaidMaxSim(emb, qvecs, cents, nCand = 16, k = 10)
    val exact = RetrievalOps.maxSimScored(
      emb.select(expr("vec_id div 8").as("doc_id"), col("embedding")), qvecs)
      .select(col("qdoc").as("query_doc"), col("doc_id"), col("maxsim").as("exact_ms"))
    val joined = topk.join(exact, Seq("query_doc", "doc_id"))
      .select(col("query_doc"), col("doc_id"), col("maxsim"), col("exact_ms"))
      .collect()
    assert(joined.length === topk.count())
    joined.foreach { r =>
      assert(r.getDouble(2) === r.getDouble(3), s"pruned score != exact: $r")
    }
  }

  test("candidate generation is plan-pinned to O(probed postings): the cluster IN " +
    "filter reaches the posting scan and names a PROPER subset of the cells") {
    val (emb, cents, qvecs) = fixture()
    // a parquet-backed posting index, the production layout — so the probe
    // filter has a real scan to push into
    val dir = java.nio.file.Files.createTempDirectory("graft-plaid-idx").toString + "/postings"
    RetrievalOps.plaidCellSets(emb, cents).write.parquet(dir)
    val cellSets = spark.read.parquet(dir)
    // nprobe=2 of 64 cells: the probed union over 16 query tokens cannot
    // cover the full cell space, so the IN-list is a proper subset and the
    // assertion is not vacuous
    val cand = RetrievalOps.plaidCandidates(cellSets, qvecs, cents, nCand = 16, nprobe = 2)
    val plan = cand.queryExecution.executedPlan.toString
    // past the optimizer's IN->INSET threshold the filter renders as
    // `cluster INSET ...`; the authoritative pin is the PushedFilters
    // entry on the parquet scan itself
    val pushed = "PushedFilters: \\[In\\(cluster, \\[([0-9,]*)".r.findFirstMatchIn(plan)
    assert(pushed.nonEmpty, s"cluster IN not PUSHED into the parquet posting scan:\n$plan")
    val nProbed = pushed.get.group(1).split(",").length
    assert(nProbed <= 32, s"probed $nProbed of 64 cells — filter does not bite:\n$plan")
  }

  test("r17 soundness rows hold at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("r17_plaid_maxsim")(spark, dir).collect()
      assert(rows.length === 2, s"$dir: expected one row per query doc")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_returned") === 10L, s"$dir $r")
        assert(r.getAs[Long]("n_score_mismatch") === 0L, s"$dir $r")
        assert(r.getAs[Long]("n_outside_topn") === 0L, s"$dir $r")
        assert(r.getAs[Boolean]("recall_ok"), s"$dir $r")
      }
    }
  }
}
