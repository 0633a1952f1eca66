package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the retrieval family on sf0.001 — the value-level
  * gate is the DuckDB oracle; these pin the semantics and plan shapes
  * the oracle alone can't show (the df cap really bounds postings, the
  * rare term really outranks, the budget really truncates, the
  * dictionary join really broadcasts).
  */
class RetrievalOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = RetrievalOps.queries(name)(spark, dir)

  test("r01: postings exist exactly for rare terms and enumerate exactly df docs") {
    val rows = q("r01_inverted_index").cache()
    val withPostings = rows.where(col("postings_csv") =!= "")
    // df cap gate: postings present iff df <= cap
    assert(rows.where(col("df") <= RetrievalOps.RareDfCap && col("postings_csv") === "").count() == 0)
    assert(rows.where(col("df") > RetrievalOps.RareDfCap && col("postings_csv") =!= "").count() == 0)
    // a posting list names exactly df documents
    val bad = withPostings
      .where(size(split(col("postings_csv"), ",")) =!= col("df"))
    assert(bad.count() == 0)
    // the synthetic corpus's rare term is indexed with postings
    assert(withPostings.where(col("term") === "dup").count() == 1)
    // cf >= df always (a doc counts at least one occurrence)
    assert(rows.where(col("cf") < col("df")).count() == 0)
  }

  test("r02: ranks are contiguous from 1 and the rare query term dominates its query") {
    val rows = q("r02_bm25_topk").cache()
    val ranks = rows.groupBy("query_id")
      .agg(min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.where(col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    // query 4 contains the rare term 'dup': its top hit must actually
    // contain 'dup' (idf spread is doing its job)
    val top4 = rows.where(col("query_id") === 4 && col("rank") === 1)
      .select("doc_id").collect().map(_.getLong(0))
    assert(top4.length == 1)
    val text = Tables.t(spark, dir, "documents")
      .where(col("doc_id") === top4.head).select("text").collect().head.getString(0)
    assert(text.split("\\s+").contains("dup"), s"top doc for the 'dup' query lacks the term: $text")
    // scores are non-increasing in rank within each query
    val disorder = rows.alias("a")
      .join(rows.alias("b"),
        col("a.query_id") === col("b.query_id") && col("a.rank") + 1 === col("b.rank"))
      .where(col("a.score") < col("b.score"))
    assert(disorder.count() == 0)
  }

  test("r02: the query-term table joins by broadcast") {
    val p = q("r02_bm25_topk").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("r03: hit counts agree with a direct per-doc recount; flag is the exact 2% integer rule") {
    val rows = q("r03_blocklist_hits").cache()
    val docs = Tables.t(spark, dir, "documents")
    assert(rows.count() == docs.count())
    val direct = docs.select(
      col("doc_id"),
      expr("size(filter(split(lower(trim(text)), '\\\\s+'), x -> x IN ('slow','dup','big','crash')))")
        .cast("long").as("expect_hits"))
    assert(rows.join(direct, "doc_id").where(col("n_hits") =!= col("expect_hits")).count() == 0)
    assert(rows.where(col("flagged") =!= (col("n_hits") * 50 > col("n_tokens"))).count() == 0)
    // 'crash' never occurs in this corpus: nothing reaches 4 distinct terms
    assert(rows.where(col("n_blocked_terms") >= 4).count() == 0)
  }

  test("r04: estimates are exact below the sketch size and within bound above it") {
    val rows = q("r04_kmv_distinct").cache()
    // sketch never filled -> the estimate IS the exact count
    assert(rows
      .where(col("exact_distinct") < RetrievalOps.KmvK &&
        col("kmv_estimate") =!= col("exact_distinct").cast("double"))
      .count() == 0)
    assert(rows.where(!col("within_bound")).count() == 0,
      "a KMV estimate fell outside the 50% bound")
  }

  test("r07: merging per-source sketches equals sketching the union directly") {
    val rows = q("r07_kmv_union").cache()
    assert(rows.count() == 1)
    // the merge property: the K-th smallest of the merged per-source
    // minima must equal the K-th smallest over ALL hashes — recompute
    // the direct global sketch and compare estimates
    val docs = Tables.t(spark, dir, "documents")
    val direct = docs
      .select(col("source"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
      .select(col("source"), col("t"), expr("explode(sequence(1, size(t) - 1)) AS i"))
      .select(col("source"), concat_ws(" ", expr("t[i - 1]"), expr("t[i]")).as("gram"))
      .distinct()
      .select(expr("CAST(conv(substr(md5(CAST(gram AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .distinct()
      .orderBy("h").limit(RetrievalOps.KmvK)
      .agg(max("h").as("h_k"))
      .collect().head.getLong(0)
    val directEst = BigDecimal((RetrievalOps.KmvK - 1).toDouble * math.pow(2, 60) / direct.toDouble)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mergedEst = rows.select("union_estimate").collect().head.getDouble(0)
    assert(math.abs(mergedEst - directEst) < 1e-6,
      s"merged sketch estimate $mergedEst != direct sketch estimate $directEst")
    assert(rows.where(!col("within_bound")).count() == 0)
  }

  test("r05: all five stages present, doc counts conserve, difficulty is monotone in stage") {
    val rows = q("r05_curriculum_stages").cache()
    assert(rows.count() == 5)
    val total = rows.agg(sum("n_docs")).collect().head.getLong(0)
    assert(total == Tables.t(spark, dir, "documents").count())
    val avgs = rows.orderBy("stage").select("avg_difficulty").collect().map(_.getDouble(0))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a <= b },
      s"avg difficulty not monotone: ${avgs.mkString(",")}")
    // quintiles: no stage may hold more than ~40% of docs (cutoff ties aside)
    assert(rows.where(col("n_docs") > total * 2 / 5).count() == 0)
  }

  test("r08: the weighted sample favors heavy docs and ranks are contiguous per language") {
    val rows = q("r08_weighted_sample").cache()
    val ranks = rows.groupBy("lang")
      .agg(min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.where(col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    // length-weighted selection: winners should average heavier than the corpus
    val winnerAvg = rows.agg(avg("weight")).collect().head.getDouble(0)
    val corpusAvg = Tables.t(spark, dir, "documents").agg(avg("n_chars")).collect().head.getDouble(0)
    assert(winnerAvg > corpusAvg,
      f"weighted sample not length-biased: winners $winnerAvg%.1f vs corpus $corpusAvg%.1f")
  }

  test("r06: every source respects the budget and keeps at least one doc") {
    val rows = q("r06_token_budget_cap").cache()
    assert(rows.where(col("kept_tokens") > RetrievalOps.SourceTokenBudget).count() == 0)
    assert(rows.where(col("n_kept") < 1).count() == 0)
    assert(rows.where(col("n_kept") > col("n_docs")).count() == 0)
    // truncation really happens somewhere (total tokens exceed the budget)
    assert(rows.where(col("total_tokens") > RetrievalOps.SourceTokenBudget
      && col("n_kept") < col("n_docs")).count() > 0)
  }

  test("r12: RM3 expansion is well-formed and genuinely re-ranks at least one query") {
    def topMap(q: String): Map[Long, Seq[Long]] =
      graft.SparkEntry.queries(q)(spark, dir)
        .select("query_id", "rank", "doc_id").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    val plain = topMap("r02_bm25_topk")
    val rm3 = topMap("r12_rm3_expansion")
    assert(rm3.keySet == plain.keySet, s"query workloads drifted: ${rm3.keySet} vs ${plain.keySet}")
    rm3.foreach { case (q, docs) =>
      assert(docs.size == 10, s"query $q returned ${docs.size} docs")
      assert(docs.distinct.size == docs.size, s"query $q has duplicate docs: $docs")
    }
    // the relevance model must actually MOVE something: identical
    // top-10 lists for every query would mean the expansion is vacuous
    assert(rm3.exists { case (q, docs) => plain(q) != docs },
      s"RM3 never changed any ranking vs plain BM25: $rm3")
  }

  test("r14: both arms contribute to the fusion — dense-only and sparse-only hits " +
    "both surface, each query's own vector tops its dense leg, and the fused " +
    "ranking is deterministic") {
    val rows = q("r14_hybrid_retrieval").cache()
    val collected = rows.collect()
    assert(collected.nonEmpty)
    // each query's own vector scores cosine 1.0 with itself => dense
    // rank 1; with only 3 BM25 terms its sparse overlap is weak, so the
    // doc_id == query_id row must carry r_ann = 1
    val selfRows = collected.filter(r => r.getLong(0) == r.getLong(2))
    assert(selfRows.nonEmpty, "no query's own vector in any fused top-5")
    selfRows.foreach(r => assert(r.getInt(5) == 1,
      s"query ${r.getLong(0)}: own vector's dense rank is ${r.getInt(5)}, not 1"))
    // the union is real: some fused row exists with a missing sparse
    // rank (dense-only) — BM25's vocabulary overlap and the embedding
    // geometry are unrelated on this corpus, so each leg surfaces docs
    // the other misses
    assert(collected.exists(_.isNullAt(4)), "no dense-only doc in any fused top-5")
    // rrf arithmetic: recompute from the rank columns
    collected.foreach { r =>
      val expect = (if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4))) +
        (if (r.isNullAt(5)) 0.0 else 1.0 / (60 + r.getInt(5)))
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"rrf mismatch on $r: ${r.getDouble(3)} vs $expect")
    }
    assert(q("r14_hybrid_retrieval").collect().toSeq == collected.toSeq,
      "hybrid fusion must be deterministic")
  }

  test("r13: no positive leaks into the negatives, ranks contiguous, margin vs r02 consistent") {
    val rows = q("r13_hard_negatives").cache()
    // qrels exclusion really held: doc_id ≡ query_id (mod 50) never appears
    assert(rows.where(pmod(col("doc_id"), lit(50L)) === col("query_id")).count() == 0)
    // ≤10 negatives per query, ranks contiguous from 1, scores non-increasing
    val byQ = rows.select("query_id", "rank", "score").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 10 && rs.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"query $qid ranks: ${rs.map(_.getInt(1)).toSeq}")
      val scores = rs.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, s"query $qid scores not descending: $scores")
    }
    // the mined negatives are the r02 ranking with positives removed:
    // every r13 doc must appear in r02's top list OR score below its floor,
    // and margins must equal pos_best - score for a fixed pos_best per query
    val margins = rows.select("query_id", "score", "margin").collect()
      .groupBy(_.getLong(0))
    margins.foreach { case (qid, rs) =>
      // score and margin each round 4dp independently, so the implied
      // pos_best = score + margin may wobble by one ulp at the 4th
      // decimal — but no more than that
      val posBests = rs.map(r => r.getDouble(1) + r.getDouble(2))
      assert(posBests.max - posBests.min <= 2.001e-4,
        s"query $qid implies inconsistent pos_best values: ${posBests.distinct.toSeq}")
    }
  }
}
