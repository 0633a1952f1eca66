package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 curation additions — DSIR importance
  * resampling (d40), content-defined chunking (d41), prototype-distance
  * pruning (s13) — beyond the driver's DuckDB hash gate: the invariants
  * each paper's method promises (pool exclusion, boundary shift
  * stability, per-cluster keep fractions) rather than value equality.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = Tables.t(spark, sfDir, "documents")

  // ------------------------------------------------------------------ d40
  test("dsir: target-domain docs are excluded from the scored pool") {
    val scored = TextOps.dsirWeights(docs)
    val targetIds = docs.filter(col("source") === "src0").select("doc_id")
    assert(scored.join(targetIds, "doc_id").count() == 0)
    assert(scored.count() == docs.filter(col("source") =!= "src0").count())
  }

  test("dsir: keep rate tracks the 0.8 quantile cutoff") {
    val scored = TextOps.dsirWeights(docs).cache()
    try {
      val n = scored.count().toDouble
      val kept = scored.filter(col("kept")).count().toDouble
      // >= on an interpolated 0.8 quantile keeps ~20%; ties can widen it.
      assert(kept / n >= 0.15 && kept / n <= 0.30, s"kept ${kept / n}")
      // Every kept score must be >= every dropped score's max boundary.
      val minKept = scored.filter(col("kept")).agg(min("dsir_logratio")).head().getDouble(0)
      val maxDrop = scored.filter(!col("kept")).agg(max("dsir_logratio")).head().getDouble(0)
      assert(minKept >= maxDrop)
    } finally scored.unpersist(blocking = false)
  }

  test("dsir: scores are corpus-order-invariant (deterministic)") {
    // Deterministic: scores depend only on bucket stats, so reordering
    // the corpus cannot change them.
    val a = TextOps.dsirWeights(docs).orderBy("doc_id").collect()
    val b = TextOps.dsirWeights(docs.orderBy(col("doc_id").desc)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  // ------------------------------------------------------------------ d41
  test("cdc: chunks tile every document exactly") {
    val chunks = graft.SparkEntry.queries("d41_cdc_chunks")(spark, sfDir).cache()
    try {
      val n = docs.select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      // Last chunk ends at n; first starts at 1; lengths sum to n.
      val agg = chunks.groupBy("doc_id").agg(
        min("start_pos").as("first_start"),
        max("end_pos").as("last_end"),
        sum("n_tokens").as("tok_sum"))
      val bad = agg.join(n, "doc_id")
        .filter(col("first_start") =!= 1 || col("last_end") =!= col("n") || col("tok_sum") =!= col("n"))
      assert(bad.count() == 0)
      // Contiguity: chunk k+1 starts where chunk k ended + 1.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("chunk_idx")
      val gaps = chunks
        .withColumn("prev_end", lag(col("end_pos"), 1).over(w))
        .filter(col("prev_end").isNotNull && col("start_pos") =!= col("prev_end") + 1)
      assert(gaps.count() == 0)
    } finally chunks.unpersist(blocking = false)
  }

  test("cdc: boundaries are shift-stable under a prefix insertion") {
    import spark.implicits._
    val base = "key agg row scan slow fast table value part hash value table part a row fast " * 4
    val shifted = "alpha beta gamma " + base
    val two = Seq((0L, base.trim), (1L, shifted.trim)).toDF("doc_id", "text")
    val wTok = 4
    // Reuse the query's boundary rule directly on both docs.
    val chunks = {
      val toks = two.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).as("n"))
      toks.where(col("n") >= wTok)
        .select(col("doc_id"), col("n"), expr(s"explode(sequence(1, size(t) - ${wTok - 1})) AS i"), col("t"))
        .select(col("doc_id"), col("n"), (col("i") + (wTok - 1)).as("e"),
          concat_ws(" ", slice(col("t"), col("i"), lit(wTok))).as("win"))
        .where(expr("CAST(conv(substr(md5(CAST(win AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 16") === 0 &&
          col("e") < col("n"))
        .select(col("doc_id"), col("e"))
    }.collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getInt(1)).toSet }
    val b0 = chunks.getOrElse(0L, Set.empty)
    val b1 = chunks.getOrElse(1L, Set.empty)
    // Every boundary of the base doc past the first window reappears in
    // the shifted doc displaced by exactly the 3 inserted tokens — the
    // content-defined property (fixed-stride chunking has no analogue).
    val reachable = b0.filter(_ >= wTok)
    assert(reachable.nonEmpty)
    assert(reachable.forall(e => b1.contains(e + 3)), s"base $b0 shifted $b1")
  }

  // ------------------------------------------------------------------ s13
  test("prototype prune: per-cluster keep fraction ~ keepFrac and kept are the hard examples") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val pruned = SimilarityOps.prototypePrune(emb).cache()
    try {
      val frac = pruned.groupBy("label").agg(
        (sum(when(col("kept"), 1).otherwise(0)).cast("double") / count(lit(1))).as("f"))
      val off = frac.filter(col("f") < 0.55 || col("f") > 0.85).count()
      assert(off == 0, "per-cluster keep fraction drifted from 0.7")
      // Every kept vector is no more prototypical than any dropped one
      // within the same cluster (<= cutoff).
      val worstKept = pruned.filter(col("kept")).groupBy("label").agg(max("proto_cos").as("mk"))
      val bestDrop = pruned.filter(!col("kept")).groupBy("label").agg(min("proto_cos").as("md"))
      val bad = worstKept.join(bestDrop, "label").filter(col("mk") > col("md")).count()
      assert(bad == 0)
      assert(pruned.filter(col("proto_cos") < -1.0 || col("proto_cos") > 1.0).count() == 0)
    } finally pruned.unpersist(blocking = false)
  }

  // ------------------------------------------------------------------ d60
  test("d60: the lexical arm IS d15 (chaining), both arms discriminate, " +
    "and keep = neither arm fired") {
    val d60 = graft.SparkEntry.queries("d60_semantic_decontam")(spark, sfDir).collect()
    assert(d60.nonEmpty)
    // chaining after d15: for every doc d15 reports, d60's lexical column
    // carries the identical shared-8gram count (doc_id = vec_id linkage)
    val d15 = graft.SparkEntry.queries("d15_contamination")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d60lex = d60.map(r => r.getLong(0) -> r.getLong(1)).toMap
    d15.foreach { case (id, shared) =>
      d60lex.get(id).foreach(v => assert(v == shared, s"doc $id: d60 lex $v != d15 $shared"))
    }
    // a doc d60 covers that d15 does NOT report must show zero overlap
    d60.foreach { r =>
      if (!d15.contains(r.getLong(0))) assert(r.getLong(1) == 0L)
    }
    // both arms flag something and most rows survive (tau sits in the
    // discriminative band, not above or below the whole distribution)
    val lex = d60.count(_.getBoolean(3))
    val sem = d60.count(_.getBoolean(4))
    val keep = d60.count(_.getBoolean(5))
    assert(lex >= 1, "lexical arm flagged nothing")
    assert(sem >= 1, "semantic arm flagged nothing")
    assert(keep >= d60.length / 2, s"tau/overlap flags swallowed the corpus: $keep of ${d60.length}")
    d60.foreach { r =>
      assert(r.getBoolean(5) == (!r.getBoolean(3) && !r.getBoolean(4)))
    }
  }

  // ------------------------------------------------------------------ d64
  // Buckets of the generating lexicon under the 'w:'-salted md5 family:
  // md5("w:slow") % 256 = 28, md5("w:fast") % 256 = 193 (no vocab
  // collision on this fixture's 31-word vocabulary).
  private val slowBucket = 28L
  private val fastBucket = 193L

  test("d64: gradient descent RECOVERS the generating lexicon at both gate SFs — " +
    "w[slow] strongly positive, w[fast] strongly negative, dominating every other bucket") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = TextOps.logregTrain(Tables.t(spark, dir, "documents")).collect()
      val w3 = rows.map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w3")).toMap
      val othersMax = w3.collect {
        case (b, w) if b != slowBucket && b != fastBucket => math.abs(w)
      }.max
      assert(w3(slowBucket) > 0, s"$dir: w[slow] = ${w3(slowBucket)} not positive")
      assert(w3(fastBucket) < 0, s"$dir: w[fast] = ${w3(fastBucket)} not negative")
      assert(w3(slowBucket) >= 2 * othersMax && -w3(fastBucket) >= 2 * othersMax,
        s"$dir: lexicon weights (${w3(slowBucket)}, ${w3(fastBucket)}) do not dominate " +
          s"the noise buckets (max |w| = $othersMax)")
    }
  }

  test("d64: training moves balanced accuracy well past chance at both gate SFs " +
    "and the loop is deterministic") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = TextOps.logregTrain(Tables.t(spark, dir, "documents")).collect()
      val h = r.head
      val (nDocs, nPos) = (h.getAs[Long]("n_docs"), h.getAs[Long]("n_pos"))
      val (nCorrect, nPosCorrect) = (h.getAs[Long]("n_correct"), h.getAs[Long]("n_pos_correct"))
      val posRecall = nPosCorrect.toDouble / nPos
      val negRecall = (nCorrect - nPosCorrect).toDouble / (nDocs - nPos)
      val balanced = (posRecall + negRecall) / 2
      // class-balanced GD optimizes balanced error: plain accuracy can sit
      // below the majority base rate while balanced accuracy is far above
      // the 0.5 chance line (measured: 0.64 at sf0.001, 0.82 at sf0.01)
      assert(balanced >= 0.6, s"$dir: balanced accuracy $balanced below the 0.6 floor")
    }
    def once() = TextOps.logregTrain(Tables.t(spark, sfDir, "documents"))
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("w3"))).toSeq
    assert(once() == once(), "training is not deterministic across runs")
  }
}
