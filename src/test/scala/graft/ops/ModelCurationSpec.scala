package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for p05 — the closed train→apply loop (fit d64's
  * classifier on the even-doc_id slice, filter the FULL corpus with the
  * trained weights through d39's weight seam). Beyond the DuckDB hash
  * gate, the claims that make it a real model-based filter:
  *
  *   1. the kept set DEPENDS on the trained weights — a perturbed
  *      (sign-flipped) control selects a materially different set, and
  *      a zero-weight control keeps everything (so every drop is the
  *      trained model's decision);
  *   2. the filter GENERALIZES: on the held-out odd half the keep
  *      decision tracks the generating lexicon label (measured: pos
  *      recall 1.0 at both gate SFs, balanced accuracy 0.607/0.565).
  */
class ModelCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val gateSfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def docs(dir: String) = Tables.t(spark, dir, "documents")

  private def trainedW(dir: String): Array[Long] =
    TextOps.logregFit(docs(dir).filter(col("doc_id") % 2 === 0))._2.last

  private def keptSet(dir: String, w: Array[Long]): Set[Long] =
    TextOps.logregScore(docs(dir), w)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet

  test("p05: the kept set depends on the TRAINED weights — sign-flipped control " +
    "selects a different set, zero-weight control drops nothing") {
    val dir = "/root/testdata/sf0.01"
    val w = trainedW(dir)
    val total = docs(dir).count()
    val kept = keptSet(dir, w)
    // trained model genuinely filters: a nonempty drop set
    assert(kept.nonEmpty && kept.size < total,
      s"trained filter is degenerate: ${kept.size}/$total kept")
    // sign-flip control: score is 1-p (up to ties at z=0), so every
    // decided doc flips — if keep didn't depend on w these would agree
    val keptFlipped = keptSet(dir, w.map(-_))
    val flipped = (kept -- keptFlipped).size + (keptFlipped -- kept).size
    assert(flipped >= total / 2,
      s"only $flipped/$total decisions moved under the sign-flip control")
    // zero-weight control: p = 0.5 everywhere → keep all. Every drop in
    // the trained run is therefore attributable to the trained weights.
    val keptZero = keptSet(dir, Array.fill(w.length)(0L))
    assert(keptZero.size == total, s"zero-weight control kept ${keptZero.size}/$total")
  }

  test("p05: trained filter generalizes to the HELD-OUT odd half at both gate SFs " +
    "— keep tracks the generating lexicon label") {
    for (dir <- gateSfs) {
      val scored = PipelineOps.modelCurate(docs(dir))
      val y = docs(dir)
        .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
        .select(col("doc_id"),
          (size(filter(col("toks"), t => t === "slow")) >
            size(filter(col("toks"), t => t === "fast"))).as("y"))
      val held = scored.filter(!col("in_train")).join(y, "doc_id")
        .groupBy("y", "keep").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
      val posRecall = held((true, true)).toDouble / (held((true, true)) + held((true, false)))
      val negRecall = held((false, false)).toDouble / (held((false, false)) + held((false, true)))
      val balanced = (posRecall + negRecall) / 2
      assert(posRecall >= 0.95, s"$dir: held-out positive recall $posRecall")
      // 3 half-gradient-mass iterations under-separate the negatives;
      // the floor pins "past chance", not the full-train 0.82
      assert(balanced >= 0.55, s"$dir: held-out balanced accuracy $balanced")
      assert(negRecall > 0.0, s"$dir: filter never drops a held-out negative")
    }
  }

  test("p05: every doc is scored exactly once and in_train marks the even half") {
    val dir = "/root/testdata/sf0.001"
    val out = PipelineOps.modelCurate(docs(dir)).cache()
    try {
      assert(out.count() == docs(dir).count())
      assert(out.select("doc_id").distinct().count() == out.count())
      assert(out.filter(col("in_train") =!= (col("doc_id") % 2 === 0)).count() == 0)
    } finally out.unpersist(blocking = false)
  }
}
