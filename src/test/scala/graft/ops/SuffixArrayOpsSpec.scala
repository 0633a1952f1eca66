package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[SuffixArrayOps]] — the true-ExactSubstr contracts: a planted long
  * duplicate is recovered as ONE maximal span (not a pile of
  * overlapping fixed windows), true equality means no false spans from
  * near-misses or shared short suffixes, and the prefix-doubling ranks
  * are a pure function of the corpus (deterministic across runs and
  * partition counts).
  */
class SuffixArrayOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame, nParts: Int = 4): Seq[(Long, Long, Long)] =
    SuffixArrayOps.maximalDupSpans(df, window = 8, nParts = nParts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  // 30 distinct planted tokens — long enough that fixed-8 windows
  // produce 23 overlapping duplicated starts, which MUST merge to one
  private val planted = (1 to 30).map(i => s"dup$i").mkString(" ")

  test("a planted 30-token cross-doc duplicate surfaces as exactly ONE maximal " +
    "span per doc, at the right offsets, with the right length") {
    val df = docsOf(
      0L -> s"a1 a2 a3 a4 $planted z1 z2",
      1L -> s"b1 b2 $planted y1 y2 y3 y4",
      2L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    val got = spans(df)
    assert(got == Seq((0L, 5L, 30L), (1L, 3L, 30L)),
      s"expected one 30-token span per planted doc, got $got")
  }

  test("a within-doc repeat also surfaces, and merging never bridges a gap " +
    "between two separate duplicates") {
    // doc 3 holds the planted run twice with a 9-token unique gap: two
    // separate maximal spans, not one bridged one
    val gap = (1 to 9).map(i => s"gap$i").mkString(" ")
    val df = docsOf(3L -> s"$planted $gap $planted")
    val got = spans(df)
    assert(got == Seq((3L, 1L, 30L), (3L, 40L, 30L)),
      s"expected two separate 30-token spans, got $got")
  }

  test("no false spans: near-miss windows (7 of 8 tokens shared) and a shared " +
    "SHORT suffix (5 trailing tokens) never produce a duplicate") {
    val df = docsOf(
      0L -> "p1 p2 p3 p4 p5 p6 p7 ALPHA q1 q2 q3 tail1 tail2 tail3 tail4 tail5",
      1L -> "p1 p2 p3 p4 p5 p6 p7 BETA r1 r2 r3 tail1 tail2 tail3 tail4 tail5")
    assert(spans(df).isEmpty, s"false duplicate surfaced: ${spans(df)}")
  }

  test("ranks are a pure function of the corpus: identical spans across runs " +
    "and across partition counts") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val a = spans(docs, nParts = 4)
    val b = spans(docs, nParts = 7)
    val c = spans(docs, nParts = 4)
    assert(a == b, "spans differ across partition counts")
    assert(a == c, "spans differ across runs")
    assert(a.nonEmpty, "fixture should contain natural duplicated 8-grams")
  }

  test("suffixDedup agrees with d34's md5-gram spanDedup row-for-row on the " +
    "fixture (true rank equality == hash equality wherever md5 is collision-free) " +
    "and removes the planted later occurrence, not the first") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val viaRanks = SuffixArrayOps.suffixDedup(docs, window = 8, nParts = 4)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaMd5 = TextOps.spanDedup(docs, spanWidth = 8)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaRanks == viaMd5, "suffix-array dedup drifted from the md5 form")
    // planted: doc 1's copy of the run is removed, doc 0's original kept
    val planted2 = docsOf(
      0L -> s"a1 a2 $planted z1",
      1L -> s"b1 $planted y1 y2")
    val got = SuffixArrayOps.suffixDedup(planted2, window = 8, nParts = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 33L, 0L), (1L, 33L, 30L)),
      s"first occurrence must survive, the later copy must lose its 30 tokens: $got")
  }

  test("agrees with an independent brute-force gram group-by on the fixture") {
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val got = spans(docs)
    // brute force: true-text 8-gram groups, cover, merge — DataFrame-side
    val toks = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("t"))
    val sp = toks
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), expr("explode(sequence(1, size(t) - 7)) AS p"), col("t"))
      .select(col("doc_id"), col("p").cast("long").as("p"),
        expr("array_join(slice(t, p, 8), ' ')").as("gram"))
    val dup = sp.groupBy("gram").agg(count(lit(1)).as("c")).filter(col("c") >= 2).select("gram")
    val cov = sp.join(dup, "gram")
      .select(col("doc_id"), explode(expr("sequence(p, p + 7)")).as("cpos")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("cpos")
    val expect = cov.withColumn("grp", col("cpos") - row_number().over(w))
      .groupBy("doc_id", "grp")
      .agg(min(col("cpos")).as("s"), count(lit(1)).as("l"))
      .select("doc_id", "s", "l")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(got == expect, s"suffix-array spans != brute-force spans")
  }
}
