package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves d16's keeper selection is skew-immune: on a corpus where ONE
  * content hash covers 90% of all documents (the boilerplate-page shape
  * routine in web crawls), the struct-min aggregate must
  * (a) still pick the minimum doc_id as the keeper, and
  * (b) partial-aggregate map-side, so the shuffle carries one candidate
  *     row per (map partition, hash) — NOT one row per document. The
  *     window form this replaced shuffles every row of the hot group
  *     into a single task, which at 10⁹ duplicates is a stage that
  *     never finishes; AQE skew-split does not apply to windows.
  */
class Dedup16SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("d16 keeper agg on a 90%-one-hash corpus: correct keeper, map-side-combined shuffle") {
    import spark.implicits._
    val nDocs = 10000
    val nParts = 8
    // 90% of docs share one text (one content hash); the rest are unique.
    val docs = spark.range(0, nDocs, 1, nParts)
      .select(
        col("id").as("doc_id"),
        when(col("id") % 10 < 9, lit("the same boilerplate page body text"))
          .otherwise(concat(lit("unique body text number "), col("id"))).as("text"),
        lit("en").as("lang"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    // capture shuffle-write volume across the job
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          written.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    val rows =
      try {
        val r = TextOps.corpusCuration(docs).collect()
        // the listener bus is async: poll until the metric stabilizes
        var last = -1L
        var spins = 0
        while (written.get() != last && spins < 50) {
          last = written.get(); spins += 1; Thread.sleep(100)
        }
        r
      } finally spark.sparkContext.removeSparkListener(listener)

    // (a) correctness: keepers are the hot group's min doc_id plus every
    // unique doc clearing the floors; min_doc is the global min keeper.
    assert(rows.length == 1)
    val row = rows.head
    assert(row.getString(row.fieldIndex("lang")) == "en")
    // 1 keeper for the hot hash + nDocs/10 unique docs
    assert(row.getLong(row.fieldIndex("n_curated")) == 1L + nDocs / 10,
      s"keeper count wrong: $row")
    assert(row.getLong(row.fieldIndex("min_doc")) == 0L, s"hot-hash keeper must be doc 0: $row")

    // (b) scale posture: the partial min collapses each map partition to
    // one candidate row per hash it holds. Hot hash: nParts candidates.
    // Unique hashes: one each. Anything near nDocs means the partial
    // aggregate vanished and every duplicate row crossed the shuffle.
    val shuffled = written.get()
    val bound = nDocs / 4
    assert(shuffled > 0, "expected at least one shuffle (keeper + summary aggs)")
    assert(shuffled < bound,
      s"$shuffled shuffle records for $nDocs docs — keeper selection is not map-side combined")
  }
}
