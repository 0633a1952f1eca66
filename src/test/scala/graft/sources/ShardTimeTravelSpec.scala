package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[TrainingShards.readAsOf]] — time-travel over the generation
  * snapshots. Contracts:
  *
  *  1. read-at-generation under compaction at retain>=2: a reader
  *     pinned to the pre-compaction generation serves the EXACT corpus
  *     that generation committed, row-for-row, while the live read
  *     serves the compacted one — and vacuum at the default retention
  *     does not disturb it;
  *  2. schema-as-of: a generation archived BEFORE a column evolved
  *     reads back without that column (exactly what its consumers
  *     saw), while the live read serves the union chain;
  *  3. vacuum expiry fails LOUDLY: after retain=1 the archived
  *     generation's readAsOf throws, naming the available generations
  *     — never a silent partial corpus;
  *  4. unknown generations fail loudly too;
  *  5. generations() lists archived + live, oldest first.
  */
class ShardTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(): String =
    Files.createTempDirectory("graft-timetravel-spec").toString

  test("read-at-generation under compaction at retain>=2 serves the exact superseded corpus") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val genA = docs.filter(col("doc_id") < 120).select("doc_id", "source", "n_chars")
    TrainingShards.write(genA, out, maxDocsPerShard = 32, mode = "overwrite")
    TrainingShards.compact(spark, out, maxDocsPerShard = 64)
    // live layout moves on: more rows append after the compaction
    TrainingShards.write(
      docs.filter(col("doc_id") >= 120 && col("doc_id") < 150)
        .select("doc_id", "source", "n_chars"), out, maxDocsPerShard = 32)

    assert(TrainingShards.generations(spark, out) == Seq(1L, 2L))
    // vacuum at the default retention keeps the archived generation whole
    TrainingShards.vacuum(spark, out, retainGenerations = 2)

    val asOf1 = TrainingShards.readAsOf(spark, out, 1L)
    assert(asOf1.count() === 120L)
    assert(asOf1.select("doc_id").except(genA.select("doc_id")).count() === 0L)
    assert(genA.select("doc_id").except(asOf1.select("doc_id")).count() === 0L)
    val live = TrainingShards.read(spark, out)
    assert(live.count() === 150L)
    assert(TrainingShards.readAsOf(spark, out, 2L).count() === 150L,
      "the live generation must be readable through readAsOf too")
  }

  test("schema-as-of: an archived generation reads under the columns its consumers saw") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    TrainingShards.write(docs.filter(col("doc_id") < 50)
      .select("doc_id", "source", "n_chars"), out, maxDocsPerShard = 32, mode = "overwrite")
    TrainingShards.compact(spark, out, maxDocsPerShard = 64) // archives gen 1 pre-evolution
    // the column evolves on the LIVE generation only
    TrainingShards.write(docs.filter(col("doc_id") >= 50 && col("doc_id") < 80)
      .select("doc_id", "source", "n_chars", "lang"), out, maxDocsPerShard = 32)

    val asOf1 = TrainingShards.readAsOf(spark, out, 1L)
    assert(!asOf1.columns.contains("lang"),
      s"generation 1 predates the lang column; got ${asOf1.columns.mkString(",")}")
    val live = TrainingShards.read(spark, out)
    assert(live.columns.contains("lang"))
    assert(live.filter(col("lang").isNull).count() === 50L)
  }

  test("vacuum expiry and unknown generations fail loudly with the available set") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(60)
    TrainingShards.write(docs.select("doc_id", "source", "n_chars"), out,
      maxDocsPerShard = 16, mode = "overwrite")
    TrainingShards.compact(spark, out, maxDocsPerShard = 64)
    assert(TrainingShards.readAsOf(spark, out, 1L).count() === 60L)

    TrainingShards.vacuum(spark, out, retainGenerations = 1)
    val e1 = intercept[IllegalArgumentException] {
      TrainingShards.readAsOf(spark, out, 1L)
    }
    assert(e1.getMessage.contains("not readable") && e1.getMessage.contains("vacuum"),
      s"expiry must name vacuum: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      TrainingShards.readAsOf(spark, out, 99L)
    }
    assert(e2.getMessage.contains("available"), e2.getMessage)
    // the live generation still reads
    assert(TrainingShards.read(spark, out).count() === 60L)
  }
}
