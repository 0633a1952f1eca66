package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on graft-shards ([[ShardSchemas]] + the
  * [[TrainingShards.write]] gate): real corpora add columns across
  * appends, so the container must take a superset append, read the
  * mixed generations back under ONE union schema (older rows
  * null-filled), refuse a type change loudly, and reset the chain on
  * overwrite.
  */
class ShardSchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(): String = Files.createTempDirectory("graft-schema-evo").toString

  private def schemaFiles(out: String): Seq[String] =
    new java.io.File(out).list().filter(_.startsWith("_SCHEMA.g")).toSeq.sorted

  test("two-generation evolved read: a superset append succeeds, old rows null-fill " +
    "the new column, and the recorded chain advances") {
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val out = freshDir()
    // generation 0: (doc_id, source, n_chars)
    TrainingShards.write(docs.filter(col("doc_id") < 250)
      .select("doc_id", "source", "n_chars"), out, maxDocsPerShard = 64)
    assert(schemaFiles(out).size == 1, s"expected one schema record, got ${schemaFiles(out)}")
    // generation 1: + lang (superset)
    TrainingShards.write(docs.filter(col("doc_id") >= 250)
      .select("doc_id", "source", "n_chars", "lang"), out, maxDocsPerShard = 64)
    assert(schemaFiles(out).size == 2, s"expected two schema records, got ${schemaFiles(out)}")
    val back = TrainingShards.read(spark, out)
    assert(back.columns.toSet == Set("doc_id", "source", "n_chars", "lang"),
      s"union schema not served: ${back.columns.toSeq}")
    assert(back.count() == 500)
    assert(back.filter(col("lang").isNull).count() == 250,
      "pre-evolution rows must null-fill the added column")
    assert(back.filter(col("doc_id") >= 250 && col("lang").isNull).count() == 0,
      "post-evolution rows lost their column values")
    // a same-schema re-append does NOT mint a new generation
    TrainingShards.write(docs.filter(col("doc_id") === 0L)
      .select("doc_id", "source", "n_chars", "lang"), out, maxDocsPerShard = 64)
    assert(schemaFiles(out).size == 2, "identical-schema append minted a schema generation")
    // a SUBSET append is compatible as-is (rows just lack the keys)
    TrainingShards.write(docs.filter(col("doc_id") === 1L)
      .select("doc_id", "n_chars"), out, maxDocsPerShard = 64)
    assert(schemaFiles(out).size == 2, "subset append minted a schema generation")
    assert(TrainingShards.read(spark, out).columns.length == 4)
  }

  test("an incompatible type change fails loudly and leaves the directory untouched") {
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val out = freshDir()
    TrainingShards.write(docs.select("doc_id", "n_chars"), out, maxDocsPerShard = 64)
    val before = TrainingShards.read(spark, out).count()
    val e = intercept[IllegalArgumentException] {
      TrainingShards.write(docs.select(col("doc_id"),
        col("n_chars").cast("string").as("n_chars")), out, maxDocsPerShard = 64)
    }
    assert(e.getMessage.contains("n_chars") && e.getMessage.contains("type change"),
      e.getMessage)
    assert(TrainingShards.read(spark, out).count() == before,
      "a rejected write must not change the corpus")
    assert(schemaFiles(out).size == 1, "a rejected write must not evolve the chain")
  }

  test("overwrite resets the schema chain to exactly the new write's schema") {
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val out = freshDir()
    TrainingShards.write(docs.select("doc_id", "source", "n_chars"), out, maxDocsPerShard = 64)
    TrainingShards.write(docs.select("doc_id", "source", "n_chars", "lang"), out, maxDocsPerShard = 64)
    assert(schemaFiles(out).size == 2)
    TrainingShards.write(docs.select("doc_id", "text"), out,
      maxDocsPerShard = 64, mode = "overwrite")
    assert(schemaFiles(out).size == 1, s"overwrite must reset the chain: ${schemaFiles(out)}")
    val back = TrainingShards.read(spark, out)
    assert(back.columns.toSet == Set("doc_id", "text"))
    // the reset chain now permits what was a type change before
    TrainingShards.write(docs.select(col("doc_id"), col("text"),
      col("n_chars").cast("string").as("n_chars")), out, maxDocsPerShard = 64)
    assert(TrainingShards.read(spark, out)
      .schema("n_chars").dataType == StringType)
  }

  test("an explicit read schema overrides the recorded chain; a legacy directory " +
    "with no records still reads by inference, and an APPEND to it never mints a " +
    "record that would drop legacy-only columns") {
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val out = freshDir()
    TrainingShards.write(docs.select("doc_id", "source", "n_chars"), out, maxDocsPerShard = 64)
    val narrow = StructType(Seq(StructField("doc_id", LongType)))
    assert(TrainingShards.read(spark, out, Some(narrow)).columns.toSeq == Seq("doc_id"))
    // legacy: strip the records, read still works via inference
    schemaFiles(out).foreach(n => new java.io.File(s"$out/$n").delete())
    val inferred = TrainingShards.read(spark, out)
    assert(inferred.count() == 500 && inferred.columns.contains("n_chars"))
    // append a NARROWER frame to the legacy dir: no record may be
    // minted (it would describe only the new write, and read would
    // silently drop 'source'/'n_chars' from the 500 legacy rows)
    TrainingShards.write(docs.filter(col("doc_id") === 0L).select("doc_id"), out,
      maxDocsPerShard = 64)
    assert(schemaFiles(out).isEmpty,
      "a legacy append minted a schema record that narrows the corpus")
    val after = TrainingShards.read(spark, out)
    assert(after.columns.contains("n_chars") && after.count() == 501,
      s"legacy columns lost after append: ${after.columns.toSeq}")
  }
}
