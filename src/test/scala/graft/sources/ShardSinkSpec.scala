package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardSinkSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(): String =
    Files.createTempDirectory("graft-shards").toString

  test("round-trip: every document survives the jsonl.gz container byte-for-byte") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    TrainingShards.write(docs, out, maxDocsPerShard = 64)
    val back = TrainingShards.read(spark, out, Some(docs.schema))
    assert(back.count() == docs.count())
    // anti-join both ways: nothing lost, nothing invented
    val cols = docs.columns.map(col)
    assert(docs.except(back.select(cols: _*)).count() == 0)
    assert(back.select(cols: _*).except(docs).count() == 0)
  }

  test("shards respect the document target and the manifest accounts for every row") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val n = docs.count()
    TrainingShards.write(docs, out, maxDocsPerShard = 64)
    val manifest = new String(Files.readAllBytes(Paths.get(out, "_MANIFEST.json")), "UTF-8")
    val docCounts = """"docs": (\d+)""".r.findAllMatchIn(manifest).map(_.group(1).toLong).toSeq
    // first match is total_docs? no — totals use total_docs; these are per-shard
    assert(docCounts.nonEmpty)
    assert(docCounts.forall(_ <= 64), s"a shard exceeded the doc target: $docCounts")
    assert(docCounts.sum == n, s"manifest docs ${docCounts.sum} != corpus $n")
    val totalDocs = """"total_docs": (\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toLong)
    assert(totalDocs.contains(n))
    // every manifest shard exists on disk; no stray part files beyond them
    val files = """"file": "([^"]+)"""".r.findAllMatchIn(manifest).map(_.group(1)).toSet
    assert(files.forall(f => Files.exists(Paths.get(out, f))))
    val onDisk = new java.io.File(out).list().filter(_.endsWith(".jsonl.gz")).toSet
    assert(onDisk == files, s"disk/manifest drift: disk=$onDisk manifest=$files")
  }

  test("the byte target rolls shards even when the doc target is loose") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(50).repartition(1)
    TrainingShards.write(docs, out, maxDocsPerShard = 1000000, maxShardBytes = 2048)
    val manifest = new String(Files.readAllBytes(Paths.get(out, "_MANIFEST.json")), "UTF-8")
    val rawBytes = """"raw_bytes": (\d+)""".r.findAllMatchIn(manifest).map(_.group(1).toLong).toSeq
    assert(rawBytes.length > 1, "expected multiple shards from the byte target")
    // every line is <2048 in this corpus, so no shard may exceed the bound
    assert(rawBytes.forall(_ <= 2048), s"a shard exceeded the byte bound: $rawBytes")
  }

  test("the sink rejects multi-column or non-string input") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val e = intercept[Exception] {
      docs.select(col("doc_id"), col("text"))
        .write.format("graft-shards").option("path", out).mode("append").save()
    }
    assert(e.getMessage.contains("line"))
  }
}
