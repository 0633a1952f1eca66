package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

/** [[TrainingShards.vacuum]] — the retention contract: only files
  * unreferenced by the manifests inside the retention window are
  * deleted, a tailer holding the previous layout either still reads
  * (retain >= 2) or fails LOUDLY (retain = 1), and the live corpus is
  * untouchable at any setting.
  */
class ShardVacuumSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def freshDir(): String = Files.createTempDirectory("graft-vacuum").toString

  private def partFiles(out: String): Set[String] =
    new java.io.File(out).list().filter(_.startsWith("part-")).toSet

  test("vacuum deletes crash orphans, never manifest-listed shards") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    TrainingShards.write(docs, out, maxDocsPerShard = 64)
    val committed = partFiles(out)
    val n = docs.count()
    // a crashed abort's survivor: a data file in no manifest
    val orphan = "part-deadbeef-00000-99.000.jsonl.gz"
    Files.copy(Paths.get(out, committed.head), Paths.get(out, orphan),
      StandardCopyOption.REPLACE_EXISTING)
    val deleted = TrainingShards.vacuum(spark, out, retainGenerations = 2)
    assert(deleted == Seq(orphan), s"expected exactly the orphan deleted, got $deleted")
    assert(partFiles(out) == committed, "vacuum touched committed shards")
    assert(TrainingShards.read(spark, out, Some(docs.schema)).count() == n)
  }

  test("retain=2 keeps the superseded layout's files for in-flight tailers; " +
    "retain=1 reclaims them and a straggler fails loudly, never silently") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(200)
    TrainingShards.write(docs, out, maxDocsPerShard = 16)
    val oldFiles = partFiles(out)
    val survivor = oldFiles.head
    // compaction RETAINS the superseded layout (lakehouse contract:
    // commits change which files are live, vacuum changes which exist)
    TrainingShards.compact(spark, out, maxDocsPerShard = 128)
    assert(oldFiles.forall(f => Files.exists(Paths.get(out, f))),
      "compaction must retain the superseded layout's files until vacuum")

    // retain=2: the snapshot written at compaction still references the
    // old layout, so a tailer mid-batch on it can finish its files
    val deleted2 = TrainingShards.vacuum(spark, out, retainGenerations = 2)
    assert(deleted2.isEmpty, s"retain=2 must keep snapshot-referenced files, deleted $deleted2")
    assert(Files.exists(Paths.get(out, survivor)))
    val held = spark.read.text(s"$out/$survivor").count() // the in-flight read
    assert(held > 0 && held <= 16)

    // retain=1: only the live layout survives; the straggler's read now
    // FAILS (path gone) instead of serving stale rows
    val deleted1 = TrainingShards.vacuum(spark, out, retainGenerations = 1)
    assert(deleted1.toSet == oldFiles.toSet,
      s"expected the whole superseded layout reclaimed, got $deleted1")
    assert(!Files.exists(Paths.get(out, survivor)))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.text(s"$out/$survivor").count()
    }
    // the live corpus is whole either way
    assert(TrainingShards.read(spark, out, Some(docs.schema)).count() == 200)
    // and any tailer checkpointed on the old layout is already fenced by
    // the generation marker vacuum never touches
    assert(ShardManifest.readGeneration(
      new org.apache.hadoop.fs.Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(out)) == 2L)
  }

  test("snapshots expire with their window: two compactions leave two snapshots, " +
    "vacuum trims to the retention count") {
    val out = freshDir()
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(100)
    TrainingShards.write(docs, out, maxDocsPerShard = 16)
    // the overwrite COMMIT archives the outgoing layout, which runs
    // after compaction's first generation bump: snapshots land at the
    // post-bump generations g1 and g3
    TrainingShards.compact(spark, out, maxDocsPerShard = 32)  // archives g1
    TrainingShards.compact(spark, out, maxDocsPerShard = 64)  // archives g3
    def snapshots() = new java.io.File(out).list()
      .filter(n => n.startsWith("_MANIFEST.g") && n.endsWith(".json")).toSeq.sorted
    assert(snapshots().size == 2, s"expected two archived layouts, got ${snapshots()}")
    TrainingShards.vacuum(spark, out, retainGenerations = 2)
    assert(snapshots() == Seq(ShardManifest.archiveName(3L)),
      s"retain=2 keeps only the newest snapshot, got ${snapshots()}")
    TrainingShards.vacuum(spark, out, retainGenerations = 1)
    assert(snapshots().isEmpty, "retain=1 keeps no snapshots")
    assert(TrainingShards.read(spark, out, Some(docs.schema)).count() == 100)
    intercept[IllegalArgumentException] {
      TrainingShards.vacuum(spark, out, retainGenerations = 0)
    }
  }

  test("truncate and pinned-token replace snapshot what they supersede: " +
    "a crash-orphaned superseded file survives vacuum at retain=2") {
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(64)

    // truncate: the overwrite commit archives the outgoing manifest and
    // RETAINS its files — snapshot-protected until vacuum's window moves
    val out1 = freshDir()
    TrainingShards.write(docs, out1, maxDocsPerShard = 8)
    val truncated = partFiles(out1)
    TrainingShards.write(docs, out1, maxDocsPerShard = 32, mode = "overwrite")
    assert(truncated.forall(f => Files.exists(Paths.get(out1, f))),
      "truncate must retain the superseded layout's files until vacuum")
    assert(TrainingShards.vacuum(spark, out1, retainGenerations = 2).isEmpty,
      "retain=2 must keep truncate-superseded files for in-flight tailers")
    assert(TrainingShards.vacuum(spark, out1, retainGenerations = 1).toSet == truncated.toSet,
      "retain=1 reclaims the superseded layout")

    // pinned-token replace: a replayed job's commit archives the layout
    // holding its previous attempt's shards and retains them likewise
    val out2 = freshDir()
    TrainingShards.write(docs, out2, maxDocsPerShard = 8, jobToken = Some("batch7"))
    val attempt1 = partFiles(out2)
    TrainingShards.write(docs, out2, maxDocsPerShard = 32, jobToken = Some("batch7"))
    assert(attempt1.forall(f => Files.exists(Paths.get(out2, f))),
      "a pinned-token replay must retain the replaced attempt's files until vacuum")
    assert(TrainingShards.vacuum(spark, out2, retainGenerations = 2).isEmpty,
      "retain=2 must keep replace-superseded files for in-flight tailers")
    assert(TrainingShards.vacuum(spark, out2, retainGenerations = 1).toSet == attempt1.toSet)
    assert(TrainingShards.read(spark, out2, Some(docs.schema)).count() == 64)
  }
}
