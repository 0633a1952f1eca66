package graft.streaming

import graft.SparkSpec
import graft.ops.{IvfIndex, Tables}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deletes in the live IVF index — the churn story s24's upserts left
  * open. Contracts pinned here:
  *
  *  1. merge-on-read, LAST WRITER WINS by epoch: a tombstone kills
  *     same-id rows from the base and from batches at-or-before it; a
  *     re-upsert in a LATER epoch resurfaces the id — and the cluster
  *     partition prune survives the anti-join (in-plan check);
  *  2. tombstone replay is idempotent (overwrite-own-partition, the
  *     upsert channel's contract applied to deletes);
  *  3. a mixed upsert+delete STREAM applies both sides of each epoch
  *     ([[IndexStreams.streamingIvfUpsertWithDeletes]]), and unknown
  *     ops fail loudly;
  *  4. compaction folds base + upserts − tombstones into a fresh
  *     generation with EXACTLY one row per id, search results are
  *     row-identical before and after, the marker advances, and replay
  *     is idempotent;
  *  5. vacuum retention: retain=2 keeps the previous generation for
  *     in-flight readers; retain=1 reclaims it plus the consumed
  *     batch dirs, and search still serves the compacted corpus.
  */
class IndexTombstoneSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Base = vec_id >= 100; batches 0/1 stream in 0..99; batch 2 deletes
    * 1,2,3 (streamed) + 105 (base); batch 3 re-upserts 1.
    */
  private def churnedIndex(): (org.apache.spark.sql.DataFrame, String, Array[Float]) = {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-ivf-tomb-spec").toString
    IvfIndex.build(emb.filter(col("vec_id") >= 100), idxDir, k = 16, iters = 2)
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") < 50), 0L, idxDir, cents)
    IndexStreams.upsertBatch(
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100), 1L, idxDir, cents)
    IndexStreams.tombstoneBatch(spark, Seq(1L, 2L, 3L, 105L), 2L, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") === 1L), 3L, idxDir, cents)
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    (emb, idxDir, qe)
  }

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("merge-on-read LWW: deleted base and stream ids vanish, a later re-upsert " +
    "resurfaces, and the partition prune survives the anti-join") {
    val (emb, idxDir, qe) = churnedIndex()
    // search wide enough to see everything: k = corpus size
    val all = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16)
    val ids = topIds(all).toSet
    assert(!ids.contains(2L) && !ids.contains(3L), "deleted streamed ids still served")
    assert(!ids.contains(105L), "deleted base id still served")
    assert(ids.contains(1L), "re-upserted id did not resurface")
    assert(topIds(all).size == ids.size, "duplicate rows served for one vec_id")
    // prune intact on a narrow search
    val narrow = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 4,
      excludeId = Some(0L))
    val plan = narrow.queryExecution.executedPlan.toString
    // LWW-before-prune plan shape: the corpus-scale BASE scan keeps the
    // partition-level cluster prune; the bounded channel is scanned whole
    // (a re-upsert may have moved a vector between cells, so pruning it
    // pre-LWW could serve a stale base row) and the probe prune re-applies
    // AFTER the max_by merge as a struct-field filter.
    val inLists = "cluster#\\d+L? IN \\(([^)]*)\\)".r.findAllMatchIn(plan).toSeq
    assert(inLists.nonEmpty, s"expected cluster IN prune on the base scan:\n$plan")
    assert("\\.cluster IN \\(".r.findFirstIn(plan).nonEmpty,
      s"expected the post-LWW probe prune on the merged view:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"tombstone merge must broadcast, not shuffle:\n$plan")
  }

  test("upsert-over-upsert without an intervening tombstone serves the id ONCE, " +
    "by its latest version") {
    val (emb, idxDir, qe) = churnedIndex()
    // vec 10 was upserted in batch 0; land it again in batch 4 with a
    // DIFFERENT embedding (vec 200's), no tombstone in between
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    val moved = emb.filter(col("vec_id") === 200L)
      .select(lit(10L).as("vec_id"), col("embedding"), col("label"))
    IndexStreams.upsertBatch(moved, 4L, idxDir, cents)
    val all = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16)
    val rows = all.collect()
    assert(rows.count(_.getLong(0) == 10L) <= 1,
      "re-upserted id served twice — LWW must resolve upsert-over-upsert")
    // the served score must be the LATEST embedding's (vec 200's), not batch 0's
    val got10 = rows.collectFirst { case r if r.getLong(0) == 10L => r.getDouble(1) }
    val got200 = rows.collectFirst { case r if r.getLong(0) == 200L => r.getDouble(1) }
    assert(got10.nonEmpty, "re-upserted id 10 not served at all")
    assert(got10 == got200,
      s"id 10 served at stale score $got10, its latest (vec-200) version scores $got200")
  }

  test("tombstone replay is idempotent: re-landing batch 2 changes nothing") {
    val (_, idxDir, qe) = churnedIndex()
    val before = topIds(IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16))
    IndexStreams.tombstoneBatch(spark, Seq(1L, 2L, 3L, 105L), 2L, idxDir)
    val after = topIds(IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16))
    assert(before == after, "tombstone replay changed the served corpus")
    assert(spark.read.parquet(s"$idxDir/tombstones").count() == 4L,
      "replay appended tombstones instead of overwriting its own batch")
  }

  test("a mixed upsert+delete stream applies both sides per epoch; unknown ops fail loudly") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-ivf-ops").toString
    val drop = Files.createTempDirectory("graft-ivf-ops-drop").toString
    val ckpt = Files.createTempDirectory("graft-ivf-ops-ckpt").toString
    IvfIndex.build(emb.filter(col("vec_id") >= 100), idxDir, k = 16, iters = 2)
    // one file = one epoch: upserts 0..49 AND a delete of base id 105
    emb.filter(col("vec_id") < 50)
      .select(lit("upsert").as("op"), col("vec_id"), col("embedding"), col("label"))
      .unionByName(emb.filter(col("vec_id") === 105L)
        .select(lit("delete").as("op"), col("vec_id"), col("embedding"), col("label")))
      .coalesce(1).write.mode("append").parquet(drop)
    val q = IndexStreams.streamingIvfUpsertWithDeletes(
      IndexStreams.readOpsStream(spark, drop), idxDir, ckpt).start()
    q.processAllAvailable(); q.stop()
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val ids = topIds(IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16)).toSet
    assert(ids.contains(5L), "streamed upsert not served")
    assert(!ids.contains(105L), "streamed delete not applied")
    // unknown op: loud
    val badDrop = Files.createTempDirectory("graft-ivf-bad-drop").toString
    val badCkpt = Files.createTempDirectory("graft-ivf-bad-ckpt").toString
    emb.filter(col("vec_id") === 7L)
      .select(lit("upsort").as("op"), col("vec_id"), col("embedding"), col("label"))
      .coalesce(1).write.mode("append").parquet(badDrop)
    val qb = IndexStreams.streamingIvfUpsertWithDeletes(
      IndexStreams.readOpsStream(spark, badDrop), idxDir, badCkpt).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qb.processAllAvailable()
    }
    qb.stop()
    assert(e.getMessage.contains("unknown op") || Option(e.getCause).exists(_.getMessage.contains("unknown op")),
      s"expected a loud unknown-op failure, got: ${e.getMessage}")
  }

  test("a DELETE-ONLY epoch leaves no empty stream partition behind and search " +
    "still works (the schema-inference trap)") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-ivf-delonly").toString
    val drop = Files.createTempDirectory("graft-ivf-delonly-drop").toString
    val ckpt = Files.createTempDirectory("graft-ivf-delonly-ckpt").toString
    IvfIndex.build(emb, idxDir, k = 16, iters = 2)
    // one epoch holding ONLY deletes
    emb.filter(col("vec_id") === 105L)
      .select(lit("delete").as("op"), col("vec_id"), col("embedding"), col("label"))
      .coalesce(1).write.mode("append").parquet(drop)
    val q = IndexStreams.streamingIvfUpsertWithDeletes(
      IndexStreams.readOpsStream(spark, drop), idxDir, ckpt).start()
    q.processAllAvailable(); q.stop()
    assert(!new java.io.File(s"$idxDir/stream_assignment").exists() ||
      new java.io.File(s"$idxDir/stream_assignment").list().forall(!_.startsWith("batch=")) ||
      new java.io.File(s"$idxDir/stream_assignment").listFiles()
        .filter(_.getName.startsWith("batch=")).forall(_.list().exists(_.endsWith(".parquet"))),
      "a rowless batch partition was written")
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val ids = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 600, nprobe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && !ids.contains(105L), "delete-only epoch not applied or search broke")
  }

  test("compaction: fresh generation holds exactly one row per live id, search is " +
    "row-identical across it, the marker advances, and replay is idempotent") {
    val (emb, idxDir, qe) = churnedIndex()
    val before = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 6,
      excludeId = Some(0L)).collect().map(_.toString).toSeq
    assert(IvfIndex.readLiveState(spark, idxDir) == IvfIndex.LiveState(0L, -1L))
    val st1 = IvfIndex.compactLiveIndex(spark, idxDir)
    assert(st1 == IvfIndex.LiveState(1L, 3L), s"unexpected post-compact state $st1")
    val gen1 = spark.read.parquet(IvfIndex.liveBaseDir(idxDir, 1L))
    assert(gen1.count() == gen1.select("vec_id").distinct().count(),
      "compacted generation holds duplicate ids")
    val genIds = gen1.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!genIds.contains(2L) && !genIds.contains(105L) && genIds.contains(1L))
    val after = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 6,
      excludeId = Some(0L)).collect().map(_.toString).toSeq
    assert(before == after, s"compaction changed search results\nbefore: $before\nafter:  $after")
    // nothing pending => compaction is a no-op returning the same state
    assert(IvfIndex.compactLiveIndex(spark, idxDir) == st1)
  }

  test("vacuum retention: retain=2 keeps the previous generation; retain=1 reclaims " +
    "it plus the consumed batch dirs and search still serves the compacted corpus") {
    val (emb, idxDir, qe) = churnedIndex()
    val before = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 6,
      excludeId = Some(0L)).collect().map(_.toString).toSeq
    IvfIndex.compactLiveIndex(spark, idxDir)
    val kept = IvfIndex.vacuumLiveIndex(spark, idxDir, retainGenerations = 2)
    assert(kept.forall(n => !n.startsWith("assignment")),
      s"retain=2 must keep the previous generation, deleted $kept")
    assert(new java.io.File(s"$idxDir/assignment").exists(), "gen 0 gone at retain=2")
    val gone = IvfIndex.vacuumLiveIndex(spark, idxDir, retainGenerations = 1)
    assert(gone.contains("assignment"), s"retain=1 must reclaim gen 0, deleted $gone")
    assert(!new java.io.File(s"$idxDir/assignment").exists())
    // consumed channels reclaimed by the retain=2 pass already
    assert(!new java.io.File(s"$idxDir/stream_assignment/batch=0").exists())
    assert(!new java.io.File(s"$idxDir/tombstones/batch=2").exists())
    val after = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 6,
      excludeId = Some(0L)).collect().map(_.toString).toSeq
    assert(before == after, "vacuum changed what search serves")
    intercept[IllegalArgumentException] {
      IvfIndex.vacuumLiveIndex(spark, idxDir, retainGenerations = 0)
    }
  }
}
