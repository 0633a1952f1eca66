package graft.streaming

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming surface driven synchronously: parquet file source ->
  * watermarked windows / stateful dedup -> memory or foreachBatch sink.
  */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Stage the events table as a stream-watchable directory (the nanos
    * source table is converted once to micros parquet).
    */
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("events-stream").toString
    graft.ops.Tables.t(spark, sfDir, "events").repartition(4).write.mode("overwrite").parquet(d)
    d
  }

  test("tumbling window stream matches the batch q30 aggregation") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 2)
    val q = EventStreams
      .tumblingCounts(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("tumbling_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark
      .table("tumbling_out")
      .agg(sum("n").cast("long").as("total"))
      .head()
      .getLong(0)
    val batch = graft.ops.Tables.t(spark, sfDir, "events").count()
    // Append mode emits only windows the watermark has passed; the final
    // (unclosed) windows stay in state. Everything emitted must agree with
    // batch counts per window.
    val batchWindows = graft.ops.Tables
      .t(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val emitted = spark.table("tumbling_out").select("window_start", "event_type", "n")
    val mismatches = emitted
      .join(batchWindows, Seq("window_start", "event_type"), "left")
      .filter(emitted("n") =!= batchWindows("n"))
      .count()
    assert(mismatches == 0)
    assert(streamed > 0 && streamed <= batch)
  }

  test("flatMapGroupsWithState transitions match the batch q92 counts across a batch boundary") {
    // Two TIME-split files (every row of file 0 precedes every row of
    // file 1) fed one per micro-batch: per-user order is preserved and
    // at least one transition must span the batch boundary via state.
    val d = Files.createTempDirectory("events-transitions").toString
    val ev = graft.ops.Tables.t(spark, sfDir, "events")
    val cut = ev.selectExpr("percentile(cast(ts as double), 0.5)").head().getDouble(0)
    ev.filter(col("ts").cast("double") <= cut).coalesce(1).write.parquet(s"$d/b0")
    ev.filter(col("ts").cast("double") > cut).coalesce(1).write.parquet(s"$d/b1")
    val staged = Files.createTempDirectory("events-transitions-feed").toString
    // stage in lexical order so the file source picks b0 before b1
    Files.list(java.nio.file.Paths.get(s"$d/b0")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(staged, "0-" + p.getFileName))
    }
    Files.list(java.nio.file.Paths.get(s"$d/b1")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(staged, "1-" + p.getFileName))
    }
    // FileStreamSource orders by modification time: pin b0 strictly first
    Files.list(java.nio.file.Paths.get(staged)).forEach { p =>
      val early = p.getFileName.toString.startsWith("0-")
      p.toFile.setLastModified(if (early) 1000000000000L else 1000000100000L)
    }
    val events = EventStreams.readEventStream(spark, staged, maxFilesPerTrigger = 1)
    val q = EventStreams.eventTransitions(spark, events)
      .writeStream.outputMode("append").format("memory").queryName("transitions_out").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("transitions_out")
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val batch = graft.ops.EventOps.queries("q92_event_transitions")(spark, sfDir)
      .select(col("from_type"), col("to_type"), col("n").as("n_batch"))
    val joined = streamed.join(batch, Seq("from_type", "to_type"), "full_outer")
    assert(joined.filter(col("n").isNull || col("n_batch").isNull || col("n") =!= col("n_batch"))
      .count() == 0, "streamed transition counts diverge from the batch window query")
    // the boundary really was crossed: more transitions than any single batch could emit alone
    val nUsers = ev.select("user_id").distinct().count()
    val total = spark.table("transitions_out").count()
    assert(total == ev.count() - nUsers, "every consecutive pair must be emitted exactly once")
  }

  test("eventTransitionsOrdered: exact event-time parity on an OUT-OF-ORDER cross-batch feed") {
    import spark.implicits._
    // Hand-built feed where arrival order ≠ event-time order across a
    // batch boundary — the case the simple arrival-order variant
    // miscounts (its parity is a feed-contract property):
    //   batch 1: A@10:00, B@11:00           (wm after: 10:30)
    //   batch 2: C@10:40 (OUT OF ORDER), D@12:30   (wm after: 12:00)
    //   batch 3: E@13:30                    (wm after: 13:00)
    // Event-time chain: A C B D E. The ordered operator must emit
    // exactly the transitions among events at or below the final
    // watermark (13:00): A→C, C→B, B→D — with C sorted BEFORE B even
    // though it arrived a batch later. Arrival order would have said
    // A→B, B→C.
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val b1 = Seq((1L, ts(10, 0), 1L, "A", 0.0, "{}"), (1L, ts(11, 0), 2L, "B", 0.0, "{}"))
    val b2 = Seq((1L, ts(10, 40), 3L, "C", 0.0, "{}"), (1L, ts(12, 30), 4L, "D", 0.0, "{}"))
    val b3 = Seq((1L, ts(13, 30), 5L, "E", 0.0, "{}"))
    val feed = Files.createTempDirectory("events-ooo-feed").toString
    Seq(b1, b2, b3).zipWithIndex.foreach { case (rows, i) =>
      val scratch = Files.createTempDirectory(s"events-ooo-$i").toString
      rows.toDF("user_id", "ts", "event_id", "event_type", "value", "props")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(feed, s"b$i.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 100000L)
    }
    val events = EventStreams.readEventStream(spark, feed, maxFilesPerTrigger = 1)
    val q = EventStreams.eventTransitionsOrdered(spark, events)
      .writeStream.outputMode("append").format("memory").queryName("ordered_transitions_out").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("ordered_transitions_out")
      .select("from_type", "to_type").as[(String, String)].collect().toSeq.sorted
    assert(streamed == Seq(("A", "C"), ("B", "D"), ("C", "B")),
      s"ordered transitions diverged from the event-time chain: $streamed")
  }

  test("stateful dedup emits at most one row per key") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 2)
    val q = EventStreams
      .dedupEvents(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val out = spark.table("dedup_out")
    assert(out.count() > 0)
    assert(out.groupBy("user_id", "event_type").count().filter(col("count") > 1).count() == 0)
  }

  test("foreachBatch sink sees every micro-batch exactly once (AvailableNow)") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 1)
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = EventStreams
      .foreachBatchSink(events.groupBy("event_type").count(), checkpoint) { (df, id) =>
        seen.put(id, df.count())
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(seen.size() >= 1)
    assert(seen.values().stream().allMatch(_ > 0))
  }

  test("mapGroupsWithState: running totals accumulate across micro-batches") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 1)
    val q = EventStreams
      .runningUserStats(spark, events)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stats_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // the LAST emitted row per user must equal the batch totals
    val out = spark.table("stats_out")
    val finalPerUser = out
      .groupBy("user_id")
      .agg(max("n_events").as("n_events")) // counts only grow
    val batch = graft.ops.Tables
      .t(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("expected"))
    val bad = finalPerUser
      .join(batch, "user_id")
      .filter(col("n_events") =!= col("expected"))
      .count()
    assert(bad == 0)
  }

  test("session windows cover all events for a sampled user") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 2)
    val q = EventStreams
      .sessionCounts(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("session_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // Emitted (closed) sessions must never over-count a user's events.
    val out = spark.table("session_out")
    val perUserStream = out.groupBy("user_id").agg(sum("n_events").as("streamed"))
    val perUserBatch = graft.ops.Tables
      .t(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("batch"))
    val over = perUserStream
      .join(perUserBatch, "user_id")
      .filter(col("streamed") > col("batch"))
      .count()
    assert(over == 0)
  }

  test("stream-stream interval join emits exactly the batch q47 attribution pairs") {
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 2)
    val q = EventStreams
      .clickAttribution(events)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("attrib_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // An INNER stream-stream join within the interval bound emits each
    // matched pair exactly once regardless of arrival order; on a bounded
    // input it must equal the batch interval join.
    val streamed = spark
      .table("attrib_out")
      .select("user_id", "click_id", "purchase_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = graft.SparkEntry
      .queries("q47_interval_join")(spark, sfDir)
      .select("user_id", "click_id", "purchase_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(batch.nonEmpty, "fixture produced no attribution pairs")
    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size} diff=${(streamed diff batch).take(5)}")
  }

  test("stream-static enrichment joins every event to its dim row with zero stream state") {
    val dim = spark.range(0, 1000).select(
      col("id").as("user_id"),
      (col("id") % 25).as("nation_key")
    )
    val events = EventStreams.readEventStream(spark, streamDir, maxFilesPerTrigger = 2)
    val q = EventStreams
      .enrichWithDim(events, dim, "user_id")
      .select("event_id", "user_id", "nation_key")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enrich_out")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val enriched = spark.table("enrich_out")
    val nEvents = graft.ops.Tables.t(spark, sfDir, "events").count()
    assert(enriched.count() == nEvents, "every event must be enriched exactly once")
    assert(
      enriched.filter(col("nation_key") =!= col("user_id") % 25).count() == 0,
      "enrichment must carry the matching dim row"
    )
    // Zero stateful operators: enrichment must not accumulate stream state.
    val progress = q.lastProgress
    assert(progress == null || progress.stateOperators.isEmpty || progress.stateOperators.forall(_.numRowsTotal == 0))
  }
}
