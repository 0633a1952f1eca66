package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, collect_list, count, explode, expr, lit, lower, map_from_entries, md5, pmod, size, split, struct, to_json, trim, xxhash64}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.TrainingShards

/** The streaming CURATION rung: ingest → exact-dedup → quality floor →
  * training shards, running incrementally — the stream twin of the
  * batch `d16_corpus_curation` keeper chain landing in the
  * `graft-shards` container (`p01` is the batch composition; this is
  * the same head of that pipeline as an unbounded incremental flow).
  *
  * A crawl drop-folder is watched as a file stream; each micro-batch's
  * documents are content-hashed, deduplicated against ALL previously
  * accepted documents (streaming `dropDuplicates` state — one tiny row
  * per distinct content hash, the exact cross-batch guarantee batch
  * reruns get from d01's groupBy), floored on the d16 quality rules,
  * and appended to a shard directory whose manifest merges per commit —
  * so a training loader can read a consistent corpus at any point
  * between batches.
  *
  * State posture at scale: dedup state is one (hash) row per DISTINCT
  * accepted document — the same cardinality the batch keeper aggregate
  * shuffles, held in the state store instead. On a truly unbounded
  * crawl, bound it by re-keying to `dropDuplicatesWithinWatermark` on
  * an ingest-time column (the events twin at [[EventStreams.dedupEvents]]
  * shows the shape); the synthetic documents table carries no ingest
  * timestamp, so the unbounded-state exact form is the faithful twin
  * here and the caveat is this scaladoc.
  */
object DocumentStreams {

  /** Schema of the `documents` table (TESTDATA.md). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  /** File-source stream over a drop-folder of document parquet files.
    * `maxFilesPerTrigger = 1` makes each dropped file its own
    * micro-batch (the spec drives exactly this); offsets live in the
    * checkpoint like the reference's watermark file.
    */
  def readDocumentStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** The incremental curation transform: content-hash exact dedup with
    * cross-batch state plus the d16 quality floors. First arrival wins
    * the dedup — on a mod-time-ordered drop folder that is the earliest
    * file's copy, matching the batch keeper's min-doc_id choice when
    * files arrive in id order.
    */
  def curatedDocuments(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withColumn("n_tokens", size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
      .dropDuplicates("content_hash")
      .filter(col("n_tokens") >= 5 && col("n_chars") >= 20)

  /** Wires the curated stream into the `graft-shards` container: every
    * micro-batch appends its accepted documents as jsonl.gz shards and
    * merges the manifest in the same commit, so the shard directory is
    * readable (and consistent) between any two batches. The batch id
    * pins the write's job token, so a micro-batch REPLAYED after a
    * failure (committed to the sink but not yet to the stream
    * checkpoint) replaces its own earlier shards at commit instead of
    * appending the same documents twice.
    */
  def curatedShardStream(
      docs: DataFrame,
      outDir: String,
      checkpoint: String,
      maxDocsPerShard: Long = 100000L
  ): DataStreamWriter[org.apache.spark.sql.Row] =
    curatedDocuments(docs)
      .drop("content_hash", "n_tokens")
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TrainingShards.write(batch, outDir, maxDocsPerShard = maxDocsPerShard,
          mode = "append", jobToken = Some(f"fb$batchId%06d"))
      }

  /** The same curated stream through the sink's NATIVE streaming write
    * (`TableCapability.STREAMING_WRITE`): no foreachBatch hook — the
    * epoch commit itself merges the manifest, shard names are
    * epoch-scoped so replayed epochs cannot collide, and the directory
    * is a loadable corpus between any two epochs. Use this form when
    * no per-batch side logic is needed; [[curatedShardStream]] shows
    * the foreachBatch hook for when there is (the reference's
    * watermark-write slot).
    */
  /** Streaming heavy hitters: the Misra-Gries summary as CROSS-BATCH
    * state — one ≤k-entry counter map per source lives in the state
    * store, each micro-batch folds its tokens into it with the same
    * update rule the batch aggregate uses
    * ([[graft.functions.MisraGries.updateMap]]), and every batch emits
    * the current candidate set with the tokens-seen total. Because the
    * state is the summary itself, the MG guarantee holds over the
    * stream's ENTIRE history: any token whose frequency across all
    * batches so far exceeds n/(k+1) is present — a token can become
    * heavy cumulatively without ever being heavy within one batch and
    * still surface. State posture: k counters per source, forever —
    * bounded regardless of stream length, the whole point of running a
    * sketch instead of a streaming groupBy(token) whose state grows
    * with vocabulary.
    */
  /** Per-source sketch state: the tokens-seen total (the θ-threshold
    * n/(k+1) needs it) next to the ≤k MG counters.
    */
  case class HeavyHitterState(n: Long, counters: Map[String, Long])

  def streamingHeavyHitters(
      docs: DataFrame, k: Int = 49): org.apache.spark.sql.Dataset[(String, Long, Seq[String])] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.functions.explode
    docs
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HeavyHitterState, (String, Long, Seq[String])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, String)], state: GroupState[HeavyHitterState]) =>
          val prior = state.getOption.getOrElse(HeavyHitterState(0L, Map.empty))
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          prior.counters.foreach { case (t, c) => m.update(t, c) }
          var n = prior.n
          rows.foreach { case (_, tok) =>
            graft.functions.MisraGries.updateMap(m, tok, k)
            n += 1
          }
          state.update(HeavyHitterState(n, m.toMap))
          Iterator((source, n, m.keysIterator.toSeq.sorted))
      }
  }

  /** Streaming per-source token budget — r06's curation cap as an
    * incremental flow: the state store carries one (tokens-admitted,
    * closed) pair per source (forever bounded state), each micro-batch
    * walks its documents in doc_id order and admits while the source's
    * cumulative stays within the budget; later batches resume from the
    * persisted state, so the budget holds across the whole stream, not
    * per batch. Semantics MATCH r06's monotone prefix-sum filter
    * exactly: the first doc whose cumulative would exceed the budget
    * CLOSES the source — it and everything after it are dropped, even
    * smaller docs that would individually still fit. (r06's
    * `cum <= budget` over a monotone running sum is truncation, not
    * greedy skip-and-continue; matching it means the batch cap over a
    * backfill and this streaming cap over the live tail select the
    * SAME documents.) Determinism: the walk order is (batch arrival,
    * doc_id) — arrival order is the stream's time axis; doc_id breaks
    * ties within a batch (the batch's rows are buffered and sorted per
    * source — bounded by batch size; cap batches with
    * maxFilesPerTrigger at scale).
    *
    * Emits the ADMITTED docs with their running cumulative.
    */
  case class BudgetState(consumed: Long, closed: Boolean)

  def streamingTokenBudget(
      docs: DataFrame, budget: Long): org.apache.spark.sql.Dataset[(String, Long, Long, Long)] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    docs
      .select(col("source"), col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, (String, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long, Long)], state: GroupState[BudgetState]) =>
          var st = state.getOption.getOrElse(BudgetState(0L, closed = false))
          val admitted = rows.toSeq.sortBy(_._2).flatMap { case (_, id, nt) =>
            if (!st.closed && st.consumed + nt <= budget) {
              st = st.copy(consumed = st.consumed + nt)
              Some((source, id, nt, st.consumed))
            } else {
              st = st.copy(closed = true)
              None
            }
          }
          state.update(st)
          admitted.iterator
      }
  }

  /** Streaming dedup with BOUNDED state: a Bloom filter per key-space
    * partition instead of `dropDuplicates`' one-row-per-distinct-hash
    * state. The exact rung ([[curatedDocuments]]) is the right default;
    * this is the knob a truly unbounded crawl reaches for when even
    * one tiny row per distinct document is too much state — the classic
    * memory/recall trade:
    *
    *  - a DUPLICATE is always dropped (Bloom filters have no false
    *    negatives), so the zero-dups-admitted guarantee is kept;
    *  - a NOVEL document is wrongly dropped with probability ≤ fpp
    *    (false positive) — bounded data loss, zero duplication;
    *  - state per group is the filter's bit array, sized ONCE from
    *    (expectedItems, fpp) and CONSTANT for the stream's lifetime —
    *    `state_bytes` is emitted with every row so a monitor (and the
    *    spec) can see it not growing. Size expectedItems to the
    *    anticipated distinct count per group or fpp degrades.
    *
    * Documents route to one of `groups` state partitions by their
    * content hash, so every copy of a document — whatever batch it
    * arrives in — meets the same filter. Uses Spark's own
    * `util.sketch.BloomFilter` (the q50 sketch) serialized into the
    * state store. Within a batch the group walks rows in doc_id order
    * (the budget rung's determinism rule).
    */
  case class BloomDedupState(bytes: Array[Byte], admitted: Long)

  def streamingBloomDedup(
      docs: DataFrame,
      groups: Int = 8,
      expectedItems: Long = 100000L,
      fpp: Double = 0.01): org.apache.spark.sql.Dataset[(Int, Long, Long, Int)] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.util.sketch.BloomFilter
    docs
      .withColumn("content_hash", md5(col("text")))
      .select(col("content_hash"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey { case (hash, _) => math.floorMod(hash.hashCode, groups) }
      .flatMapGroupsWithState[BloomDedupState, (Int, Long, Long, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: Int, rows: Iterator[(String, Long)], state: GroupState[BloomDedupState]) =>
          val bloom = state.getOption match {
            case Some(st) => BloomFilter.readFrom(new java.io.ByteArrayInputStream(st.bytes))
            case None => BloomFilter.create(expectedItems, fpp)
          }
          var admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).flatMap { case (hash, id) =>
            if (bloom.mightContain(hash)) None
            else {
              bloom.put(hash)
              admitted += 1
              Some((group, id, admitted, 0)) // state size patched below
            }
          }
          val ser = new java.io.ByteArrayOutputStream()
          bloom.writeTo(ser)
          val bytes = ser.toByteArray
          state.update(BloomDedupState(bytes, admitted))
          out.map { case (g, id, cum, _) => (g, id, cum, bytes.length) }.iterator
      }
  }

  /** Deterministic hashed bag-of-words featurizer: token `t` adds 1 to
    * bucket `xxhash64(t) mod dim`, yielding a `dim`-wide float vector
    * per document — the doc→vector seam of the streaming index loop
    * (ingest → curate → shard → tail → upsert). It is a STAND-IN with
    * the real pipeline shape: one narrow explode + two map-side-
    * combinable aggregates, no UDF, byte-stable across runs (the
    * multimodal-stub posture — production swaps in a learned encoder
    * behind the same (doc_id, text) ⇒ (vec_id, embedding) contract,
    * and nothing downstream changes). Cosine over these vectors is
    * lexical similarity, which is exactly what the loop's drift metric
    * wants to watch move.
    */
  def hashedEmbeddings(docs: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 2, s"embedding dim must be >= 2, got $dim")
    docs
      .select(col("doc_id").as("vec_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .groupBy(col("vec_id"), pmod(xxhash64(col("tok")), lit(dim.toLong)).cast("int").as("b"))
      .agg(count(lit(1)).cast("float").as("c"))
      .groupBy("vec_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"))
      .select(col("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), i -> coalesce(element_at(m, i), CAST(0.0 AS FLOAT)))")
          .as("embedding"))
  }

  def curatedShardStreamNative(
      docs: DataFrame,
      outDir: String,
      checkpoint: String,
      maxDocsPerShard: Long = 100000L
  ): DataStreamWriter[org.apache.spark.sql.Row] = {
    val curated = curatedDocuments(docs).drop("content_hash", "n_tokens")
    curated
      .select(to_json(struct(curated.columns.map(col): _*)).as("line"))
      .writeStream
      .format("graft-shards")
      .option("path", outDir)
      .option("maxDocsPerShard", maxDocsPerShard.toString)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
  }
}
