package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Tables.t

/** The end-to-end curation PIPELINE — the composition proof that the
  * operator library works as one data flow, not as isolated queries.
  *
  * A training-data recipe runs its curation stages over ONE corpus
  * read: parse/fingerprint once, then dedup → quality floor →
  * decontamination → per-source budget → sequence packing, each stage
  * consuming the previous stage's survivors. `p01_curation_pipeline`
  * wires the repo's own stage kernels together exactly that way:
  *
  *   stage 0  raw        the corpus as read
  *   stage 1  dedup      exact-dedup keepers (d01: min doc_id per
  *                       content hash, aggregate — never a hash window)
  *   stage 2  quality    the d36 Gopher-style floors (wc/mwl/stopword/
  *                       top-token-share)
  *   stage 3  decontam   d15's 8-gram overlap against the held-out set
  *                       (doc_id % 97 == 0), eval members removed too
  *   stage 4  budget     r06's per-source token budget walked in
  *                       deterministic md5 order (chunked two-phase
  *                       prefix sum — never a per-source window)
  *   stage 5  pack       d13's contiguous 512-token bins per source
  *
  * ONE SCAN: the per-doc feature frame (hash, token stats, 8-gram
  * array) is computed in a single narrow pass over `documents` and
  * `localCheckpoint`ed — the "materialize the tokenized corpus once"
  * step every production recipe has. Every stage then reads the
  * checkpointed RDD: the final plan contains ZERO parquet scans
  * (PipelineSpec pins this), where the naive composition would re-parse
  * the corpus ~6 times. Size posture: the checkpoint (dominated by the
  * ~8x-text 8-gram arrays) is MEMORY_AND_DISK — localCheckpoint's
  * storage level — so oversized partitions spill rather than OOM; at
  * 100 TB the same materialization points at a shard store / durable
  * checkpoint dir instead of executor-local disk, and the stage
  * dataflow is unchanged.
  *
  * Output: one row per stage — (stage, stage_name, n_docs, n_tokens,
  * n_bins) — the survivor ledger a curation run reports. The DuckDB
  * oracle replays all six stages as chained CTEs.
  */
object PipelineOps {

  /** d13's packing budget (tokens per training sequence bin). */
  val PackBudget = 512L

  /** Per-source token budget for the pipeline's stage 4. Larger than
    * r06's 800 so the walk keeps a meaningful slice of each source
    * after three upstream filters.
    */
  val PipelineTokenBudget = 5000L

  private def tokens(c: Column) = split(lower(trim(c)), "\\s+")

  /** The one-pass per-document feature frame: everything downstream
    * stages need — content hash, token count, the d36 quality stats
    * (computed IN ROW with array lambdas: no explode+agg, no shuffle),
    * and the 8-gram array for decontamination. The single place the
    * pipeline touches `text`.
    */
  def featureFrame(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"), col("source"),
        md5(col("text")).as("content_hash"),
        tokens(col("text")).as("t"))
      .select(
        col("doc_id"), col("source"), col("content_hash"),
        size(col("t")).cast("long").as("n_tokens"),
        round(expr("aggregate(t, 0L, (acc, x) -> acc + length(x))").cast("double") /
          size(col("t")), 4).as("mwl"),
        size(array_intersect(array_distinct(col("t")), array(lit("the"), lit("a"))))
          .cast("long").as("n_stop"),
        round(expr("array_max(transform(array_distinct(t), u -> size(filter(t, x -> x = u))))")
          .cast("double") / size(col("t")), 4).as("top_share"),
        when(size(col("t")) >= 8,
          expr("transform(sequence(1, size(t) - 7), i -> array_join(slice(t, i, 8), ' '))"))
          .otherwise(array().cast("array<string>")).as("g8"))

  /** Runs the six-stage pipeline over an eagerly-materialized feature
    * frame and returns the per-stage survivor ledger.
    */
  def curate(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // One corpus pass: the documents table is a single parquet split at
    // test SFs, so spread the (lambda-heavy) feature projection first.
    // SIZE-derived spread, not repartition(cores): the checkpoint pins
    // this partitioning for every downstream stage, and a hard 32-way
    // fan-out of a tiny input was this family's 8c/32c anti-scaling
    // (p01 ratio 0.57 in the r18 driver scaling block).
    val feat = featureFrame(docs.repartition(graft.SessionTuning.spreadParts(docs)))
      .localCheckpoint()

    // stage 1 — exact-dedup keepers. The keeper id set is an aggregate
    // (min per hash): map-side combinable and AQE-skew-splittable where
    // a window over content_hash would serialize a hot hash's whole
    // group into one task (the d16 rationale).
    val keeperIds = feat.groupBy("content_hash").agg(min(col("doc_id")).as("doc_id"))
    val s1 = feat.join(keeperIds, Seq("doc_id"), "left_semi")

    // stage 2 — d36 quality floors over the keepers.
    val s2 = s1.filter(
      col("n_tokens") >= 20 && col("mwl") >= 3.0 && col("mwl") <= 4.5 &&
        col("n_stop") >= 2 && col("top_share") <= 0.12)

    // stage 3 — decontamination: drop held-out members and any training
    // doc sharing an 8-gram with them. The eval gram set is tiny and
    // broadcasts (the d15 shape).
    val evalGrams = feat.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(explode(col("g8")).as("g")).distinct()
    val train = s2.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val contaminated = train
      .select(col("doc_id"), explode(col("g8")).as("g"))
      .join(broadcast(evalGrams), "g")
      .select("doc_id").distinct()
    // stage-3 frontier materialized ONCE: three ledger branches (3, 4,
    // 5/pack) otherwise re-run the gram-explode anti-join chain each —
    // the profiled bulk of this query (guide §3.3: materialize the
    // intermediate instead of letting a wide plan recompute it)
    val s3 = train.join(contaminated, Seq("doc_id"), "left_anti").localCheckpoint()

    // stage 4 — per-source budget in deterministic md5 order: the r06
    // chunked two-phase prefix sum (md5-prefix chunks are contiguous in
    // the order key; never a window partitioned by `source` alone).
    val ordered = s3
      .withColumn("ord", md5(col("doc_id").cast("string")))
      .withColumn("chunk", substring(col("ord"), 1, 2))
    val s4 = PrefixOps
      .chunkedCumSum(ordered, "source", "chunk", Seq("ord", "doc_id"), "n_tokens", "cum")
      .filter(col("cum") <= PipelineTokenBudget)
      .select("doc_id", "source", "n_tokens")

    // stage 5 — contiguous packing (d13): bins per source in doc_id
    // order over the budgeted survivors, via the chunked prefix sum.
    val packed = PrefixOps
      .partitionedCumSum(s4, "source", Seq("doc_id"), "n_tokens", "pcum")
      .withColumn("bin_id", floor((col("pcum") - col("n_tokens")) / lit(PackBudget)))

    def ledger(stage: Int, name: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"), lit(0L).as("n_bins"))
    val packRow = packed.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
      countDistinct(col("source"), col("bin_id")).as("n_bins"))
      .select(lit(5).as("stage"), lit("pack").as("stage_name"),
        col("n_docs"), col("n_tokens"), col("n_bins"))

    ledger(0, "raw", feat)
      .unionByName(ledger(1, "dedup", s1))
      .unionByName(ledger(2, "quality", s2))
      .unionByName(ledger(3, "decontam", s3))
      .unionByName(ledger(4, "budget", s4))
      .unionByName(packRow)
      .orderBy("stage")
  }

  /** Per-registered-domain token budget for the p03 web pipeline's
    * stage 4 (domains hold ~5 docs of ~56 tokens after three upstream
    * stages; 150 keeps a meaningful 2-3 doc slice of each).
    */
  val DomainTokenBudget = 150L

  /** The WEB-side composition (p03): the same one-scan discipline as
    * [[curate]], but the stages are the round-11 crawl operators —
    * URL-canonical dedup, domain blocklist, Kneser-Ney quality floor,
    * per-DOMAIN token budget. One narrow pass computes the URL
    * canonicalization (the w05 kernel via [[WebOps.urlFrame]]) plus
    * the token array, localCheckpointed; the KN stage's count tables
    * are then aggregated from the SURVIVING docs (quality models in
    * production recipes are fit on the post-dedup corpus — fitting on
    * the raw corpus would let boilerplate mass skew the LM), and the
    * budget walk is the r06 chunked two-phase prefix sum keyed on
    * registered_domain — never a per-domain window.
    *
    *   stage 0  raw        the corpus as read
    *   stage 1  canonical  keep min doc_id per canonical URL (the
    *                       fetch-dedup a crawl frontier does)
    *   stage 2  blocklist  drop blocklisted registered domains
    *   stage 3  kn_floor   interpolated Kneser-Ney avg logprob ≥ -3.4
    *                       (tables fit on stage-2 survivors)
    *   stage 4  budget     ≤ 150 tokens per registered domain in
    *                       deterministic md5 order
    */
  def curateWeb(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // size-derived spread (see curate's note; p03's r18 ratio was 0.52)
    val feat = WebOps.urlFrame(docs.repartition(graft.SessionTuning.spreadParts(docs)))
      .select(
        col("doc_id"), col("source"), col("canonical_url"), col("registered_domain"),
        tokens(col("text")).as("t"))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .localCheckpoint()

    // stage 1 — canonical-URL keepers (aggregate min, never a window:
    // a hot canonical URL — a portal page mirrored across the crawl —
    // would serialize its whole group into one task)
    val keepers = feat.groupBy("canonical_url").agg(min(col("doc_id")).as("doc_id"))
    val s1 = feat.join(keepers, Seq("doc_id"), "left_semi")

    // stage 2 — registered-domain blocklist
    val s2 = s1.filter(!col("registered_domain").isin(WebOps.DomainBlocklist: _*))

    // stage 3 — Kneser-Ney floor, tables fit on the survivors (d55's
    // kernel over the checkpointed token arrays — no parquet re-scan)
    val docBg = s2
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), col("t"), expr("explode(sequence(1, size(t) - 1)) AS i"))
      .selectExpr("doc_id", "t[i - 1] AS a", "t[i] AS b")
    val bg = docBg.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val ctx = bg.groupBy("a").agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1p_left"))
    val cont = bg.groupBy("b").agg(count(lit(1)).as("n1p_right"))
    val totals = bg.agg(count(lit(1)).as("btypes"))
    val kn = docBg
      .join(bg, Seq("a", "b")).join(ctx, "a").join(cont, "b")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        log((col("c_ab") - lit(0.75)) / col("c_a") +
          lit(0.75) * col("n1p_left") / col("c_a") * (col("n1p_right") / col("btypes"))).as("logp"))
      .groupBy("doc_id").agg(round(avg(col("logp")), 6).as("kn"))
    // stage-3 frontier materialized ONCE: the ledger's stage-3 and
    // stage-4 branches otherwise re-run the whole KN fit (bigram
    // explode + three shuffle joins) each — the profiled bulk of this
    // query (guide §3.3)
    val s3 = s2.join(kn.where(col("kn") >= -3.4), Seq("doc_id"), "left_semi")
      .localCheckpoint()

    // stage 4 — per-domain budget via the chunked two-phase prefix sum
    val ordered = s3
      .withColumn("ord", md5(col("doc_id").cast("string")))
      .withColumn("chunk", substring(col("ord"), 1, 2))
    val s4 = PrefixOps
      .chunkedCumSum(ordered, "registered_domain", "chunk", Seq("ord", "doc_id"), "n_tokens", "cum")
      .filter(col("cum") <= DomainTokenBudget)

    def ledger(stage: Int, name: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))

    ledger(0, "raw", feat)
      .unionByName(ledger(1, "canonical", s1))
      .unionByName(ledger(2, "blocklist", s2))
      .unionByName(ledger(3, "kn_floor", s3))
      .unionByName(ledger(4, "budget", s4))
      .orderBy("stage")
  }

  /** p04's DROP list: w06's pattern list minus the bare unigram
    * "vector" — w06 COUNTS occurrences (any frequency is fine there);
    * p04 DROPS the document, and a common single word would gate out
    * 80% of this corpus, leaving the downstream budget stage vacuous.
    * Real drop-blocklists are multi-word phrases for exactly this
    * reason.
    */
  private[ops] val PhraseDropList = WebOps.BlockPatterns.filterNot(_ == "vector")

  /** Per-source token budget for p04's stage 3 (phrase survivors carry
    * ~500-1100 tokens per source at the gate SFs; 600 binds on most
    * sources without emptying any).
    */
  val PhraseTokenBudget = 600L

  /** The PHRASE-blocklist composition (p04): w06's Aho–Corasick
    * automaton as a pipeline STAGE rather than a standalone scan.
    * r03/p03 block at token/domain equality; real badword and
    * boilerplate lists are substring semantics ("rt win" must match
    * inside "...sort window..."), and at curation time the right
    * granularity is drop-the-document. The automaton builds once on
    * the driver (KBs even for 10k-phrase lists), ships with the task
    * closure, and the scan is ONE narrow typed pass over the
    * checkpointed dedup survivors — early-exit per document, no
    * shuffle, O(total text) however long the list grows, where a
    * per-pattern contains() loop would re-scan every document per
    * pattern. Stage order mirrors production recipes: dedup first (no
    * point scanning copies), then the content gate, then the budget.
    *
    *   stage 0  raw           the corpus as read
    *   stage 1  dedup         keep min doc_id per content hash
    *   stage 2  phrase_block  drop docs containing ANY blocklisted
    *                          phrase (substring, cross-word included)
    *   stage 3  budget        ≤ 600 tokens per source in
    *                          deterministic md5 order
    */
  def curatePhrases(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ac = graft.functions.AhoCorasick.build(PhraseDropList)
    // size-derived spread (see curate's note; p04's r18 ratio was 0.43)
    val feat = docs
      .repartition(graft.SessionTuning.spreadParts(docs))
      .select(
        col("doc_id"), col("source"), col("text"),
        md5(col("text")).as("content_hash"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .localCheckpoint()

    // stage 1 — exact-dedup keepers (aggregate min per hash, the p01
    // shape); the automaton flag is computed in the SAME narrow pass
    // that carries the ledger columns, so stages 1+2 cost one scan
    val keepers = feat.groupBy("content_hash").agg(min(col("doc_id")).as("doc_id"))
    val scanned = feat.join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("text"))
      .as[(Long, String, Long, String)]
      .mapPartitions(_.map { case (id, src, nt, text) =>
        (id, src, nt, ac.containsAny(text))
      })
      .toDF("doc_id", "source", "n_tokens", "blocked")
      .localCheckpoint()

    // stage 2 — the phrase gate
    val s2 = scanned.filter(!col("blocked"))

    // stage 3 — per-source budget via the chunked two-phase prefix sum
    val ordered = s2
      .withColumn("ord", md5(col("doc_id").cast("string")))
      .withColumn("chunk", substring(col("ord"), 1, 2))
    val s3 = PrefixOps
      .chunkedCumSum(ordered, "source", "chunk", Seq("ord", "doc_id"), "n_tokens", "cum")
      .filter(col("cum") <= PhraseTokenBudget)

    def ledger(stage: Int, name: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(stage).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))

    ledger(0, "raw", feat)
      .unionByName(ledger(1, "dedup", scanned))
      .unionByName(ledger(2, "phrase_block", s2))
      .unionByName(ledger(3, "budget", s3))
      .orderBy("stage")
  }

  /** p05 — the CLOSED train→apply loop (DCLM / fastText "model-based
    * filtering": distill a quality judgment into a cheap linear
    * classifier on a LABELED slice, then filter the whole corpus with
    * it). d64 is the train half and d39's weight seam is the apply
    * half; this stage composes them:
    *
    *   stage 1  fit    [[TextOps.logregFit]] on the even-doc_id half —
    *                   the labeled slice (swap the predicate for any
    *                   labeling harness / judge output)
    *   stage 2  apply  the trained (buckets+1) micro-logit vector ships
    *                   as an O(buckets) plan literal into
    *                   [[TextOps.logregScore]] over the FULL corpus —
    *                   including the held-out odd half — keep = rounded
    *                   score ≥ 0.5
    *
    * The DuckDB oracle replays BOTH halves end-to-end: the full
    * 3-iteration descent on the slice (d64's unrolled CTEs with the
    * train predicate), then the apply pass under w3 — every score must
    * match to 6dp and every keep decision bit-for-bit.
    * ModelCurationSpec proves the kept set genuinely depends on the
    * TRAINED weights (a perturbed-weights control selects a different
    * set) and that held-out balanced accuracy clears the floor.
    *
    * 100 TB posture: training never moves the corpus (d64's O(buckets)
    * gradient collects); apply is one narrow tokenize + one doc-keyed
    * aggregate with a literal weight table — no join, no second pass.
    */
  def modelCurate(docs: DataFrame, buckets: Int = 256): DataFrame = {
    val (_, hist) = TextOps.logregFit(docs.filter(col("doc_id") % 2 === 0), buckets)
    TextOps.logregScore(docs, hist.last, buckets)
      .withColumn("in_train", col("doc_id") % 2 === 0)
      .orderBy("doc_id")
  }

  val queries: Map[String, Tables.Q] = Map(
    "p01_curation_pipeline" -> ((s, dir) => curate(t(s, dir, "documents"))),

    "p05_model_curation" -> ((s, dir) => modelCurate(t(s, dir, "documents"))),

    // p07 — CALIBRATION of the trained quality classifier (the
    // reliability table): before a threshold-based corpus filter
    // ships, the go/no-go check is whether a predicted 0.8 is really
    // an ~80% positive rate. Trains the d64 model, scores the SAME
    // frame the descent consumed (db already carries y, bucket, c —
    // one corpus pass total), bins the 6dp-rounded probability into
    // deciles (floor(p·10), 1.0 folds into bin 9), and reports per
    // bin: count, positives, mean prediction, empirical rate, the
    // calibration gap (computed FROM the two 4dp-rounded columns so
    // both engines derive it from identical values), and the bin's
    // Brier contribution. The oracle replays the descent via the
    // shared [[TextOps.LogregDescentSql]] and the same binning.
    "p07_calibration" -> ((s, dir) => {
      val (db, hist) = TextOps.logregFit(t(s, dir, "documents"))
      val w = hist.last
      val scored = db
        .withColumn("wm", element_at(typedLit(w.toSeq), col("bucket").cast("int") + 1))
        .groupBy("doc_id", "y")
        .agg(sum(col("c") * col("wm")).as("z"))
        .select(col("y"), expr("round(1.0/(1.0+exp(-(z/1000000.0))), 6)").as("p"))
      scored
        .withColumn("bin", least(floor(col("p") * 10).cast("long"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("y").cast("long")).as("n_pos"),
          round(avg(col("p")), 4).as("mean_pred"),
          round(avg(col("y").cast("double")), 4).as("empirical_rate"),
          round(avg(pow(col("p") - col("y"), 2)), 4).as("brier"))
        .withColumn("calib_gap", round(abs(col("mean_pred") - col("empirical_rate")), 4))
        .orderBy("bin")
    }),

    // p06 — p05's train→filter loop taken ONLINE, driven as a REAL
    // stream ([[graft.streaming.ModelStreams.weightRefreshStream]]):
    // the labeled corpus arrives as two micro-batches (even doc_ids,
    // then odd — the s24 two-file drop-folder pattern), batch 1
    // CONTINUES the descent from the version batch 0 published (warm
    // start via logregFit's initW), each version lands
    // overwrite-idempotent under weights/batch=<id>, and the curation
    // scorer broadcasts the LATEST published vector over the full
    // corpus. The DuckDB oracle replays the entire history — SIX
    // descent iterations in two warm-started phases, then the apply
    // pass — bit-for-bit (integer micro-logits, 6dp logistic,
    // power-of-two step). n_versions carries the REAL published-version
    // count (a directory listing, not an assumption) for the oracle to
    // pin at 2. 100 TB posture: refresh cost per batch is O(batch) +
    // O(buckets) gradient collects regardless of corpus history, and
    // the scorer's weight table stays an O(buckets) plan literal.
    "p06_stream_weight_refresh" -> ((s, dir) => {
      import graft.streaming.ModelStreams
      val docs = t(s, dir, "documents")
      val drop = java.nio.file.Files.createTempDirectory("graft-p06-drop").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-p06-ckpt").toString
      val modelDir = java.nio.file.Files.createTempDirectory("graft-p06-model").toString
      docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)
      docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(drop)
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(drop)
      val q = ModelStreams.weightRefreshStream(stream, modelDir, ckpt).start()
      q.processAllAvailable(); q.stop()
      val fs = new org.apache.hadoop.fs.Path(modelDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val nVersions = fs.listStatus(new org.apache.hadoop.fs.Path(s"$modelDir/weights"))
        .count(_.getPath.getName.startsWith("batch="))
      val w = ModelStreams.latestWeights(s, modelDir).get._2
      // the returned frame depends only on the corpus and the collected
      // weight LITERAL — the stream's scratch state (a full corpus copy
      // in the drop folder included) is deletable before returning, so
      // repeated suite/bench invocations don't accumulate copies (the
      // q104/q105 temp-dir advisory, applied here from the start)
      Seq(drop, ckpt, modelDir).foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(d), true))
      TextOps.logregScore(docs, w)
        .withColumn("from_batch", (col("doc_id") % 2).cast("int"))
        .withColumn("n_versions", lit(nVersions.toLong))
        .orderBy("doc_id")
    }),

    "p03_web_pipeline" -> ((s, dir) => curateWeb(t(s, dir, "documents"))),

    "p04_phrase_pipeline" -> ((s, dir) => curatePhrases(t(s, dir, "documents"))),

    // CROSS-TABLE hybrid curation — the text×vector composition p01
    // (single-table) doesn't exercise: documents clear the d36 quality
    // floors, join to their embedding rows (vec_id = doc_id), and the
    // SURVIVORS are semantically deduplicated cluster-by-cluster with
    // s11's SemDeDup kernel at threshold 0.3 (the regime where dedup
    // fires on this corpus; s11's 0.4 is its own documented setting) —
    // keep/drop decisions depend on which docs survived the text
    // stage: PipelineSpec pins that vectors s11 drops full-table are
    // KEPT here because their offending lower-id neighbor was
    // quality-floored away, which is exactly why recipes run the
    // stages composed rather than intersecting standalone outputs.
    // Shapes: floors are one explode+agg (codegen, map-side
    // combinable); the join is embedding-keyed; the pairwise kernel is
    // cluster-scoped (skew = cluster imbalance, the clustering stage's
    // contract). Output: the per-cluster survivor ledger. DuckDB
    // replays floors → join → pairwise decisions → ledger as CTEs.
    "p02_hybrid_curation" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val tokCounts = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("c"))
      val floors = tokCounts.groupBy("doc_id")
        .agg(
          sum(col("c")).as("wc"),
          round(sum(length(col("tok")) * col("c")).cast("double") / sum(col("c")), 4).as("mwl"),
          sum(when(col("tok").isin("the", "a"), 1L).otherwise(0L)).as("n_stop"),
          round(max(col("c")).cast("double") / sum(col("c")), 4).as("top_share"))
        .filter(col("wc") >= 20 && col("mwl") >= 3.0 && col("mwl") <= 4.5 &&
          col("n_stop") >= 2 && col("top_share") <= 0.12)
        .select(col("doc_id").as("vec_id"), col("wc"))
      val je = emb.join(floors, "vec_id")
      SimilarityOps.semDedup(je, clusterCol = "label", threshold = 0.3)
        .join(je.select(col("vec_id"), col("wc")), "vec_id")
        .groupBy("cluster")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          coalesce(sum(when(col("keep"), col("wc"))), lit(0L)).as("kept_tokens"))
        .orderBy("cluster")
    }))

  val oracleSql: Map[String, String] = Map(
    // Train→apply replay: d64's full 3-iteration descent re-derived on
    // the even-doc_id TRAIN slice (same integer micro-logit discipline,
    // same power-of-two step), then the apply pass over the FULL corpus
    // under w3 — scores 6dp-exact, keep decisions bit-for-bit.
    // Calibration replay: the shared descent CTEs, the SAME db-frame
    // scoring the engine uses (zf is d64's), decile bins of the
    // 6dp-rounded p, gap from the two 4dp-rounded columns.
    "p07_calibration" -> {
      s"""WITH ${TextOps.LogregDescentSql},
         |zf AS (SELECT doc_id, y, CAST(sum(c * wm) AS BIGINT) AS z FROM db JOIN w3 USING (bucket) GROUP BY 1, 2),
         |sc AS (SELECT y, round(1.0/(1.0+exp(-(z/1000000.0))), 6) AS p FROM zf),
         |b AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, y, p FROM sc),
         |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos,
         |             round(avg(p), 4) AS mean_pred,
         |             round(avg(CAST(y AS DOUBLE)), 4) AS empirical_rate,
         |             round(avg(pow(p - y, 2)), 4) AS brier
         |      FROM b GROUP BY 1)
         |SELECT bin, n_docs, n_pos, mean_pred, empirical_rate, brier,
         |       round(abs(mean_pred - empirical_rate), 4) AS calib_gap
         |FROM g ORDER BY bin""".stripMargin
    },

    "p05_model_curation" -> {
      def iter(t: Int): String =
        s"""z$t AS (SELECT doc_id, y, CAST(sum(c * wm) AS BIGINT) AS z FROM db JOIN w${t - 1} USING (bucket) GROUP BY 1, 2),
           |e$t AS (SELECT doc_id, CAST(round((round(1.0/(1.0+exp(-(z/1000000.0))), 6) - y) * 1000000.0) AS BIGINT)
           |               * (CASE WHEN y = 1 THEN pw.n_neg ELSE pw.n_pos END) AS e FROM z$t, pw),
           |g$t AS (SELECT bucket, CAST(sum(e * c) AS BIGINT) AS g FROM db JOIN e$t USING (doc_id) GROUP BY 1),
           |w$t AS (SELECT bk.bucket, w${t - 1}.wm - CAST(floor(coalesce(g$t.g, 0)/2097152.0 + 0.5) AS BIGINT) AS wm
           |        FROM bk JOIN w${t - 1} USING (bucket) LEFT JOIN g$t USING (bucket))""".stripMargin
      s"""WITH tk0 AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
         |             FROM documents WHERE doc_id % 2 = 0),
         |dy AS (SELECT doc_id, CAST(count(*) FILTER (WHERE tok = 'slow') > count(*) FILTER (WHERE tok = 'fast') AS INT) AS y
         |       FROM tk0 GROUP BY 1),
         |tk AS (SELECT tk0.doc_id, dy.y, tk0.tok FROM tk0 JOIN dy USING (doc_id)),
         |db AS (SELECT doc_id, y, ('0x'||substr(md5('w:'||tok),1,8))::BIGINT % 256 AS bucket, count(*) AS c
         |       FROM tk GROUP BY 1, 2, 3
         |       UNION ALL SELECT doc_id, y, CAST(256 AS BIGINT), CAST(1 AS BIGINT) FROM dy),
         |bk AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(257)),
         |pw AS (SELECT CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS n_pos,
         |              CAST(count(*) FILTER (WHERE y = 0) AS BIGINT) AS n_neg FROM dy),
         |w0 AS (SELECT bucket, CAST(0 AS BIGINT) AS wm FROM bk),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)},
         |atk AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok FROM documents),
         |adb AS (SELECT doc_id, ('0x'||substr(md5('w:'||tok),1,8))::BIGINT % 256 AS bucket, count(*) AS c
         |        FROM atk GROUP BY 1, 2
         |        UNION ALL SELECT doc_id, CAST(256 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
         |sz AS (SELECT doc_id, CAST(sum(c * wm) AS BIGINT) AS z,
         |              CAST(coalesce(sum(c) FILTER (WHERE bucket < 256), 0) AS BIGINT) AS n_tokens
         |       FROM adb JOIN w3 USING (bucket) GROUP BY 1)
         |SELECT doc_id, n_tokens, round(1.0/(1.0+exp(-(z/1000000.0))), 6) AS score,
         |       round(1.0/(1.0+exp(-(z/1000000.0))), 6) >= 0.5 AS keep,
         |       doc_id % 2 = 0 AS in_train
         |FROM sz ORDER BY doc_id""".stripMargin
    },

    // Full ONLINE-training replay: phase A = d64's 3-iteration descent
    // on the even-doc_id batch from zero; phase B = 3 MORE iterations
    // on the odd batch warm-started from phase A's final weights
    // (wb0 := wa3 — exactly ModelStreams' strictly-below-id version
    // read); apply over the full corpus under wb3. Same integer
    // micro-logit discipline throughout, so all six steps and every
    // score replay bit-for-bit.
    "p06_stream_weight_refresh" -> {
      def iterP(sfx: String, t: Int): String =
        s"""z$sfx$t AS (SELECT doc_id, y, CAST(sum(c * wm) AS BIGINT) AS z FROM db$sfx JOIN w$sfx${t - 1} USING (bucket) GROUP BY 1, 2),
           |e$sfx$t AS (SELECT doc_id, CAST(round((round(1.0/(1.0+exp(-(z/1000000.0))), 6) - y) * 1000000.0) AS BIGINT)
           |               * (CASE WHEN y = 1 THEN pw$sfx.n_neg ELSE pw$sfx.n_pos END) AS e FROM z$sfx$t, pw$sfx),
           |g$sfx$t AS (SELECT bucket, CAST(sum(e * c) AS BIGINT) AS g FROM db$sfx JOIN e$sfx$t USING (doc_id) GROUP BY 1),
           |w$sfx$t AS (SELECT bk.bucket, w$sfx${t - 1}.wm - CAST(floor(coalesce(g$sfx$t.g, 0)/2097152.0 + 0.5) AS BIGINT) AS wm
           |        FROM bk JOIN w$sfx${t - 1} USING (bucket) LEFT JOIN g$sfx$t USING (bucket))""".stripMargin
      def phaseTables(sfx: String, predicate: String): String =
        s"""tk${sfx}0 AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
           |             FROM documents WHERE $predicate),
           |dy$sfx AS (SELECT doc_id, CAST(count(*) FILTER (WHERE tok = 'slow') > count(*) FILTER (WHERE tok = 'fast') AS INT) AS y
           |       FROM tk${sfx}0 GROUP BY 1),
           |tk$sfx AS (SELECT tk${sfx}0.doc_id, dy$sfx.y, tk${sfx}0.tok FROM tk${sfx}0 JOIN dy$sfx USING (doc_id)),
           |db$sfx AS (SELECT doc_id, y, ('0x'||substr(md5('w:'||tok),1,8))::BIGINT % 256 AS bucket, count(*) AS c
           |       FROM tk$sfx GROUP BY 1, 2, 3
           |       UNION ALL SELECT doc_id, y, CAST(256 AS BIGINT), CAST(1 AS BIGINT) FROM dy$sfx),
           |pw$sfx AS (SELECT CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS n_pos,
           |              CAST(count(*) FILTER (WHERE y = 0) AS BIGINT) AS n_neg FROM dy$sfx)""".stripMargin
      s"""WITH bk AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(257)),
         |${phaseTables("a", "doc_id % 2 = 0")},
         |wa0 AS (SELECT bucket, CAST(0 AS BIGINT) AS wm FROM bk),
         |${iterP("a", 1)},
         |${iterP("a", 2)},
         |${iterP("a", 3)},
         |${phaseTables("b", "doc_id % 2 = 1")},
         |wb0 AS (SELECT bucket, wm FROM wa3),
         |${iterP("b", 1)},
         |${iterP("b", 2)},
         |${iterP("b", 3)},
         |atk AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok FROM documents),
         |adb AS (SELECT doc_id, ('0x'||substr(md5('w:'||tok),1,8))::BIGINT % 256 AS bucket, count(*) AS c
         |        FROM atk GROUP BY 1, 2
         |        UNION ALL SELECT doc_id, CAST(256 AS BIGINT), CAST(1 AS BIGINT) FROM documents),
         |sz AS (SELECT doc_id, CAST(sum(c * wm) AS BIGINT) AS z,
         |              CAST(coalesce(sum(c) FILTER (WHERE bucket < 256), 0) AS BIGINT) AS n_tokens
         |       FROM adb JOIN wb3 USING (bucket) GROUP BY 1)
         |SELECT doc_id, n_tokens, round(1.0/(1.0+exp(-(z/1000000.0))), 6) AS score,
         |       round(1.0/(1.0+exp(-(z/1000000.0))), 6) >= 0.5 AS keep,
         |       CAST(doc_id % 2 AS INT) AS from_batch,
         |       CAST(2 AS BIGINT) AS n_versions
         |FROM sz ORDER BY doc_id""".stripMargin
    },

    // The oracle replays the six stages as chained CTEs — same keeper
    // rule (min doc_id per text; md5 is injective here so grouping by
    // text is the same partition), same d36 floors, same 8-gram overlap,
    // same md5-ordered budget walk, same contiguous bins.
    // Replays the five web stages as chained CTEs: same URL synthesis/
    // canonicalization (the w05 kernel), same min-doc_id keeper per
    // canonical URL, same blocklist, the d55 Kneser-Ney replay FIT ON
    // THE STAGE-2 SURVIVORS, same md5-ordered domain budget walk.
    "p03_web_pipeline" ->
      """WITH u AS (SELECT doc_id, source, text,
        |  'https://' ||
        |  (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' WHEN 2 THEN 'm.' ELSE '' END) ||
        |  source || '.' ||
        |  (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com' ELSE 'org' END) ||
        |  '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
        |  (CASE CAST(doc_id % 5 AS INT)
        |     WHEN 0 THEN '?utm_source=feed&utm_campaign=x&page=' || CAST(doc_id % 3 AS VARCHAR)
        |     WHEN 1 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
        |     ELSE '' END) AS url
        |  FROM documents),
        |pp AS (SELECT *, regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS qs FROM u),
        |cc AS (SELECT *, CASE WHEN starts_with(host, 'www.') THEN substr(host, 5) ELSE host END AS host_nw FROM pp),
        |kk AS (SELECT *, coalesce(array_to_string(list_filter(string_split(qs, '&'), x -> x <> '' AND NOT starts_with(x, 'utm_')), '&'), '') AS kq FROM cc),
        |f AS (SELECT doc_id, source,
        |  host_nw || path || (CASE WHEN kq = '' THEN '' ELSE '?' || kq END) AS cu,
        |  CASE WHEN host_nw LIKE '%.co.uk' THEN array_to_string(string_split(host_nw, '.')[-3:], '.')
        |       ELSE array_to_string(string_split(host_nw, '.')[-2:], '.') END AS rd,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS t,
        |  CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM kk),
        |k1 AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY cu),
        |s1 AS (SELECT f.* FROM f JOIN k1 USING (doc_id)),
        |s2 AS (SELECT * FROM s1 WHERE rd NOT IN ('src3.com', 'src7.co.uk', 'src11.org')),
        |db AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> struct_pack(a := t[i], b := t[i + 1]))) AS s
        |       FROM s2 WHERE len(t) >= 2),
        |dbf AS (SELECT doc_id, s.a AS a, s.b AS b FROM db),
        |bg AS (SELECT a, b, count(*) AS c_ab FROM dbf GROUP BY 1, 2),
        |ctx AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a, count(*) AS n1p_left FROM bg GROUP BY 1),
        |cont AS (SELECT b, count(*) AS n1p_right FROM bg GROUP BY 1),
        |tot AS (SELECT count(*) AS btypes FROM bg),
        |lp AS (SELECT d.doc_id,
        |         ln((bg.c_ab - 0.75) / ctx.c_a + 0.75 * ctx.n1p_left / ctx.c_a * (CAST(cont.n1p_right AS DOUBLE) / tot.btypes)) AS logp
        |       FROM dbf d JOIN bg ON d.a = bg.a AND d.b = bg.b
        |       JOIN ctx ON d.a = ctx.a JOIN cont ON d.b = cont.b, tot),
        |kn AS (SELECT doc_id, round(avg(logp), 6) AS kn FROM lp GROUP BY 1),
        |s3 AS (SELECT s2.* FROM s2 JOIN kn USING (doc_id) WHERE kn.kn >= -3.4),
        |s4 AS (SELECT * FROM (
        |    SELECT s3.*, sum(n_tokens) OVER (PARTITION BY rd ORDER BY md5(doc_id::VARCHAR), doc_id) AS cum FROM s3)
        |  WHERE cum <= 150)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage, 'raw' AS stage_name, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM f
        |  UNION ALL SELECT 1, 'canonical', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'blocklist', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'kn_floor', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s3
        |  UNION ALL SELECT 4, 'budget', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s4
        |) ORDER BY stage""".stripMargin,

    "p01_curation_pipeline" ->
      """WITH f0 AS (SELECT doc_id, source, text,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM documents),
        |f AS (SELECT doc_id, source, text,
        |    CAST(len(t) AS BIGINT) AS n_tokens,
        |    round(CAST(list_aggregate(list_transform(t, x -> len(x)), 'sum') AS DOUBLE) / len(t), 4) AS mwl,
        |    CAST(len(list_intersect(list_distinct(t), ['the', 'a'])) AS BIGINT) AS n_stop,
        |    round(CAST(list_aggregate(list_transform(list_distinct(t), u -> len(list_filter(t, x -> x = u))), 'max') AS DOUBLE) / len(t), 4) AS top_share,
        |    CASE WHEN len(t) >= 8 THEN list_transform(range(1, len(t) - 6), i -> array_to_string(t[i:i+7], ' '))
        |         ELSE [] END AS g8
        |  FROM f0),
        |k1 AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
        |s1 AS (SELECT f.* FROM f JOIN k1 USING (doc_id)),
        |s2 AS (SELECT * FROM s1 WHERE n_tokens >= 20 AND mwl >= 3.0 AND mwl <= 4.5
        |       AND n_stop >= 2 AND top_share <= 0.12),
        |ev AS (SELECT DISTINCT unnest(g8) AS g FROM f WHERE doc_id % 97 = 0),
        |tr AS (SELECT * FROM s2 WHERE doc_id % 97 <> 0),
        |contam AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest(g8) AS g FROM tr) x JOIN ev USING (g)),
        |s3 AS (SELECT * FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
        |s4 AS (SELECT doc_id, source, n_tokens FROM (
        |    SELECT s3.*, sum(n_tokens) OVER (PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) AS cum FROM s3)
        |  WHERE cum <= 5000),
        |s5 AS (SELECT source, CAST(floor((pcum - n_tokens) / 512.0) AS BIGINT) AS bin_id, n_tokens FROM (
        |    SELECT s4.*, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS pcum FROM s4))
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage, 'raw' AS stage_name, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens, CAST(0 AS BIGINT) AS n_bins FROM f
        |  UNION ALL SELECT 1, 'dedup', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM s1
        |  UNION ALL SELECT 2, 'quality', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM s2
        |  UNION ALL SELECT 3, 'decontam', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM s3
        |  UNION ALL SELECT 4, 'budget', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT), 0 FROM s4
        |  UNION ALL SELECT 5, 'pack', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
        |    CAST(count(DISTINCT (source, bin_id)) AS BIGINT) FROM s5
        |) ORDER BY stage""".stripMargin,

    // Dedup → substring phrase gate (contains() over the same literal
    // list — presence semantics need no border-free argument) → budget
    // window → the same 4-row ledger.
    "p04_phrase_pipeline" ->
      """WITH f AS (SELECT doc_id, source, text,
        |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |k1 AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY text),
        |s1 AS (SELECT f.* FROM f JOIN k1 USING (doc_id)),
        |pats AS (SELECT * FROM (VALUES
        |  ('merge slow'), ('spark join'), ('window dup'), ('fast key'),
        |  ('customer line'), ('batch stream'), ('rt win'),
        |  ('zz-never-hits')) AS v(pattern)),
        |blocked AS (SELECT DISTINCT doc_id FROM s1, pats WHERE contains(s1.text, pats.pattern)),
        |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM blocked)),
        |s3 AS (SELECT doc_id, source, n_tokens FROM (
        |    SELECT s2.*, sum(n_tokens) OVER (PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) AS cum FROM s2)
        |  WHERE cum <= 600)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage, 'raw' AS stage_name, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM f
        |  UNION ALL SELECT 1, 'dedup', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT 2, 'phrase_block', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT 3, 'budget', count(*), CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM s3
        |) ORDER BY stage""".stripMargin,

    // Replays floors (the d36 CTE) → doc↔embedding join → pairwise
    // SemDeDup decisions among the survivors → per-cluster ledger.
    "p02_hybrid_curation" ->
      """WITH tc AS (SELECT doc_id, tok, count(*) AS c
        |            FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok FROM documents)
        |            GROUP BY doc_id, tok),
        |fl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS wc,
        |        round(CAST(sum(len(tok) * c) AS DOUBLE) / sum(c), 4) AS mwl,
        |        CAST(count(*) FILTER (WHERE tok IN ('the', 'a')) AS BIGINT) AS n_stop,
        |        round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_share
        |      FROM tc GROUP BY doc_id),
        |q AS (SELECT doc_id, wc FROM fl
        |      WHERE wc >= 20 AND mwl >= 3.0 AND mwl <= 4.5 AND n_stop >= 2 AND top_share <= 0.12),
        |je AS (SELECT e.vec_id, e.label, e.embedding, q.wc
        |       FROM embeddings e JOIN q ON q.doc_id = e.vec_id),
        |p AS (SELECT a.vec_id AS va,
        |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cos
        |  FROM je a JOIN je b ON a.label = b.label AND a.vec_id > b.vec_id),
        |m AS (SELECT va, max(cos) AS mx FROM p GROUP BY va),
        |d AS (SELECT je.vec_id, CAST(je.label AS BIGINT) AS cluster,
        |        coalesce(m.mx, -1.0) <= 0.3 AS keep, je.wc
        |      FROM je LEFT JOIN m ON m.va = je.vec_id)
        |SELECT cluster, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN keep THEN wc END), 0) AS BIGINT) AS kept_tokens
        |FROM d GROUP BY cluster ORDER BY cluster""".stripMargin)
}
