package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan properties the 100 TB posture depends on — the
  * shapes SURVEY §8/§9 documents. A change that silently un-pushes a
  * filter, turns a top-k into a global sort, or re-introduces a shuffle
  * into the IVF assignment fails HERE, not in a profile at scale.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** Partition specs of every `WindowExec` in a plan string, as the raw
    * text of each window's partition bracket group — `None` for an
    * unpartitioned (single-task) window. WindowExec prints
    * `Window [exprs], [partition], [order]` with both specs,
    * `Window [exprs], [partition]` with no ordering, and
    * `Window [exprs], [order]` when unpartitioned — the two-group forms
    * disambiguate by sort direction (an order spec entry always carries
    * ` ASC`/` DESC`; a partition spec never does). `WindowGroupLimit`
    * lines are a different (pushdown) node and are excluded.
    */
  private def windowPartitions(plan: String): Seq[Option[String]] =
    plan.split("\n").toSeq
      .filter(l => l.contains("Window [") && !l.contains("WindowGroupLimit"))
      .map { line =>
        val start = line.indexOf("Window [") + "Window ".length
        // split the tail into top-level [...] groups by bracket depth
        val groups = scala.collection.mutable.ArrayBuffer.empty[String]
        var depth = 0
        val cur = new StringBuilder
        line.substring(start).foreach {
          case '[' => depth += 1; if (depth > 1) cur += '['
          case ']' =>
            depth -= 1
            if (depth > 0) cur += ']'
            else { groups += cur.toString; cur.clear() }
          case c if depth > 0 => cur += c
          case _ => ()
        }
        if (groups.length >= 3) Some(groups(1))
        else if (groups.length == 2 && !groups(1).contains(" ASC") && !groups(1).contains(" DESC"))
          Some(groups(1))
        else None
      }

  test("q02: predicates reach the parquet scan (PushedFilters)") {
    val p = plan("q02_revenue_forecast")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), s"no filters pushed:\n$p")
  }

  test("q01: scan is column-pruned (ReadSchema strictly narrower than the table)") {
    val p = plan("q01_pricing_summary")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").length
    assert(cols > 0 && cols <= 7, s"expected <=7 of lineitem's 11 columns read, got $cols:\n$read")
  }

  test("q24: top-k is TakeOrderedAndProject, never a global sort") {
    val p = plan("q24_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: fixed-size dims join via BroadcastHashJoin") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("s01: cosine kernel runs as the codegen expression with a broadcast 1-row query side") {
    val p = plan("s01_cosine_topk")
    assert(p.contains("graft_cosine_similarity"), p)
    assert(p.contains("Broadcast"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("IVF assignment is shuffle-free (no Exchange between scan and argmax projection)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cents = IvfIndex.train(emb, k = 8, iters = 1)
    val assigned = IvfIndex.search(emb, cents, queryId = 0L, k = 5, nprobe = 8)
    val p = assigned.queryExecution.executedPlan.toString
    // the only allowed mention is the final top-k; assignment itself must not repartition
    assert(!p.contains("Exchange hashpartitioning"), s"IVF assignment shuffles:\n$p")
  }

  test("x02: near-dup candidates come from an equi-join on bucket keys, not a cartesian") {
    // the RAW pair path (the x02 query entry wraps it in a soundness
    // summary whose exact side is a DELIBERATE constant-size cross join)
    val p = TextOps.minhashDedupPairs(
      Tables.t(spark, sfDir, "documents"), shingleWidth = 1, threshold = 0.95)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x07: simhash Hamming pairs come from an equi-join on (band, value) keys, not a cartesian") {
    val p = TextOps.simhashHammingPairs(Tables.t(spark, sfDir, "documents"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("d34: span dedup is all equi-joins on span-hash/position keys — no cartesian, no window over spans") {
    val p = TextOps.spanDedup(Tables.t(spark, sfDir, "documents"), spanWidth = 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // first-occurrence selection must be an aggregate (map-side combinable),
    // not a row_number window partitioned by the (skewable) span key
    assert(!p.contains("Window"), p)
  }

  test("d35: perplexity buckets come from broadcast cutoffs — no global rank window over the corpus") {
    val p = graft.SparkEntry.queries("d35_perplexity_buckets")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s11: semdedup pairs come from an equi-join on the cluster key, not a cartesian") {
    val p = SimilarityOps.semDedup(Tables.t(spark, sfDir, "embeddings"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("q71: the lone-late-supplier query is ONE orderkey window — no decorrelated semi/anti joins") {
    val p = plan("q71_late_supplier")
    assert(p.contains("Window"), s"expected the hand-decorrelated window form:\n$p")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"EXISTS/NOT-EXISTS decorrelation re-appeared (extra lineitem scans):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("r01: posting lists come from a df-gated equi-join — no cartesian, no term window") {
    val p = plan("r01_inverted_index")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), s"a window over the term key would skew on stopwords:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("r05: curriculum stages come from broadcast quantile cutoffs — no global rank window") {
    val p = plan("r05_curriculum_stages")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), s"vocab-sized frequency dim not broadcast:\n$p")
  }

  test("r03: the blocklist dictionary joins by broadcast — never a shuffle of the token stream") {
    val p = plan("r03_blocklist_hits")
    assert(p.contains("BroadcastHashJoin"), s"blocklist not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q106: the root fold reuses the CHECKPOINTED bucket digests — no second corpus scan — " +
    "and the emitted root is exactly md5 over the bucket-ordered digest concat") {
    val df = graft.SparkEntry.queries("q106_corpus_manifest")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan"),
      s"the manifest result re-scans parquet (both legs must read the checkpoint):\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val concat = rows.sortBy(_.getAs[String]("bucket"))
      .map(_.getAs[String]("digest")).mkString("")
    val root = java.security.MessageDigest.getInstance("MD5")
      .digest(concat.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.forall(_.getAs[String]("corpus_root") == root),
      s"corpus_root does not equal the recomputed digest-tree root $root")
  }

  test("d42: trigram LM count tables join by key with no cartesian and no window") {
    val p = plan("d42_trigram_logprob")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("m06: perceptual-hash grouping is one aggregate — no join, no window over pixels") {
    val p = plan("m06_phash_dedup")
    assert(!p.contains("Join"), s"dedup grouping should be join-free:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }

  test("d13: sequence packing windows are PARTITIONED by shard — no single-partition global sort") {
    val p = plan("d13_sequence_pack")
    assert(!p.contains("Exchange SinglePartition"), s"global window detected:\n$p")
    assert(p.contains("Window"), p)
  }

  test("d15: decontamination probes a BROADCAST eval n-gram set; the corpus never shuffles to a cartesian") {
    val p = plan("d15_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q62: the correlated LATERAL LIMIT decorrelates to a keyed window, not a per-row re-scan") {
    val p = plan("q62_lateral_topk")
    assert(p.contains("Window"), s"expected a window-based decorrelation:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d26: top-1000 type ranking is TakeOrderedAndProject — vocabulary size never forces a global sort") {
    val p = plan("d26_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q61: the keyless range join plans as an equi-join on the bin, not a nested loop over intervals") {
    val p = plan("q61_range_bin_join")
    // the only nested-loop allowed is the deliberate 1-row scalar (base
    // epoch) broadcast; the events-x-intervals join itself must be keyed
    assert(
      "BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"range join degenerated to a nested loop:\n$p"
    )
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graft-objects read: key-only projection prunes the scan schema to the key column") {
    import java.nio.file.Files
    import spark.implicits._
    val root = Files.createTempDirectory("plan-objects").toString
    Seq(("k/a", "x".getBytes, Map("iv" -> "1")))
      .toDF("key", "data", "metadata")
      .write.format("graft-objects").option("root", root).mode("append").save()
    val df = spark.read.format("graft-objects").option("root", root).load().select("key")
    val p = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output columns in brackets.
    assert("""BatchScan graft-objects[^\[]*\[key#\d+\]""".r.findFirstIn(p).isDefined, s"scan not pruned to key:\n$p")
  }

  test("s10: kNN join broadcasts the query side; corpus bytes never shuffle (only K-arrays)") {
    val p = plan("s10_knn_join")
    assert(p.contains("Broadcast"), s"query side not broadcast:\n$p")
    // top-k per query is the bounded-heap aggregate: the partial
    // collect_top_k runs BEFORE the exchange (map-side K-bounding), so
    // the only hashpartitioning Exchange moves (query_id, K-array) rows
    // — the embedding column must not appear in any shuffle
    assert(p.contains("partial_collect_top_k"), s"map-side K-bounding missing:\n$p")
    val exchanges = "Exchange hashpartitioning[^\\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty && exchanges.forall(e => !e.contains("embedding")),
      s"corpus vectors cross a shuffle:\n$p")
  }

  test("r04/r07/r08 + s10/r02/r10: bounded-heap minK replaced every per-source/per-lang/" +
    "per-query_id window (no WindowExec at all)") {
    for (n <- Seq("r04_kmv_distinct", "r07_kmv_union", "r08_weighted_sample",
        "s10_knn_join", "r02_bm25_topk", "r10_rrf_fusion")) {
      val p = plan(n)
      assert(windowPartitions(p).isEmpty,
        s"$n still plans a WindowExec — one task per source/lang/query value at scale:\n$p")
      assert(p.contains("ObjectHashAggregate"),
        s"$n: the minK bounded-heap aggregate (ObjectHashAggregate) is missing:\n$p")
    }
  }

  test("d16: keeper selection is a map-side-combinable aggregate, not a content_hash window") {
    val p = plan("d16_corpus_curation")
    assert(windowPartitions(p).isEmpty,
      s"d16 plans a WindowExec — a 10⁹-duplicate hash group would serialize into one task:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"d16: keeper min does not partial-aggregate map-side:\n$p")
  }

  test("r06: the prefix sum is two-phase — every window partitioned by (source, chunk), never source alone") {
    val p = plan("r06_token_budget_cap")
    val parts = windowPartitions(p)
    assert(parts.nonEmpty, s"expected the chunk-local cumsum window:\n$p")
    parts.foreach { ps =>
      assert(ps.isDefined, s"unpartitioned window in r06:\n$p")
      assert(ps.get.contains("chunk#"),
        s"r06 window partitioned without the chunk salt (one task per source at scale): [${ps.get}]\n$p")
    }
  }

  // The closed set of queries allowed to plan a single-task WindowExec.
  // Each is bounded by construction — the window input is a sketch or
  // stage frame, never the corpus: q76 runs over 3 funnel-stage rows;
  // r09 over its 128 histogram bins. Everything else must partition
  // (or use a bounded-heap aggregate). This pin exists because
  // WindowExec's "No Partition Defined" warnings in the bench log are
  // expected for exactly these queries, and the noise must never hide
  // a NEW accidental global window in any of the other queries.
  // (d26 left this list in r19: its top-1000 re-rank is now the
  // census-offset + per-count tie-break shape, no global window.)
  private val unpartitionedWindowAllowlist =
    Set("q76_funnel", "r09_histogram_quantiles")

  /** The partition keys a WindowExec MAY partition by: columns whose
    * cardinality grows with the corpus (ids, keys, chunk salts), so the
    * per-key group a single task must hold stays bounded as data grows.
    * This is an ALLOWLIST — the round-9 audit blocklisted `source|lang`
    * and let the same one-task-per-key shape through on `query_id`
    * (s10/r02/r10) and on the skewable `content_hash` (d16). Any window
    * whose partition spec contains NONE of these keys now fails the
    * audit with the offending spec, whatever the key is called.
    * Deliberately absent: `source`, `lang`, `query_id` (bounded
    * workload cardinality = one task per value), and `content_hash`
    * (unbounded cardinality but unbounded per-key skew — a boilerplate
    * doc duplicated 10⁹ times lands in ONE task, and AQE skew-split
    * does not apply to windows).
    */
  private val highCardWindowKeys: Set[String] = Set(
    "doc_id", "vec_id", "user_id", "event_id", "chunk", "__chunk",
    "l_orderkey", "o_orderkey", "o_custkey", "c_custkey",
    "l_partkey", "l_suppkey", "ps_partkey", "ps_suppkey", "s_suppkey", "p_partkey")

  /** Queries whose PARTITIONED windows run over an input that is bounded
    * by construction, not by key cardinality — r09's window partitions
    * its 128-bin histogram sketch by the quantile probability `q` (3
    * values × ≤128 rows per task at any corpus size); d26's tie-break
    * window partitions its LIMIT-1000 vocabulary frame by the count
    * value `c` (≤1000 rows total, so any one count group is ≤1000 rows
    * at any corpus size). Everything else must carry a high-cardinality
    * partition key.
    */
  private val boundedInputWindowAllowlist =
    Set("r09_histogram_quantiles", "d26_zipf_slope")

  /** Top-level comma-split of a printed partition spec (commas inside
    * parentheses/brackets belong to a wrapping expression, not the
    * spec). `pmod(doc_id#5, 4)` is ONE expression, not two.
    */
  private def topLevelPartitionExprs(ps: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    ps.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  /** A partition expression counts as high-cardinality ONLY when it is a
    * BARE reference to an allowlisted column (`doc_id#123L`), not when
    * the column merely appears inside a wrapping expression: a
    * low-cardinality function of a high-card column — `pmod(doc_id, 4)`,
    * a cast-and-bucket, a substring — plans the same one-task-per-value
    * shape the audit bans, whatever identifiers its printed form
    * mentions.
    */
  private val bareColumnRef = "^([A-Za-z_][A-Za-z0-9_]*)#\\d+[A-Za-z]*$".r

  private def lowCardOffense(ps: String): Boolean =
    !topLevelPartitionExprs(ps).exists {
      case bareColumnRef(name) => highCardWindowKeys.contains(name)
      case _ => false
    }

  test("window audit over ALL queries: no single-task window outside the allowlist; " +
    "every window partition spec contains a high-cardinality key") {
    val offendersGlobal = scala.collection.mutable.ArrayBuffer.empty[String]
    val offendersLowCard = scala.collection.mutable.ArrayBuffer.empty[String]
    // keepLazy: the scratch-index queries normally return an eagerly
    // checkpointed frame whose plan is just an ExistingRDD scan — the
    // audit must see their REAL plans, so the hook disables the
    // checkpoint (and the scratch cleanup, done below) for this loop
    SimilarityOps.scratchKeepLazy = true
    try {
      graft.SparkEntry.queries.foreach { case (name, fn) =>
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        windowPartitions(p).foreach {
          case None =>
            if (!unpartitionedWindowAllowlist.contains(name)) offendersGlobal += name
          case Some(ps) =>
            if (lowCardOffense(ps) && !boundedInputWindowAllowlist.contains(name))
              offendersLowCard += s"$name: [$ps]"
        }
      }
    } finally {
      SimilarityOps.scratchKeepLazy = false
      var d = SimilarityOps.scratchKeepLazyDirs.poll()
      while (d != null) {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        d = SimilarityOps.scratchKeepLazyDirs.poll()
      }
    }
    assert(offendersGlobal.isEmpty,
      s"queries planning an unallowlisted single-task WindowExec: ${offendersGlobal.distinct.sorted.mkString(", ")}")
    assert(offendersLowCard.isEmpty,
      "windows partitioned without any high-cardinality key (one task per key value at scale): " +
        offendersLowCard.distinct.sorted.mkString("; "))
  }

  test("window audit canary: a planted per-query_id rank window IS flagged") {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    val planted = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), (col("vec_id") % 4).as("query_id"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id").orderBy(col("vec_id"))))
    val specs = windowPartitions(planted.queryExecution.executedPlan.toString).flatten
    assert(specs.nonEmpty, "canary plan lost its WindowExec")
    assert(specs.forall(lowCardOffense),
      s"audit failed to flag a query_id-partitioned window: $specs")
    // and the same extraction does NOT flag the legitimate salted shape
    assert(!lowCardOffense("source#1, chunk#2"), "chunk-salted window wrongly flagged")
  }

  test("window audit canary: a low-card EXPRESSION over a high-card column IS flagged") {
    import org.apache.spark.sql.functions.{col, lit, pmod, row_number}
    import org.apache.spark.sql.expressions.Window
    // pmod(doc_id, 4) has 4 values — one task per value — even though
    // the printed spec mentions the allowlisted identifier doc_id.
    val planted = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(pmod(col("doc_id"), lit(4))).orderBy(col("doc_id"))))
    val specs = windowPartitions(planted.queryExecution.executedPlan.toString).flatten
    assert(specs.nonEmpty, "canary plan lost its WindowExec")
    assert(specs.forall(lowCardOffense),
      s"audit failed to flag a pmod(doc_id, 4)-partitioned window: $specs")
    // a bare high-card reference next to an expression still passes —
    // the bare key is what bounds the per-task group
    assert(!lowCardOffense("pmod(doc_id#9L, 4), doc_id#9L"), "mixed spec with bare key wrongly flagged")
  }

  // AQE's skew-join split handles the same hot-key shape q36 salts
  // manually — this pins that the runtime re-plan actually fires
  // (skew=true on the final SortMergeJoin), documenting the division of
  // labor: AQE covers post-shuffle sort-merge joins at runtime; the
  // manual salt (SkewJoin.saltedInnerJoin) is still needed when the plan
  // must stay broadcast/shuffled-hash, when the skew is in an
  // aggregation rather than a join, or when the split must be
  // deterministic across runs.
  test("AQE skew-join splits the hot-key partition that q36 otherwise salts (skew=true)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key carrying ~97% of the rows, the q36 shape in miniature
      val large = spark.range(30000)
        .select(when(col("id") % 30 === 0, col("id")).otherwise(lit(7L)).as("k"),
          col("id").as("payload"))
      val small = spark.range(30000).filter(col("id") % 30 === 0)
        .select(col("id").as("k"), (col("id") * 2).as("dim"))
        .union(Seq(7L).toDF("k").select(col("k"), lit(0L).as("dim")))
      val joined = large.join(small, "k")
      // execute THIS QueryExecution (count() would build its own) so the
      // adaptive plan is final when inspected
      assert(joined.collect().length === 30000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
