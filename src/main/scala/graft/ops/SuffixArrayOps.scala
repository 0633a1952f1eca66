package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRUE ExactSubstr dedup via a DISTRIBUTED SUFFIX ARRAY — the method
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL 2022), built the way a 100 TB corpus has to build it:
  * prefix doubling (Manber–Myers), where round k turns window-2^k
  * ranks into window-2^(k+1) ranks with ONE range-partitioned sort
  * each — O(log window) rounds, never a per-suffix comparison loop.
  * d34 approximates the goal with fixed-width hashed spans; this
  * operator ranks the ACTUAL token windows (no hashing anywhere, true
  * equality by construction) and recovers MAXIMAL duplicated spans by
  * merging the covered-token intervals.
  *
  * Spark shape:
  *  - tokens carry a global position `gpos = doc_id·2^20 + offset`;
  *    doc boundaries need no separator symbols because `gpos + width`
  *    can never land in another document (docs are far shorter than
  *    2^20 tokens) — a missing right neighbour ranks as the -1
  *    sentinel, exactly the shorter-suffix-sorts-first convention;
  *  - each doubling round is: one self-equi-join on `gpos + width`
  *    (both sides keyed, no broadcast of the corpus) + one DENSE RANK
  *    of the (r1, r2) pairs computed by the two-phase chunked scheme —
  *    range-partition + in-partition sort, per-partition distinct
  *    counts to the driver (ONE row per partition — bounded), offsets
  *    broadcast back, second pass assigns offset + local dense index.
  *    No global window, no single-task sort; the ranks are a pure
  *    function of the total order, so the output is deterministic
  *    whatever the partitioning;
  *  - duplicate detection keeps only FULL-window starts (pos ≤ n−w+1),
  *    where prefix-doubling rank equality is exactly window equality
  *    (the sentinel only ever reaches ranks of excluded short
  *    suffixes);
  *  - maximal spans: covered tokens = union of [p, p+w) over
  *    duplicated starts, merged per doc by the islands trick (the
  *    per-doc window is keyed on high-cardinality doc_id — the d41
  *    precedent).
  */
object SuffixArrayOps {

  /** Two-phase distributed dense rank of (r1, r2) pairs: returns
    * (gpos, rank) with ranks dense in the pairs' total order. Equal
    * keys land in one range partition, so per-partition distinct
    * counts compose into global offsets exactly.
    */
  private def denseRankPairs(ds: Dataset[(Long, Long, Long)], nParts: Int): Dataset[(Long, Long)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val parted = ds.toDF("gpos", "r1", "r2")
      .repartitionByRange(nParts, col("r1"), col("r2"))
      .sortWithinPartitions("r1", "r2")
      .as[(Long, Long, Long)]
      .localCheckpoint(true) // pin the partitioning: both passes below must see identical splits
    val counts: Map[Int, Long] = parted.mapPartitions { it =>
      var n = 0L
      var prev: (Long, Long) = null
      it.foreach { case (_, a, b) =>
        val k = (a, b)
        if (prev == null || k != prev) { n += 1; prev = k }
      }
      Iterator.single((TaskContext.getPartitionId(), n))
    }.collect().toMap
    val sortedIds = counts.keys.toSeq.sorted
    val offMap = sortedIds.zip(sortedIds.scanLeft(0L)((acc, pid) => acc + counts(pid))).toMap
    val bOff = spark.sparkContext.broadcast(offMap)
    parted.mapPartitions { it =>
      val base = bOff.value(TaskContext.getPartitionId())
      var rank = base - 1
      var prev: (Long, Long) = null
      it.map { case (g, a, b) =>
        val k = (a, b)
        if (prev == null || k != prev) { rank += 1; prev = k }
        (g, rank)
      }
    }
  }

  /** String-keyed twin for the window-1 base case (token dense rank). */
  private def denseRankTokens(ds: Dataset[(Long, String)], nParts: Int): Dataset[(Long, Long)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val parted = ds.toDF("gpos", "tok")
      .repartitionByRange(nParts, col("tok"))
      .sortWithinPartitions("tok")
      .as[(Long, String)]
      .localCheckpoint(true)
    val counts: Map[Int, Long] = parted.mapPartitions { it =>
      var n = 0L
      var prev: String = null
      it.foreach { case (_, t) => if (prev == null || t != prev) { n += 1; prev = t } }
      Iterator.single((TaskContext.getPartitionId(), n))
    }.collect().toMap
    val sortedIds = counts.keys.toSeq.sorted
    val offMap = sortedIds.zip(sortedIds.scanLeft(0L)((acc, pid) => acc + counts(pid))).toMap
    val bOff = spark.sparkContext.broadcast(offMap)
    parted.mapPartitions { it =>
      val base = bOff.value(TaskContext.getPartitionId())
      var rank = base - 1
      var prev: String = null
      it.map { case (g, t) =>
        if (prev == null || t != prev) { rank += 1; prev = t }
        (g, rank)
      }
    }
  }

  /** Window-`window` suffix ranks by prefix doubling over the corpus
    * token stream `(gpos, tok)`: log2(window) rounds, each one join +
    * one distributed dense rank. Rank equality between FULL windows is
    * exact window equality.
    */
  private[ops] def windowRanks(toks: DataFrame, window: Int, nParts: Int): DataFrame = {
    require(window >= 2 && (window & (window - 1)) == 0,
      s"window must be a power of two, got $window")
    val spark = toks.sparkSession
    import spark.implicits._
    var ranks: Dataset[(Long, Long)] =
      denseRankTokens(toks.select(col("gpos"), col("tok")).as[(Long, String)], nParts)
    var width = 1
    while (width < window) {
      val r = ranks.toDF("gpos", "r")
      // r2 = rank of the suffix `width` positions to the right. gpos
      // packing guarantees gpos + width never lands in another document
      // (docs ≪ 2^20 tokens), and within a document positions are
      // contiguous, so the right neighbour is exactly lead(r, width)
      // over the per-document position order — ONE exchange keyed by
      // the high-cardinality doc (gpos >> 20) instead of the former
      // self-equi-join on gpos + width, which shuffled BOTH sides and
      // re-derived the rank map-pass twice (profiled at 2 × ~0.6-1.1 s
      // per round at sf0.1; guide §2.4 — remove shuffles outright).
      // Missing right neighbour (doc tail) ranks as the -1 sentinel,
      // the shorter-suffix-sorts-first convention, same as the old
      // left join's no-match row.
      val byDoc = Window.partitionBy(shiftright(col("gpos"), 20)).orderBy("gpos")
      val joined = r
        .select(col("gpos"), col("r").as("r1"),
          coalesce(lead(col("r"), width).over(byDoc), lit(-1L)).as("r2"))
        .as[(Long, Long, Long)]
      ranks = denseRankPairs(joined, nParts)
      width *= 2
    }
    ranks.toDF("gpos", "r")
  }

  /** TRUE ExactSubstr REMOVAL — d34's first-occurrence-wins span dedup
    * with the suffix-array rank groups replacing the md5 gram hash:
    * every duplicated `window`-token run keeps only its globally-first
    * occurrence (min packed doc_id·2^20+pos), later occurrences'
    * covered tokens are dropped and docs rebuilt. Output contract is
    * d34's `(doc_id, n_tokens, n_removed, rebuilt)` so the two forms
    * are directly comparable; equality is TRUE window equality by
    * construction (rank groups), not a hash. First-occurrence
    * selection stays an AGGREGATE over the rank key (map-side
    * combinable — the d34 plan discipline), never a window over the
    * skewable group key.
    */
  def suffixDedup(docs: DataFrame, window: Int = 8, nParts: Int = 32): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p0", "tok")))
      .select(
        (col("doc_id") * (1L << 20) + col("p0")).as("gpos"),
        col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
      .localCheckpoint() // feeds ranks, the rebuild, and the totals — one tokenize
    // materialize the final rank assignment ONCE: it feeds two consumers
    // below (the group census and the covered-token expansion), each of
    // which would otherwise re-run the whole assign pass over the last
    // round's checkpoint (profiled at ~0.7-0.8 s per consumer at sf0.1)
    val ranks = windowRanks(toks, window, nParts).localCheckpoint()
    // doc_id and pos are ARITHMETIC on gpos (the packing is
    // gpos = doc_id·2^20 + p0) — recovering them needs no join back to
    // the token stream; the full-window bound n comes from one per-doc
    // max window instead of the former tokenize-side aggregate + join
    // (guide §2.4: two exchanges and a join replaced by one exchange)
    val byDocAll = Window.partitionBy("doc_id")
    val starts = ranks
      .select(shiftright(col("gpos"), 20).as("doc_id"),
        (col("gpos").bitwiseAND(lit((1L << 20) - 1)) + 1).as("pos"),
        col("gpos"), col("r"))
      .withColumn("n", max(col("pos")).over(byDocAll))
      .filter(col("pos") <= col("n") - window + 1)
      .select(col("doc_id"), col("pos"), col("gpos"), col("r"))
    val byGroup = starts.groupBy("r")
      .agg(count(lit(1)).as("cnt"), min(col("gpos")).as("first_key"))
    val covered = starts
      .join(byGroup, "r")
      .where(col("cnt") >= 2 && col("gpos") =!= col("first_key"))
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${window - 1})")).as("pos"))
      .distinct()
    val kept = toks.select("doc_id", "pos", "tok")
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    val totals = toks.groupBy("doc_id").agg(max(col("pos")).cast("long").as("n_tokens"))
    val keptAgg = kept
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("rebuilt"))
    totals
      .join(keptAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("rebuilt"), lit("")).as("rebuilt"))
  }

  /** Maximal duplicated token spans per document: every `window`-token
    * run occurring ≥2 times corpus-wide marks its covered tokens;
    * overlapping/adjacent covered intervals merge into maximal spans
    * `(doc_id, span_start, span_len)` (1-based token offsets).
    */
  def maximalDupSpans(docs: DataFrame, window: Int = 8, nParts: Int = 32): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p0", "tok")))
      .select(
        (col("doc_id") * (1L << 20) + col("p0")).as("gpos"),
        col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
    // one materialization of the final assignment — it feeds the group
    // census and the cover expansion (see suffixDedup's note)
    val ranks = windowRanks(toks, window, nParts).localCheckpoint()
    // FULL-window starts only: short suffixes (sentinel-ranked) are not
    // length-`window` windows and must not count as duplicates. doc_id
    // and pos are arithmetic on gpos; the per-doc length bound is one
    // max window — no join back to the token stream (guide §2.4)
    val starts = ranks
      .select(shiftright(col("gpos"), 20).as("doc_id"),
        (col("gpos").bitwiseAND(lit((1L << 20) - 1)) + 1).as("pos"),
        col("r"))
      .withColumn("n", max(col("pos")).over(Window.partitionBy("doc_id")))
      .filter(col("pos") <= col("n") - window + 1)
      .select(col("doc_id"), col("pos"), col("r"))
    val dupGroups = starts.groupBy("r").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val cov = starts.join(dupGroups.select("r"), "r")
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${window - 1})")).as("cpos"))
      .distinct()
    val byDoc = Window.partitionBy("doc_id").orderBy("cpos")
    cov
      .withColumn("grp", col("cpos") - row_number().over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(min(col("cpos")).as("span_start"), count(lit(1)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_len"))
      .orderBy("doc_id", "span_start")
  }
}
