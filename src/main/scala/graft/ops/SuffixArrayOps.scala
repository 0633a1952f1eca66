package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRUE ExactSubstr dedup via a DISTRIBUTED SUFFIX ARRAY — the method
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL 2022), built the way a 100 TB corpus has to build it:
  * generalized prefix doubling (Manber–Myers with arity-8 rounds),
  * where one round turns window-w ranks into window-8w ranks with ONE
  * per-doc window pass + ONE range-partitioned sort — ceil(log8 window)
  * rounds, never a per-suffix comparison loop. d34 approximates the
  * goal with fixed-width hashed spans; this operator ranks the ACTUAL
  * token windows (no hashing anywhere, true equality by construction)
  * and recovers MAXIMAL duplicated spans by merging the covered-token
  * intervals.
  *
  * Spark shape:
  *  - tokens carry a global position `gpos = doc_id·2^20 + offset`;
  *    doc boundaries need no separator symbols because `gpos + j·width`
  *    can never land in another document (docs are far shorter than
  *    2^20 tokens) — a missing right neighbour ranks as the -1
  *    sentinel, exactly the shorter-suffix-sorts-first convention;
  *  - each round is: up to 7 `lead(r, j·width)` lookups riding ONE
  *    per-doc window sort + one DENSE RANK of the rank tuples by the
  *    two-phase chunked scheme — range-partition + in-partition sort,
  *    per-partition distinct counts to the driver (ONE row per
  *    partition — bounded), offsets broadcast back, second pass assigns
  *    offset + local dense index. No global window, no single-task
  *    sort; the ranks are a pure function of the total order, so the
  *    output is deterministic whatever the partitioning;
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

  /** Two-phase distributed dense rank of 8-component rank tuples
    * `(gpos, k1..k8)`: returns (gpos, rank) with ranks dense in the
    * tuples' total order. Equal keys land in one range partition, so
    * per-partition distinct counts compose into global offsets exactly.
    * Arity 8 lets [[windowRanks]] OCTUPLE the window per round (log8
    * rounds instead of log2 — guide §1.2-1: each avoided round is a
    * full corpus window-pass + range-exchange); rounds needing fewer
    * components pad the tail with a constant, which never affects
    * tuple distinctness.
    */
  private def denseRankKeys(df: DataFrame, nParts: Int): Dataset[(Long, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    type T9 = (Long, Long, Long, Long, Long, Long, Long, Long, Long)
    def key(t: T9) = (t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9)
    val kc = (1 to 8).map(i => col(s"k$i"))
    val parted = df
      .repartitionByRange(nParts, kc: _*)
      .sortWithinPartitions(kc: _*)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .localCheckpoint(true) // pin the partitioning: both passes below must see identical splits
    val counts: Map[Int, Long] = parted.mapPartitions { it =>
      var n = 0L
      var prev: Any = null
      it.foreach { t =>
        val k = key(t)
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
      var prev: Any = null
      it.map { t =>
        val k = key(t)
        if (prev == null || k != prev) { rank += 1; prev = k }
        (t._1, rank)
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
    * token stream `(gpos, tok)`. Rank equality between FULL windows is
    * exact window equality.
    *
    * PRECONDITION (callers): positions within each document must be
    * CONTIGUOUS — `gpos` values of one doc are doc_id·2^20 + 0,1,2,…
    * with no gaps, which both entry points guarantee by building the
    * stream with `posexplode`. The per-round `lead(r, width)` lookup
    * depends on it: the suffix starting `width` tokens to the right IS
    * the row `width` positions later in the per-doc order. Feeding a
    * FILTERED/gapped token stream would produce silently wrong ranks
    * (the old gpos+width self-equi-join would merely miss matches), so
    * any future caller that filters tokens must re-number positions
    * first.
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
      // One round turns width-w ranks into width-(arity·w) ranks by
      // dense-ranking the tuple (r(i), r(i+w), …, r(i+(arity-1)·w)) —
      // the Manber–Myers doubling generalized to OCTUPLING: for
      // window=8 that is ONE round (3 rounds in the pairwise form),
      // i.e. one window pass + one range exchange instead of three of
      // each (guide §1.2-1 / §2.4 — each round is a full corpus pass).
      //
      // r(i+j·w) = lead(r, j·w) over the per-document position order:
      // the gpos packing guarantees gpos + j·w never lands in another
      // document (docs ≪ 2^20 tokens) and positions are contiguous
      // (the documented precondition), so all arity-1 leads ride ONE
      // exchange + sort keyed by the high-cardinality doc (gpos >> 20).
      // A missing right neighbour (doc tail) ranks as the -1 sentinel —
      // the shorter-suffix-sorts-first convention — and sentinel-bearing
      // tuples can never collide with a full window's tuple (every
      // component of a full window is a full-subwindow rank ≥ 0, and
      // inductively short-suffix ranks never equal full-window ranks).
      val arity = math.min(window / width, 8) // both powers of two, so ≥ 2
      val r = ranks.toDF("gpos", "r")
      val byDoc = Window.partitionBy(shiftright(col("gpos"), 20)).orderBy("gpos")
      val keyed = r.select(
        Seq(col("gpos")) ++ (0 until 8).map {
          case 0 => col("r").as("k1")
          case j if j < arity =>
            coalesce(lead(col("r"), j * width).over(byDoc), lit(-1L)).as(s"k${j + 1}")
          case j => lit(-1L).as(s"k${j + 1}") // constant pad: distinctness unchanged
        }: _*)
      ranks = denseRankKeys(keyed, nParts)
      width *= arity
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
