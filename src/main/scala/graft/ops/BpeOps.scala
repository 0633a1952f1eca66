package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.{t, Q}

/** Byte-pair-encoding vocabulary induction — the tokenizer-training step
  * of an LLM data pipeline (learn merges from corpus statistics), as a
  * distributed loop.
  *
  * Shape, sized for 100 TB: the corpus first collapses to a DISTINCT-WORD
  * frequency table (one agg shuffle — the only pass over raw text; at
  * scale this is the standard sample/aggregate step and is orders of
  * magnitude smaller than the corpus). Each merge round then (a) counts
  * adjacent symbol pairs weighted by word frequency — a flatMap + one
  * small agg shuffle over the vocab table, (b) collects ONE winning row
  * to the driver (ties broken deterministically: count desc, then pair
  * lexicographic), and (c) rewrites the vocab's symbol arrays with the
  * merge applied (narrow map, no shuffle), truncating lineage with
  * localCheckpoint like the d12 label-propagation loop. Driver traffic is
  * O(merges) single rows; vocab never leaves the executors.
  */
object BpeOps {

  /** One learned merge: rank order, the merged pair, and its weighted
    * count at merge time.
    */
  final case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** End-of-word marker (the classic formulation, so "low" and "lowly"
    * share a prefix but not the terminal symbol).
    */
  val EndOfWord = "</w>"

  private def mergeSymbols(syms: Seq[String], left: String, right: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Learn `k` merges from a `(word, freq)` table. Deterministic for a
    * given table: the winner each round is (max count, then smallest
    * (left, right) pair).
    */
  def learnMerges(words: DataFrame, k: Int): Seq[Merge] = {
    val spark = words.sparkSession
    import spark.implicits._
    var vocab: org.apache.spark.sql.Dataset[(Seq[String], Long)] = words
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString).toList: Seq[String], f) }
      .map { case (syms, f) => (syms :+ EndOfWord, f) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val best = vocab
        .flatMap { case (syms, f) => syms.sliding(2).collect { case Seq(a, b) => (a, b, f) } }
        .toDF("left", "right", "f")
        .groupBy("left", "right")
        .agg(sum("f").as("n")) // codegen hash-agg, partial map-side combine
        .orderBy(col("n").desc, col("left"), col("right"))
        .head(1) // ONE row to the driver per round
      best.headOption match {
        case None => exhausted = true // no adjacent pairs left (all words fully merged)
        case Some(row) =>
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += Merge(round, l, r, n)
          // Lazy checkpoint: still truncates lineage, but materializes
          // inside the NEXT round's head(1) action instead of spending a
          // dedicated eager job per round — halves the per-round job
          // count (8 rounds of tiny-vocab jobs are latency-bound).
          vocab = vocab.map { case (syms, f) => (mergeSymbols(syms, l, r), f) }.localCheckpoint(false)
          round += 1
      }
    }
    merges.toSeq
  }

  /** Encode a word's symbols by replaying the learned merges in rank
    * order — the apply half of the tokenizer (greedy, same as training).
    */
  def applyMerges(syms: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(syms) { case (s, (l, r)) => mergeSymbols(s, l, r) }

  // --------------------------------------------------------- WordPiece

  /** One learned WordPiece merge; score = count(lr)/(count(l)·count(r)),
    * the likelihood-gain objective that distinguishes WordPiece from
    * BPE's raw-count argmax (Schuster & Nakajima 2012; the BERT
    * tokenizer's training rule).
    */
  final case class WpMerge(rank: Int, left: String, right: String, pair_count: Long)

  /** Word-initial chars are plain, continuations carry the "##" prefix
    * (the BERT convention); merging strips the right side's "##" so
    * "s"+"##p" → "sp" while "##a"+"##r" → "##ar". Single left-to-right
    * pass like [[mergeSymbols]].
    */
  def mergeSymbolsWp(syms: Seq[String], left: String, right: String): Seq[String] = {
    val merged = left + (if (right.startsWith("##")) right.drop(2) else right)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += merged
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** WordPiece vocabulary induction: [[learnMerges]]' distributed loop
    * with the likelihood-gain winner — per round ONE extra (tiny,
    * |symbols|-row) unary-count aggregate joins the pair counts to
    * score count(lr)/(count(l)·count(r)) in IEEE double (both engines
    * divide the same exact integers, so the oracle orders identically
    * without rounding); ties break (score desc, left, right). Same
    * 100 TB posture: the corpus collapses once to distinct words, each
    * round moves one winner row to the driver.
    */
  def learnWordPiece(words: DataFrame, k: Int): Seq[WpMerge] = {
    val spark = words.sparkSession
    import spark.implicits._
    var vocab: org.apache.spark.sql.Dataset[(Seq[String], Long)] = words
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
      .map { case (w, f) =>
        // iterate by CODEPOINT, not UTF-16 unit: d62's encode vocab is
        // built from Spark's codepoint split(word, ''), so the seed
        // segmentation here must match or non-BMP input would learn
        // lone-surrogate pieces absent from the encode vocab
        val cps = w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
        (cps.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }.toSeq: Seq[String], f)
      }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[WpMerge]()
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val pairs = vocab
        .flatMap { case (syms, f) => syms.sliding(2).collect { case Seq(a, b) => (a, b, f) } }
        .toDF("left", "right", "f")
        .groupBy("left", "right").agg(sum("f").as("n"))
      val units = vocab
        .flatMap { case (syms, f) => syms.map((_, f)) }
        .toDF("sym", "f")
        .groupBy("sym").agg(sum("f").as("m"))
      val best = pairs
        .join(units.select(col("sym").as("left"), col("m").as("ml")), "left")
        .join(units.select(col("sym").as("right"), col("m").as("mr")), "right")
        .withColumn("sc", col("n").cast("double") / (col("ml").cast("double") * col("mr").cast("double")))
        .orderBy(col("sc").desc, col("left"), col("right"))
        .select("left", "right", "n")
        .head(1)
      best.headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          merges += WpMerge(round, l, r, n)
          vocab = vocab.map { case (syms, f) => (mergeSymbolsWp(syms, l, r), f) }.localCheckpoint(false)
          round += 1
      }
    }
    merges.toSeq
  }

  /** Greedy longest-match-first (maximal munch) WordPiece encoding — the
    * BERT runtime tokenizer, a DIFFERENT algorithm from training-merge
    * replay (d19's BPE encode): at each position take the longest vocab
    * piece that matches (word-initial pieces plain, continuations
    * "##"-prefixed). With every single char in the vocab it cannot
    * fail, so no [UNK] handling is needed here.
    */
  def wordPieceEncode(w: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      var l = w.length - pos
      var found: String = null
      while (found == null && l >= 1) {
        val cand = (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
        if (vocab(cand)) found = cand else l -= 1
      }
      require(found != null, s"'$w' unencodable at $pos — single-char coverage broken")
      out += found
      pos += l
    }
    out.toSeq
  }

  // ----------------------------------------------- unigram-LM tokenizer

  /** HALF_UP 6dp — the cross-engine stage-boundary rounding grain
    * (matches both Spark's round() and DuckDB's).
    */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Viterbi segmentation of one word under piece log-probs: maximize
    * the summed logp over pieces (length <= 4), scores rounded 6dp at
    * every DP cell so the oracle's unrolled replay compares equal
    * doubles; ties prefer the LONGER piece (ORDER BY s DESC, l DESC in
    * the oracle). Single chars are always in the vocab, so every
    * prefix is segmentable and no -inf handling is needed.
    */
  def viterbiPieces(w: String, lp: scala.collection.Map[String, Double]): Seq[String] = {
    val n = w.length
    val best = new Array[Double](n + 1)
    val bl = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bs = Double.NegativeInfinity
      var bestL = 0
      var l = 1
      while (l <= math.min(4, i)) {
        lp.get(w.substring(i - l, i)).foreach { x =>
          val s = r6(best(i - l) + x)
          if (s > bs || (s == bs && l > bestL)) { bs = s; bestL = l }
        }
        l += 1
      }
      require(bestL > 0, s"word '$w' position $i unsegmentable — single-char coverage broken")
      best(i) = bs; bl(i) = bestL
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { val l = bl(pos); out += w.substring(pos - l, pos); pos -= l }
    out.reverse.toSeq
  }

  /** Unigram-LM tokenizer induction — the SentencePiece shape (Kudo
    * 2018), hard-EM/Viterbi variant: seed the vocab with every single
    * char (coverage floor, never pruned) plus the top `seedMulti`
    * multi-char substrings (len ≤ 4) by corpus frequency; then each
    * round runs an E-step (Viterbi-segment every distinct word under
    * the current piece log-probs — one broadcast of the ≤ ~70-entry
    * vocab, one narrow map over the word table, one bounded agg) and an
    * M-step (re-estimate probs from the Viterbi piece counts with +1
    * smoothing and PRUNE the `prunePerRound` weakest multi-char
    * pieces). Scale shape mirrors [[learnMerges]]: the corpus collapses
    * once to the distinct-word frequency table; rounds move only
    * vocab-bounded rows to the driver. Deterministic: seed and prune
    * tie-break (count desc, piece asc), DP tie-break (score, then
    * longer piece), 6dp rounding at every stage boundary — so the
    * oracle can replay the whole induction as unrolled CTEs (d18's
    * discipline).
    *
    * Returns the final vocab: (piece, last round's raw Viterbi count,
    * smoothed logp), sorted by piece.
    */
  def learnUnigram(
      words0: DataFrame,
      rounds: Int = 2,
      seedMulti: Int = 40,
      prunePerRound: Int = 8): Seq[(String, Long, Double)] = {
    val spark = words0.sparkSession
    import spark.implicits._
    val words = words0.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].localCheckpoint()
    val maxLen = words.map(_._1.length).reduce(math.max)
    require(maxLen <= 12, s"word length $maxLen exceeds the oracle's 12-stage DP unroll")
    val pieceFreq = words
      .flatMap { case (w, f) =>
        for { i <- 0 until w.length; l <- 1 to 4 if i + l <= w.length }
          yield (w.substring(i, i + l), f)
      }
      .toDF("piece", "f").groupBy("piece").agg(sum("f").as("freq"))
      .localCheckpoint()
    val multi0 = pieceFreq.where(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(seedMulti)
      .as[(String, Long)].collect()
    val chars0 = pieceFreq.where(length(col("piece")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    var kept: Seq[(String, Long)] = (multi0 ++ chars0).toSeq
    val total0 = kept.map(_._2).sum.toDouble
    var vocabLp: Map[String, Double] =
      kept.map { case (p, c) => p -> r6(math.log(c / total0)) }.toMap
    var keepMulti = seedMulti
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(vocabLp)
      val counts = words
        .flatMap { case (w, f) => viterbiPieces(w, bc.value).map(p => (p, f)) }
        .toDF("piece", "f").groupBy("piece").agg(sum("f").as("cnt"))
        .as[(String, Long)].collect().toMap
      keepMulti -= prunePerRound
      val multis = vocabLp.keysIterator.filter(_.length >= 2)
        .map(p => (p, counts.getOrElse(p, 0L))).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(keepMulti)
      val chars = vocabLp.keysIterator.filter(_.length == 1)
        .map(p => (p, counts.getOrElse(p, 0L))).toSeq.sortBy(_._1)
      kept = multis ++ chars
      val total = kept.map(_._2 + 1L).sum.toDouble // +1 smoothing keeps 0-count chars finite
      vocabLp = kept.map { case (p, c) => p -> r6(math.log((c + 1L) / total)) }.toMap
    }
    kept.map { case (p, c) => (p, c, vocabLp(p)) }.sortBy(_._1)
  }

  /** Distinct-word frequency table of the documents corpus — the single
    * pass over raw text that every subsequent merge round reuses.
    */
  def wordFreqs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  val queries: Map[String, Q] = Map(
    // Learned merge table (rank-ordered). EXACT-oracle: the iterative
    // argmax fixpoint can't be a single SQL query, but with a FIXED round
    // count it unrolls — the oracle below is 8 generated CTE stages, each
    // counting weighted adjacent pairs over the (tiny, distinct-word)
    // vocab, picking the same (count desc, pair asc) winner, and
    // rewriting symbols with a boundary-safe string replace whose
    // left-to-right non-overlapping semantics match mergeSymbols.
    // BpeOpsSpec still pins the hand-computed fixture sequence.
    "d18_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      learnMerges(wordFreqs(s, dir), k = 8)
        .toDF()
        .select(col("rank"), col("left"), col("right"), col("pair_count"))
        .orderBy("rank")
    }),

    // The APPLY half: re-encode every document with the learned merges.
    // Oracle-checked in the soundness-summary shape: n_words and
    // n_char_symbols are EXACT scalars DuckDB recomputes from the raw
    // text, while the merge replay itself is checked by two per-doc
    // assertion columns the oracle pins as literal TRUE — detok_ok
    // (every word's BPE tokens concatenate back to the word + the
    // end-of-word marker, the tokenizer round-trip guarantee) and
    // bounds_ok (n_words <= n_bpe_tokens <= n_char_symbols: merging only
    // ever shrinks a word, never below one token). A replay bug that
    // drops, duplicates, or reorders symbols flips detok_ok and fails
    // the gate. Merges are a tiny driver-side list shipped in the task
    // closure (same posture as the envelope key); encoding is one narrow
    // pass, no shuffle before the final sort.
    "d19_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val merges = learnMerges(wordFreqs(s, dir), k = 8).map(m => (m.left, m.right))
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // one parquet split: spread the per-word merge replay across tasks
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .mapPartitions { rows =>
          // per-partition word cache (the fastBPE/HuggingFace trick):
          // BPE encoding of a word is context-free, and token streams are
          // Zipf-distributed, so almost every word is a repeat — replay
          // the merges once per DISTINCT word per task, not per position
          val cache = scala.collection.mutable.HashMap.empty[String, (Long, Long, Boolean)]
          val cacheCap = 1 << 20 // bound task memory on open-vocab corpora
          def encode(w: String): (Long, Long, Boolean) = {
            val syms = (w.map(_.toString).toList: Seq[String]) :+ EndOfWord
            val toks = applyMerges(syms, merges)
            (syms.length.toLong, toks.length.toLong, toks.mkString("") == w + EndOfWord)
          }
          rows.map { case (id, text) =>
            val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
            var nSym = 0L
            var nTok = 0L
            var detokOk = true
            words.foreach { w =>
              val (symLen, tokLen, ok) =
                if (cache.size < cacheCap) cache.getOrElseUpdate(w, encode(w))
                else cache.getOrElse(w, encode(w))
              nSym += symLen
              nTok += tokLen
              detokOk &&= ok
            }
            val boundsOk = words.length <= nTok && nTok <= nSym
            (id, words.length.toLong, nSym, detokOk, boundsOk)
          }
        }
        .toDF("doc_id", "n_words", "n_char_symbols", "detok_ok", "bounds_ok")
        .orderBy("doc_id")
    }),

    // WordPiece induction (the BERT training rule) — d18's loop with the
    // likelihood-gain winner count(lr)/(count(l)·count(r)). EXACT-oracle
    // by the d18 unroll discipline, plus one unary-count CTE per round;
    // the score needs no rounding because both engines divide the same
    // exact integers in IEEE double and ties fall back to the pair.
    "d61_wordpiece_merges" -> ((s, dir) => {
      import s.implicits._
      learnWordPiece(wordFreqs(s, dir), k = 8)
        .toDF()
        .select(col("rank"), col("left"), col("right"), col("pair_count"))
        .orderBy("rank")
    }),

    // The greedy longest-match-first (maximal munch) encode half — the
    // BERT runtime algorithm, distinct from d19's merge replay. Vocab =
    // every corpus char (plain + "##" continuation forms, so encoding
    // cannot fail) plus the 8 learned d61 pieces, shipped in the task
    // closure; one narrow pass, d19's per-partition word cache, and the
    // d19 soundness-summary oracle shape (exact scalars recomputed by
    // DuckDB + assertion columns pinned literal TRUE: detok_ok is the
    // ##-stripping round trip, bounds_ok the 1 ≤ pieces ≤ chars rule).
    "d62_wordpiece_encode" -> ((s, dir) => {
      import s.implicits._
      val merges = learnWordPiece(wordFreqs(s, dir), k = 8)
      val mergedPieces = merges.foldLeft(Set.empty[String]) { (acc, m) =>
        acc + (m.left + (if (m.right.startsWith("##")) m.right.drop(2) else m.right))
      }
      val chars = wordFreqs(s, dir)
        .select(explode(split(col("word"), "")).as("c")).distinct()
        .as[String].collect().filter(_.nonEmpty).toSet
      val vocab = chars ++ chars.map("##" + _) ++ mergedPieces
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[(Long, String)]
        .mapPartitions { rows =>
          val cache = scala.collection.mutable.HashMap.empty[String, (Long, Long, Boolean)]
          def encode(w: String): (Long, Long, Boolean) = {
            val pieces = wordPieceEncode(w, vocab)
            (w.length.toLong, pieces.length.toLong,
              pieces.map(p => if (p.startsWith("##")) p.drop(2) else p).mkString("") == w)
          }
          rows.map { case (id, text) =>
            val words = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
            var nChars = 0L
            var nPieces = 0L
            var detokOk = true
            words.foreach { w =>
              val (cl, pl, ok) = cache.getOrElseUpdate(w, encode(w))
              nChars += cl; nPieces += pl; detokOk &&= ok
            }
            val boundsOk = words.length <= nPieces && nPieces <= nChars
            (id, words.length.toLong, nChars, detokOk, boundsOk)
          }
        }
        .toDF("doc_id", "n_words", "n_chars", "detok_ok", "bounds_ok")
        .orderBy("doc_id")
    }),

    // The learned unigram-LM vocab (SentencePiece's model family, next
    // to d18's BPE): final pieces with their last-round Viterbi counts
    // and smoothed log-probs. EXACT-oracle by the d18 discipline — the
    // whole induction (substring seeding, two Viterbi-EM rounds with
    // the DP unrolled to 12 position stages, count-based pruning, +1-
    // smoothed re-estimation) replays as generated DuckDB CTEs with
    // identical tie-breaks and 6dp stage rounding.
    "d59_unigram_lm" -> ((s, dir) => {
      import s.implicits._
      learnUnigram(wordFreqs(s, dir)).toDF("piece", "cnt", "logp").orderBy("piece")
    })
  )

  /** The d18 oracle, generated by unrolling `k` merge rounds into CTE
    * stages (see the d18 comment). `v0` seeds each distinct word's
    * symbol string joined with DOUBLE sentinel spaces; the per-round
    * replace matches ` l  r ` (one boundary space each side) and emits
    * ` lr `, so each match consumes only one of the two spaces at each
    * boundary and the replacement restores it — adjacent occurrences
    * (`abab`, `aaaa`) therefore never share a delimiter and all merge in
    * one left-to-right pass, exactly like the single-pass
    * [[mergeSymbols]]. (A single-space sentinel breaks here: the first
    * match eats the space the second needs.) An exhausted round leaves
    * its `b` CTE empty and the LEFT JOIN + coalesce carries the vocab
    * through unchanged while the final UNION simply omits that rank —
    * the same early-stop shape as learnMerges.
    */
  private def d18OracleSql(k: Int): String = {
    val head = Seq(
      """w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word FROM documents)
        |  WHERE len(word) > 0 GROUP BY word)""".stripMargin,
      """v0 AS (SELECT word, freq,
        |  '  ' || array_to_string(list_append(string_split(word, ''), '</w>'), '  ') || '  ' AS s FROM w)""".stripMargin
    )
    val stages = (0 until k).flatMap { i =>
      Seq(
        s"""p$i AS (SELECT t[i] AS l, t[i+1] AS r, sum(freq) AS n
           |  FROM (SELECT freq, string_split(trim(s), '  ') AS t FROM v$i), UNNEST(range(1, len(t))) u(i)
           |  GROUP BY 1, 2)""".stripMargin,
        s"b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1)",
        s"""v${i + 1} AS (SELECT word, freq,
           |  coalesce(replace(s, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' '), s) AS s
           |  FROM v$i LEFT JOIN b$i b ON true)""".stripMargin
      )
    }
    val union = (0 until k)
      .map(i => s"SELECT CAST($i AS INT) AS rank, l AS left, r AS right, CAST(n AS BIGINT) AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    "WITH " + (head ++ stages).mkString(",\n") + "\nSELECT * FROM (\n" + union + "\n) ORDER BY rank"
  }

  /** The d61 oracle: d18's unroll with the WordPiece scoring — each
    * round adds a unary-count CTE (u$i) beside the pair counts and the
    * winner maximizes CAST(n AS DOUBLE)/(m_l·m_r) with (left, right)
    * tie-break; the v-rewrite strips the right symbol's "##" on merge.
    * Seed symbols: word-initial char plain, continuations "##"-prefixed
    * (the BERT convention), double-space sentinels as in d18.
    */
  private def d61OracleSql(k: Int): String = {
    val head = Seq(
      """w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word FROM documents)
        |  WHERE len(word) > 0 GROUP BY word)""".stripMargin,
      """v0 AS MATERIALIZED (SELECT word, freq,
        |  '  ' || array_to_string(list_transform(range(1, len(word) + 1),
        |      i -> CASE WHEN i = 1 THEN word[i] ELSE '##' || word[i] END), '  ') || '  ' AS s FROM w)""".stripMargin
    )
    // Each v$i is referenced three times (u$i, p$i, v${i+1}); DuckDB
    // inlines plain CTEs, which would compound to 3^k leaf scans —
    // MATERIALIZED caps every round at one.
    val stages = (0 until k).flatMap { i =>
      Seq(
        s"""u$i AS (SELECT sym, sum(freq) AS m
           |  FROM (SELECT freq, unnest(string_split(trim(s), '  ')) AS sym FROM v$i) GROUP BY 1)""".stripMargin,
        s"""p$i AS (SELECT t[i] AS l, t[i+1] AS r, sum(freq) AS n
           |  FROM (SELECT freq, string_split(trim(s), '  ') AS t FROM v$i), UNNEST(range(1, len(t))) u(i)
           |  GROUP BY 1, 2)""".stripMargin,
        s"""b$i AS (SELECT l, r, n FROM (
           |  SELECT p.l, p.r, p.n, CAST(p.n AS DOUBLE) / (CAST(ul.m AS DOUBLE) * CAST(ur.m AS DOUBLE)) AS sc
           |  FROM p$i p JOIN u$i ul ON ul.sym = p.l JOIN u$i ur ON ur.sym = p.r)
           |  ORDER BY sc DESC, l, r LIMIT 1)""".stripMargin,
        s"""v${i + 1} AS MATERIALIZED (SELECT word, freq,
           |  coalesce(replace(s, ' ' || b.l || '  ' || b.r || ' ',
           |    ' ' || b.l || CASE WHEN starts_with(b.r, '##') THEN substr(b.r, 3) ELSE b.r END || ' '), s) AS s
           |  FROM v$i LEFT JOIN b$i b ON true)""".stripMargin
      )
    }
    val union = (0 until k)
      .map(i => s"SELECT CAST($i AS INT) AS rank, l AS left, r AS right, CAST(n AS BIGINT) AS pair_count FROM b$i")
      .mkString("\nUNION ALL\n")
    "WITH " + (head ++ stages).mkString(",\n") + "\nSELECT * FROM (\n" + union + "\n) ORDER BY rank"
  }

  /** The d59 oracle: the unigram-LM induction unrolled. Per round, the
    * Viterbi DP becomes `lmax` position CTEs (b_i = best rounded score
    * + chosen piece length at position i, tie-break score desc then
    * longer piece), the backtrace becomes `lmax` chained step CTEs
    * walking chosen lengths back from each word's end, and the M-step
    * is the same (count desc, piece) prune + (+1)-smoothed re-score.
    * Reused big CTEs are AS MATERIALIZED (DuckDB inlines plain CTEs —
    * the bt/cnt tables are each referenced lmax times).
    */
  private def d59OracleSql(rounds: Int, seedMulti: Int, prune: Int, lmax: Int): String = {
    val head = Seq(
      """w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq, len(word) AS n
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word FROM documents)
        |  WHERE len(word) > 0 GROUP BY word)""".stripMargin,
      s"""cand AS (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece, CAST(sum(freq) AS BIGINT) AS freq
         |  FROM w, range(1, ${lmax + 1}) r1(i), range(1, 5) r2(l) WHERE i + l - 1 <= n GROUP BY 1)""".stripMargin,
      s"m0 AS (SELECT piece, freq FROM cand WHERE len(piece) >= 2 ORDER BY freq DESC, piece LIMIT $seedMulti)",
      "c0 AS (SELECT piece, freq FROM cand WHERE len(piece) = 1)",
      "k0 AS (SELECT * FROM m0 UNION ALL SELECT * FROM c0)",
      "v0 AS MATERIALIZED (SELECT piece, round(ln(CAST(freq AS DOUBLE) / (SELECT sum(freq) FROM k0)), 6) AS lp FROM k0)"
    )
    val roundStages = (1 to rounds).flatMap { r =>
      val v = s"v${r - 1}"
      val b0 = s"b${r}_0 AS (SELECT word, CAST(0 AS DOUBLE) AS s, 0 AS l FROM w)"
      val dp = (1 to lmax).map { i =>
        val alts = (1 to math.min(4, i)).map { l =>
          s"""SELECT w.word, round(b.s + x.lp, 6) AS s, $l AS l
             |      FROM w JOIN b${r}_${i - l} b USING (word) JOIN $v x ON x.piece = substr(w.word, ${i - l + 1}, $l)
             |      WHERE w.n >= $i""".stripMargin
        }.mkString("\n      UNION ALL\n")
        s"""b${r}_$i AS (SELECT word, s, l FROM (
           |  SELECT word, s, l, row_number() OVER (PARTITION BY word ORDER BY s DESC, l DESC) AS rn FROM (
           |      $alts)) WHERE rn = 1)""".stripMargin
      }
      val bt = s"bt$r AS MATERIALIZED (" +
        (1 to lmax).map(i => s"SELECT word, $i AS i, l FROM b${r}_$i").mkString(" UNION ALL ") + ")"
      val t0 = s"t${r}_0 AS (SELECT word, freq, n AS pos, CAST(NULL AS VARCHAR) AS piece FROM w)"
      val ts = (1 to lmax).map { k =>
        s"""t${r}_$k AS (SELECT t.word, t.freq, t.pos - b.l AS pos,
           |  substr(t.word, CAST(t.pos - b.l + 1 AS INT), CAST(b.l AS INT)) AS piece
           |  FROM t${r}_${k - 1} t JOIN bt$r b ON b.word = t.word AND b.i = t.pos WHERE t.pos > 0)""".stripMargin
      }
      val cnt = s"cnt$r AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (" +
        (1 to lmax).map(k => s"SELECT piece, freq FROM t${r}_$k").mkString(" UNION ALL ") +
        ") GROUP BY piece)"
      val keepM = seedMulti - r * prune
      val keep = Seq(
        s"""km$r AS (SELECT v.piece, coalesce(c.cnt, 0) AS cnt FROM $v v LEFT JOIN cnt$r c USING (piece)
           |  WHERE len(v.piece) >= 2 ORDER BY cnt DESC, v.piece LIMIT $keepM)""".stripMargin,
        s"""kc$r AS (SELECT v.piece, coalesce(c.cnt, 0) AS cnt FROM $v v LEFT JOIN cnt$r c USING (piece)
           |  WHERE len(v.piece) = 1)""".stripMargin,
        s"k$r AS (SELECT * FROM km$r UNION ALL SELECT * FROM kc$r)",
        s"v$r AS MATERIALIZED (SELECT piece, cnt, round(ln(CAST(cnt + 1 AS DOUBLE) / (SELECT sum(cnt + 1) FROM k$r)), 6) AS lp FROM k$r)"
      )
      Seq(b0) ++ dp ++ Seq(bt, t0) ++ ts ++ Seq(cnt) ++ keep
    }
    "WITH " + (head ++ roundStages).mkString(",\n") +
      s"\nSELECT piece, cnt, lp AS logp FROM v$rounds ORDER BY piece"
  }

  val oracleSql: Map[String, String] = Map(
    "d18_bpe_merges" -> d18OracleSql(8),
    "d61_wordpiece_merges" -> d61OracleSql(8),
    // d19's soundness-summary shape: exact halves recomputed from raw
    // text, assertion halves pinned TRUE (detok round trip, piece-count
    // bounds); n_chars here is character count, WordPiece has no
    // end-of-word marker.
    "d62_wordpiece_encode" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS word
        |           FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(len(word)) AS BIGINT) AS n_chars,
        |       true AS detok_ok, true AS bounds_ok
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d59_unigram_lm" -> d59OracleSql(rounds = 2, seedMulti = 40, prune = 8, lmax = 12),
    // Exact halves recomputed from raw text; assertion halves pinned TRUE
    // (see the d19 comment). Every document in this corpus has at least
    // one word after trim, so the per-word unnest never drops a doc.
    "d19_bpe_encode" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS word
        |           FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum(len(word) + 1) AS BIGINT) AS n_char_symbols,
        |       true AS detok_ok, true AS bounds_ok
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
