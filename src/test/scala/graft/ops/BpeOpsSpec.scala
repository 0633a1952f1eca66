package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** BPE induction is not oracle-checkable (iterative argmax fixpoint), so
  * correctness pins here: the EXACT merge sequence on the classic
  * hand-computable fixture, plus determinism on the real corpus.
  */
class BpeOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("learnMerges reproduces the classic fixture's exact merge sequence") {
    import spark.implicits._
    // The canonical BPE illustration vocabulary (hand-computed below):
    // low:5 lower:2 newest:6 widest:3, symbols = chars + </w>.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)).toDF("word", "freq")
    val merges = BpeOps.learnMerges(words, k = 8).map(m => (m.left, m.right, m.pair_count))
    val expected = Seq(
      ("e", "s", 9L), // (e,s)=(s,t)=(t,</w>)=9; lexicographic tie-break picks (e,s)
      ("es", "t", 9L),
      ("est", "</w>", 9L),
      ("l", "o", 7L), // (l,o)=(o,w)=7
      ("lo", "w", 7L),
      ("e", "w", 6L), // (e,w)=(n,e)=(w,est</w>)=6
      ("ew", "est</w>", 6L),
      ("n", "ewest</w>", 6L)
    )
    assert(merges == expected, s"got $merges")
  }

  test("merge ranks are sequential and the loop stops when no pairs remain") {
    import spark.implicits._
    val words = Seq(("ab", 3L)).toDF("word", "freq") // a b </w>: only 2 merges possible
    val merges = BpeOps.learnMerges(words, k = 10)
    assert(merges.map(_.rank) == Seq(0, 1))
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("applyMerges replays the fixture merges exactly (the encode half)") {
    import spark.implicits._
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)).toDF("word", "freq")
    val merges = BpeOps.learnMerges(words, k = 8).map(m => (m.left, m.right))
    def enc(w: String) =
      BpeOps.applyMerges((w.map(_.toString).toList: Seq[String]) :+ BpeOps.EndOfWord, merges)
    assert(enc("newest") == Seq("newest</w>")) // fully merged by rank 8
    assert(enc("low") == Seq("low", "</w>"))
    assert(enc("widest") == Seq("w", "i", "d", "est</w>"))
    assert(enc("unseen") == Seq("u", "n", "s", "e", "e", "n", "</w>")) // OOV stays at char level
  }

  test("d19 encode: every doc round-trips through the merges with in-bounds token counts") {
    val rows = graft.SparkEntry
      .queries("d19_bpe_encode")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2))) // n_words <= n_char_symbols
    assert(rows.forall(_.getBoolean(3)), "detok_ok must hold for every doc")
    assert(rows.forall(_.getBoolean(4)), "bounds_ok must hold for every doc")
  }

  test("d18 over the corpus is deterministic across runs and rank-complete") {
    val a = graft.SparkEntry.queries("d18_bpe_merges")(spark, "/root/testdata/sf0.001").collect().toSeq
    val b = graft.SparkEntry.queries("d18_bpe_merges")(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(a == b)
    assert(a.map(_.getInt(0)) == (0 until a.size))
    assert(a.nonEmpty && a.size <= 8)
  }

  // ------------------------------------------------ unigram-LM (d59)

  test("d59 unigram LM: Viterbi segmentation detokenizes back to every word") {
    import org.apache.spark.sql.functions._
    val words = BpeOps.wordFreqs(spark, "/root/testdata/sf0.001")
    val vocab = BpeOps.learnUnigram(words)
    val lp = vocab.map { case (p, _, l) => p -> l }.toMap
    val ws = words.select(col("word")).collect().map(_.getString(0))
    assert(ws.nonEmpty)
    ws.foreach { w =>
      val pieces = BpeOps.viterbiPieces(w, lp)
      assert(pieces.mkString("") == w, s"'$w' detokenized to '${pieces.mkString("")}'")
      assert(pieces.forall(lp.contains), s"'$w' used an out-of-vocab piece")
    }
  }

  test("d59 unigram LM: vocab shrinks monotonically and single chars are never pruned") {
    import spark.implicits._
    val words = Seq(("unigram", 5L), ("union", 3L), ("grammar", 4L), ("ion", 2L))
      .toDF("word", "freq")
    val chars = "unigramo".toSet.map((c: Char) => c.toString)
    for (r <- 0 to 2) {
      val vocab = BpeOps.learnUnigram(words, rounds = r, seedMulti = 12, prunePerRound = 3)
      val multis = vocab.collect { case (p, _, _) if p.length >= 2 => p }
      assert(multis.length == 12 - 3 * r, s"round $r: ${multis.length} multi pieces")
      val singles = vocab.collect { case (p, _, _) if p.length == 1 => p }.toSet
      assert(singles == chars, s"round $r: char coverage changed: $singles")
    }
  }

  test("d59 unigram LM: segmentation prefers high-probability long pieces " +
    "and the induction is deterministic") {
    // 'aaab' dominated by piece 'aaa': the word segments as [aaa, b],
    // never four singles -- the DP must sum logp and prefer the longer
    // piece on ties
    val lp = Map("aaa" -> -0.5, "aa" -> -1.0, "a" -> -2.0, "b" -> -2.0)
    assert(BpeOps.viterbiPieces("aaab", lp) == Seq("aaa", "b"))
    // [aa, aa] = -2.0 beats [aaa, a] = -2.5: the DP maximizes the SUM,
    // not greedy longest-match
    assert(BpeOps.viterbiPieces("aaaa", lp) == Seq("aa", "aa"))
    val words = BpeOps.wordFreqs(spark, "/root/testdata/sf0.001")
    assert(BpeOps.learnUnigram(words) == BpeOps.learnUnigram(words))
  }

  test("learnWordPiece: likelihood winner diverges from BPE's count winner (hand-computed)") {
    import spark.implicits._
    // ab:4 abc:2 bc:3 → symbols a/##b, a/##b/##c, b/##c.
    // Round 0: pair counts (a,##b)=6 (##b,##c)=2 (b,##c)=3; unaries
    // a=6 ##b=6 ##c=5 b=3. Scores 6/36, 2/30, 3/15 → (b,##c) wins at
    // 0.2 even though BPE's raw-count rule would take (a,##b)=6.
    // Round 1: (a,##b)=6/36 TIES (##b,##c)=2/12 at exactly 1/6 (IEEE
    // division is correctly rounded, so both are the same double);
    // pair tie-break picks "##b" < "a". Round 2: another exact 1/6
    // tie, right-side tie-break "##b" < "##bc". Round 3: last pair.
    val words = Seq(("ab", 4L), ("abc", 2L), ("bc", 3L)).toDF("word", "freq")
    val merges = BpeOps.learnWordPiece(words, k = 8).map(m => (m.left, m.right, m.pair_count))
    assert(merges == Seq(
      ("b", "##c", 3L),
      ("##b", "##c", 2L),
      ("a", "##b", 4L),
      ("a", "##bc", 2L)), s"got $merges")
  }

  test("mergeSymbolsWp strips the continuation prefix: s+##p=sp, ##a+##r=##ar") {
    assert(BpeOps.mergeSymbolsWp(Seq("s", "##p"), "s", "##p") == Seq("sp"))
    assert(BpeOps.mergeSymbolsWp(Seq("x", "##a", "##r"), "##a", "##r") == Seq("x", "##ar"))
  }

  test("learnWordPiece seeds by CODEPOINT: non-BMP words learn whole-codepoint pieces " +
    "that the codepoint-split encode vocab can replay") {
    import spark.implicits._
    // U+1F4A1 is a surrogate PAIR in UTF-16; a code-unit seed would emit
    // two lone-surrogate symbols that split(word,'')'s codepoint vocab
    // lacks, and encode's length-1 fallback would throw (ADVICE r12)
    val bulb = new String(Character.toChars(0x1F4A1))
    val words = Seq((s"$bulb${bulb}x", 3L), (s"x$bulb", 2L)).toDF("word", "freq")
    val merges = BpeOps.learnWordPiece(words, k = 2)
    assert(merges.nonEmpty)
    val pieceChars = merges.flatMap(m => (m.left + m.right).toCharArray)
    merges.foreach { m =>
      Seq(m.left, m.right).foreach { s =>
        val stripped = if (s.startsWith("##")) s.drop(2) else s
        assert(!Character.isSurrogate(stripped.head) || stripped.length > 1,
          s"lone surrogate piece '$s' learned from non-BMP input: $merges")
      }
    }
    assert(pieceChars.nonEmpty)
    // the d62 vocab construction (codepoint singles + merges) replays it
    val mergedPieces = merges.foldLeft(Set.empty[String]) { (acc, m) =>
      acc + (m.left + (if (m.right.startsWith("##")) m.right.drop(2) else m.right))
    }
    val chars = Set(bulb, "x")
    val vocab = chars ++ chars.map("##" + _) ++ mergedPieces
    val pieces = BpeOps.wordPieceEncode(s"$bulb${bulb}x", vocab)
    assert(pieces.map(p => if (p.startsWith("##")) p.drop(2) else p).mkString == s"$bulb${bulb}x")
  }

  test("wordPieceEncode is maximal munch and round-trips through ## stripping") {
    val vocab = Set("a", "b", "c", "##a", "##b", "##c", "ab", "##bc", "abc")
    assert(BpeOps.wordPieceEncode("abc", vocab) == Seq("abc"))
    // without the whole-word piece, the longest PREFIX wins over a
    // segmentation with fewer pieces later ("ab"+"##c", not "a"+"##bc")
    assert(BpeOps.wordPieceEncode("abc", vocab - "abc") == Seq("ab", "##c"))
    assert(BpeOps.wordPieceEncode("cab", vocab) == Seq("c", "##a", "##b"))
    // round trip
    val pieces = BpeOps.wordPieceEncode("cabc", vocab)
    assert(pieces.map(p => if (p.startsWith("##")) p.drop(2) else p).mkString == "cabc")
  }
}
