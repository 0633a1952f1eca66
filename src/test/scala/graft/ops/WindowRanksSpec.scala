package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the arity-8 generalized prefix doubling in
  * [[SuffixArrayOps.windowRanks]]: for FULL windows, rank equality must
  * equal TRUE window-text equality — at window=8 (one arity-8 round),
  * window=16 (arity 8 then arity 2 — the constant-padded tail) and
  * window=32 (arity 8 then arity 4), across partition counts.
  */
class WindowRanksSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "a b c d e f g h i j k l m n o p q r"),
    (1L, "z z a b c d e f g h i j k l m n o p q r y"),
    (2L, "a b c d e f g h x x x x x x x x x x x x x x x x x x"),
    (3L, "q w e r t y u i o p a s d f g h j k l"),
    (4L, "a b c d e f g h i j k l m n o p q r"), // exact dup of doc 0
    (5L, "short doc"),
    (6L, "x x x x x x x x x x")
  ).toDF("doc_id", "text")

  private def toks = docs
    .select(col("doc_id"), posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p0", "tok")))
    .select((col("doc_id") * (1L << 20) + col("p0")).as("gpos"),
      col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))

  /** Group full-window starts by suffix RANK vs by the actual window
    * TEXT; the two partitions of the start set must be identical.
    */
  private def check(window: Int, nParts: Int): Unit = {
    val tk = toks.cache()
    try {
      val ranks = SuffixArrayOps.windowRanks(tk, window, nParts)
      val n = tk.groupBy("doc_id").agg(max("pos").as("n"))
      val starts = ranks
        .select(shiftright(col("gpos"), 20).as("doc_id"),
          (col("gpos").bitwiseAND(lit((1L << 20) - 1)) + 1).as("pos"), col("gpos"), col("r"))
        .join(n, "doc_id")
        .filter(col("pos") <= col("n") - window + 1)
      val windowText = tk
        .join(tk.select(col("doc_id"), col("pos").as("p2"), col("tok").as("t2")), "doc_id")
        .filter(col("p2").between(col("pos"), col("pos") + window - 1))
        .groupBy("doc_id", "pos")
        .agg(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(p2, t2))), x -> x.t2)")).as("wtext"))
      val joined = starts.join(windowText, Seq("doc_id", "pos"))
        .select(col("gpos"), col("r"), col("wtext")).collect()
      val byRank = joined.groupBy(_.getLong(1)).values.map(_.map(_.getLong(0)).toSet).toSet
      val byText = joined.groupBy(_.getString(2)).values.map(_.map(_.getLong(0)).toSet).toSet
      assert(byRank === byText, s"window=$window nParts=$nParts")
    } finally { tk.unpersist(blocking = false); () }
  }

  test("rank equality == window equality at window=8 (single arity-8 round)") {
    check(8, 3)
  }
  test("window=16 (arity 8 then padded arity 2) and window=32 (arity 8 then 4)") {
    check(16, 2)
    check(32, 4)
  }
  test("partition count never changes the rank partition") {
    check(8, 1)
    check(8, 7)
  }
}
