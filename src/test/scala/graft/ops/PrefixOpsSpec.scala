package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PrefixOps]] must be value-identical to the naive
  * `Window.partitionBy(key)` forms it replaces (the chunking is an
  * execution detail — ANY monotone chunking yields the same prefix sums),
  * and its plan must never partition a window by the key alone.
  */
class PrefixOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def fixture = {
    import spark.implicits._
    // deliberately skewed: one key holds ~90% of rows — the shape that
    // serializes a per-key window and that the two-phase form must survive
    (1 to 2000).map(i => (if (i % 10 == 0) "small" else "big", i.toLong, (i % 7 + 1).toLong))
      .toDF("k", "id", "v")
      .repartition(8)
  }

  test("partitionedCumSum equals the naive per-key running-sum window, including on skew") {
    val df = fixture
    val naive = df.withColumn("cum",
      sum(col("v")).over(Window.partitionBy("k").orderBy("id")))
    val got = PrefixOps.partitionedCumSum(df, "k", Seq("id"), "v", "cum", nChunks = 16)
    assert(got.select("k", "id", "v", "cum").exceptAll(naive.select("k", "id", "v", "cum")).isEmpty)
    assert(naive.select("k", "id", "v", "cum").exceptAll(got.select("k", "id", "v", "cum")).isEmpty)
  }

  test("partitionedRowNumber equals the naive per-key row_number window") {
    val df = fixture
    val naive = df.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("id")).cast("long"))
    val got = PrefixOps.partitionedRowNumber(df, "k", Seq("id"), "rn", nChunks = 16)
    assert(got.select("k", "id", "rn").exceptAll(naive.select("k", "id", "rn")).isEmpty)
    assert(naive.select("k", "id", "rn").exceptAll(got.select("k", "id", "rn")).isEmpty)
  }

  test("chunk assignment is monotone in the order key within each part") {
    val df = PrefixOps.withRangeChunks(fixture, "k", "id", "chunk", nChunks = 16)
    val naughty = df.alias("a").join(df.alias("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") && col("a.chunk") > col("b.chunk"))
    assert(naughty.isEmpty, "a later row landed in an earlier chunk")
    // the skewed key really splits into multiple chunks (parallelism exists)
    val spread = df.filter(col("k") === "big").select(countDistinct("chunk")).collect().head.getLong(0)
    assert(spread > 4, s"expected the fat key to spread over chunks, got $spread")
  }

  test("plan: no window partitioned by the key alone; offsets broadcast back") {
    val got = PrefixOps.partitionedCumSum(fixture, "k", Seq("id"), "v", "cum", nChunks = 16)
    val p = got.queryExecution.executedPlan.toString
    val windowLines = p.split("\n").filter(l => l.contains("Window [") && !l.contains("WindowGroupLimit"))
    assert(windowLines.nonEmpty, p)
    windowLines.foreach(l => assert(l.contains("__chunk"), s"window not chunk-partitioned: $l"))
    assert(p.contains("BroadcastHashJoin"), s"offsets/cuts not broadcast:\n$p")
  }
  test("d58: each epoch is a complete permutation into balanced shards; epochs genuinely differ") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("d58_epoch_shuffle")(spark, dir).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard_id"), r.getAs[Long]("pos_in_shard")))
    val n = Tables.t(spark, dir, "documents").count()
    Seq(0, 1).foreach { e =>
      val ep = rows.filter(_._1 == e)
      assert(ep.length == n, s"epoch $e does not cover the corpus: ${ep.length} vs $n")
      // (shard, pos) slots are a bijection onto 0..n-1
      val slots = ep.map(r => r._3 * 64 + r._4).sorted
      assert(slots.toSeq == (0L until n).toSeq, s"epoch $e slots are not a permutation")
      // balanced shards: every shard except possibly the last holds 64
      val byShard = ep.groupBy(_._3).view.mapValues(_.length).toMap
      val full = byShard.filter(_._2 == 64).size
      assert(full >= byShard.size - 1, s"epoch $e shards unbalanced: $byShard")
    }
    // the seed changes the permutation: some doc lands in a different slot
    val e0 = rows.filter(_._1 == 0).map(r => r._2 -> (r._3, r._4)).toMap
    val e1 = rows.filter(_._1 == 1).map(r => r._2 -> (r._3, r._4)).toMap
    assert(e0.exists { case (id, slot) => e1(id) != slot },
      "epoch 0 and epoch 1 produced the identical permutation")
  }
}
