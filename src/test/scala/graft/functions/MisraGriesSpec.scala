package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The Misra-Gries summary's two contracts, exercised directly on the
  * aggregation buffer (the query-level gate only sees the final heavy
  * set; the bounds that make the candidates SOUND at any scale are
  * properties of update/merge/serialize themselves):
  *
  *  1. every item with true frequency > n/(k+1) is present in the
  *     summary (the d56 superset guarantee), and
  *  2. stored counts are lower bounds with error ≤ n/(k+1), preserved
  *     across arbitrary partition splits + merge orders and a
  *     serialization round trip — the shape a multi-executor partial
  *     aggregation actually produces.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def freshAgg(k: Int) = MisraGriesItems(BoundReference(0, StringType, nullable = true), k)

  private def summarize(agg: MisraGriesItems, items: Seq[String]): mutable.HashMap[UTF8String, Long] = {
    val buf = agg.createAggregationBuffer()
    items.foreach(t => agg.update(buf, InternalRow(UTF8String.fromString(t))))
    buf
  }

  test("single-stream summary: heavy items survive, size bounded, counts are lower bounds within n/(k+1)") {
    val rnd = new Random(7)
    for (trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(12)
      val n = 200 + rnd.nextInt(2000)
      // Zipf-ish: token id = floor(u^3 * width) concentrates mass on low ids
      val items = Seq.fill(n) { val u = rnd.nextDouble(); s"t${(u * u * u * 40).toInt}" }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = freshAgg(k)
      val buf = summarize(agg, items)
      assert(buf.size <= k, s"trial $trial: ${buf.size} counters exceed budget $k")
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (item, f) =>
        val stored = buf.getOrElse(UTF8String.fromString(item), 0L)
        assert(stored <= f, s"trial $trial: '$item' overcounted ($stored > $f)")
        assert(f - stored <= bound, s"trial $trial: '$item' undercounted beyond n/(k+1) ($f - $stored > $bound)")
        if (f > bound)
          assert(stored > 0L, s"trial $trial: heavy item '$item' (f=$f > $bound) missing from summary")
      }
    }
  }

  test("merged summaries preserve the bound across random splits, merge orders, and serialization") {
    val rnd = new Random(13)
    for (trial <- 0 until 20) {
      val k = 2 + rnd.nextInt(10)
      val n = 500 + rnd.nextInt(3000)
      val items = Seq.fill(n) { val u = rnd.nextDouble(); s"w${(u * u * 60).toInt}" }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val agg = freshAgg(k)
      // split into 2..8 uneven partitions, summarize each independently
      val nParts = 2 + rnd.nextInt(7)
      val parts = items.groupBy(_ => rnd.nextInt(nParts)).values.toSeq
      var bufs = parts.map { p =>
        // half the partial buffers take the executor-shuffle path:
        // serialize + deserialize before merging
        val b = summarize(agg, p)
        if (rnd.nextBoolean()) agg.deserialize(agg.serialize(b)) else b
      }
      // fold in a random order (merge is not required to be associative
      // in its EXACT contents, only in its bounds)
      while (bufs.size > 1) {
        val shuffled = rnd.shuffle(bufs)
        bufs = agg.merge(shuffled.head, shuffled(1)) +: shuffled.drop(2)
      }
      val buf = bufs.head
      assert(buf.size <= k)
      val bound = n.toDouble / (k + 1)
      truth.foreach { case (item, f) =>
        val stored = buf.getOrElse(UTF8String.fromString(item), 0L)
        assert(stored <= f, s"trial $trial: '$item' overcounted after merge ($stored > $f)")
        assert(f - stored <= bound,
          s"trial $trial (parts=$nParts): '$item' merge error beyond n/(k+1) ($f - $stored > $bound)")
        if (f > bound) assert(stored > 0L, s"trial $trial: heavy '$item' lost in merge (f=$f > $bound)")
      }
    }
  }

  test("d56 plans the bounded path: MG ObjectHashAggregate feeds a checkpointed candidate " +
    "frame; the exact count is semi-join-pruned and never re-runs the summary pass") {
    val spark = graft.SparkSpec.spark
    // the MG pass itself plans as an ObjectHashAggregate (checked on the
    // aggregate's own plan — in d56 it executes once, eagerly, into the
    // candidate checkpoint)
    import org.apache.spark.sql.functions.{col, count, explode, lit, lower, split, trim}
    val toks = graft.ops.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val mgPlan = toks.groupBy("source")
      .agg(MisraGries.candidates(col("tok"), 49).as("cands"), count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(mgPlan.contains("misra_gries_items"), s"MG aggregate missing:\n$mgPlan")
    assert(mgPlan.contains("ObjectHashAggregate"), s"MG must plan as ObjectHashAggregate:\n$mgPlan")
    // the composed query consumes the candidates from the CHECKPOINT
    // (two consumers, one summary execution) and prunes the exact count
    // through a semi-join — the full plan must show the checkpoint scan
    // and must NOT re-plan the MG aggregation
    val p = graft.SparkEntry.queries("d56_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      s"exact counting must be candidate-pruned by a semi-join, not full-cardinality:\n$p")
    assert(p.contains("ExistingRDD"), s"candidates should come from the checkpoint:\n$p")
    assert(!p.contains("misra_gries_items"),
      s"the summary pass re-planned downstream of its checkpoint (it would execute twice):\n$p")
  }

  test("d56 returns EXACTLY the exact heavy set on a skewed stream (end to end)") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    // 3 heavy tokens (>2% each) in a sea of near-unique noise, across
    // 8 partitions so partial summaries genuinely merge
    val rnd = new Random(3)
    val rows = (0 until 20000).map { i =>
      val tok = if (i % 13 == 0) "heavy_a" else if (i % 17 == 0) "heavy_b"
                else if (i % 23 == 0) "heavy_c" else s"noise_${rnd.nextInt(100000)}"
      ("srcX", tok)
    }
    val df = rows.toDF("source", "tok").repartition(8)
    val k = 49
    val cands = df.groupBy("source")
      .agg(MisraGries.candidates(org.apache.spark.sql.functions.col("tok"), k).as("cands"))
      .selectExpr("source", "explode(cands) AS tok")
      .as[(String, String)].collect().map(_._2).toSet
    val n = rows.size
    val exactHeavy = rows.groupBy(_._2).view.mapValues(_.size).filter(_._2 * (k + 1) > n).keySet
    assert(exactHeavy == Set("heavy_a", "heavy_b", "heavy_c"), s"fixture drifted: $exactHeavy")
    assert(exactHeavy.subsetOf(cands), s"MG candidates lost a heavy token: ${exactHeavy -- cands}")
    assert(cands.size <= k, s"candidate set exceeds the counter budget: ${cands.size}")
  }
}
