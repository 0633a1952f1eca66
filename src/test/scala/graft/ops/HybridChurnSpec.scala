package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** r20 — hybrid retrieval over the CHURNING index. The user-visible
  * churn contract, pinned against the static r14 fusion on the same
  * corpus:
  *
  *  1. a tombstoned doc VANISHES from the fused list (not just from
  *     one leg): doc 2 is query 2's self-hit in the static fusion and
  *     must be absent everywhere post-churn (with 3 and 105);
  *  2. its replacement SURFACES: query 2's post-churn top-5 contains
  *     a doc the static top-5 did not;
  *  3. a delete-then-reinsert RESURFACES through last-writer-wins:
  *     doc 1 (tombstoned in epoch 2, re-upserted in epoch 3) still
  *     appears in query 1's fused top-5, served by the dense live leg
  *     at r_ann = 1 (its self-hit cosine).
  */
class HybridChurnSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("deleted docs vanish from the fused list, replacements surface, re-inserts resurface") {
    val pre = graft.SparkEntry.queries("r14_hybrid_retrieval")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val post = graft.SparkEntry.queries("r20_hybrid_churn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.get(5)))

    val preQ2 = pre.filter(_._1 == 2L).map(_._3).toSet
    assert(preQ2.contains(2L), s"fixture drift: static fusion no longer ranks doc 2 for query 2 ($preQ2)")

    val deleted = Set(2L, 3L, 105L)
    assert(post.forall(r => !deleted.contains(r._3)),
      s"a tombstoned doc survived in the fused output: ${post.filter(r => deleted.contains(r._3)).mkString(",")}")

    val postQ2 = post.filter(_._1 == 2L).map(_._3).toSet
    assert((postQ2 -- preQ2).nonEmpty,
      s"no replacement surfaced for query 2: pre=$preQ2 post=$postQ2")

    val doc1 = post.find(r => r._1 == 1L && r._3 == 1L)
    assert(doc1.nonEmpty,
      s"doc 1 (delete + re-upsert) must resurface in query 1's fused top-5: ${post.filter(_._1 == 1L).mkString(",")}")
    assert(doc1.exists(_._4 == 1),
      s"doc 1 must come through the dense live leg at r_ann = 1, got $doc1")
  }
}
