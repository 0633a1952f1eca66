package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("IVF: every vector lands in exactly one of k cells; search returns genuinely similar results") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val centroids = IvfIndex.train(emb, k = 16, iters = 2)
    assert(centroids.length == 16)
    val ivf = IvfIndex.search(emb, centroids, queryId = 0L, k = 10, nprobe = 4).collect()
    assert(ivf.length == 10)
    // IVF results must be a subset of a generous brute-force candidate set
    val brute = SimilarityOps
      .cosineTopK(emb, 0L, 150)
      .collect()
      .map(_.getLong(0))
      .toSet
    val hits = ivf.map(_.getLong(0)).count(brute.contains)
    assert(hits >= 5, s"only $hits/10 IVF results in brute-force top-150")
    // determinism
    val again = IvfIndex.search(emb, centroids, queryId = 0L, k = 10, nprobe = 4).collect()
    assert(ivf.map(_.getLong(0)).sameElements(again.map(_.getLong(0))))
  }

  test("materialized IVF index: search reads only the nprobe cluster partitions (plan-time pruning)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val indexDir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    val cents = IvfIndex.build(emb, indexDir, k = 16, iters = 2)
    assert(IvfIndex.loadCentroids(spark, indexDir).map(_._1).sameElements(cents.map(_._1)))

    val qvec = emb.filter(col("vec_id") === 0L).select("embedding").head().getSeq[Float](0).toArray
    val res = IvfIndex.searchIndex(spark, indexDir, qvec, k = 10, nprobe = 4, excludeId = Some(0L))

    // plan-time pruning: the scan carries a cluster IN (...) partition
    // filter listing exactly the nprobe probed cells
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filter in:\n$plan")
    val inList = "cluster#\\d+L? IN \\(([^)]*)\\)".r.findFirstMatchIn(plan)
    assert(inList.isDefined, s"no cluster IN(...) partition filter in:\n$plan")
    assert(inList.get.group(1).split(",").length == 4, s"expected 4 probed cells: ${inList.get}")

    // same answer as the on-the-fly search over the same centroids
    val onTheFly = IvfIndex.search(emb, cents, queryId = 0L, k = 10, nprobe = 4).collect()
    assert(res.collect().map(_.toString).sameElements(onTheFly.map(_.toString)))
  }

  test("salted join returns identical results to the plain join") {
    val orders = Tables.t(spark, sfDir, "orders")
    val customer = Tables.t(spark, sfDir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders
      .join(customer, "o_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
      .collect()
      .sortBy(_.getString(0))
    val salted = SkewJoin
      .saltedInnerJoin(orders, customer, key = "o_custkey", uniqueCol = "o_orderkey", saltFactor = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("t"))
      .collect()
      .sortBy(_.getString(0))
    assert(plain.map(_.toString).sameElements(salted.map(_.toString)))
  }

  test("salted join cost guard: an over-sized small side is rejected loudly") {
    val orders = Tables.t(spark, sfDir, "orders")
    val customer = Tables.t(spark, sfDir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedInnerJoin(
        orders, customer, key = "o_custkey", uniqueCol = "o_orderkey",
        saltFactor = 8, maxReplicatedBytes = 1024L // deliberately tiny cap
      )
    }
    assert(e.getMessage.contains("not small enough for salting"))
  }

  test("s04_ivf_ann returns k neighbors and its soundness row is green") {
    assert(IvfIndex.ivfTopK(spark, sfDir, queryId = 0L, k = 10).count() == 10)
    val row = graft.SparkEntry.queries("s04_ivf_ann")(spark, sfDir).head()
    assert(row.getLong(row.fieldIndex("n_returned")) == 10L)
    assert(row.getLong(row.fieldIndex("n_outside_topn")) == 0L)
    assert(row.getBoolean(row.fieldIndex("recall_ok")))
  }
}
