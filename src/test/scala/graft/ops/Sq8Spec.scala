package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (s28): the affine code round-trips within
  * its scale/2-per-dimension bound, the codegen byte-sum kernel agrees
  * with its interpreted twin bit-for-bit, the on-disk index is the
  * promised fraction of float32, the candidate pass reads CODES (not
  * embeddings), and search recall against the exact kernel holds.
  */
class Sq8Spec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.t(spark, sfDir, "embeddings")
  private lazy val params = Sq8Index.train(emb)

  test("reconstruction error is within scale/2 per dimension (+ float slack)") {
    import spark.implicits._
    val p = params
    val rows = emb.select("embedding").as[Seq[Float]].collect()
    rows.foreach { e =>
      e.indices.foreach { d =>
        val c =
          if (p.scale(d) == 0.0) 0
          else math.max(0, math.min(255, math.round((e(d) - p.vmin(d)) / p.scale(d)).toInt))
        val rec = p.vmin(d) + c * p.scale(d)
        val bound = p.scale(d) / 2 + 1e-6
        assert(math.abs(rec - e(d)) <= bound,
          s"dim $d: |${rec} - ${e(d)}| > $bound (scale ${p.scale(d)})")
      }
    }
  }

  test("a constant dimension (scale 0) reconstructs exactly") {
    val p = Sq8Index.Params(vmin = Array(3.5, 0.0), scale = Array(0.0, 0.1))
    import spark.implicits._
    val df = Seq((1L, Seq(3.5f, 0.25f))).toDF("vec_id", "embedding")
    val (_, code, rnorm) = Sq8Index.encode(df, p).head()
    assert(code(0) == 0.toByte)
    val rec1 = p.vmin(1) + (code(1) & 0xFF) * p.scale(1)
    assert(math.abs(rnorm - math.sqrt(3.5 * 3.5 + rec1 * rec1)) < 1e-12)
  }

  test("Sq8Dot: interpreted eval equals the codegen path (whole-stage on)") {
    import spark.implicits._
    val code = Array[Byte](0, 127, -128, -1) // unsigned: 0, 127, 128, 255
    val w = Seq(0.5, -1.25, 2.0, 0.125)
    val expected = w(0) * 0 + w(1) * 127 + w(2) * 128 + w(3) * 255
    // interpreted: direct eval on the expression
    val interp = graft.functions.Sq8Dot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(code,
        org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(w,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      .eval(null).asInstanceOf[Double]
    assert(interp == expected)
    // codegen: through a DataFrame with whole-stage codegen enabled
    val viaDf = Seq(Tuple1(code)).toDF("c")
      .select(graft.functions.VectorFunctions.sq8_dot(col("c"),
        array(w.map(lit): _*)).as("d"))
      .head().getDouble(0)
    assert(viaDf == expected && viaDf == interp)
  }

  test("the materialized code index is at most half the float32 index bytes " +
    "and the candidate pass reads codes, not embeddings") {
    val dir = java.nio.file.Files.createTempDirectory("sq8-size").toString
    Sq8Index.encode(emb, params).toDF("vec_id", "code", "rnorm")
      .write.mode("overwrite").parquet(s"$dir/codes")
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(s"$dir/floats")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val cb = bytes(s"$dir/codes")
    val fb = bytes(s"$dir/floats")
    assert(cb > 0 && fb > 0)
    assert(cb.toDouble / fb <= 0.5, s"codes $cb vs floats $fb — ratio ${cb.toDouble / fb}")
    // candidate pass over the materialized index: the scan schema has
    // code/rnorm and NO embedding column
    import spark.implicits._
    val codes = spark.read.parquet(s"$dir/codes")
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val ann = Sq8Index.search(codes, emb, params, qe, excludeId = 0L, k = 10, rerank = 50)
    // the codes scan's ReadSchema has code+rnorm and NO embedding (the
    // rerank join's embedding scan is a separate line)
    val plan = ann.queryExecution.executedPlan.toString
    val codeScanLine = plan.split("\n").find(_.contains("code:binary"))
    assert(codeScanLine.isDefined, s"no code scan in the plan:\n$plan")
    assert(!codeScanLine.get.contains("embedding"),
      s"candidate scan reads embeddings:\n${codeScanLine.get}")
  }

  test("IVF+SQ8: the code scan is partition-pruned AND reads only code columns, " +
    "the reranked result equals exact search within the probed cells, deterministic") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("ivfsq8-spec").toString
    val cents = Sq8Index.buildIvf(emb, idxDir, params, kCells = 16, iters = 2)
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    def once() = Sq8Index.searchIvf(spark, idxDir, cents, emb, params, qe,
      excludeId = 0L, k = 10, nprobe = 4, rerank = 50)
    val ann = once()
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition prune on the code scan:\n$plan")
    val codeScanLine = plan.split("\n").find(_.contains("code:binary"))
    assert(codeScanLine.isDefined && !codeScanLine.get.contains("embedding"),
      s"code scan must not read floats:\n${codeScanLine.getOrElse("<missing>")}")
    // rerank=50 over ~125 probed rows: the SQ8 candidate pool covers the
    // exact-within-probes top-10, so the final result EQUALS exact IVF
    // search (same centroids — buildIvf and IvfIndex.search share train)
    val got = ann.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exactIvf = IvfIndex.search(emb, cents, queryId = 0L, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exactIvf, s"IVF+SQ8+rerank drifted from exact-within-probes\ngot:   $got\nexact: $exactIvf")
    assert(once().collect().toSeq == ann.collect().toSeq, "searchIvf must be deterministic")
  }

  test("a query whose dimension differs from the trained quantizer's fails loudly") {
    import spark.implicits._
    val codes = Sq8Index.encode(emb, params).toDF("vec_id", "code", "rnorm")
    val short = Array.fill(params.dim / 2)(0.5f)
    val e = intercept[IllegalArgumentException] {
      Sq8Index.search(codes, emb, params, short, excludeId = 0L, k = 10, rerank = 50)
    }
    assert(e.getMessage.contains("dim"), e.getMessage)
  }

  test("batched searchMany equals Q independent single-query searches per query " +
    "and is deterministic") {
    import spark.implicits._
    val codes = Sq8Index.encode(emb, params).toDF("vec_id", "code", "rnorm")
    val panel: Map[Long, Array[Float]] = emb.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def once() = Sq8Index.searchMany(codes, emb, params, panel, k = 10, rerank = 50)
    val rows = once().collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    panel.keys.toSeq.sorted.foreach { qid =>
      val single = Sq8Index.search(codes, emb, params, panel(qid), excludeId = qid,
        k = 10, rerank = 50)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
      val got = rows.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4))
      assert(got == single, s"query $qid: batch != single\nbatch:  $got\nsingle: $single")
    }
    assert(once().collect().toSeq == once().collect().toSeq, "searchMany must be deterministic")
  }

  test("batched IVF+SQ8 equals Q independent searchIvf calls bit-for-bit, reads " +
    "the codes in ONE pruned float-free scan, and is deterministic") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("ivfsq8-batch-spec").toString
    val cents = Sq8Index.buildIvf(emb, idxDir, params, kCells = 16, iters = 2)
    val panel: Map[Long, Array[Float]] = emb.filter(col("vec_id") < 8)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def once() = Sq8Index.searchIvfMany(spark, idxDir, cents, emb, params, panel,
      k = 10, nprobe = 4, rerank = 50)
    val batch = once()
    val plan = batch.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition prune on the code scan:\n$plan")
    val codeScans = plan.split("\n").filter(_.contains("code:binary"))
    assert(codeScans.length == 1 && !codeScans.head.contains("embedding"),
      s"the panel must read the codes in exactly one float-free scan:\n${codeScans.toSeq}")
    val rows = batch.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
    panel.keys.toSeq.sorted.foreach { qid =>
      val single = Sq8Index.searchIvf(spark, idxDir, cents, emb, params, panel(qid),
        excludeId = qid, k = 10, nprobe = 4, rerank = 50)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
      val got = rows.filter(_._1 == qid).sortBy(_._2).map(t => (t._3, t._4))
      assert(got == single, s"query $qid: batch != single\nbatch:  $got\nsingle: $single")
    }
    assert(once().collect().toSeq == batch.collect().toSeq, "searchIvfMany must be deterministic")
  }

  test("HNSW over SQ8: the walk's cell scan is partition-pruned and float-free, " +
    "recall@10 matches the float walk's on this corpus, output scores exact, " +
    "deterministic") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("hnswsq8-spec").toString
    val cents = Sq8Index.buildHnsw(emb, idxDir, params, kCells = 16, iters = 2,
      m = 8, efC = 32)
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    def once() = Sq8Index.searchHnsw(spark, idxDir, cents, emb, params, qe,
      excludeId = 0L, k = 10, nprobe = 4, ef = 48, rerank = 50)
    val ann = once()
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition prune on the walk scan:\n$plan")
    val codeScanLine = plan.split("\n").find(_.contains("code:binary"))
    assert(codeScanLine.isDefined && !codeScanLine.get.contains("embedding"),
      s"the quantized walk must not read float vectors:\n${codeScanLine.getOrElse("<missing>")}")
    val got = ann.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // scores are exact (post-rerank): each equals the exact 6dp cosine
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val exactAll = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosine_similarity(col("embedding"), col("qe")), 6).as("c"))
    val exactMap = exactAll.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, c) =>
      assert(exactMap(id) == c, s"claimed score for $id is not exact: $c vs ${exactMap(id)}")
    }
    // recall vs the FLOAT graph walk over its own index (same cell/graph
    // parameters): the quantized walk must not lose ground to quantization
    val floatIdx = java.nio.file.Files.createTempDirectory("hnswsq8-float").toString
    val floatCents = NswIndex.build(emb, floatIdx, k = 16, iters = 2, m = 8, efC = 32)
    val floatWalk = NswIndex.searchFrame(spark, floatIdx, floatCents, qe, excludeId = 0L,
      k = 10, nprobe = 4, ef = 48)
      .collect().map(_.getLong(0)).toSet
    val truth = exactAll.orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recallSq8 = (got.map(_._1).toSet & truth).size
    val recallFloat = (floatWalk & truth).size
    assert(recallSq8 >= recallFloat,
      s"quantized walk recall $recallSq8 lost to the float walk's $recallFloat")
    assert(once().collect().toSeq == ann.collect().toSeq, "searchHnsw must be deterministic")
  }

  test("search: exact output scores, 10/10 recall vs the exact kernel on this " +
    "corpus, deterministic across runs") {
    import spark.implicits._
    val codes = Sq8Index.encode(emb, params).toDF("vec_id", "code", "rnorm")
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    def once() = Sq8Index.search(codes, emb, params, qe, excludeId = 0L, k = 10, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = once()
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosine_similarity(col("embedding"), col("qe")), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1).toSet == exact.map(_._1).toSet,
      s"SQ8+rerank must recover the exact top-10 here\ngot:   $got\nexact: $exact")
    got.foreach { case (id, c) =>
      assert(exact.toMap.apply(id) == c, s"claimed score for $id is not exact")
    }
    assert(once() == got, "search must be deterministic")
  }
}
