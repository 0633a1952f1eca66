package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end check of the SQL extension surface: a session built with
  * `withExtensions(new GraftExtensions())` can call the custom codegen
  * expressions from pure SQL text.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** New session over the shared SparkContext, with the extensions
    * applied at build time (the public activation path). The shared
    * session is restored afterwards.
    */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    val shared = SparkSpec.spark // ensures the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().withExtensions(new GraftExtensions()).getOrCreate()
      f(s)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("vector kernels callable from SQL text") {
    withExtendedSession { s =>
      val r = s
        .sql("""SELECT round(graft_dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)), 6) AS dp,
                |       round(graft_cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS cs
                |""".stripMargin)
        .head()
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
    }
  }

  test("heavy-hitter candidates aggregate callable from SQL text (k-bounded, heavy token present)") {
    withExtendedSession { s =>
      // 40 'hot' among 60 singletons: hot is heavy at k=9 (θ=10% of 100)
      val r = s.sql(
        """SELECT graft_heavy_hitter_candidates(t.tok, 9) AS cands FROM (
          |  SELECT CASE WHEN id % 5 < 2 THEN 'hot' ELSE concat('u', id) END AS tok
          |  FROM range(100)) t
          |""".stripMargin).head()
      val cands = r.getSeq[String](0)
      assert(cands.contains("hot"), s"heavy token missing from SQL aggregate: $cands")
      assert(cands.size <= 9, s"candidate set exceeds the k bound: $cands")
      // non-literal k is rejected at plan time, not silently defaulted
      val e = intercept[Exception] {
        s.sql("SELECT graft_heavy_hitter_candidates(CAST(id AS STRING), CAST(id AS INT)) FROM range(10)").head()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      assert(msgs(e).contains("int literal"), s"wrong rejection: $e")
    }
  }

  test("graft_min_k / graft_max_k from SQL: equals the DataFrame surface, plans the " +
    "bounded ObjectHashAggregate (no window), rejects non-literal k") {
    withExtendedSession { s =>
      import org.apache.spark.sql.functions._
      s.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .createOrReplaceTempView("orders_topk")
      val sql = s.sql(
        """SELECT o_orderstatus, graft_min_k(o_totalprice, 3) AS lo, graft_max_k(o_totalprice, 3) AS hi
          |FROM orders_topk GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      val plan = sql.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), s"top-K did not plan as ObjectHashAggregate:\n$plan")
      assert(!plan.contains("Window"), s"top-K planned a window:\n$plan")
      val df = s.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(graft.functions.TopKAggregates.minK(col("o_totalprice"), 3).as("lo"),
          graft.functions.TopKAggregates.maxK(col("o_totalprice"), 3).as("hi"))
        .orderBy("o_orderstatus")
      assert(sql.collect().toSeq == df.collect().toSeq,
        "SQL surface and DataFrame surface disagree")
      // ordering contract: lo ascending, hi descending, both k-bounded
      sql.collect().foreach { r =>
        val lo = r.getSeq[Double](1); val hi = r.getSeq[Double](2)
        assert(lo.size <= 3 && hi.size <= 3)
        assert(lo == lo.sorted, s"min_k not ascending: $lo")
        assert(hi == hi.sorted.reverse, s"max_k not descending: $hi")
      }
      val e = intercept[Exception] {
        s.sql("SELECT graft_min_k(id, CAST(id AS INT)) FROM range(10)").head()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
      assert(msgs(e).contains("int literal"), s"wrong rejection: $e")
    }
  }

  test("CodecSimplification rule elides decompress(compress(x)) — and ONLY that direction") {
    withExtendedSession { s =>
      // Column input (literals would be constant-folded before the rule
      // and prove nothing).
      s.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(5)
        .createOrReplaceTempView("docs_codec")
      val roundTrip = s.sql(
        "SELECT doc_id, graft_zlib_decompress(graft_zlib_compress(CAST(text AS BINARY))) AS v FROM docs_codec"
      )
      val p = roundTrip.queryExecution.optimizedPlan.toString
      assert(!p.contains("graft_zlib"), s"codec round-trip not elided:\n$p")
      assert(roundTrip.count() == 5)

      // compress(decompress(compress(x))): the INNER round trip elides,
      // the outer compress must survive (re-compression is not
      // byte-identity, so compress∘decompress is never rewritten)
      val reverse = s.sql(
        """SELECT graft_zlib_compress(graft_zlib_decompress(graft_zlib_compress(CAST(text AS BINARY)))) AS v
          |FROM docs_codec""".stripMargin
      )
      val rp = reverse.queryExecution.optimizedPlan.toString
      assert(rp.contains("graft_zlib_compress"), s"outer compress wrongly elided:\n$rp")
      assert(!rp.contains("graft_zlib_decompress"), s"inner round trip not elided:\n$rp")

      // the zstd pair gets the same identity (and the same
      // one-direction-only restriction)
      val zstdTrip = s.sql(
        "SELECT doc_id, graft_zstd_decompress(graft_zstd_compress(CAST(text AS BINARY))) AS v FROM docs_codec"
      )
      val zp = zstdTrip.queryExecution.optimizedPlan.toString
      assert(!zp.contains("graft_zstd"), s"zstd round-trip not elided:\n$zp")
      assert(zstdTrip.count() == 5)
      val zstdReverse = s.sql(
        """SELECT graft_zstd_compress(graft_zstd_decompress(graft_zstd_compress(CAST(text AS BINARY)))) AS v
          |FROM docs_codec""".stripMargin
      )
      val zrp = zstdReverse.queryExecution.optimizedPlan.toString
      assert(zrp.contains("graft_zstd_compress"), s"outer zstd compress wrongly elided:\n$zrp")
      assert(!zrp.contains("graft_zstd_decompress"), s"inner zstd round trip not elided:\n$zrp")
      s.catalog.dropTempView("docs_codec")
    }
  }

  test("zlib round-trip from SQL text") {
    withExtendedSession { s =>
      val r = s
        .sql("SELECT CAST(graft_zlib_decompress(graft_zlib_compress(CAST('hello graft' AS BINARY))) AS STRING) AS v")
        .head()
      assert(r.getString(0) == "hello graft")
    }
  }

  test("decrypt∘encrypt elides ONLY when the keys are provably a pair") {
    withExtendedSession { s =>
      val (pubA, privA) = graft.ingest.Envelope.generateKeyPair()
      val (_, privB) = graft.ingest.Envelope.generateKeyPair()
      val pubA64 = java.util.Base64.getEncoder.encodeToString(pubA.getEncoded)
      val privA64 = java.util.Base64.getEncoder.encodeToString(privA.getEncoded)
      val privB64 = java.util.Base64.getEncoder.encodeToString(privB.getEncoded)
      s.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(5)
        .createOrReplaceTempView("docs_env")

      // Matching pair: both crypto passes vanish from the optimized plan.
      val matched = s.sql(
        s"""SELECT doc_id, CAST(graft_envelope_decrypt(
           |  graft_envelope_encrypt(CAST(text AS BINARY), '$pubA64', 'kid'), '$privA64', 'gcm') AS STRING) AS v
           |FROM docs_env""".stripMargin
      )
      val mp = matched.queryExecution.optimizedPlan.toString
      assert(!mp.contains("graft_envelope"), s"matching-pair round trip not elided:\n$mp")
      assert(matched.collect().forall(r => r.getString(1) != null))

      // Foreign private key: NOT elided (and the un-elided query fails at
      // runtime, which is the correct loud behavior for a wrong key).
      val mismatched = s.sql(
        s"""SELECT graft_envelope_decrypt(
           |  graft_envelope_encrypt(CAST(text AS BINARY), '$pubA64', 'kid'), '$privB64', 'gcm') AS v
           |FROM docs_env""".stripMargin
      )
      val up = mismatched.queryExecution.optimizedPlan.toString
      assert(up.contains("graft_envelope_decrypt"), s"mismatched keys wrongly elided:\n$up")
      intercept[Exception](mismatched.collect())
      s.catalog.dropTempView("docs_env")
    }
  }

  test("envelope encrypt from SQL: struct output decrypts; non-literal key rejected") {
    withExtendedSession { s =>
      val (pub, priv) = graft.ingest.Envelope.generateKeyPair()
      val pubB64 = java.util.Base64.getEncoder.encodeToString(pub.getEncoded)
      // Per-field projection is the regression pin: before foldable=false
      // on EnvelopeEncryptExpr, ConstantFolding evaluated the encryption
      // once PER CONSUMING FIELD at plan time, mixing fields from three
      // different encryptions (undecryptable).
      val row = s
        .sql(s"SELECT graft_envelope_encrypt(CAST('payload' AS BINARY), '$pubB64', 'kid') AS obj")
        .select("obj.data", "obj.iv", "obj.wrapped_key")
        .head()
      val md = Map(
        "iv" -> row.getString(1),
        "ciphertext" -> row.getString(2),
        "datakeyencryptionkeyid" -> "kid"
      )
      val plain = graft.ingest.Envelope.decrypt(graft.ingest.EncryptedObject(row.getAs[Array[Byte]](0), md), priv)
      assert(new String(plain, "UTF-8") == "payload")

      val e = intercept[Exception](
        s.sql("SELECT graft_envelope_encrypt(CAST('x' AS BINARY), CAST(rand() AS STRING), 'kid')").head()
      )
      assert(e.getMessage.contains("string literal"))
    }
  }
}
