package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions._

/** Algebraic simplification for the codec expressions:
  * `graft_zlib_decompress(graft_zlib_compress(x))` is the identity
  * (zlib is lossless), so composed pipelines — e.g. a view that
  * compresses feeding a consumer that inflates — skip both passes
  * entirely. The reverse composition is NOT rewritten:
  * `compress(decompress(x))` can differ byte-wise from `x` (compression
  * level / encoder choices), and byte equality is what the sink stores.
  */
object CodecSimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ZlibDecompress(ZlibCompress(child)) => child
    // same lossless-identity argument for the zstd pair (x08 +
    // PropertySpec pin the byte-exact round trip); the reverse
    // composition stays un-rewritten for the same byte-equality reason
    case ZstdDecompress(ZstdCompress(child)) => child
    // decrypt∘encrypt is the identity ONLY when the decrypting private key
    // is provably the counterpart of the encrypting public key (checked by
    // deriving the public key from the private's CRT parameters at plan
    // time) and the cipher mode matches the encryptor's (GCM). Mismatched
    // keys must NOT elide: the un-elided query fails loudly at runtime,
    // which is the correct behavior.
    case graft.functions.EnvelopeDecryptExpr(EnvelopeEncryptExpr(child, pubB64, _), privB64, graft.ingest.Envelope.AesMode.Gcm)
        if graft.ingest.Envelope.isKeyPair(pubB64, privB64) =>
      child
  }
}

/** SQL surface for the engine's custom codegen expressions — the
  * idiomatic `SparkSessionExtensions` entry point, so a pure-SQL user
  * (spark-sql, Thrift server, notebooks) gets the same fused kernels the
  * DataFrame API exposes through [[graft.functions.VectorFunctions]] etc.
  *
  * Activate per session:
  *   `--conf spark.sql.extensions=graft.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions())`.
  *
  * Injected functions (all whole-stage-codegen expressions, no UDFs):
  *  - `graft_dot_product(array<float|double>, array<float|double>) -> double`
  *  - `graft_cosine_similarity(array<float|double>, array<float|double>) -> double`
  *  - `graft_zlib_compress(binary) -> binary` / `graft_zlib_decompress(binary) -> binary`
  *  - `graft_zstd_compress(binary) -> binary` / `graft_zstd_decompress(binary) -> binary`
  *  - `graft_heavy_hitter_candidates(string, k literal) -> array<string>` (aggregate)
  *  - `graft_envelope_encrypt(binary, pubKeyB64 literal, keyId literal) -> struct`
  *    (key material must be foldable string literals — it is parsed once
  *    at plan time, not per row)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(
      ext: SparkSessionExtensions,
      name: String,
      clazz: Class[_],
      arity: Int
  )(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
          build(args)
        }
      )
    )

  private def stringLiteral(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a string literal (got ${other.sql}): key material is parsed once at plan time"
      )
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CodecSimplification)
    // Whole-operator extension: the native as-of join's planner strategy
    // (logical AsOfJoinPlan -> physical AsOfJoinExec merge).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    inject(ext, "graft_dot_product", classOf[DotProduct], 2)(a => DotProduct(a(0), a(1)))
    inject(ext, "graft_cosine_similarity", classOf[CosineSimilarity], 2)(a => CosineSimilarity(a(0), a(1)))
    inject(ext, "graft_zlib_compress", classOf[ZlibCompress], 1)(a => ZlibCompress(a(0)))
    inject(ext, "graft_zlib_decompress", classOf[ZlibDecompress], 1)(a => ZlibDecompress(a(0)))
    inject(ext, "graft_zstd_compress", classOf[ZstdCompress], 1)(a => ZstdCompress(a(0)))
    inject(ext, "graft_zstd_decompress", classOf[ZstdDecompress], 1)(a => ZstdDecompress(a(0)))
    inject(ext, "graft_envelope_encrypt", classOf[EnvelopeEncryptExpr], 3) { a =>
      EnvelopeEncryptExpr(a(0), stringLiteral(a(1), "pubKeyB64"), stringLiteral(a(2), "keyId"))
    }
    inject(ext, "graft_envelope_decrypt", classOf[EnvelopeDecryptExpr], 3) { a =>
      EnvelopeDecryptExpr(
        a(0),
        stringLiteral(a(1), "privKeyDerB64"),
        EnvelopeFunctions.parseAesMode(stringLiteral(a(2), "mode"))
      )
    }
    // Aggregate: Misra-Gries heavy-hitter candidates from pure SQL —
    // `SELECT graft_heavy_hitter_candidates(tok, 49) FROM ...` plans
    // the same ≤k-counter ObjectHashAggregate the DataFrame surface
    // gets via MisraGries.candidates. k must be a foldable int literal
    // (it is the aggregation buffer's size bound, fixed at plan time).
    inject(ext, "graft_heavy_hitter_candidates", classOf[MisraGriesItems], 2) { a =>
      MisraGriesItems(a(0), intLiteral(a(1), "graft_heavy_hitter_candidates k")).toAggregateExpression()
    }
    // Aggregates: bounded top-K from pure SQL — the scale-safe
    // replacement for `row_number() OVER (PARTITION BY lowCardKey)`
    // rank windows (one task per key value at 100 TB). Plans the same
    // CollectTopK ObjectHashAggregate the DataFrame surface gets via
    // TopKAggregates.minK/maxK: ≤ k values of state per group, map-side
    // combinable. Returns the k extrema as a sorted array (ascending
    // for min_k, descending for max_k); posexplode recovers dense ranks.
    inject(ext, "graft_min_k", classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK], 2) { a =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        a(0), intLiteral(a(1), "graft_min_k k"), reverse = true).toAggregateExpression()
    }
    inject(ext, "graft_max_k", classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK], 2) { a =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        a(0), intLiteral(a(1), "graft_max_k k"), reverse = false).toAggregateExpression()
    }
  }

  private def intLiteral(e: Expression, what: String): Int = e match {
    case Literal(i: Int, org.apache.spark.sql.types.IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal (got ${other.sql}): " +
        "it bounds the aggregation buffer at plan time")
  }
}
