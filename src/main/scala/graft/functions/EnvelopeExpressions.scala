package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.ingest.Envelope

/** DKS-style envelope encryption as a column expression: the reference's
  * per-file encrypt step (audit_data_ingest.py:107-125) in expression-chain
  * form — `df.select(envelope_encrypt(zlib_compress($"content"), pub, kid))`
  * yields a struct carrying the ciphertext plus exactly the 3 metadata
  * values the sink attaches.
  *
  * Marked non-deterministic: a fresh random data key + nonce per row
  * (:109,115), so the optimizer must not collapse, reorder across
  * filters, or re-execute it assuming stable output. Crypto dominates the
  * per-row cost, so this is CodegenFallback by design; the RSA public key
  * is parsed once per executor (lazy transient), mirroring the reference's
  * once-per-day key fetch hoisting (:78).
  */
case class EnvelopeEncryptExpr(child: Expression, pubKeyB64: String, keyId: String)
    extends UnaryExpression
    with CodegenFallback {

  override def prettyName: String = "graft_envelope_encrypt"
  override lazy val deterministic: Boolean = false

  // UnaryExpression would derive foldable from the child, and a foldable
  // "nondeterministic" expression gets CONSTANT-FOLDED — ConstantFolding
  // checks foldable only, so a literal input made the optimizer evaluate
  // the encryption once per consuming projection at plan time (observed:
  // obj.data / obj.iv / obj.wrapped_key folded from three different
  // encryptions — undecryptable). Spark's own RDG/Uuid pin this the same
  // way.
  override def foldable: Boolean = false

  @transient private lazy val pubKey = Envelope.publicKeyFromBase64(pubKeyB64)

  override def dataType: DataType = EnvelopeEncryptExpr.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val obj = Envelope.encrypt(input.asInstanceOf[Array[Byte]], pubKey, keyId)
    new GenericInternalRow(
      Array[Any](
        obj.ciphertext,
        UTF8String.fromString(obj.metadata("iv")),
        UTF8String.fromString(obj.metadata("ciphertext")),
        UTF8String.fromString(obj.metadata("datakeyencryptionkeyid"))
      )
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EnvelopeEncryptExpr {
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("iv", StringType, nullable = false),
    StructField("wrapped_key", StringType, nullable = false),
    StructField("key_id", StringType, nullable = false)
  ))
}

object EnvelopeFunctions {
  def envelope_encrypt(data: Column, pubKeyB64: String, keyId: String): Column =
    ColumnBridge.column(EnvelopeEncryptExpr(ColumnBridge.expression(data), pubKeyB64, keyId))
}
