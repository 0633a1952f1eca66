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
import graft.ingest.{EncryptedObject, Envelope}

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

/** Dual of [[EnvelopeEncryptExpr]]: RSA-unwrap the per-object data key and
  * AES-decrypt the payload — the read side of the landed corpus
  * (README.md:16's "queried in an analytical environment") as a column
  * expression, so decryption composes with Catalyst instead of living in
  * an RDD pipeline.
  *
  * Input is any struct carrying fields `data: binary`, `iv: string`,
  * `wrapped_key: string` (matched BY NAME — both the encrypt expression's
  * output struct and a struct assembled from the `graft-objects` table's
  * metadata map qualify). Deterministic — unlike encryption there is no
  * fresh randomness, so the optimizer may fold/elide it; CodegenFallback
  * because RSA+AES dominates per-row cost.
  *
  * The private key is a task-closure literal for the same reason as the
  * reader's ([[graft.ingest.IngestReader]]): in a real deployment a KMS
  * decrypt call stands where the local unwrap is.
  */
case class EnvelopeDecryptExpr(child: Expression, privKeyDerB64: String, mode: Envelope.AesMode)
    extends UnaryExpression
    with CodegenFallback {

  override def prettyName: String = "graft_envelope_decrypt"

  @transient private lazy val privKey =
    Envelope.privateKeyFromDer(java.util.Base64.getDecoder.decode(privKeyDerB64.replaceAll("\\s", "")))

  private def fieldIndex(name: String): Option[(Int, DataType)] = child.dataType match {
    case s: StructType => s.fields.zipWithIndex.collectFirst { case (f, i) if f.name == name => (i, f.dataType) }
    case _ => None
  }

  @transient private lazy val Some((iData, _)) = fieldIndex("data")
  @transient private lazy val Some((iIv, _)) = fieldIndex("iv")
  @transient private lazy val Some((iWk, _)) = fieldIndex("wrapped_key")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(name: String, t: DataType) = fieldIndex(name).exists(_._2 == t)
    if (ok("data", BinaryType) && ok("iv", StringType) && ok("wrapped_key", StringType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires struct<data: binary, iv: string, wrapped_key: string>, got ${child.dataType.sql}"
      )
  }

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val obj = EncryptedObject(
      row.getBinary(iData),
      Map(
        "iv" -> row.getUTF8String(iIv).toString,
        "ciphertext" -> row.getUTF8String(iWk).toString
      )
    )
    Envelope.decrypt(obj, privKey, mode)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EnvelopeFunctions {
  def envelope_encrypt(data: Column, pubKeyB64: String, keyId: String): Column =
    ColumnBridge.column(EnvelopeEncryptExpr(ColumnBridge.expression(data), pubKeyB64, keyId))

  def parseAesMode(mode: String): Envelope.AesMode = mode.toLowerCase match {
    case "gcm" => Envelope.AesMode.Gcm
    case "eax" => Envelope.AesMode.Eax
    case other => throw new IllegalArgumentException(s"Unknown AES mode '$other' (expected gcm or eax)")
  }

  /** Decrypt a `struct<data, iv, wrapped_key, ...>` column to plaintext
    * binary. `obj` may be the encrypt expression's output or
    * [[encrypted_object]] over the `graft-objects` read schema.
    */
  def envelope_decrypt(obj: Column, privKeyDerB64: String, mode: String = "gcm"): Column =
    ColumnBridge.column(
      EnvelopeDecryptExpr(ColumnBridge.expression(obj), privKeyDerB64, parseAesMode(mode))
    )

  /** Assemble the decrypt input struct from the `graft-objects` read
    * schema: payload bytes plus the reference's 3-key metadata map
    * (`iv`, `ciphertext` = wrapped data key, audit_data_ingest.py:121-125).
    */
  def encrypted_object(data: Column, metadata: Column): Column = {
    import org.apache.spark.sql.functions._
    struct(
      data.as("data"),
      element_at(metadata, "iv").as("iv"),
      element_at(metadata, "ciphertext").as("wrapped_key")
    )
  }
}
