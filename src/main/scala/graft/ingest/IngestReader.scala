package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.functions.{CompressionFunctions, EnvelopeFunctions}

/** The read side of the pipeline: scan a prefix of the object store and
  * yield decrypted, decompressed plaintext rows — what the reference's
  * "queried in an analytical environment" consumers do with the landed
  * objects (README.md:16), as a Catalyst-composed Spark query.
  *
  * Built entirely from the engine's own relational pieces (no RDD path):
  * the `graft-objects` DSv2 table ([[graft.sources.ObjectStoreSinkProvider]])
  * lists key names on the driver and fetches bytes executor-side, and the
  * decrypt/inflate steps are column expressions
  * ([[graft.functions.EnvelopeDecryptExpr]], `graft_zlib_decompress`) —
  * so column pruning, filter composition, and the optimizer's
  * decrypt∘encrypt elision ([[graft.CodecSimplification]]) all apply. A
  * key-only aggregate over the landed corpus never moves object bytes.
  *
  * At-least-once re-reads are trivially safe (reads are idempotent); a
  * missing/corrupt object fails its task loudly rather than yielding a
  * silent hole — consumers decide whether to quarantine.
  */
object IngestReader {

  /** Decrypt every object under `prefix` of the store at `root` to rows
    * of `(key, content)`.
    *
    * @param privKeyDerB64 base64 PKCS#8 DER of the RSA private key (the
    *        DKS-side secret the reference never holds; a plan-time literal
    *        that ships in the task closure — on a real cluster this is
    *        where a KMS decrypt call would stand instead)
    */
  def read(
      spark: SparkSession,
      root: String,
      prefix: String,
      privKeyDerB64: String,
      aesMode: Envelope.AesMode = Envelope.AesMode.Gcm
  ): DataFrame =
    decrypted(
      spark.read.format("graft-objects").option("root", root).option("prefix", prefix).load(),
      privKeyDerB64,
      aesMode
    )

  /** The expression half, usable over ANY `(key, data, metadata)` frame
    * (a `graft-objects` read, a checkpointed copy, a unioned corpus):
    * unwrap + AES-decrypt + zlib-inflate as columns.
    */
  def decrypted(
      objects: DataFrame,
      privKeyDerB64: String,
      aesMode: Envelope.AesMode = Envelope.AesMode.Gcm
  ): DataFrame =
    objects.select(col("key"), content(col("data"), col("metadata"), privKeyDerB64, aesMode).as("content"))

  /** Plaintext of one object as a column: decrypt(data, metadata) then inflate. */
  def content(data: Column, metadata: Column, privKeyDerB64: String, aesMode: Envelope.AesMode): Column = {
    val modeStr = aesMode match {
      case Envelope.AesMode.Gcm => "gcm"
      case Envelope.AesMode.Eax => "eax"
    }
    CompressionFunctions.zlib_decompress(
      EnvelopeFunctions.envelope_decrypt(
        EnvelopeFunctions.encrypted_object(data, metadata),
        privKeyDerB64,
        modeStr
      )
    )
  }
}
