package graft.ingest

import java.util.Base64
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The read side of the pipeline: scan a prefix of the object store and
  * yield decrypted, decompressed plaintext rows — what the reference's
  * "queried in an analytical environment" consumers do with the landed
  * objects (README.md:16), as a distributed Spark job.
  *
  * Layout mirror of the write path: the driver lists KEY NAMES only
  * (names, never bytes — the same posture as the ingest listing); key
  * names are partitioned across executors, and each task opens its own
  * store client (clients are not serializable) to fetch, RSA-unwrap the
  * per-object data key, AES-decrypt, and zlib-inflate. Parallelism =
  * min(#objects, 2x default parallelism) so small prefixes don't schedule
  * thousands of empty tasks while big prefixes keep every core busy.
  *
  * At-least-once re-reads are trivially safe (reads are idempotent); a
  * missing/corrupt object fails its task loudly rather than yielding a
  * silent hole — consumers decide whether to quarantine.
  */
object IngestReader {

  /** Decrypt every object under `prefix` to rows of `(key, content)`.
    *
    * @param privKeyDerB64 base64 PKCS#8 DER of the RSA private key (the
    *        DKS-side secret the reference never holds; serializable so it
    *        ships in the task closure — on a real cluster this is where a
    *        KMS decrypt call would stand instead)
    */
  def read(
      spark: SparkSession,
      factory: ObjectStoreFactory,
      prefix: String,
      privKeyDerB64: String,
      aesMode: Envelope.AesMode = Envelope.AesMode.Gcm
  ): DataFrame = {
    import spark.implicits._
    val keys = factory.create().listKeys(prefix)
    val slices = math.max(1, math.min(keys.size, spark.sparkContext.defaultParallelism * 2))
    spark.sparkContext
      .parallelize(keys, slices)
      .mapPartitions { it =>
        val store = factory.create()
        val priv = Envelope.privateKeyFromDer(Base64.getDecoder.decode(privKeyDerB64))
        it.map { key =>
          val obj = EncryptedObject(store.get(key), store.getMetadata(key))
          (key, Zlib.decompress(Envelope.decrypt(obj, priv, aesMode)))
        }
      }
      .toDF("key", "content")
  }
}
