package graft.ingest

import java.time.LocalDate
import org.apache.spark.sql.{Dataset, SparkSession}
import org.slf4j.LoggerFactory

/** Engine config — the reference's 11 CLI args minus the ones Spark makes
  * obsolete (tmp dir, process count; audit_data_ingest.py:236-285).
  *
  * @param srcDir        root of dated day directories
  * @param storeFactory  sink object store (S3 in prod, local dir in tests)
  * @param s3Prefix      object key prefix; concatenated to the day WITHOUT
  *                      an inserted separator, exactly like the reference
  *                      (`f"{s3_prefix}{day}/{basename}"`, :173) — callers
  *                      must end it with `/` if they want one
  * @param masterKeyId   value of the `datakeyencryptionkeyid` metadata key
  * @param publicKeyB64  b64 X.509 RSA public key (the reference fetches
  *                      this from SSM once per day, :78; we take it as
  *                      config and ship it in the task closure — same
  *                      hoisting, no per-file fetch)
  * @param progressFile  watermark file path
  */
final case class IngestConfig(
    srcDir: String,
    storeFactory: ObjectStoreFactory,
    s3Prefix: String,
    masterKeyId: String,
    publicKeyB64: String,
    progressFile: String
)

/** Outcome for one file; days commit only when no file failed. */
final case class FileResult(path: String, key: String, ok: Boolean, error: String)

final case class DayResult(day: LocalDate, results: Seq[FileResult]) {
  def ok: Boolean = results.forall(_.ok)
  def failures: Seq[FileResult] = results.filterNot(_.ok)
}

final case class IngestSummary(days: Seq[DayResult]) {
  def filesOk: Long = days.map(_.results.count(_.ok).toLong).sum
}

/** The pipeline: scan dated dirs -> prune days <= watermark -> per day:
  * map(compress ∘ envelope-encrypt) -> sink objects+metadata -> commit
  * watermark (audit_data_ingest.py:36-68 re-expressed as Spark jobs).
  *
  * Faithfulness notes:
  *  - Days run strictly sequentially, oldest first; the watermark advances
  *    only after a fully-successful day, otherwise the run aborts (:50-68).
  *    => at-least-once: a half-failed day is re-run whole; re-encryption
  *    uses a fresh key+nonce so bytes differ between attempts, same as the
  *    reference (SURVEY.md §2.3).
  *  - Per-file failure isolation: one bad file fails its day but every
  *    sibling is still attempted (:96-104) — the map wraps each file in
  *    try/catch and emits a status row; nothing short-circuits.
  *  - Key layout `{prefix}{day}/{basename}.gz.enc` (:117,173).
  *
  * Scale notes (100 TB posture): no driver-side staging or collect of
  * content — executors read their own binaryFile splits and upload from
  * `mapPartitions`; only the small per-file status rows come back to the
  * driver. Parallelism = source bytes / `spark.sql.files.maxPartitionBytes`,
  * no shuffle anywhere in the plan.
  */
object IngestJob {
  private val log = LoggerFactory.getLogger(getClass)

  def run(spark: SparkSession, cfg: IngestConfig): IngestSummary = {
    val watermark = Watermark.read(cfg.progressFile)
    val days = AuditSource.pendingDays(spark, cfg.srcDir, watermark)
    log.info(s"Watermark=$watermark; ${days.size} pending day(s)")
    val results = days.map { dp =>
      log.info(s"Processing day ${dp.day} at ${dp.path}")
      val dayResult = processDay(spark, cfg, dp)
      if (dayResult.ok) {
        Watermark.commit(cfg.progressFile, dp.day)
      } else {
        val failed = dayResult.failures.map(f => s"${f.path}: ${f.error}").mkString("; ")
        throw new RuntimeException(
          s"Failed to process day ${dp.day} (${dayResult.failures.size} file(s) failed): $failed"
        )
      }
      dayResult
    }
    IngestSummary(results)
  }

  /** Alternative sink path: the same per-day transform written through the
    * DataSource V2 `graft-objects` writer ([[graft.sources.ObjectStoreSinkProvider]]).
    * Differences vs [[processDay]]: a failing file fails its TASK (Spark
    * retries it, then fails the day) instead of being gathered into a
    * status report — all-or-nothing per day still holds, but the
    * best-effort-attempt-every-sibling reporting of the reference
    * (:96-104) is traded for the declarative writer. Only local-dir
    * stores are supported (the provider constructs the store from the
    * `root` option).
    */
  def processDayV2(spark: SparkSession, cfg: IngestConfig, dp: DayPartition, storeRoot: String): Unit = {
    import spark.implicits._
    val dayStr = dp.day.toString
    val prefix = cfg.s3Prefix
    val keyId = cfg.masterKeyId
    val pubB64 = cfg.publicKeyB64
    AuditSource
      .readDay(spark, dp.path)
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val pubKey = Envelope.publicKeyFromBase64(pubB64)
        it.map { case (path, content) =>
          val basename = path.substring(path.lastIndexOf('/') + 1)
          val obj = Envelope.encrypt(Zlib.compress(content), pubKey, keyId)
          (s"$prefix$dayStr/$basename.gz.enc", obj.ciphertext, obj.metadata)
        }
      }
      .toDF("key", "data", "metadata")
      .write
      .format("graft-objects")
      .option("root", storeRoot)
      .mode("append")
      .save()
  }

  /** One day = one Spark job; every file attempted, statuses gathered. */
  def processDay(spark: SparkSession, cfg: IngestConfig, dp: DayPartition): DayResult = {
    import spark.implicits._
    val dayStr = dp.day.toString
    val prefix = cfg.s3Prefix
    val keyId = cfg.masterKeyId
    val pubB64 = cfg.publicKeyB64
    val factory = cfg.storeFactory

    val files = AuditSource.readDay(spark, dp.path)
    val statuses: Dataset[FileResult] = files
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // Per-partition init: parse key once, one store client per task —
        // the loop-invariant hoisting the reference does per day (:78).
        val pubKey = Envelope.publicKeyFromBase64(pubB64)
        val store = factory.create()
        it.map { case (path, content) =>
          val basename = path.substring(path.lastIndexOf('/') + 1)
          val key = s"$prefix$dayStr/$basename.gz.enc"
          try {
            val obj = Envelope.encrypt(Zlib.compress(content), pubKey, keyId)
            store.put(key, obj.ciphertext, obj.metadata)
            FileResult(path, key, ok = true, error = null)
          } catch {
            case e: Throwable => FileResult(path, key, ok = false, error = e.toString)
          }
        }
      }
    DayResult(dp.day, statuses.collect().toSeq) // status rows only — tiny
  }
}
