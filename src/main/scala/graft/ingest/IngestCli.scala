package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

/** CLI entry point — the reference's argparse `__main__` block
  * (audit_data_ingest.py:235-313) re-expressed. Obsolete knobs are
  * dropped by design: `--tmp` (no local staging), `--processes` (Spark
  * task parallelism), `--hsm-key-param-name` (the key arrives as config,
  * not an SSM fetch; pass `--public-key-file` with the b64 key).
  *
  * Exit codes: 0 success OR expected-transient failure (warn-and-exit so
  * the scheduler retries, mirroring the reference's ExpiredTokenException
  * handling, :303-308), 2 usage error, 3 source missing, 1 any other
  * failure.
  */
object IngestCli {
  private val log = LoggerFactory.getLogger(getClass)

  private val usage =
    """Usage: graft.ingest.IngestCli
      |  --src-dir <dir>            dated day directories root (required)
      |  --out-root <dir>           object store root (required)
      |  --s3-prefix <prefix>       key prefix, concatenated WITHOUT separator (default "")
      |  --key-id <id>              datakeyencryptionkeyid metadata value (required)
      |  --public-key-file <path>   file holding the b64 X.509 RSA public key (required)
      |  --progress-file <path>     watermark file (required)
      |  --v2-sink                  write through the DataSource V2 graft-objects sink
      |  --streaming <checkpoint>   run as ONE Structured Streaming AvailableNow drain over the
      |                             graft-audit source (one day per micro-batch, checkpoint =
      |                             watermark, restart-resume) instead of the batch day-loop
      |  --aes-mode <gcm|eax>       payload cipher: gcm (hardened default) or eax (reference parity)
      |  --retries <n>              store-put attempts AND Spark task retries (default 3)
      |""".stripMargin

  /** Parsed CLI: config plus the sink/engine mode selectors. */
  final case class ParsedArgs(
      cfg: IngestConfig,
      useV2: Boolean,
      retries: Int,
      streamingCheckpoint: Option[String]
  )

  def parseArgs(args: Array[String]): Either[String, ParsedArgs] = {
    val m = scala.collection.mutable.Map[String, String]()
    var v2 = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--v2-sink" => v2 = true; i += 1
        case flag if flag.startsWith("--") && i + 1 < args.length =>
          m(flag.stripPrefix("--")) = args(i + 1); i += 2
        case other => return Left(s"Unexpected argument: $other")
      }
    }
    val required = Seq("src-dir", "out-root", "key-id", "public-key-file", "progress-file")
    val missing = required.filterNot(m.contains)
    if (missing.nonEmpty) return Left(s"Missing required options: ${missing.map("--" + _).mkString(", ")}")
    val keyPath = Paths.get(m("public-key-file"))
    if (!Files.exists(keyPath)) return Left(s"Public key file not found: $keyPath")
    val pubB64 = new String(Files.readAllBytes(keyPath), StandardCharsets.UTF_8).trim
    val retriesRaw = m.getOrElse("retries", "3")
    val retries = scala.util.Try(retriesRaw.toInt).toOption match {
      case Some(n) if n >= 1 => n
      case _ => return Left(s"--retries must be a positive integer, got: $retriesRaw")
    }
    val aesMode = m.getOrElse("aes-mode", "gcm") match {
      case "gcm" => Envelope.AesMode.Gcm
      case "eax" => Envelope.AesMode.Eax
      case other => return Left(s"--aes-mode must be gcm or eax, got: $other")
    }
    val streaming = m.get("streaming")
    if (streaming.exists(_.isEmpty)) return Left("--streaming requires a checkpoint directory")
    if (streaming.isDefined && v2) return Left("--streaming and --v2-sink are mutually exclusive")
    Right(
      ParsedArgs(
        IngestConfig(
          srcDir = m("src-dir"),
          storeFactory = LocalDirObjectStoreFactory(m("out-root")),
          s3Prefix = m.getOrElse("s3-prefix", ""),
          masterKeyId = m("key-id"),
          publicKeyB64 = pubB64,
          progressFile = m("progress-file"),
          aesMode = aesMode,
          putRetries = retries
        ),
        v2,
        retries,
        streaming
      )
    )
  }

  /** True when the cause chain contains the expected-transient class
    * (Spark wraps task failures in SparkException layers).
    */
  private[ingest] def isTransient(e: Throwable): Boolean =
    Iterator
      .iterate(e)(_.getCause)
      .takeWhile(_ != null)
      .take(10)
      .exists(_.isInstanceOf[TransientCredentialsException])

  def main(args: Array[String]): Unit = {
    parseArgs(args) match {
      case Left(err) =>
        System.err.println(err)
        System.err.println(usage)
        sys.exit(2)
      case Right(ParsedArgs(cfg, useV2, retries, streamingCkpt)) =>
        val spark = SparkSession
          .builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName("graft-ingest")
          .config("spark.task.maxFailures", retries.toString)
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try {
          val summary =
            if (streamingCkpt.isDefined) {
              IngestStream.runAvailableNow(spark, cfg, streamingCkpt.get)
              s"streaming drain complete (checkpoint ${streamingCkpt.get})"
            } else if (useV2) {
              val root = cfg.storeFactory.asInstanceOf[LocalDirObjectStoreFactory].root
              val watermark = Watermark.read(cfg.progressFile)
              val days = AuditSource.pendingDays(spark, cfg.srcDir, watermark)
              days.foreach { dp =>
                IngestJob.processDayV2(spark, cfg, dp, root)
                Watermark.commit(cfg.progressFile, dp.day)
              }
              s"${days.size} day(s) via v2 sink"
            } else {
              val s = IngestJob.run(spark, cfg)
              s"${s.days.size} day(s), ${s.filesOk} file(s)"
            }
          log.info(s"Ingest complete: $summary")
        } catch {
          case e: Throwable if isTransient(e) =>
            // Expected transient (credentials expired): warn and exit CLEAN
            // so the scheduler's next cadence retries (ref :303-308).
            log.warn(s"Transient credential failure, exiting for scheduler retry: ${e.getMessage}")
          case e: java.io.FileNotFoundException =>
            log.error(s"Source missing: ${e.getMessage}")
            sys.exit(3)
          case e: Throwable =>
            log.error(s"Ingest failed: ${e.getMessage}", e)
            sys.exit(1)
        } finally spark.stop()
    }
  }
}
