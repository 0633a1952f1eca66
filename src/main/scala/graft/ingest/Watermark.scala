package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate
import java.time.format.{DateTimeFormatter, DateTimeParseException}

/** Progress-file watermark: a single `YYYY-MM-DD` line recording the last
  * fully-completed day (audit_data_ingest.py:71-73,213-232).
  *
  * Semantics preserved from the reference:
  *  - missing file  => None => process everything (:227-230)
  *  - malformed date => raise (:220-226)
  *  - the filter applied against it is STRICTLY greater-than (:33), so the
  *    recorded day itself is never reprocessed.
  */
object Watermark {
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  /** Read the watermark; None means "no progress yet, process all days". */
  def read(progressFile: String): Option[LocalDate] = {
    val p = Paths.get(progressFile)
    if (!Files.exists(p)) None
    else {
      val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      try Some(LocalDate.parse(raw, Fmt))
      catch {
        case e: DateTimeParseException =>
          throw new IllegalStateException(s"Corrupt progress file $progressFile: '$raw'", e)
      }
    }
  }

  /** Atomically overwrite the watermark with the completed day.
    * Temp-file + ATOMIC_MOVE so a crash mid-commit can never leave a
    * half-written date (stronger than the reference's plain overwrite,
    * same observable semantics).
    */
  def commit(progressFile: String, completedDay: LocalDate): Unit = {
    val target = Paths.get(progressFile).toAbsolutePath
    val parent = Option(target.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(parent)
    val tmp: Path = Files.createTempFile(parent, ".watermark", ".tmp")
    Files.write(tmp, completedDay.format(Fmt).getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Parse a `YYYY-MM-DD` day-directory name; None for non-dated dirs,
    * which the reference skips with a warning (audit_data_ingest.py:30-32).
    */
  def parseDay(name: String): Option[LocalDate] =
    try Some(LocalDate.parse(name, Fmt))
    catch { case _: DateTimeParseException => None }

  /** The reference's `filter_date`: keep strictly newer days only (:33). */
  def isPending(day: LocalDate, watermark: Option[LocalDate]): Boolean =
    watermark.forall(w => day.isAfter(w))
}
