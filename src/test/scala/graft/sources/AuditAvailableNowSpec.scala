package graft.sources

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Trigger.AvailableNow admission contract on the `graft-audit`
  * stream: the ceiling is fixed at query start, INCLUDING when the start
  * listing is empty — a day directory landing mid-run waits for the next
  * run (one scheduled invocation of the reference processes only what it
  * saw at startup).
  */
class AuditAvailableNowSpec extends AnyFunSuite {
  private def emptyOpts = new CaseInsensitiveStringMap(java.util.Collections.emptyMap[String, String]())

  test("AvailableNow pinned on an EMPTY source admits nothing, even if a day lands mid-run") {
    graft.SparkSpec.spark // ensure SparkSession.active exists
    val src = Files.createTempDirectory("empty-src")
    val stream = new AuditMicroBatchStream(src.toString, emptyOpts)
    stream.prepareForTriggerAvailableNow() // lists nothing: ceiling must mean "admit nothing"

    // a day lands mid-run
    val d = Files.createDirectories(src.resolve("2021-01-01"))
    Files.write(d.resolve("a.txt"), "x".getBytes)

    val start = stream.initialOffset()
    assert(stream.latestOffset(start, ReadLimit.allAvailable()) == start, "mid-run day was admitted")

    // the NEXT run (fresh pin) sees it
    val next = new AuditMicroBatchStream(src.toString, emptyOpts)
    next.prepareForTriggerAvailableNow()
    assert(
      next.latestOffset(start, ReadLimit.allAvailable()) == AuditDayOffset(Some(LocalDate.parse("2021-01-01")))
    )
  }

  test("a non-AvailableNow (continuous micro-batch) stream has no ceiling: new days admitted as they land") {
    graft.SparkSpec.spark
    val src = Files.createTempDirectory("cont-src")
    val stream = new AuditMicroBatchStream(src.toString, emptyOpts) // prepare never called
    val d = Files.createDirectories(src.resolve("2021-02-01"))
    Files.write(d.resolve("a.txt"), "x".getBytes)
    val start = stream.initialOffset()
    assert(
      stream.latestOffset(start, ReadLimit.allAvailable()) == AuditDayOffset(Some(LocalDate.parse("2021-02-01")))
    )
  }
}
