package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for the q98/q99 storage-format interop queries: the ORC
  * read-back must actually push its predicate into the scan, and the
  * CSV dialect must survive the classic quote-mangling inputs.
  */
class FormatRoundTripSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q98: the ORC read-back scan pushes the lang/n_chars predicate down") {
    val p = graft.SparkEntry.queries("q98_orc_roundtrip")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("orc"), s"expected an ORC scan:\n$p")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), s"no filters pushed into the ORC scan:\n$p")
  }

  test("q99 dialect: delimiter, quote, and newline characters survive the CSV round trip") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("csv-edge").toString
    val nasty = Seq(
      (1L, "comma, separated, text", "en"),
      (2L, "a \"quoted\" phrase", "fr"),
      (3L, "line\nbreak inside", "en"),
      (4L, "both, \"at\" once\nreally", "de"))
      .toDF("doc_id", "text", "lang")
    nasty.write.mode("overwrite").option("header", "true").option("quoteAll", "true").csv(tmp)
    val back = spark.read.schema(nasty.schema).option("header", "true")
      .option("multiLine", "true") // embedded newlines span physical lines
      .csv(tmp)
    assert(back.count() == 4)
    val diff = nasty.join(back.withColumnRenamed("text", "t2"), Seq("doc_id"))
      .filter(col("text") =!= col("t2")).count()
    assert(diff == 0, "CSV dialect mangled quoted content")
  }

  test("q99 ITSELF (the production query, not a parallel re-implementation) survives " +
    "newline-bearing document text") {
    import spark.implicits._
    // the advisory gap: this spec used to exercise the dialect with its
    // own multiLine read while the q99 query read without it — green
    // spec, broken production path. Run the real entry over a fixture
    // whose text embeds newlines and let its own lengths_consistent
    // guard judge the round trip.
    val fixtureDir = java.nio.file.Files.createTempDirectory("csv-newline-docs").toString
    Seq(
      (1L, "plain text", "en", "web"),
      (2L, "line\nbreak inside", "en", "web"),
      (3L, "two\nbreaks\nhere, with a \"quote\"", "fr", "books"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$fixtureDir/documents.parquet")
    val out = graft.SparkEntry.queries("q99_csv_roundtrip")(spark, fixtureDir).collect()
    assert(out.nonEmpty)
    val rowCount = out.map(_.getAs[Long]("n_docs")).sum
    assert(rowCount == 3, s"newline text sheared rows apart: ${out.mkString("; ")}")
    assert(out.forall(_.getAs[Boolean]("lengths_consistent")),
      s"q99 mangled newline-bearing text: ${out.mkString("; ")}")
  }
}
