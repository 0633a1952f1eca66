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

  test("q104: the written footer carries a doc_id bloom filter on every row group " +
    "and the point lookup pushes its filter") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    // write the same layout the query writes
    val base = java.nio.file.Files.createTempDirectory("bloom-spec").toString
    Tables.t(spark, sfDir, "documents")
      .orderBy(md5(col("text")))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#doc_id", "true")
      .option("parquet.bloom.filter.expected.ndv#doc_id", "100000")
      .parquet(base)
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(base).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala
        assert(blocks.nonEmpty)
        blocks.foreach { b =>
          val cols = b.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
          val docCol = cols("doc_id")
          assert(docCol.getBloomFilterOffset > 0,
            s"row group in ${f.getName} has no bloom filter for doc_id")
          // and the bloom really answers membership: present id hits,
          // absent id (beyond the corpus) misses with high probability
          val bloom = rd.getBloomFilterDataReader(b).readBloomFilter(docCol)
          assert(bloom != null)
          val present = spark.read.parquet(f.getAbsolutePath)
            .select(col("doc_id")).limit(1).collect()(0).getLong(0)
          assert(bloom.findHash(bloom.hash(present)), "bloom missed a PRESENT id (false negative)")
        }
      } finally rd.close()
    }
    // the production query's scan pushes the In filter
    val p = graft.SparkEntry.queries("q104_bloom_pointlookup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(doc_id") || p.contains("PushedFilters: [EqualTo(doc_id"),
      s"point lookup not pushed into the parquet scan:\n$p")
  }

  test("q105 Morton kernel: the bit-interleave expression matches a reference " +
    "interleave on known values and is monotone-local (same 16x16 tile => close z)") {
    import spark.implicits._
    // the exact expression q105 builds (low 16 bits of x and y interleaved,
    // x in odd positions, y in even)
    val zBits = (0 until 16).map(b =>
      s"shiftleft((x >> $b) & 1, ${2 * b + 1}) | shiftleft((y >> $b) & 1, ${2 * b})")
      .mkString("(", ") | (", ")")
    def refZ(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b))).reduce(_ | _)
    val cases = Seq((0L, 0L), (5L, 3L), (1L, 0L), (0L, 1L), (65535L, 65535L), (1023L, 512L))
    val got = cases.toDF("x", "y").withColumn("z", expr(zBits))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == refZ(x, y), s"z($x, $y) = $z, reference ${refZ(x, y)}")
    }
    // spot the locality property the layout relies on: interleaving maps a
    // 16x16 tile into one contiguous 256-value z range
    assert(refZ(5L, 3L) == 39L)
    for (x <- 16L until 32L; y <- 48L until 64L)
      assert(refZ(x, y) >= refZ(16L, 48L) && refZ(x, y) < refZ(16L, 48L) + 256,
        s"($x, $y) escapes its 16x16 tile's z range")
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
