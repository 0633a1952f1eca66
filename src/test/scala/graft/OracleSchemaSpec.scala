package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every oracle-checked query must emit a scalar-only schema: the driver's
  * correctness gate sorts result rows through pandas, which cannot hash
  * array/map/struct cells (unhashable numpy.ndarray) and turns a correct
  * answer into an `err` row. Schema derivation is analysis-only (no job
  * runs), so checking all queries here is cheap.
  */
class OracleSchemaSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("all oracle-checked queries emit scalar-only columns") {
    val spark = SparkSpec.spark
    val bad = SparkEntry.queries.toSeq
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .flatMap { case (name, fn) =>
        val complex = fn(spark, sf).schema.fields.filterNot(f => Verify.isScalar(f.dataType))
        complex.map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
      }
    assert(bad.isEmpty, s"non-scalar oracle-checked outputs: ${bad.mkString("; ")}")
  }

  test("the guard itself rejects an array-emitting frame") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(array(col("id"), col("id")).as("a"))
    assert(df.schema.fields.exists(f => !Verify.isScalar(f.dataType)))
  }

  test("every queries entry has an oracle or is on the explicit rows-only allowlist") {
    // As of round 6 every query is exact-oracle, so the allowlist is
    // EMPTY. Adding a query without an oracleSql entry fails this test
    // until its name is deliberately added here — rows-only is a
    // conscious, reviewed downgrade, never a silent default.
    val rowsOnlyAllowlist = Set.empty[String]
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(
      rowsOnly == rowsOnlyAllowlist,
      s"queries without an oracle and not allowlisted: ${(rowsOnly -- rowsOnlyAllowlist).toSeq.sorted.mkString(", ")}")
  }
}
