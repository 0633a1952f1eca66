package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  /** Session conf that lets Spark read a TIMESTAMP(NANOS) events table
    * (it reads as a nanos long). Must be set ONCE at session construction
    * (Verify/Bench/SparkSpec do); `t()` never mutates session state — a
    * conf write inside the query path would race with concurrent foreign
    * queries on the same session. Harmless when the table is micros.
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      try spark.read.parquet(s"$dir/$name.parquet")
      catch {
        // Schema inference rejects TIMESTAMP(NANOS) columns before the
        // friendly require below can run; re-throw with the conf hint.
        case e: Exception if Option(e.getMessage).exists(_.contains("NANOS")) =>
          throw new IllegalStateException(
            s"$NanosConf must be set to true at SparkSession construction " +
              s"to read $name.parquet (TIMESTAMP(NANOS) column)", e)
      }
    if (name == "events") {
      // The driver has shipped events.ts as parquet TIMESTAMP(NANOS) in
      // some rounds and timestamp[us] (TIMESTAMP_NTZ) in others; normalize
      // both to a session-TZ (UTC) TimestampType so every downstream query
      // sees one type. Nanos arrive as a long (NanosConf) and carry micro
      // precision, so `div 1000` is lossless.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          require(
            spark.conf.getOption(NanosConf).contains("true"),
            s"$NanosConf must be set to true at SparkSession construction to read the events table")
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Data is UTC-naive and the session TZ is pinned to UTC, so the
          // NTZ→LTZ cast reinterprets the same wall-clock instant.
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else df
  }
}
