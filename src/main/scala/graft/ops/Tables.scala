package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  type Q = (SparkSession, String) => DataFrame

  /** Session conf required to read the nanos-timestamp events table.
    * Must be set ONCE at session construction (Verify/Bench/SparkSpec do);
    * `t()` never mutates session state — a conf write inside the query
    * path would race with concurrent foreign queries on the same session.
    */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark refuses to read
      // natively; read it as a nanos long and convert. The data carries
      // micro precision, so `div 1000` is lossless here.
      require(
        spark.conf.getOption(NanosConf).contains("true"),
        s"$NanosConf must be set to true at SparkSession construction to read the events table"
      )
      spark.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
