package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR`, emits ONE JSON line with per-query seconds.
  *
  * Noise posture: single-shot timings on a shared VM recorded 10-80x
  * phantom regressions (BENCH_r02 x02=89.6s vs 8.8s standalone), so each
  * query now runs one UNTIMED warmup rep (JIT + page cache + shuffle-file
  * warm) followed by `Reps` timed reps; the reported figure is the MIN —
  * the rep least contaminated by external contention — and the raw reps
  * are kept in the JSON (`"reps"`) so a reader can tell steady-state from
  * weather. Failures are reported per query (`"failed":[...]`) instead of
  * being folded into a normal-looking duration, and the catalog cache is
  * cleared between reps so one rep's storage never skews the next.
  */
object Bench {
  val Reps = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAIL: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, warmOk) = timeOnce(fn) // warmup: untimed, but a failure still counts
      val reps =
        if (warmOk) (1 to Reps).map(_ => timeOnce(fn))
        else Seq((Double.NaN, false))
      val allOk = warmOk && reps.forall(_._2)
      val times = reps.map(_._1)
      (name, if (allOk) times.min else Double.NaN, times, allOk)
    }
    def fmt(d: Double): String = if (d.isNaN) "null" else d.toString
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val reps = results
      .map { case (k, _, ts, _) => "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.filterNot(_._2.isNaN).map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"failed":$failed,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
