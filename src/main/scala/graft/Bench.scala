package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR`, emits ONE JSON line with per-query seconds.
  *
  * Noise posture: single-shot timings on a shared VM recorded 10-80x
  * phantom regressions (BENCH_r02 x02=89.6s vs 8.8s standalone), so each
  * query runs one UNTIMED warmup rep (JIT + page cache + shuffle-file
  * warm) followed by `Reps` timed reps; the reported figure is the MIN —
  * the rep least contaminated by external contention — and the raw reps
  * are kept in the JSON (`"reps"`) so a reader can tell steady-state from
  * weather. The passes are INTERLEAVED (warmup pass over every query,
  * then full timed pass 1, then full timed pass 2) so a query's reps are
  * separated by a whole pass: a multi-minute contention window hits one
  * rep of many queries, not both reps of a few (observed: a sustained
  * window inflated back-to-back reps of 3 adjacent doc queries 10-40x
  * while min-of-2 back-to-back couldn't tell). Failures are reported per
  * query (`"failed":[...]`) instead of being folded into a normal-looking
  * duration, and the catalog cache is cleared between reps so one rep's
  * storage never skews the next.
  *
  * Interleaving is still beatable: a contention window spanning a WHOLE
  * pass poisons both reps of the alphabetical tail at once (observed in
  * round 3: s01–s04 recorded 8–60x their standalone times, both reps).
  * So after the interleaved passes, any query whose reps disagree by more
  * than [[ContentionRatio]] gets extra ISOLATED reps (run at the end,
  * when the window has usually passed) until two reps agree within the
  * ratio or [[MaxExtraReps]] is spent; queries whose reps never agreed
  * are flagged in `"contended":[...]` so a reader knows the min is still
  * weather-bound rather than steady-state.
  */
object Bench {
  val Reps = 2
  val ContentionRatio = 5.0
  val MaxExtraReps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.ops.Tables.NanosConf, "true") // events table is TIMESTAMP(NANOS)
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

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmOk = ordered.map { case (name, fn) => name -> timeOnce(fn)._2 }.toMap
    val passes: Seq[Map[String, (Double, Boolean)]] = (1 to Reps).map { _ =>
      ordered.map { case (name, fn) =>
        name -> (if (warmOk(name)) timeOnce(fn) else (Double.NaN, false))
      }.toMap
    }
    // Reps agree when the two fastest are within ContentionRatio of each
    // other — then the min is a steady-state figure, not one lucky rep.
    def settled(ts: Seq[Double]): Boolean = {
      val sorted = ts.sorted
      sorted.length >= 2 && sorted(1) <= sorted.head * ContentionRatio
    }
    val results = ordered.map { case (name, fn) =>
      val firstReps = passes.map(_(name))
      val allOk = warmOk(name) && firstReps.forall(_._2)
      var times = firstReps.map(_._1)
      var ok = allOk
      if (ok) {
        // Isolated re-timing for queries the interleaved passes disagree
        // on: a pass-spanning contention window inflates BOTH reps, so
        // keep timing until two reps corroborate each other.
        var extra = 0
        while (ok && !settled(times) && extra < MaxExtraReps) {
          val (t, o) = timeOnce(fn)
          times = times :+ t
          ok = o
          extra += 1
        }
      }
      val contended = ok && !settled(times)
      (name, if (ok) times.min else Double.NaN, times, ok, contended)
    }
    def fmt(d: Double): String = if (d.isNaN) "null" else d.toString
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val reps = results
      .map { case (k, _, ts, _, _) => "\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false, _) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val contended = results.collect { case (k, _, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.filterNot(_._2.isNaN).map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"failed":$failed,"contended":$contended,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
