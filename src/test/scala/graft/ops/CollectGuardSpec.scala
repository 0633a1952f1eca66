package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CollectGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("smallDistinct collects a set within the cap") {
    import spark.implicits._
    val rows = CollectGuard.smallDistinct(
      Seq("a", "b", "a", "c").toDF("k"), cap = 10)
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
  }

  test("smallDistinct refuses a set over the cap instead of collecting it") {
    val wide = spark.range(1000).toDF("k")
    val e = intercept[IllegalArgumentException] {
      CollectGuard.smallDistinct(wide, cap = 100)
    }
    assert(e.getMessage.contains("exceeds the cap"))
  }
}
