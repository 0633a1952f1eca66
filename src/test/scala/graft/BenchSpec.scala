package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite {
  test("parseFlatJsonMap reads flat name->seconds maps, skipping string values") {
    val m = Bench.parseFlatJsonMap("""{"sf":"sf0.1","q01_pricing_summary":0.25,"x06_envelope_roundtrip":8.4}""")
    assert(m == Map("q01_pricing_summary" -> 0.25, "x06_envelope_roundtrip" -> 8.4))
  }

  test("parseFlatJsonMap tolerates scientific notation and garbage entries") {
    val m = Bench.parseFlatJsonMap("""{"a":1.5e-2,"b":not_json,"c":3}""")
    assert(m("a") == 0.015 && m("c") == 3.0 && !m.contains("b"))
  }
}
