package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{FilterConfig, Presets}
import graft.rules.Heuristics

class ConfigSpec extends AnyFunSuite {

  test("config validation fails fast on the driver (C3)") {
    assertThrows[IllegalArgumentException](FilterConfig(minLangConf = 1.5))
    assertThrows[IllegalArgumentException](FilterConfig(maxCharsPerSec = 1.0, minCharsPerSec = 2.0))
    assertThrows[IllegalArgumentException](FilterConfig(frameMs = 0))
    assertThrows[IllegalArgumentException](FilterConfig(saltBuckets = 0))
  }

  test("preset lookup is alias-tolerant with a default fallback (C1/C2)") {
    assert(Presets("PREMIUM") == Presets.default)
    assert(Presets(" strict ") == Presets.strict)
    assert(Presets("nonsense") == Presets.default)
    assert(Presets.strict.minLangConf > Presets.default.minLangConf)
    assert(Presets.lenient.maxSymbolFrac > Presets.default.maxSymbolFrac)
  }

  test("driver contract: entry() returns rows; every oracleSql key has a query") {
    assert(SparkEntry.entry(SparkTestBase.spark).count() > 0)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("H1/H4 boundary behavior") {
    assert(Heuristics.charsPerSec("abcd", 1000) == 4.0)
    assert(Heuristics.charsPerSec("abcd", 0) == 0.0)
    assert(Heuristics.durMismatch(16000, 16000, 1000) == 0.0)
    assert(Heuristics.durMismatch(8000, 16000, 1000) == 0.5)
    assert(Heuristics.durMismatch(0, 16000, 0) == 1.0)
  }
}
