package graft

import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must stay machine-readable on any host: '.'-decimal
  * regardless of JVM locale, and no two queries may silently share a
  * display key (round-6 ADVICE). */
class BenchSpec extends AnyFunSuite {

  test("seconds format is byte-identical under a ','-decimal locale") {
    val saved = Locale.getDefault
    try {
      val samples = Seq(0.0, 0.1234, 1.5, 33.638, 12345.678)
      val underRoot = samples.map(Bench.fmtSeconds)
      Locale.setDefault(Locale.GERMANY) // ','-decimal
      assert(samples.map(Bench.fmtSeconds) == underRoot)
      assert(Bench.fmtSeconds(1.5) == "1.500")
      assert(Bench.fmtSeconds(-1.0) == "-1")
    } finally Locale.setDefault(saved)
  }

  test("compact per-query format: tiered precision, stripped zeros, locale-proof") {
    val saved = Locale.getDefault
    try {
      Locale.setDefault(Locale.GERMANY) // ','-decimal
      assert(Bench.fmtShort(-1.0) == "-1")
      assert(Bench.fmtShort(0.0) == "0")
      assert(Bench.fmtShort(0.029) == "0.029") // <0.1: 3 decimals
      assert(Bench.fmtShort(0.03) == "0.03")
      assert(Bench.fmtShort(0.5) == "0.5") // <1: 2 decimals, stripped
      assert(Bench.fmtShort(0.504) == "0.5")
      assert(Bench.fmtShort(0.72) == "0.72")
      assert(Bench.fmtShort(3.05) == "3.1") // <10: 1 decimal
      assert(Bench.fmtShort(2.0) == "2")
      assert(Bench.fmtShort(12.34) == "12") // >=10: whole seconds
      assert(Bench.fmtShort(86.0) == "86")
    } finally Locale.setDefault(saved)
    // the full-board line must fit the harness tail with sbt's status
    // line behind it: the round-13 line (152 rows × fixed "0.000")
    // overflowed 2000 and the driver recorded parsed: null
    val names = SparkEntry.queries.keys.toSeq.sorted
    val key = Bench.shortKeys(names)
    // worst-typical shape: every row in the widest common tier ("0.12")
    val rows = names.map(n => "\"" + key(n) + "\":" + Bench.fmtShort(0.12))
    val line = rows.mkString("{", ",", "}")
    assert(line.length + 130 < 1900,
      s"queries map ${line.length} chars + ~130 wrapper exceeds the ~1900-char tail budget")
  }

  test("short keys fall back to the full name on prefix collision") {
    val keys = Bench.shortKeys(Seq("q01_agg", "q02_filter", "q02_filter_more", "d01_dedup"))
    assert(keys("q01_agg") == "q01")
    assert(keys("d01_dedup") == "d01")
    // colliding q02 prefix: both keep their full (unique) names
    assert(keys("q02_filter") == "q02_filter")
    assert(keys("q02_filter_more") == "q02_filter_more")
    assert(keys.values.toSeq.distinct.size == keys.size)
  }

  test("the real query board has collision-free display keys") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSeq.distinct.size == names.size)
    // today's board has unique prefixes, so every key stays short; if a
    // future query breaks that, the fallback (not this assert) handles it
    assert(keys.forall { case (k, v) => v == k.takeWhile(_ != '_') || names.count(n =>
      n.takeWhile(_ != '_') == k.takeWhile(_ != '_')) > 1 })
  }
}
