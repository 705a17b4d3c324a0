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
