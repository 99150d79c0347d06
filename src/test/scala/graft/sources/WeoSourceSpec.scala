package graft.sources

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** S11 probing cadence vs the reference loop (code/03_deflators.R:25-42):
  * version arithmetic, URL shape, and the probe walk against a fake
  * server (no Spark session needed — this is driver-side logic). */
class WeoSourceSpec extends AnyFunSuite {
  import WeoSource._

  test("fallback cadence matches the R loop: May-Oct→Apr, Jan-Apr→prev Oct, Nov-Dec→Oct") {
    assert(previous(WeoVersion(2025, 8)) == WeoVersion(2025, 4))
    assert(previous(WeoVersion(2025, 10)) == WeoVersion(2025, 4))
    assert(previous(WeoVersion(2025, 5)) == WeoVersion(2025, 4))
    assert(previous(WeoVersion(2025, 4)) == WeoVersion(2024, 10))
    assert(previous(WeoVersion(2025, 1)) == WeoVersion(2024, 10))
    assert(previous(WeoVersion(2025, 12)) == WeoVersion(2025, 10))
    assert(previous(WeoVersion(2025, 11)) == WeoVersion(2025, 10))
  }

  test("URL and tag follow the IMF layout the reference builds (code/03:28)") {
    val v = WeoVersion(2024, 10)
    assert(v.tag == "Oct2024")
    assert(v.url == "https://www.imf.org/-/media/Files/Publications/WEO/" +
      "WEO-Database/2024/October/WEOOct2024all.ashx")
  }

  test("resolve walks newest-first until the fake server's edition and records the probe order") {
    val served = WeoVersion(2023, 10).url
    val probed = scala.collection.mutable.ArrayBuffer.empty[String]
    val hit = resolve(LocalDate.of(2025, 8, 15), u => { probed += u; u == served })
    assert(hit.contains(WeoVersion(2023, 10)))
    // exact walk from an August seed: Aug2025 → Apr2025 → Oct2024 →
    // Apr2024 → Oct2023 (the reference probes its seed first too)
    assert(probed.toSeq == Seq(
      WeoVersion(2025, 8), WeoVersion(2025, 4), WeoVersion(2024, 10),
      WeoVersion(2024, 4), WeoVersion(2023, 10)).map(_.url))
  }

  test("resolve is bounded: an unreachable mirror returns None instead of looping forever") {
    var n = 0
    assert(resolve(LocalDate.of(2025, 1, 1), _ => { n += 1; false }, maxProbes = 10).isEmpty)
    assert(n == 10)
  }
}
