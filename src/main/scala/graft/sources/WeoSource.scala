package graft.sources

import java.time.LocalDate
import java.time.format.TextStyle
import java.util.Locale

/** S11: IMF WEO version-probing resolution (reference
  * `code/03_deflators.R:25-42`). The reference starts from an arbitrary
  * candidate version, builds the IMF URL for it, and — when the HTTP
  * response is not the xls content-type — steps backwards through the
  * WEO publication cadence (April and October editions) until a probe
  * hits, then downloads that workbook.
  *
  * Engine-side this is pure version arithmetic with a PLUGGABLE probe:
  * this zero-egress build ships no HTTP client, so `resolve` takes
  * `probe: String => Boolean` (production injects a HEAD-request lambda
  * checking `content-type == application/vnd.ms-excel`; the spec injects
  * a fake server). The downstream scan of the resolved workbook is S10
  * (UTF-16 TSV with multi-token NA scrub, CsvSources) and the deflator
  * math is W1-W5 (cva.Deflators) — this closes the probing step between
  * them.
  */
object WeoSource {

  /** A WEO edition. After one fallback step the month is always 4 or 10
    * (the publication cadence); the STARTING candidate may carry any
    * month, exactly as the reference's seed version does. */
  final case class WeoVersion(year: Int, month: Int) {
    private def m = java.time.Month.of(month)
    /** "Oct2024" — R's `format(date, "%b%Y")` (filename + URL leaf). */
    def tag: String = s"${m.getDisplayName(TextStyle.SHORT, Locale.ENGLISH)}$year"
    /** "October" — R's full `month(label=TRUE, abbr=FALSE)` (URL path). */
    def monthText: String = m.getDisplayName(TextStyle.FULL, Locale.ENGLISH)
    def url: String =
      s"https://www.imf.org/-/media/Files/Publications/WEO/WEO-Database/" +
        s"$year/$monthText/WEO${tag}all.ashx"
  }

  /** One fallback step of the reference's while-loop (code/03:30-38):
    * May-Oct → April same year; Jan-Apr → October previous year;
    * Nov-Dec → October same year. */
  def previous(v: WeoVersion): WeoVersion =
    if (v.month > 4 && v.month <= 10) WeoVersion(v.year, 4)
    else if (v.month <= 4) WeoVersion(v.year - 1, 10)
    else WeoVersion(v.year, 10)

  /** Candidate versions newest-first from a seed date, seed included. */
  def candidates(seed: LocalDate): Iterator[WeoVersion] =
    Iterator.iterate(WeoVersion(seed.getYear, seed.getMonthValue))(previous)

  /** First edition whose URL the probe accepts, walking the cadence
    * backwards from `seed`. `maxProbes` bounds the walk (the reference
    * loops forever on an unreachable mirror — a driver-side hang this
    * engine refuses to reproduce). */
  def resolve(seed: LocalDate, probe: String => Boolean,
      maxProbes: Int = 24): Option[WeoVersion] =
    candidates(seed).take(maxProbes).find(v => probe(v.url))
}
