package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CompanyNameNorm, DedupLines, HtmlToText, internal}

import graft.GraftFunctions

/** F4-F19: pure `Column => Column` normalization/cleanup builders
  * (SURVEY.md §2.2). These compose into the document-cleaning chain the
  * reference applies at ingest (src/crawler/Processor.py:111-187).
  */
object Normalize {
  /** F4: drop parenthetical qualifiers + trim. */
  def stripParens(c: Column): Column =
    trim(regexp_replace(c, "\\(.*?\\)", ""))

  /** F5: "all but last word" company-name normalization (custom expr). */
  def companyName(c: Column): Column =
    internal.column(CompanyNameNorm(internal.expression(lower(c))))

  /** F6: URL-encode spaces (the only encoding the reference applies). */
  def urlEncodeSpaces(c: Column): Column = regexp_replace(c, " ", "%20")

  /** F7: HTML -> newline-joined text nodes (custom expr). */
  def htmlToText(c: Column): Column =
    internal.column(HtmlToText(internal.expression(c)))

  /** F7b: leaf-block HTML variant (tools/patchabbrev.py:44-85): text
    * blocks with per-block whitespace flattening, pure page-number blocks
    * dropped, joined by blank lines. */
  def htmlToBlocks(c: Column): Column =
    array_join(
      filter(
        transform(split(htmlToText(c), "\n"),
          l => regexp_replace(trim(l), "\\s+", " ")),
        l => !l.rlike("^\\d+$") && l =!= ""),
      "\n\n")

  /** F17: mojibake remap + Unicode quote folding (custom expr). */
  def normalizeQuotes(c: Column): Column =
    internal.column(org.apache.spark.sql.graft.NormalizeQuotes(
      internal.expression(c)))

  /** F8: remove digit-only lines (page numbers). */
  def removePageNumbers(c: Column): Column =
    regexp_replace(c, "(?m)^\\s*\\d+\\s*$", "")

  /** F9: collapse blank-line runs to a single blank line. */
  def collapseBlankRuns(c: Column): Column =
    regexp_replace(c, "\n\\s*\n+", "\n\n")

  /** F10: NFKC + ASCII fold (custom expr). */
  def nfkcAscii(c: Column): Column = GraftFunctions.nfkc_ascii(c)

  /** F11: strip table-of-contents markers (both reference variants). */
  def removeTocMarkers(c: Column): Column =
    regexp_replace(c, "(?i)table\\s*of\\s*contents?", "")

  /** F12: content cap (450k chars) and lowercased header probe (11k). */
  def truncateDoc(c: Column): Column = substring(c, 1, 450000)
  def headerProbe(c: Column): Column = lower(substring(c, 1, 11000))

  /** The full ingest cleaning chain F7 -> F8 -> F9 -> F10 -> F11 -> F12
    * (src/crawler/Processor.py:111-181). */
  def cleanDocument(raw: Column): Column =
    truncateDoc(removeTocMarkers(nfkcAscii(collapseBlankRuns(
      removePageNumbers(htmlToText(raw))))))

  /** U3: order-preserving line dedup (custom expr). */
  def dedupLines(c: Column): Column =
    internal.column(DedupLines(internal.expression(c)))

  /** Escape regex metacharacters in a data column (for F13 dynamic
    * word-boundary patterns), equivalent to Python's re.escape. */
  def regexQuote(c: Column): Column =
    regexp_replace(c, "([\\\\.\\[\\]{}()*+?^$|\\-&])", "\\\\$1")

  /** F13: both normalized names present (word-boundary) in the header probe.
    * Dynamic per-row pattern: compiled per distinct pattern at runtime. */
  def bothNamesPresent(header: Column, nameA: Column, nameB: Column): Column = {
    def present(name: Column): Column =
      regexp_like(header, concat(lit("\\b"), regexQuote(name), lit("\\b")))
    present(nameA) && present(nameB)
  }

  /** F14: hyphen-fallback variant of a name. */
  def hyphenToSpace(c: Column): Column = translate(c, "-", " ")

  // --- PII redaction (training-data hygiene) ---------------------------
  // Patterns stay inside the common Java-regex/RE2 subset (explicit
  // classes, \b, bounded repeats, groups/alternation) so the DuckDB twin
  // runs them verbatim. The replace chain runs in a fixed order (email,
  // SSN 3-2-4, phone, IPv4) and the oracle replays the same order, so any
  // pattern overlap resolves identically in both engines.
  //
  // Covered shapes (a gated proxy, not a compliance product): emails of
  // the common user@host.tld form; SSN-shaped 3-2-4 ids; US phones as
  // 3-3-4 with -, . or space separators plus the parenthesized-area-code
  // form "(555) 867-5309" (optional space after the close paren); IPv4 as
  // four 1-3 digit octets — deliberately lenient (999.999.999.999
  // redacts: over-redaction is the safe failure mode for a scrub).
  // International prefixes (+1), extensions, and letter-mask phones are
  // out of scope here.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhonePattern =
    "(\\([0-9]{3}\\) ?|\\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\\b"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, SSN-shaped ids, phone numbers, and IPv4 addresses to
    * fixed tags — a per-row regexp_replace chain (codegen'd, no UDF), so
    * the scrub is a pure map stage at any corpus size. */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailPattern, "<EMAIL>")
    val noSsn = regexp_replace(noEmail, SsnPattern, "<ID>")
    val noPhone = regexp_replace(noSsn, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, Ipv4Pattern, "<IP>")
  }
}
