package graft.service

/** The output-format names the service shell can render — shared by
  * [[QueryService]] (which refuses unknown names BEFORE execution;
  * ClickHouse errors on unknown format names too) and [[QueryServer]]
  * (which renders). Names are case-insensitive, as in CH. */
object ResponseFormats {
  val names: Seq[String] = Seq(
    "JSON", "JSONEachRow", "NDJSON", "JSONEachRowWithProgress",
    // r17: the play-UI envelope + its row-per-line sibling
    "JSONCompact", "JSONCompactEachRow",
    "CSV", "CSVWithNames", "CSVWithNamesAndTypes",
    "TSV", "TabSeparated", "TSVWithNames", "TabSeparatedWithNames",
    "TSVWithNamesAndTypes", "TabSeparatedWithNamesAndTypes",
    "Pretty", "PrettyCompact", "Values", "Vertical", "Null",
    // binary extract formats (r15): Native streams the CH block
    // codec one BlockRows chunk at a time; Parquet spools one file;
    // Arrow/ArrowStream ride Spark's own IPC writers
    "Native", "Parquet", "Arrow", "ArrowStream",
    // row-major binary (r16): the format most CH SDKs default to
    // after Native — graft.service.native.RowBinary
    "RowBinary", "RowBinaryWithNames", "RowBinaryWithNamesAndTypes")
  private val lower = names.map(_.toLowerCase).toSet
  def supported(name: String): Boolean = lower.contains(name.toLowerCase)
}
