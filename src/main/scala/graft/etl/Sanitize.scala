package graft.etl

/** Field/table-name sanitization with the reference's exact semantics
  * (fmp_reader.py:56-61): strip → lowercase → collapse every run of
  * non-word characters to `_` → prefix `_` if the result starts with a
  * digit.
  *
  * Python's `\W` is unicode-aware (`Enschedé → enschedé`,
  * field_mappings.csv:35), so the regexes compile with UNICODE_CHARACTER_
  * CLASS (`(?U)`); plain Java `\W` would mangle non-ASCII letters
  * (SURVEY.md §7.4.5). Pure driver-side metadata logic — column renames
  * never touch data.
  */
object Sanitize {
  private val NonWord = "(?U)\\W+".r
  private val LeadingDigit = "(?U)^\\d".r

  def sanitize(name: String): String = {
    // Locale.ROOT: Python's str.lower() is locale-independent; a default
    // tr/az JVM locale would otherwise map I→ı and corrupt clean names.
    val base = NonWord.replaceAllIn(name.trim.toLowerCase(java.util.Locale.ROOT), "_")
    if (LeadingDigit.findPrefixOf(base).isDefined) "_" + base else base
  }

  /** Default header strategy (fmp_reader.py:64-72): sanitize every field
    * name; duplicate cleaned names are a hard failure, not silent
    * suffixing (reference semantics rule §2C.3).
    */
  def defaultHeaderStrategy(originalNames: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    originalNames.foreach { orig =>
      val clean = sanitize(orig)
      if (!seen.add(clean))
        throw new IllegalArgumentException(s"Duplicate field name: $clean")
      out += clean
    }
    out.toSeq
  }
}
