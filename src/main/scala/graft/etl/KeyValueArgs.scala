package graft.etl

/** `--db-metadata key=value` parsing with the reference's exact semantics
  * (_cli.py:137-144): split on the FIRST `=` only, strip both sides, fail
  * fast on malformed input.
  */
object KeyValueArgs {
  def parse(items: Seq[String]): Map[String, String] =
    items.map { item =>
      if (!item.contains("="))
        throw new IllegalArgumentException(
          s"Metadata must be in key=value format, got: $item")
      val Array(k, v) = item.split("=", 2)
      k.trim -> v.trim
    }.toMap
}
