package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `--mapping-column` support (_cli.py:86-105): parse a
  * `file.csv[:column]` spec, read the CSV, and build a
  * `clean_name → target_name` map. Keys always come from CSV column index
  * 1 (the clean names); the value column is resolved by header name when
  * `:column` is given, else defaults to index 1.
  *
  * In the reference the mapping does NOT rename the database columns —
  * the table always keeps the sanitized clean names, and the mapped value
  * becomes the column COMMENT (sql.py:29-37 passes `mapping[name]` as
  * `comment` while `Column(name=clean)`). [[applyCommentMapping]] is that
  * behavior; [[applyMapping]] (a real rename) is this engine's extension
  * for callers that want English column names in the DataFrame itself.
  *
  * Either way the mapping is driver-side metadata: a broadcast/data-plane
  * join would be the wrong tool (SURVEY.md §2A A8).
  */
object MappingFile {

  /** Parse `"file.csv"` or `"file.csv:column_name"`. The column is taken
    * after the LAST colon and only when it looks like a column identifier
    * — sanitized column names cannot contain `:`/`/`, so URI paths
    * (`file:///...`, `s3://...`) and Windows drives are never misparsed
    * into (scheme, rest). */
  def parseSpec(spec: String): (String, Option[String]) = {
    val i = spec.lastIndexOf(':')
    if (i < 0) (spec, None)
    else {
      val suffix = spec.substring(i + 1)
      if (suffix.matches("[A-Za-z_][A-Za-z0-9_]*")) (spec.substring(0, i), Some(suffix))
      else (spec, None)
    }
  }

  /** Read the mapping CSV (driver-side; header row required). */
  def readMapping(spark: SparkSession, spec: String): Map[String, String] = {
    val (file, columnName) = parseSpec(spec)
    val df = spark.read.option("header", "true").csv(file)
    val header = df.columns
    val valueIdx = columnName match {
      case Some(c) =>
        val i = header.indexOf(c)
        require(i >= 0, s"Mapping column '$c' not found in $file (have: ${header.mkString(", ")})")
        i
      case None => 1
    }
    // Spark's CSV reader parses empty cells as null; the reference's csv
    // module yields "" — normalize so comments/provenance never carry null.
    df.collect().map(r =>
      Option(r.getString(1)).getOrElse("") ->
        Option(r.getString(valueIdx)).getOrElse("")).toMap
  }

  /** Apply a rename mapping to a DataFrame (pure metadata op, no job). */
  def applyMapping(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** Reference-parity mapping application: keep the clean column names and
    * carry the mapped value as the column `comment` metadata (sql.py:29-37).
    * The FMP reader also uses `comment` for the ORIGINAL FileMaker field
    * name (the A5/`dump_headers` contract), so any pre-existing comment is
    * preserved under `fmp_original_name` before being overwritten —
    * [[graft.sinks.Sinks.headersDf]] reads that key first. Pure metadata
    * op, no job. */
  def applyCommentMapping(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val cols = df.schema.fields.map { f =>
      mapping.get(f.name) match {
        case Some(comment) =>
          val b = new MetadataBuilder().withMetadata(f.metadata)
          if (f.metadata.contains("comment") && !f.metadata.contains("fmp_original_name"))
            b.putString("fmp_original_name", f.metadata.getString("comment"))
          col(f.name).as(f.name, b.putString("comment", comment).build())
        case None => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
