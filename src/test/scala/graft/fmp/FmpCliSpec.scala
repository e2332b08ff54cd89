package graft.fmp

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

/** End-to-end CLI parity (A13): the four ct-db commands driven through
  * FmpCli.main with captured stdout. */
class FmpCliSpec extends SparkSpec {

  private val ns = "http://www.filemaker.com/fmp/1/result"

  private def fixture(): String = {
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<FMPXMLRESULT xmlns="$ns">
         |  <ERRORCODE>0</ERRORCODE>
         |  <PRODUCT BUILD="x" NAME="FileMaker" VERSION="1"/>
         |  <DATABASE DATEFORMAT="d" LAYOUT="" NAME="Ceneton" RECORDS="2" TIMEFORMAT="h"/>
         |  <METADATA>
         |    <FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Auteur" TYPE="TEXT"/>
         |    <FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Jaar" TYPE="NUMBER"/>
         |  </METADATA>
         |  <RESULTSET FOUND="2">
         |    <ROW MODID="0" RECORDID="1"><COL><DATA>Vondel</DATA></COL><COL><DATA>1637</DATA></COL></ROW>
         |    <ROW MODID="0" RECORDID="2"><COL><DATA>Bredero</DATA></COL><COL><DATA/></COL></ROW>
         |  </RESULTSET>
         |</FMPXMLRESULT>""".stripMargin
    val p = Files.createTempDirectory("fmpcli").resolve("export.xml")
    Files.write(p, xml.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def captureStdout(f: => Unit): Seq[String] = {
    val buf = new ByteArrayOutputStream()
    val ps = new PrintStream(buf, true, "UTF-8")
    // Redirect BOTH: Scala's Console (driver-thread printlns) and
    // System.out (executor-thread progress lines resolve it per call).
    val oldSysOut = System.out
    System.setOut(ps)
    try Console.withOut(ps)(f) finally System.setOut(oldSysOut)
    new String(buf.toByteArray, StandardCharsets.UTF_8).linesIterator.toSeq
  }

  test("dump_headers prints original_name,clean_name rows") {
    val out = captureStdout(FmpCli.main(Array("dump_headers", fixture())))
    assert(out == Seq("original_name,clean_name", "Auteur,auteur", "Jaar,jaar"))
  }

  test("print reports the record counts with a final rec/s progress line") {
    spark // ensure shared session exists so the CLI must not stop it
    val out = captureStdout(FmpCli.main(Array("print", fixture())))
    assert(out.contains("Parsing 2 records from Ceneton"))
    assert(out.exists(l => l.startsWith("[fmp] export.xml: parsed 2 records (")
      && l.endsWith(" rec/s)")), s"expected a progress summary line, got: $out")
    assert(out.contains("Materialized 2 records"))
    assert(out.last == "Done")
    assert(!spark.sparkContext.isStopped, "CLI must not stop a pre-existing session")
  }

  test("to_json emits null-preserving JSONL in schema order") {
    spark
    val out = captureStdout(FmpCli.main(Array("to_json", fixture())))
    assert(out.size == 2)
    assert(out.head == """{"auteur":"Vondel","jaar":"1637"}""")
    assert(out(1) == """{"auteur":"Bredero","jaar":null}""")
  }

  test("dump_headers RFC4180-quotes names containing commas or quotes") {
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<FMPXMLRESULT xmlns="$ns">
         |  <DATABASE DATEFORMAT="d" LAYOUT="" NAME="Ceneton" RECORDS="0" TIMEFORMAT="h"/>
         |  <METADATA>
         |    <FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Naam, voluit" TYPE="TEXT"/>
         |    <FIELD EMPTYOK="YES" MAXREPEAT="1" NAME="Bron &quot;A&quot;" TYPE="TEXT"/>
         |  </METADATA>
         |  <RESULTSET FOUND="0"></RESULTSET>
         |</FMPXMLRESULT>""".stripMargin
    val p = Files.createTempDirectory("fmpcsv").resolve("export.xml")
    Files.write(p, xml.getBytes(StandardCharsets.UTF_8))
    val out = captureStdout(FmpCli.main(Array("dump_headers", p.toString)))
    assert(out.contains("\"Naam, voluit\",naam_voluit"))
    assert(out.contains("\"Bron \"\"A\"\"\",bron_a_"))
  }

  test("create_db on a .bz2 snapshot hashes the DECOMPRESSED content") {
    spark
    val xmlPath = java.nio.file.Paths.get(fixture())
    val xmlBytes = Files.readAllBytes(xmlPath)
    val dir = Files.createTempDirectory("fmpbz2")
    val bz2 = dir.resolve("snap-2026-01-01.xml.bz2")
    val os = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(
      Files.newOutputStream(bz2))
    try os.write(xmlBytes) finally os.close()
    val url = "jdbc:derby:memory:clibz2;create=true"
    captureStdout(FmpCli.main(Array("create_db", dir.toString, url)))
    val meta = spark.read.jdbc(url, "ceneton_metadata", new java.util.Properties())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(xmlBytes).map("%02x".format(_)).mkString
    assert(meta("source_sha256") == expected,
      "provenance hash must cover the XML bytes, not the bz2 archive")
    assert(meta("source_sha256") !=
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(Files.readAllBytes(bz2)).map("%02x".format(_)).mkString)
  }

  test("create_db --mapping-column keeps clean column names (mapping → comment)") {
    spark
    val mappingCsv = Files.createTempDirectory("fmpmap").resolve("map.csv")
    Files.write(mappingCsv,
      "original_name,clean_name,english_name\nAuteur,auteur,author\nJaar,jaar,year\n"
        .getBytes(StandardCharsets.UTF_8))
    val url = "jdbc:derby:memory:climap;create=true"
    captureStdout(FmpCli.main(Array(
      "create_db", fixture(), url, "--table-name", "mapped_plays",
      "--mapping-column", s"$mappingCsv:english_name")))
    val loaded = spark.read.jdbc(url, "mapped_plays", new java.util.Properties())
    assert(loaded.columns.toSeq == Seq("auteur", "jaar"),
      "reference keeps sanitized clean names; mapping must not rename the table columns")
    assert(loaded.count() == 2)
    // Spark's JDBC writer emits no column COMMENT DDL, so the mapping must
    // land in the provenance metadata table — not be silently dropped.
    val meta = spark.read.jdbc(url, "mapped_plays_metadata", new java.util.Properties())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("column_comment.auteur") == "author")
    assert(meta("column_comment.jaar") == "year")
  }

  test("every CLI command opens (decompresses) the snapshot exactly once") {
    spark
    def opensDuring(f: => Unit): Long = {
      val before = FmpReader.streamOpens.get()
      f
      FmpReader.streamOpens.get() - before
    }
    val f = fixture()
    assert(opensDuring(captureStdout(FmpCli.main(Array("dump_headers", f)))) == 1L,
      "dump_headers must open the stream once (header-only early exit)")
    assert(opensDuring(captureStdout(FmpCli.main(Array("print", f)))) == 1L,
      "print must count records on the same stream that read the header")
    assert(opensDuring(captureStdout(FmpCli.main(Array("to_json", f)))) == 1L,
      "to_json must parse in a single pass")
    assert(opensDuring(captureStdout(FmpCli.main(Array(
      "create_db", f, "jdbc:derby:memory:clionce;create=true", "--table-name", "once")))) == 1L,
      "create_db must take rows, counts, and the sha256 from one tapped stream")
  }

  test("DB_URL resolution: positional wins, env var is the documented fallback") {
    assert(FmpCli.resolveDbUrl(Some("jdbc:derby:a"), Map("DB_URL" -> "jdbc:derby:b"))
      .contains("jdbc:derby:a"))
    assert(FmpCli.resolveDbUrl(None, Map("DB_URL" -> "jdbc:derby:b"))
      .contains("jdbc:derby:b"))
    assert(FmpCli.resolveDbUrl(None, Map.empty).isEmpty)
  }

  test("create_db loads Derby with provenance incl. sha256 and db-metadata") {
    spark
    val url = "jdbc:derby:memory:clitest;create=true"
    val out = captureStdout(FmpCli.main(Array(
      "create_db", fixture(), url, "--table-name", "plays",
      "--db-metadata", "curator=leiden")))
    assert(out.exists(_.contains("Loaded 2 records into plays")))
    val meta = spark.read.jdbc(url, "plays_metadata", new java.util.Properties())
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta("record_count") == "2")
    assert(meta("curator") == "leiden")
    assert(meta("source_sha256").length == 64)
    assert(meta("source_url").endsWith("export.xml"))
    assert(spark.read.jdbc(url, "plays", new java.util.Properties()).count() == 2)
  }
}
