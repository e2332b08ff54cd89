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
    Console.withOut(new PrintStream(buf, true, "UTF-8"))(f)
    new String(buf.toByteArray, StandardCharsets.UTF_8).linesIterator.toSeq
  }

  test("dump_headers prints original_name,clean_name rows") {
    val out = captureStdout(FmpCli.main(Array("dump_headers", fixture())))
    assert(out == Seq("original_name,clean_name", "Auteur,auteur", "Jaar,jaar"))
  }

  test("print reports the record counts") {
    spark // ensure shared session exists so the CLI must not stop it
    val out = captureStdout(FmpCli.main(Array("print", fixture())))
    assert(out.contains("Parsing 2 records from Ceneton"))
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
