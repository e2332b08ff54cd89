package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

class EtlSpec extends SparkSpec {

  test("key=value parsing: first '=' splits, both sides stripped") {
    assert(KeyValueArgs.parse(Seq("a=1", " b = x=y ", "c= ")) ==
      Map("a" -> "1", "b" -> "x=y", "c" -> ""))
  }

  test("key=value parsing rejects items without '='") {
    val ex = intercept[IllegalArgumentException](KeyValueArgs.parse(Seq("nope")))
    assert(ex.getMessage.contains("key=value"))
  }

  test("mapping spec parses file and optional column") {
    assert(MappingFile.parseSpec("m.csv") == ("m.csv", None))
    assert(MappingFile.parseSpec("m.csv:english_name") == ("m.csv", Some("english_name")))
  }

  test("mapping file: named column resolution against the real Ceneton CSV") {
    val res = getClass.getClassLoader.getResource("field_mappings.csv").getPath
    val m = MappingFile.readMapping(spark, s"$res:english_name")
    assert(m("aantal_bedr_") == "act_count")
    assert(m("auteur") == "author")
    assert(m.size == 126)
  }

  test("mapping file: default column index 1 (identity on clean names)") {
    val res = getClass.getClassLoader.getResource("field_mappings.csv").getPath
    val m = MappingFile.readMapping(spark, res)
    assert(m("aantal_bedr_") == "aantal_bedr_")
  }

  test("mapping file: unknown named column fails fast") {
    val res = getClass.getClassLoader.getResource("field_mappings.csv").getPath
    intercept[IllegalArgumentException](MappingFile.readMapping(spark, s"$res:not_a_column"))
  }

  test("applyMapping renames columns without touching data") {
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("auteur", "jaar")
    val renamed = MappingFile.applyMapping(df, Map("auteur" -> "author"))
    assert(renamed.columns.toSeq == Seq("author", "jaar"))
    assert(renamed.collect().head.getString(0) == "x")
  }

  test("applyCommentMapping keeps names and carries the mapping as comment metadata") {
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("auteur", "jaar")
    val out = MappingFile.applyCommentMapping(df, Map("auteur" -> "author"))
    assert(out.columns.toSeq == Seq("auteur", "jaar"), "reference never renames")
    val f = out.schema.fields(0)
    assert(f.metadata.contains("comment") && f.metadata.getString("comment") == "author")
    assert(!out.schema.fields(1).metadata.contains("comment"))
    assert(out.collect().head.getString(0) == "x", "pure metadata op")
  }
}
