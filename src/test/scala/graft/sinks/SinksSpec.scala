package graft.sinks

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  private def sampleDf = {
    val schema = StructType(Seq(
      StructField("auteur", StringType, nullable = true,
        metadata = new MetadataBuilder().putString("comment", "Auteur").build()),
      StructField("jaar", StringType, nullable = true,
        metadata = new MetadataBuilder().putString("comment", "Jaar").build())))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("Vondel", "1637"), Row(null, "1660"), Row("Bredero", null)), 1),
      schema)
  }

  test("JSONL sink preserves explicit nulls (reference parity A7)") {
    val dir = Files.createTempDirectory("jsonl").resolve("out").toString
    Sinks.writeJsonl(sampleDf.orderBy("jaar"), dir, ordered = true)
    val lines = spark.read.textFile(dir).collect().toSeq
    assert(lines.size == 3)
    assert(lines.exists(_.contains(""""auteur":null""")), s"nulls must be explicit, got $lines")
    // round-trip: schema and rows survive
    val back = spark.read.json(dir)
    assert(back.count() == 3)
  }

  test("ORC sink round-trips schema, rows, and nulls; zone maps survive") {
    val dir = Files.createTempDirectory("orc").resolve("out").toString
    val df = graft.Tables.t(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    Sinks.writeOrc(df, dir)
    val back = spark.read.orc(dir)
    assert(back.schema == df.schema, "ORC must preserve the exact schema")
    assert(back.count() == df.count())
    val a = df.orderBy("o_orderkey").limit(10).collect().toSeq
    val b = back.orderBy("o_orderkey").limit(10).collect().toSeq
    assert(a == b, "rows must survive the ORC round-trip byte-exactly")
    // Pushdown reaches the ORC scan like parquet (same pruning story).
    val plan = back.where(org.apache.spark.sql.functions.col("o_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]"),
      s"ORC scan must receive the pushed filter:\n$plan")
  }

  test("JSONL quarantine read splits malformed lines out byte-exactly") {
    val dir = Files.createTempDirectory("quarantine").toFile
    val f = new java.io.File(dir, "feed.jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "good one"}""",
      """{"doc_id": 2, "text": "also fine"}""",
      """{"doc_id": 3, "text": "truncated""",          // cut mid-string
      """not json at all""",
      """{"doc_id": 4, "text": "survives"}""")
    java.nio.file.Files.write(f.toPath, lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val qr = Sinks.readJsonlQuarantine(spark, f.toString, schema)
    assert(qr.good.schema.fieldNames.toSeq == Seq("doc_id", "text"),
      "the good lane must carry exactly the declared schema")
    assert(qr.good.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 4L))
    val raw = qr.quarantined.collect().map(_.getString(0)).sorted.toSeq
    assert(raw == Seq("""not json at all""", """{"doc_id": 3, "text": "truncated""").sorted,
      s"quarantine must retain the malformed lines byte-exactly, got $raw")
    qr.release()
  }

  test("toJsonlLines keeps schema field order and nulls") {
    val lines = Sinks.toJsonlLines(sampleDf).toSeq
    assert(lines.head.startsWith("""{"auteur":"""), "field order = schema order")
    assert(lines.exists(_.contains(""""jaar":null""")))
  }

  test("headers CSV reproduces dump_headers (original_name,clean_name)") {
    val rows = Sinks.headersDf(spark, sampleDf).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("Auteur", "auteur"), ("Jaar", "jaar")))
  }

  test("JDBC sink: load + provenance metadata table + ErrorIfExists parity") {
    val url = "jdbc:derby:memory:sinktest;create=true"
    val created = Instant.parse("2026-08-12T00:00:00Z")
    // Derby's Spark dialect maps StringType→CLOB for setNull, which clashes
    // with VARCHAR columns — use non-null rows here (null handling is
    // covered by the JSONL tests; real targets are sqlite/postgres).
    val noNulls = sampleDf.na.fill("?")
    Sinks.writeJdbc(noNulls, url, "ceneton",
      sourceSchemaName = "Ceneton", recordCount = 3,
      extraMetadata = Map("source_sha256" -> "abc123", "curator" -> "leiden"),
      createTableColumnTypes = Some("auteur VARCHAR(255), jaar VARCHAR(255)"),
      createdAt = created)

    val back = spark.read.jdbc(url, "ceneton", new java.util.Properties())
    assert(back.count() == 3)
    assert(back.columns.toSeq.map(_.toLowerCase).sorted == Seq("auteur", "jaar"))

    val meta = spark.read.jdbc(url, "ceneton_metadata", new java.util.Properties())
    val kv = meta.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("source_schema_name") == "Ceneton")
    assert(kv("record_count") == "3")
    assert(kv("created_at") == created.toString)
    assert(kv("source_sha256") == "abc123")
    assert(kv("curator") == "leiden")

    // second load into the same table must fail before any DDL (A11 parity)
    val ex = intercept[IllegalStateException] {
      Sinks.writeJdbc(noNulls, url, "ceneton", "Ceneton", 3)
    }
    assert(ex.getMessage.contains("already exists"))
  }

  test("sha256OfFile matches a known digest") {
    val f = Files.createTempFile("sha", ".txt")
    Files.write(f, "abc".getBytes("UTF-8"))
    assert(Sinks.sha256OfFile(f.toString) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }
}
