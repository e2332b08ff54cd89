package graft.sinks

import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Second JDBC dialect, end-to-end: [[Sinks.writeJdbc]] against a REAL
  * non-Derby server — an in-process Spark Thrift Server spoken to
  * through the Hive JDBC driver (`jdbc:hive2://`). This is the dialect
  * class Spark's own JDBC writer cannot serve (no `addBatch`, no
  * transactions, double-quote identifier DDL the server's parser
  * rejects), so it exercises the [[Sinks]] multi-row fallback: schema
  * DDL from `DataType.sql`, CAST-wrapped TIMESTAMP placeholders,
  * `batchSize`-row INSERT statements, provenance side table, and the
  * ErrorIfExists parity check via Hive `DatabaseMetaData.getTables`.
  *
  * The reference loads any SQLAlchemy URL (_cli.py:108-181); Derby +
  * this dialect are the two reachable in the offline container
  * (OPERATORS.md "Second-JDBC-dialect note").
  */
class SinksThriftSpec extends SparkSpec {

  private def freePort(): Int = {
    val ss = new java.net.ServerSocket(0)
    try ss.getLocalPort finally ss.close()
  }

  test("Hive-dialect JDBC sink: load + provenance + ErrorIfExists + read-back") {
    val port = freePort()
    // HiveThriftServer2.startWithContext builds its HiveConf outside
    // the runtime SQL conf; HiveConf.applySystemProperties honors any
    // `hive.*` system property, which reaches it regardless of when the
    // shared test session was created.
    System.setProperty("hive.server2.thrift.port", port.toString)
    spark.sparkContext.hadoopConfiguration.set("hive.server2.thrift.port", port.toString)
    // The server's execution-Hive metastore uses Derby's attribute-form
    // in-memory URL, which breaks JVM-wide if a NAMED memory database
    // booted first — see SparkSpec.primeDerbyMemory (run by every
    // suite's constructor), which makes suite order irrelevant here.
    val srv = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      var up = false
      var tries = 0
      while (!up && tries < 120) {
        try { val s = new java.net.Socket("localhost", port); s.close(); up = true }
        catch { case _: Exception => Thread.sleep(250); tries += 1 }
      }
      assert(up, s"thrift server did not open port $port")
      val url = s"jdbc:hive2://localhost:$port/default"

      // Original FMP headers ride in metadata exactly as FmpReader/
      // Sanitize leave them — the apostrophe pins the backslash-escape
      // path in the COMMENT DDL (ANSI quote-doubling would fail here).
      val schema = StructType(Seq(
        StructField("auteur", StringType, nullable = true,
          new MetadataBuilder().putString("fmp_original_name", "Auteur d'origine").build()),
        StructField("jaar", LongType, nullable = true,
          new MetadataBuilder().putString("comment", "Jaar (opvoering)").build()),
        StructField("seen_at", TimestampType, nullable = true)))
      val ts = java.sql.Timestamp.from(Instant.parse("2026-08-14T01:02:03Z"))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row("Vondel", 1637L, ts),
          Row(null, 1660L, ts),
          Row("Bredero", null, null)), 1),
        schema)
      val created = Instant.parse("2026-08-14T00:00:00Z")
      try {
        Sinks.writeJdbc(df, url, "ceneton_hive",
          sourceSchemaName = "Ceneton", recordCount = 3,
          extraMetadata = Map("source_sha256" -> "abc123"),
          batchSize = 2, // 3 rows across a full chunk + a remainder chunk
          createdAt = created)

        // Read back through Spark's own JDBC SOURCE over the same
        // dialect (reads are fully supported there), so both halves of
        // the JDBC surface run against the second dialect.
        val back = spark.read.format("jdbc")
          .option("url", url).option("dbtable", "ceneton_hive").load()
        assert(back.count() == 3)
        val rows = back.collect().map(r =>
          (Option(r.getAs[String]("auteur")),
            Option(r.getAs[java.lang.Long]("jaar")).map(_.toLong))).toSet
        assert(rows == Set(
          (Some("Vondel"), Some(1637L)),
          (None, Some(1660L)),
          (Some("Bredero"), None)), s"got $rows")
        val tsBack = back.filter("auteur = 'Vondel'")
          .select("seen_at").collect().head.getTimestamp(0)
        assert(tsBack == ts, s"timestamp round-trip: $tsBack vs $ts")

        val meta = spark.read.format("jdbc")
          .option("url", url).option("dbtable", "ceneton_hive_metadata").load()
        val kv = meta.collect().map(r => r.getString(0) -> r.getString(1)).toMap
        assert(kv("source_schema_name") == "Ceneton")
        assert(kv("record_count") == "3")
        assert(kv("created_at") == created.toString)
        assert(kv("source_sha256") == "abc123")

        // A8/A9 parity closure (sql.py:29-37): the original FMP header
        // must reach the DATABASE as a column comment, not only the
        // exported headers CSV. DESCRIBE through the same catalog the
        // thrift server serves reads it back; the comment-less column
        // stays comment-less.
        val described = spark.sql("DESCRIBE ceneton_hive").collect()
          .map(r => r.getString(0) -> r.getString(2)).toMap
        assert(described("auteur") == "Auteur d'origine",
          s"fmp_original_name must surface as the column comment: $described")
        assert(described("jaar") == "Jaar (opvoering)",
          s"comment metadata is the fallback: $described")
        assert(described.get("seen_at").forall(c => c == null || c.isEmpty),
          s"no metadata -> no comment: $described")

        // A11 parity: the existence check must hold on this dialect's
        // DatabaseMetaData too.
        val ex = intercept[IllegalStateException] {
          Sinks.writeJdbc(df, url, "ceneton_hive", "Ceneton", 3)
        }
        assert(ex.getMessage.contains("already exists"))
      } finally {
        spark.sql("DROP TABLE IF EXISTS ceneton_hive")
        spark.sql("DROP TABLE IF EXISTS ceneton_hive_metadata")
      }
    } finally srv.stop()
  }
}
