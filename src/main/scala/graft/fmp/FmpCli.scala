package graft.fmp

import org.apache.spark.sql.SparkSession

import graft.etl.{KeyValueArgs, MappingFile, Sanitize}
import graft.sinks.Sinks

/** CLI parity with the reference's four `ct-db` commands (_cli.py:18-181):
  * dump_headers, print, to_json, create_db. Same argument shapes
  * (positional FILE [DB_URL], `--mapping-column f.csv[:col]`,
  * `--table-name t`, repeated `--db-metadata k=v`).
  *
  * Usage:
  *   runMain graft.fmp.FmpCli dump_headers FILE
  *   runMain graft.fmp.FmpCli print FILE
  *   runMain graft.fmp.FmpCli to_json FILE
  *   runMain graft.fmp.FmpCli create_db FILE DB_URL [--mapping-column f.csv:col]
  *       [--table-name t] [--db-metadata k=v]...
  */
object FmpCli {
  private def withSession[T](f: SparkSession => T): T = {
    val preExisting = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-fmp-cli")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Only stop a context this invocation created — in-process callers
    // (tests, notebooks) keep theirs.
    try f(spark) finally if (preExisting.isEmpty) spark.stop()
  }

  /** RFC 4180 field quoting (the reference uses csv.writer, which quotes
    * fields containing commas/quotes/newlines — FileMaker field names can
    * contain any of them). */
  private def csvField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Records between progress lines for the `print` command. */
  private[fmp] val ProgressEvery = 5000L

  def main(args: Array[String]): Unit = args.toList match {
    case "dump_headers" :: file :: Nil =>
      // Schema-only path: no Spark job at all (SURVEY.md §3.3).
      val schema = FmpReader.readSchemaOnly(file)
      println("original_name,clean_name")
      schema.nameMapping.foreach { case (clean, f) =>
        println(s"${csvField(f.name)},${csvField(clean)}")
      }

    case "print" :: file :: Nil => withSession { spark =>
      // Header parse on the driver for the counts line; the actual record
      // parse runs executor-side through the V2 source, which also emits
      // the incremental progress lines (the reference's tqdm analogue).
      // NOTE: the progress lines print from the executor task — visible on
      // the CLI's stdout in local mode (this tool's deployment); under a
      // remote SPARK_MASTER they land in executor logs, as executor-side
      // output always does.
      // COST: the snapshot is decompressed twice (header walk here, full
      // parse in the V2 load) — accepted for header/count parity; bz2
      // decompression is single-pass-streamed both times, never buffered.
      val schema = FmpReader.readSchemaOnly(file)
      println(s"Parsing ${schema.foundCount} records from ${schema.name}")
      val df = spark.read.format("fmp")
        .option("progressEvery", ProgressEvery.toString).load(file)
      println(s"Materialized ${df.count()} records")
      println("Done")
    }

    case "to_json" :: file :: Nil => withSession { spark =>
      // One partition per document ⇒ toLocalIterator preserves row order.
      Sinks.toJsonlLines(FmpReader.read(spark, file)).foreach(println)
    }

    // The reference's create_db docstring promises "You can also set the
    // DB_URL environment variable" (_cli.py:132) but its click wiring
    // never reads it (no envvar= on the argument) — honor the documented
    // contract: positional DB_URL wins, the env var is the fallback.
    case "create_db" :: file :: rest0 if rest0.isEmpty || rest0.head.startsWith("--") =>
      resolveDbUrl(None, sys.env) match {
        case Some(url) => main(("create_db" :: file :: url :: rest0).toArray)
        case None =>
          System.err.println("create_db requires a DB_URL argument (or the DB_URL environment variable)")
          sys.exit(2)
      }

    case "create_db" :: file :: dbUrl :: rest => withSession { spark =>
      val opts = parseOptions(rest)
      val resolved = FmpReader.resolvePath(file)
      // Provenance hash covers the DECOMPRESSED content — the reference
      // reads from the bz2-decompressed handle before hashing
      // (_cli.py:146-148), so .bz2 snapshots hash their XML bytes.
      val sha = Sinks.sha256OfStream(FmpReader.open(resolved))
      val schema = FmpReader.readSchemaOnly(file)
      val df0 = FmpReader.read(spark, file)
      val mapping = opts.mappingColumn.map(MappingFile.readMapping(spark, _))
      // Reference parity: the table keeps the sanitized clean names; the
      // mapping supplies the column COMMENT metadata (sql.py:29-37).
      // Spark's JDBC writer emits no per-column COMMENT DDL on any
      // dialect, so the comments ALSO persist as `column_comment.<clean>`
      // rows in the provenance metadata table — queryable in the database
      // rather than silently dropped with the DataFrame.
      val df = mapping.fold(df0)(MappingFile.applyCommentMapping(df0, _))
      val tableName = opts.tableName.getOrElse(Sanitize.sanitize(schema.name))
      val commentRows = mapping.getOrElse(Map.empty)
        .filter { case (clean, _) => df0.columns.contains(clean) }
        .map { case (clean, target) => s"column_comment.$clean" -> target }
      val extra = opts.dbMetadata ++ commentRows ++ Map(
        "source_url" -> resolved.toAbsolutePath.normalize.toString,
        "source_sha256" -> sha)
      Sinks.writeJdbc(df, dbUrl, tableName,
        sourceSchemaName = schema.name, recordCount = schema.foundCount,
        extraMetadata = extra)
      println(s"Loaded ${schema.foundCount} records into $tableName")
    }

    case other =>
      System.err.println(
        s"Unknown command: ${other.mkString(" ")}\n" +
          "Commands: dump_headers FILE | print FILE | to_json FILE | " +
          "create_db FILE DB_URL [--mapping-column f.csv[:col]] [--table-name t] [--db-metadata k=v]...")
      sys.exit(2)
  }

  /** Positional DB_URL wins; the DB_URL environment variable is the
    * documented fallback (reference _cli.py:132). */
  private[fmp] def resolveDbUrl(positional: Option[String],
      env: Map[String, String]): Option[String] =
    positional.orElse(env.get("DB_URL"))

  private case class Options(
      mappingColumn: Option[String] = None,
      tableName: Option[String] = None,
      dbMetadata: Map[String, String] = Map.empty)

  private def parseOptions(rest: List[String]): Options = {
    @annotation.tailrec
    def loop(args: List[String], acc: Options, kvs: List[String]): Options = args match {
      case "--mapping-column" :: v :: tail => loop(tail, acc.copy(mappingColumn = Some(v)), kvs)
      case "--table-name" :: v :: tail => loop(tail, acc.copy(tableName = Some(v)), kvs)
      case "--db-metadata" :: v :: tail => loop(tail, acc, v :: kvs)
      case Nil => acc.copy(dbMetadata = KeyValueArgs.parse(kvs.reverse))
      case bad :: _ => throw new IllegalArgumentException(s"Unknown option: $bad")
    }
    loop(rest, Options(), Nil)
  }
}
