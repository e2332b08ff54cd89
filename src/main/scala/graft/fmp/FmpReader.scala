package graft.fmp

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, Metadata, MetadataBuilder, StringType, StructField, StructType}
import org.slf4j.LoggerFactory

import graft.etl.Sanitize

/** One `<FIELD EMPTYOK= MAXREPEAT= NAME= TYPE=>` header entry
  * (fmp_reader.py:37-42). */
final case class FmpField(name: String, fieldType: String, emptyOk: Boolean, maxRepeat: Int)

/** Parsed FMPXMLRESULT header (fmp_reader.py:45-50): table name, field
  * definitions, sanitized column names, `<RESULTSET FOUND>` and
  * `<DATABASE RECORDS>` counts. */
final case class FmpSchema(
    name: String,
    fields: Seq[FmpField],
    cleanNames: Seq[String],
    foundCount: Long,
    databaseRecords: Long) {
  /** clean name → original field, insertion-ordered (fmp_reader.py:171). */
  def nameMapping: Seq[(String, FmpField)] = cleanNames.zip(fields)
}

/** FileMaker Pro FMPXMLRESULT reader (reference operator A1,
  * fmp_reader.py:79-187) re-expressed for Spark.
  *
  * Semantics preserved exactly (SURVEY.md §2C): every cell is a raw
  * nullable string (`<DATA/>` → null); clean names via [[Sanitize]];
  * duplicate clean names are a hard failure; `FOUND != RECORDS` warns
  * ("looking at a subset") but proceeds; directory inputs resolve to the
  * lexicographically last `*.bz2` snapshot; `.bz2` decompresses
  * transparently.
  *
  * Architecture: bz2 + a single XML document are non-splittable, so the
  * document — not the byte range — is the parallelism unit. The default
  * [[read]] goes through the `format("fmp")` DataSource V2 provider,
  * which infers the schema from the `<METADATA>` header on the driver and
  * runs the constant-memory StAX pull parse inside executor tasks (unlike
  * the reference, which retains the whole lxml element tree —
  * SURVEY.md §4.1). [[readWithSchema]] keeps the driver-side parse for
  * callers that need the `FmpSchema` record counts with the data.
  */
object FmpReader {
  private val log = LoggerFactory.getLogger(getClass)

  /** Directory input → lexicographically last `*.bz2` (latest snapshot,
    * _cli.py:26-28); plain files pass through. */
  def resolvePath(path: String): Path = {
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      val snaps = try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".bz2")).toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
      require(snaps.nonEmpty, s"No *.bz2 snapshots in directory $path")
      snaps.last
    } else p
  }

  /** Test seam: every [[open]] call increments this — a CLI command's
    * open-count delta IS its decompression-pass count (FmpCliSpec asserts
    * exactly one per command). */
  private[fmp] val streamOpens = new java.util.concurrent.atomic.AtomicLong

  /** Open with transparent bz2 decompression by extension (_cli.py:30-35). */
  def open(path: Path): InputStream = {
    streamOpens.incrementAndGet()
    val raw = new BufferedInputStream(new FileInputStream(path.toFile))
    if (path.getFileName.toString.endsWith(".bz2")) new BZip2CompressorInputStream(raw)
    else raw
  }

  private def newStreamReader(in: InputStream) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** Advance `r` through the FMPXMLRESULT header and stop just after the
    * `<RESULTSET>` open tag. Shared by the schema-only path and the row
    * iterator so warnings and validation live in exactly one place. */
  private def parseHeader(r: javax.xml.stream.XMLStreamReader,
      headerStrategy: Seq[String] => Seq[String],
      warnRepeating: Boolean = true): FmpSchema = {
    var dbName = ""
    var dbRecords = -1L
    val fields = ArrayBuffer.empty[FmpField]
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "RESULTSET" =>
          val found = r.getAttributeValue(null, "FOUND").toLong
          if (found != dbRecords)
            log.warn(s"Number of records in header ($dbRecords) does not match " +
              s"number of records in result set ($found). " +
              "We are looking at a subset of the database.")
          val clean = headerStrategy(fields.map(_.name).toSeq)
          require(clean.distinct.size == fields.size,
            s"There are duplicate 'cleaned' names in the field list: $clean")
          return FmpSchema(dbName, fields.toSeq, clean, found, dbRecords)
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "DATABASE" =>
          dbName = r.getAttributeValue(null, "NAME")
          dbRecords = r.getAttributeValue(null, "RECORDS").toLong
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "FIELD" =>
          val f = FmpField(
            name = r.getAttributeValue(null, "NAME"),
            fieldType = r.getAttributeValue(null, "TYPE"),
            emptyOk = r.getAttributeValue(null, "EMPTYOK") == "YES",
            maxRepeat = r.getAttributeValue(null, "MAXREPEAT").toInt)
          // The reference silently assumes one <DATA> per column: it
          // appends EVERY <DATA> text to the record (fmp_reader.py:116-117)
          // and a repeating column therefore misaligns/overflows the row
          // (namedtuple arity failure at fmp_reader.py:112). This parser
          // reproduces that per-<DATA> behavior exactly for parity, but
          // refuses to do it silently.
          if (f.maxRepeat > 1 && warnRepeating)
            log.warn(s"Field '${f.name}' declares MAXREPEAT=${f.maxRepeat}; repeating " +
              "fields are NOT supported in positional mode (reference-parity): each " +
              "<DATA> becomes its own cell, so a row carrying more than one <DATA> for " +
              "this column will misalign or fail. Export with MAXREPEAT=1, flatten " +
              "repetitions upstream, or read with option(\"repeatingAsArray\", true) " +
              "to ingest this column as array<string>.")
          fields += f
        case _ =>
      }
    }
    throw new IllegalArgumentException("No <RESULTSET> element found: not an FMPXMLRESULT document")
  }

  /** Parse the header only and stop at `<RESULTSET>` — the schema-only
    * path (`dump_headers`, _cli.py:38-53) runs no Spark job at all.
    * The stream reader is always closed (closing an XMLStreamReader does
    * not close the underlying InputStream, which the caller owns). */
  def readSchema(in: InputStream,
      headerStrategy: Seq[String] => Seq[String] = Sanitize.defaultHeaderStrategy): FmpSchema = {
    val r = newStreamReader(in)
    try parseHeader(r, headerStrategy) finally r.close()
  }

  /** Pull-based row iterator over an FMPXMLRESULT stream: parses the
    * header eagerly (schema available immediately), then yields one
    * `Array[String]` per `<ROW>` on demand — the shape both the driver
    * reader and the DataSource V2 executor-side reader consume. Constant
    * memory; close() releases the underlying stream. */
  final class FmpRowIterator(in: InputStream,
      headerStrategy: Seq[String] => Seq[String] = Sanitize.defaultHeaderStrategy)
      extends Iterator[Array[String]] with AutoCloseable {
    private val r = newStreamReader(in)
    val schema: FmpSchema = parseHeader(r, headerStrategy)

    private val current = ArrayBuffer.empty[String]
    private var pending: Array[String] = null
    private var inData = false
    private var sawText = false
    private val text = new StringBuilder
    private var exhausted = false

    private def advance(): Unit = {
      while (pending == null && !exhausted && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "ROW" => current.clear()
              case "DATA" => inData = true; sawText = false; text.clear()
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inData =>
            text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
            sawText = true
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "DATA" =>
                current += (if (sawText) text.toString else null)
                inData = false
              case "ROW" =>
                pending = current.toArray
                current.clear()
              case "RESULTSET" => exhausted = true
              case _ =>
            }
          case _ =>
        }
      }
      if (!r.hasNext) exhausted = true
    }

    override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
    override def next(): Array[String] = {
      if (!hasNext) throw new NoSuchElementException
      val out = pending; pending = null; out
    }
    override def close(): Unit = { r.close(); in.close() }
  }

  /** COL-grouping variant of [[FmpRowIterator]] for `repeatingAsArray`
    * ingestion: yields one `Array[Array[String]]` per `<ROW>` — one entry
    * per `<COL>`, holding that column's `<DATA>` texts in document order
    * (`<DATA/>` → null element; an empty `<COL>` → empty array). A
    * MAXREPEAT>1 column thus arrives as a real repeated value instead of
    * misaligning the positional row — capability the reference lacks (it
    * appends every `<DATA>` flat, fmp_reader.py:116-117, and a repeating
    * row overflows its namedtuple). Same constant-memory StAX pull shape
    * as the positional iterator. */
  final class FmpColRowIterator(in: InputStream,
      headerStrategy: Seq[String] => Seq[String] = Sanitize.defaultHeaderStrategy)
      extends Iterator[Array[Array[String]]] with AutoCloseable {
    private val r = newStreamReader(in)
    val schema: FmpSchema = parseHeader(r, headerStrategy, warnRepeating = false)

    private val cells = ArrayBuffer.empty[Array[String]]
    private val colBuf = ArrayBuffer.empty[String]
    private var pending: Array[Array[String]] = null
    private var inData = false
    private var sawText = false
    private val text = new StringBuilder
    private var exhausted = false

    private def advance(): Unit = {
      while (pending == null && !exhausted && r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "ROW" => cells.clear()
              case "COL" => colBuf.clear()
              case "DATA" => inData = true; sawText = false; text.clear()
              case _ =>
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inData =>
            text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
            sawText = true
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "DATA" =>
                colBuf += (if (sawText) text.toString else null)
                inData = false
              case "COL" =>
                cells += colBuf.toArray
                colBuf.clear()
              case "ROW" =>
                pending = cells.toArray
                cells.clear()
              case "RESULTSET" => exhausted = true
              case _ =>
            }
          case _ =>
        }
      }
      if (!r.hasNext) exhausted = true
    }

    override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
    override def next(): Array[Array[String]] = {
      if (!hasNext) throw new NoSuchElementException
      val out = pending; pending = null; out
    }
    override def close(): Unit = { r.close(); in.close() }
  }

  /** Full streaming parse: header + all rows (`<DATA>` texts appended
    * positionally per row, fmp_reader.py:108-120). Constant memory —
    * rows are handed to `sink` as they complete. */
  def parseRows(in: InputStream,
      headerStrategy: Seq[String] => Seq[String],
      sink: Array[String] => Unit): FmpSchema = {
    val it = new FmpRowIterator(in, headerStrategy)
    while (it.hasNext) sink(it.next())
    it.schema
  }


  /** Spark StructType for an FMP schema: all-nullable strings (reference
    * semantics §2C.1), original header name carried as `comment` metadata
    * (the SQL column comment at sql.py:31-34). With `repeatingAsArray`,
    * MAXREPEAT>1 fields surface as `array<string>` instead. */
  def toStructType(schema: FmpSchema, repeatingAsArray: Boolean = false): StructType =
    StructType(schema.nameMapping.map { case (clean, field) =>
      val dt: DataType =
        if (repeatingAsArray && field.maxRepeat > 1) ArrayType(StringType, containsNull = true)
        else StringType
      StructField(clean, dt, nullable = true,
        metadata = new MetadataBuilder().putString("comment", field.name).build())
    })

  /** Read an FMPXMLRESULT export (file, `.bz2`, or snapshot directory)
    * into a DataFrame. Returns the schema (with counts) alongside. */
  def readWithSchema(spark: SparkSession, path: String,
      headerStrategy: Seq[String] => Seq[String] = Sanitize.defaultHeaderStrategy,
      numPartitions: Int = 0): (DataFrame, FmpSchema) = {
    val p = resolvePath(path)
    val rows = ArrayBuffer.empty[Row]
    val in = open(p)
    val schema = try parseRows(in, headerStrategy, arr => rows += Row.fromSeq(arr.toSeq))
    finally in.close()
    val struct = toStructType(schema)
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism, rows.size / 1000 + 1))
    (spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, parts), struct), schema)
  }

  /** Single-pass driver read for bulk-load flows (`create_db`): ONE
    * decompression yields the rows, the `FmpSchema` counts, AND the
    * sha256 of the complete decompressed byte stream — a DigestInputStream
    * taps the stream beneath the StAX parser, and the tail bytes after
    * `</RESULTSET>` (which the row iterator never consumes) are drained
    * through it so the digest equals a full-file hash (the reference
    * hashes the whole decompressed handle, _cli.py:146-148).
    *
    * Driver-buffered by design: a FileMaker snapshot is one bounded
    * curated database, and the JDBC bulk load is driver-adjacent anyway
    * (single-transaction parity coalesces to one connection). The
    * executor-side streaming path for analytics remains [[read]]. */
  def readWithSchemaAndSha(spark: SparkSession, path: String,
      headerStrategy: Seq[String] => Seq[String] = Sanitize.defaultHeaderStrategy)
      : (DataFrame, FmpSchema, String) = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = new java.security.DigestInputStream(open(resolvePath(path)), md)
    val rows = ArrayBuffer.empty[Row]
    val it = new FmpRowIterator(in, headerStrategy)
    val schema = try {
      while (it.hasNext) rows += Row.fromSeq(it.next().toSeq)
      val drain = new Array[Byte](8192)
      while (in.read(drain) != -1) {}
      it.schema
    } finally it.close()
    val sha = md.digest().map("%02x".format(_)).mkString
    val struct = toStructType(schema)
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism, rows.size / 1000 + 1))
    (spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, parts), struct),
      schema, sha)
  }

  /** Default read path: the DataSource V2 `format("fmp")` source, which
    * parses rows INSIDE executor tasks (the driver touches only the
    * `<METADATA>` header for schema inference). The driver-parallelize
    * [[readWithSchema]] remains for callers that need the `FmpSchema`
    * counts alongside the data. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("fmp").load(path)

  /** Schema-only read (no Spark job) for the `dump_headers` path. */
  def readSchemaOnly(path: String): FmpSchema = {
    val in = open(resolvePath(path))
    try readSchema(in) finally in.close()
  }
}
