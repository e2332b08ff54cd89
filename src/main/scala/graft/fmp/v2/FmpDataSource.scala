package graft.fmp.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.sources.{And, DataSourceRegister, EqualNullSafe, EqualTo, Filter, In, IsNotNull, IsNull, Not, Or, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.{ArrayType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.fmp.FmpReader

/** DataSource V2 provider for FMPXMLRESULT exports — the idiomatic
  * ingestion surface (SURVEY.md §7.3 stretch goal):
  *
  * {{{ spark.read.format("fmp").load("/path/export.xml.bz2") }}}
  *
  * Design:
  *  - schema inference parses only the `<METADATA>` header on the driver
  *    (early-exit, no row parse — the A5/`dump_headers` path);
  *  - row parsing happens INSIDE the executor task with the same
  *    constant-memory StAX pull iterator — the document never materializes
  *    on the driver (this IS the default [[FmpReader.read]] path; the
  *    driver-parallelize form survives only in `readWithSchema`);
  *  - one InputPartition per document: bz2 + single-XML-document inputs
  *    are not byte-splittable, so the file is the unit of parallelism —
  *    a directory of exports scans as one task per snapshot;
  *  - column pruning is pushed into the reader's ROW PROJECTION: every
  *    `<DATA>` cell is still parsed (StAX must walk the document), but
  *    only required columns are converted to UTF8String and carried in
  *    the InternalRow, so `select(two_cols)` does not pay 126-column
  *    row construction downstream.
  *
  * Registered via META-INF/services as short name `fmp`.
  */
class FmpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fmp"

  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("format(\"fmp\") requires a path"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FmpReader.toStructType(FmpReader.readSchemaOnly(pathOf(options)),
      options.getBoolean("repeatingAsArray", false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FmpTable(schema, properties.get("path"))
}

class FmpTable(tableSchema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"fmp:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FmpScanBuilder(tableSchema, path, options.getBoolean("allSnapshots", false),
      options.getLong("progressEvery", 0L),
      options.getBoolean("repeatingAsArray", false),
      options.getBoolean("trustHeaderCount", true))
}

class FmpScanBuilder(fullSchema: StructType, path: String, allSnapshots: Boolean,
    progressEvery: Long, repeatingAsArray: Boolean,
    trustHeaderCount: Boolean = true)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false

  /** COUNT(*) with no filters and no grouping is answered from the
    * header's `FOUND` attribute — the export's declared result-set size,
    * which the document's `<ROW>` count equals by the format contract
    * (the same value the reference trusts for its progress totals). The
    * header parse early-exits at `<RESULTSET>`, so the count is
    * O(header) instead of a full StAX walk of the document. PARTIAL
    * pushdown (supportCompletePushDown stays false): each snapshot
    * partition emits its own count row and Spark's final aggregate sums
    * them, which keeps `allSnapshots` directories correct with zero
    * extra logic. Any pushed filter or grouping declines the pushdown —
    * row-level predicates change the count.
    *
    * TRUST TRADE-OFF: a file whose body is damaged AFTER the header
    * still counts (the row scan would throw) — right for bookkeeping
    * over healthy exports, wrong for integrity accounting. Callers
    * auditing file health set `trustHeaderCount=false` to force the
    * row-parsing count. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = trustHeaderCount &&
      pushed.isEmpty && aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accepted filters are applied row-by-row on the RAW parsed strings
    * (before UTF8String conversion and InternalRow construction), with
    * full SQL three-valued semantics — so they are claimed completely and
    * only genuinely unsupported shapes remain for Spark to re-evaluate.
    * `repeatingAsArray` mode declines everything: its cells are `<DATA>`
    * LISTS, and the flat string comparison below would see only a
    * truncated scalar view of them. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] =
    if (repeatingAsArray) filters
    else {
      val (sup, rest) = filters.partition(FmpFilters.isSupported)
      pushed = sup
      rest
    }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    if (countPushed) new FmpCountScan(path, allSnapshots)
    else new FmpScan(fullSchema, required, path, allSnapshots, progressEvery,
      repeatingAsArray, pushed)
}

/** Pushed-filter support and evaluation for the FMP scan. The value side
  * of every comparison is a String (the source is all-string by design —
  * A9); any other value type (a cast the analyzer pushed past the scan)
  * is declined rather than mis-compared. */
object FmpFilters {
  def isSupported(f: Filter): Boolean = f match {
    case EqualTo(_, v) => v == null || v.isInstanceOf[String]
    case EqualNullSafe(_, v) => v == null || v.isInstanceOf[String]
    case In(_, vs) => vs != null && vs.forall(v => v == null || v.isInstanceOf[String])
    case IsNull(_) | IsNotNull(_) => true
    case StringStartsWith(_, _) | StringEndsWith(_, _) | StringContains(_, _) => true
    case And(l, r) => isSupported(l) && isSupported(r)
    case Or(l, r) => isSupported(l) && isSupported(r)
    case Not(c) => isSupported(c)
    case _ => false
  }

  /** Kleene three-valued evaluation over the raw parsed row (`get`
    * resolves a clean column name to the cell value, null when absent —
    * including columns missing from an old snapshot, which thereby filter
    * exactly like the nulls they read as). None is SQL NULL; a row is
    * emitted iff every pushed filter yields Some(true). */
  def eval(f: Filter, get: String => String): Option[Boolean] = f match {
    case EqualTo(a, v) =>
      val x = get(a)
      if (x == null || v == null) None else Some(x == v.asInstanceOf[String])
    case EqualNullSafe(a, v) =>
      val x = get(a)
      Some(if (v == null) x == null else x != null && x == v.asInstanceOf[String])
    case In(a, vs) =>
      val x = get(a)
      if (x == null) None
      else if (vs.exists(v => v != null && v.asInstanceOf[String] == x)) Some(true)
      else if (vs.contains(null)) None
      else Some(false)
    case IsNull(a) => Some(get(a) == null)
    case IsNotNull(a) => Some(get(a) != null)
    case StringStartsWith(a, p) => Option(get(a)).map(_.startsWith(p))
    case StringEndsWith(a, p) => Option(get(a)).map(_.endsWith(p))
    case StringContains(a, p) => Option(get(a)).map(_.contains(p))
    case And(l, r) => (eval(l, get), eval(r, get)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, get), eval(r, get)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, get).map(!_)
    case _ => None // unreachable: only supported shapes are pushed
  }
}

class FmpScan(fullSchema: StructType, required: StructType, path: String,
    allSnapshots: Boolean, progressEvery: Long, repeatingAsArray: Boolean,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Shown by BatchScanExec in `.explain` — the same `PushedFilters: [...]`
    * convention the built-in file sources use, so plan audits can gate on
    * it (FmpDataSourceSpec does). */
  override def description(): String =
    s"FmpScan $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    FmpPartitions.plan(path, allSnapshots)

  override def createReaderFactory(): PartitionReaderFactory =
    new FmpPartitionReaderFactory(fullSchema.fieldNames, required, progressEvery,
      repeatingAsArray, pushed)
}

object FmpPartitions {
  /** Default directory semantics follow the reference (latest *.bz2
    * snapshot). With `allSnapshots=true` every archive in the directory
    * becomes its own partition — the document, not the byte range, is
    * the parallelism unit for non-splittable bz2 XML, so a directory of
    * N exports ingests N-wide. Per-file schemas resolve by clean column
    * name in the reader (snapshot schema evolution by name). Shared by
    * the row scan and the pushed-COUNT scan. */
  def plan(path: String, allSnapshots: Boolean): Array[InputPartition] = {
    val p = java.nio.file.Paths.get(path)
    if (allSnapshots && java.nio.file.Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      val listing = java.nio.file.Files.list(p)
      val snaps = try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".bz2"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
      require(snaps.nonEmpty, s"No *.bz2 snapshots in directory $path")
      snaps.map(f => FmpInputPartition(f.toString)).toArray
    } else {
      Array(FmpInputPartition(FmpReader.resolvePath(path).toString))
    }
  }
}

/** Pushed-COUNT(*) scan: one row per snapshot partition carrying that
  * file's header-declared `FOUND` count — rows are never parsed (the
  * header read early-exits at `<RESULTSET>`). Spark's final aggregate
  * sums the partition rows (partial pushdown). */
class FmpCountScan(path: String, allSnapshots: Boolean) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(org.apache.spark.sql.types.StructField(
      "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"FmpScan $path, PushedAggregation: [COUNT(*)] (header FOUND; rows not parsed)"
  override def planInputPartitions(): Array[InputPartition] =
    FmpPartitions.plan(path, allSnapshots)
  override def createReaderFactory(): PartitionReaderFactory =
    new FmpCountReaderFactory
}

class FmpCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val path = partition.asInstanceOf[FmpInputPartition].resolvedPath
      private var emitted = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (emitted) false
        else {
          row = new GenericInternalRow(
            Array[Any](FmpReader.readSchemaOnly(path).foundCount))
          emitted = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
}

case class FmpInputPartition(resolvedPath: String) extends InputPartition

class FmpPartitionReaderFactory(allColumns: Array[String], requiredSchema: StructType,
    progressEvery: Long, repeatingAsArray: Boolean,
    pushed: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[FmpInputPartition].resolvedPath
    if (repeatingAsArray)
      new FmpArrayPartitionReader(path, allColumns, requiredSchema, progressEvery)
    else
      new FmpPartitionReader(path, allColumns, requiredSchema.fieldNames, progressEvery,
        pushed)
  }
}

/** Progress-line plumbing shared by both partition readers: a line every
  * `progressEvery` records plus a final rec/s summary on close (the tqdm
  * analogue of the reference's `print` command, _cli.py:56-68). Output
  * goes through System.out (resolved per call), not Scala's Console:
  * executor task threads inherit Console's stream from pool creation
  * time, which would bypass any later redirect. */
trait FmpProgress {
  protected def path: String
  protected def progressEvery: Long
  protected var nRecords = 0L
  private val startNanos = System.nanoTime()
  protected lazy val fileName: String = java.nio.file.Paths.get(path).getFileName.toString

  private def recPerSec: Long = {
    val secs = (System.nanoTime() - startNanos) / 1e9
    if (secs > 0) (nRecords / secs).toLong else 0L
  }

  /** Call after each produced record. */
  protected def recordProduced(): Unit = {
    nRecords += 1
    if (progressEvery > 0 && nRecords % progressEvery == 0)
      System.out.println(s"[fmp] $fileName: $nRecords records ($recPerSec rec/s)")
  }

  /** Call once from close(). */
  protected def reportFinal(): Unit =
    if (progressEvery > 0)
      System.out.println(s"[fmp] $fileName: parsed $nRecords records ($recPerSec rec/s)")
}

/** Executor-side streaming reader: StAX-parses the document and projects
  * only the pruned columns into InternalRows. */
class FmpPartitionReader(val path: String, allColumns: Array[String], requiredColumns: Array[String],
    val progressEvery: Long = 0L, pushedFilters: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] with FmpProgress {
  private val it = new FmpReader.FmpRowIterator(
    FmpReader.open(java.nio.file.Paths.get(path)))
  // Map each required column to its position in the parsed row. Resolution
  // is by clean name against the FILE's own header. Classification of the
  // file checks the FULL schema (not just the pruned columns, which may
  // all be absent from an old snapshot): if the file's header shares any
  // name with the schema, it is a by-name file and a missing column is
  // schema evolution — yield null, never another column's values. Only a
  // header sharing NOTHING with the schema is an external positional
  // schema, where the ordinal fallback applies.
  private val fileIsByName: Boolean =
    allColumns.exists(c => it.schema.cleanNames.contains(c))
  private val indices: Array[Int] = requiredColumns.map { c =>
    val i = it.schema.cleanNames.indexOf(c)
    if (i >= 0) i
    else if (fileIsByName) -1
    else allColumns.indexOf(c)
  }
  private var current: InternalRow = _

  // Filter-attribute resolution uses the same by-name/positional logic as
  // the data columns — filters may reference columns Spark pruned OUT of
  // the required schema (it trusts the claim and drops both the Filter
  // node and the column), so resolution is independent of `indices`.
  private val filterIdx = scala.collection.mutable.HashMap.empty[String, Int]
  private def rawValue(raw: Array[String], name: String): String = {
    val idx = filterIdx.getOrElseUpdate(name, {
      val i = it.schema.cleanNames.indexOf(name)
      if (i >= 0) i else if (fileIsByName) -1 else allColumns.indexOf(name)
    })
    if (idx >= 0 && idx < raw.length) raw(idx) else null
  }

  /** Pushed filters run on the RAW parsed strings, so a skipped record
    * pays zero UTF8String conversion and no row allocation. */
  private def passes(raw: Array[String]): Boolean = {
    var i = 0
    while (i < pushedFilters.length) {
      if (!FmpFilters.eval(pushedFilters(i), rawValue(raw, _)).contains(true))
        return false
      i += 1
    }
    true
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val raw = it.next()
      if (pushedFilters.isEmpty || passes(raw)) {
        val values = new Array[Any](indices.length)
        var i = 0
        while (i < indices.length) {
          val idx = indices(i)
          values(i) = if (idx >= 0 && idx < raw.length && raw(idx) != null)
            UTF8String.fromString(raw(idx)) else null
          i += 1
        }
        current = new GenericInternalRow(values)
        recordProduced()
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = {
    reportFinal()
    it.close()
  }
}

/** Executor-side reader for `repeatingAsArray` mode: the COL-grouping
  * iterator yields every cell as the `<COL>`'s `<DATA>` list, and this
  * reader converts each required column by its schema type — MAXREPEAT>1
  * fields (`array<string>`) carry the full repetition as ArrayData,
  * MAXREPEAT=1 fields (`string`) take the cell's single value. Column
  * resolution is by clean name against the file's own header with the
  * same by-name/positional classification as the flat reader, so
  * multi-snapshot (`allSnapshots`) reads evolve by name here too; a
  * snapshot whose own header declared the field MAXREPEAT=1 still
  * converts fine (its one-element cell becomes a one-element array). */
class FmpArrayPartitionReader(val path: String, allColumns: Array[String],
    requiredSchema: StructType, val progressEvery: Long = 0L)
    extends PartitionReader[InternalRow] with FmpProgress {
  private val it = new FmpReader.FmpColRowIterator(
    FmpReader.open(java.nio.file.Paths.get(path)))
  private val fileIsByName: Boolean =
    allColumns.exists(c => it.schema.cleanNames.contains(c))
  private val indices: Array[Int] = requiredSchema.fieldNames.map { c =>
    val i = it.schema.cleanNames.indexOf(c)
    if (i >= 0) i
    else if (fileIsByName) -1
    else allColumns.indexOf(c)
  }
  private val isArray: Array[Boolean] =
    requiredSchema.fields.map(_.dataType.isInstanceOf[ArrayType])
  private var current: InternalRow = _
  // A string-typed column receiving a multi-<DATA> cell (e.g. an
  // allSnapshots read whose unified schema came from a MAXREPEAT=1
  // snapshot) keeps only the first repetition — warned once per
  // file+column, never silently (the module contract).
  private val warnedTruncation = scala.collection.mutable.Set.empty[Int]

  override def next(): Boolean =
    if (it.hasNext) {
      val raw = it.next()
      val values = new Array[Any](indices.length)
      var i = 0
      while (i < indices.length) {
        val idx = indices(i)
        values(i) =
          if (idx < 0 || idx >= raw.length) null
          else {
            val cell = raw(idx)
            if (isArray(i))
              new GenericArrayData(cell.map(s =>
                if (s == null) null else UTF8String.fromString(s)): Array[Any])
            else {
              if (cell.length > 1 && warnedTruncation.add(i))
                System.err.println(s"[fmp] $fileName: column " +
                  s"'${requiredSchema.fieldNames(i)}' carries ${cell.length} <DATA> " +
                  "repetitions but the unified schema types it string; keeping the " +
                  "first repetition only (re-read with repeatingAsArray inferred " +
                  "from this snapshot to preserve all repetitions)")
              if (cell.isEmpty || cell(0) == null) null
              else UTF8String.fromString(cell(0))
            }
          }
        i += 1
      }
      current = new GenericInternalRow(values)
      recordProduced()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = {
    reportFinal()
    it.close()
  }
}
