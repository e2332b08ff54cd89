package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Z-order (Morton-curve) data layout — multi-dimensional clustering so
  * that box predicates over TWO columns prune at the file/row-group
  * level from one physical sort order.
  *
  * A single-column sort gives parquet min/max zone maps perfect pruning
  * on that column and none on any other; interleaving the bits of two
  * dimensions into one key makes file-contiguous key ranges map to
  * LOCAL RECTANGLES of the (a, b) plane, so every file's (min_a, max_a,
  * min_b, max_b) box is narrow in BOTH dimensions and a reader skips
  * every file whose box misses the predicate (the technique behind
  * Delta/Iceberg `ZORDER BY`; Morton 1966).
  *
  * Scale shape: the key is ~24 integer ops per row — pure built-in
  * bit arithmetic (shiftleft/and/or), whole-stage codegen'd, no UDF —
  * and the layout write is ONE `repartitionByRange` exchange at ingest
  * time, amortized over every subsequent scan. At 100 TB the win is
  * the scan side: a box predicate selecting fraction f of each
  * dimension touches ~f of the files instead of all of them, because
  * zone-map pruning happens before any row is decoded (ZOrderSpec
  * measures the file-skip ratio against an unclustered write).
  */
object ZOrder {

  /** Each dimension is clamped to 31 bits so the interleaved key fits a
    * non-negative BIGINT (2·31 = 62 bits) in both engines — disclosed;
    * layout keys only need relative order, not full key-space width. */
  private val Dim31 = (1L << 31) - 1

  // Magic-number bit spread: Morton's part1by1 over a 64-bit word.
  // Masks as decimal literals so the identical text interpolates into
  // the DuckDB oracle (the mix32Stages discipline).
  private val Spread: Seq[(Int, Long)] = Seq(
    16 -> 281470681808895L,     // 0x0000FFFF0000FFFF
    8  -> 71777214294589695L,   // 0x00FF00FF00FF00FF
    4  -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2  -> 3689348814741910323L, // 0x3333333333333333
    1  -> 6148914691236517205L) // 0x5555555555555555

  // The inverse walk: after masking the even bits, each step folds a
  // gap closed; the mask after shift s is the spread mask one level
  // coarser (full 32-bit word at the end).
  private val Compact: Seq[(Int, Long)] = Seq(
    1  -> 3689348814741910323L,
    2  -> 1085102592571150095L,
    4  -> 71777214294589695L,
    8  -> 281470681808895L,
    16 -> ((1L << 32) - 1))

  /** Bits of `c` (low 31) spread to the even bit positions. */
  private def part1by1(c: Column): Column =
    Spread.foldLeft(c.cast("long").bitwiseAND(lit(Dim31))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** The inverse: collapse the even bit positions back to one value. */
  private def compact1by1(c: Column): Column =
    Compact.foldLeft(c.bitwiseAND(lit(6148914691236517205L))) {
      case (x, (s, m)) => x.bitwiseOR(shiftright(x, s)).bitwiseAND(lit(m))
    }

  /** Morton key of two integer dimensions: a on even bits, b on odd. */
  def zkey(a: Column, b: Column): Column =
    part1by1(a).bitwiseOR(shiftleft(part1by1(b), 1))

  /** De-interleave: (a, b) back out of a Morton key (spec-side proof of
    * invertibility; production readers never need it — they filter on
    * the original columns and let zone maps do the pruning). */
  def zdecode(z: Column): (Column, Column) =
    (compact1by1(z), compact1by1(shiftright(z, 1)))

  /** The layout write: range-partition on the Morton key (one exchange),
    * sort each file's rows by it, write parquet. `files` approximates
    * (table bytes / healthy file size) in production. */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String, path: String,
      files: Int): Unit =
    df.withColumn("zkey", zkey(col(dimA), col(dimB)))
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
      .write.mode("overwrite").parquet(path)

  // ---------------------------------------------------------------- x72
  /** x72 — the Morton key itself, oracle-checked: per lineitem row the
    * interleave of (l_partkey, l_suppkey), plus the in-engine decode
    * proving invertibility (the oracle states the decode's mathematical
    * truth — the original keys — so a decode bug on either bit lane
    * hash-mismatches). Pure BIGINT shift/and/or in both engines. The
    * TakeOrderedAndProject keeps the artifact small; the computation it
    * certifies is the map-only projection [[zorderWrite]] runs at
    * ingest scale. */
  def zkeyQuery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val withZ = li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey").cast("long").as("l_partkey"),
      col("l_suppkey").cast("long").as("l_suppkey"),
      zkey(col("l_partkey"), col("l_suppkey")).as("zkey"))
    val (da, db) = zdecode(col("zkey"))
    withZ
      .withColumn("dec_part", da)
      .withColumn("dec_supp", db)
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** The spread as a lateral-alias chain: yields column `<t>5`. */
  private def spreadSql(in: String, t: String): String = {
    val first = s"($in & $Dim31) AS ${t}0"
    val rest = Spread.zipWithIndex.map { case ((sh, m), i) =>
      // DuckDB gives | and << the SAME precedence (left-assoc) — an
      // unparenthesized `a | a << s` parses as `(a | a) << s`.
      s"($t$i | ($t$i << $sh)) & $m AS $t${i + 1}"
    }
    (first +: rest).mkString(",\n           ")
  }

  private val zkeySql: String =
    s"""WITH base AS (SELECT l_orderkey, l_linenumber,
           CAST(l_partkey AS BIGINT) AS l_partkey,
           CAST(l_suppkey AS BIGINT) AS l_suppkey,
           ${spreadSql("l_partkey", "a")},
           ${spreadSql("l_suppkey", "b")}
         FROM lineitem)
       SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         a5 | (b5 << 1) AS zkey,
         l_partkey AS dec_part, l_suppkey AS dec_supp
       FROM base ORDER BY zkey, l_orderkey, l_linenumber LIMIT 100"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("x72_zorder_key", zkeyQuery, Some(zkeySql)))
}
