package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.{HashConstants, Ivf}

/** Explicit runtime filter (semi-join reduction) for selective shuffle
  * joins — the x67 Bloom-gate discipline applied to RELATIONAL keys.
  *
  * Spark's own InjectRuntimeFilter rewrites `fact ⋈ selective-dim` into
  * `fact WHERE might_contain(bloom(dim.keys)) ⋈ dim` so the fact side
  * is pruned BEFORE its shuffle — but the injection is gated on size
  * thresholds (10 MB creation side / 10 GB application side) tuned for
  * clusters, so small-scale runs never exercise the shape and a plan
  * can silently regress to shipping the whole fact table. This operator
  * states the same reduction explicitly and unconditionally, from
  * BUILT-IN integer expressions only (pmod/shiftleft/element_at — no
  * UDF, no custom expression, fully codegen'd):
  *
  *   - the build side's keys collapse to a [[Bits]]-bit Bloom mask
  *     (32 KB — broadcast-literal-sized at any corpus scale, the x67
  *     geometry), built once per snapshot through the [[Ivf.memoModel]]
  *     cache like every other index artifact;
  *   - each fact row probes [[K]] affine-spread positions of its key
  *     hash inside one projection; rows that cannot join are dropped at
  *     scan time, so the join exchange carries ~selectivity·|fact| rows
  *     (plus the (set_bits/m)^k false-positive sliver).
  *
  * The reduction is LOSSLESS by the Bloom no-false-negative guarantee:
  * the real join still runs and removes false positives, so the result
  * is bit-identical to the unfiltered join — which is exactly what the
  * registered b41 query's plain-SQL oracle certifies (the x67b
  * discipline: the hash match IS the losslessness proof).
  *
  * The key hash reduces the key modulo [[HashConstants.HashPrime]]
  * BEFORE the Knuth multiply, keeping the product under 2⁶³ for
  * arbitrary BIGINT keys (ANSI mode throws on overflow; a raw
  * `key * 2654435761` wraps/throws past key ≈ 3.5·10⁹ — real at
  * 100 TB row counts).
  */
object RuntimeFilter {
  /** Mask geometry: x67's (2^18 bits = 4096 longs = 32 KB, 3 probes). */
  val Bits = 1 << 18
  val K = 3

  private def keyHash(key: Column): Column =
    pmod(pmod(key, lit(HashConstants.HashPrime)) * HashConstants.Knuth,
      lit(HashConstants.HashPrime))

  private def pos(h: Column, i: Int): Column =
    pmod(h * lit(2 * i + 1) + lit(i.toLong * i * 31 + 7),
      lit(HashConstants.HashPrime)) % Bits

  /** Prune `fact` to rows whose `factKey` MAY be present among
    * `buildKeys` (single-column frame). Lossless ahead of the real
    * join; map-only on the fact side. */
  def bloomReduce(fact: DataFrame, factKey: Column, buildKeys: DataFrame,
      tag: String): DataFrame = {
    val kc = col(buildKeys.columns.head)
    val mask = Ivf.memoModel(buildKeys, s"rtfilter-$tag") {
      val ps = buildKeys.select(keyHash(kc).as("h"))
        .select(explode(array((0 until K).map(i => pos(col("h"), i)): _*)).as("p"))
        .distinct().collect().map(_.getLong(0))
      val m = new Array[Long](Bits / 64)
      ps.foreach(p => m((p / 64).toInt) |= 1L << (p % 64).toInt)
      m
    }
    val maskLit = typedLit(mask.toSeq)
    val h = keyHash(factKey)
    val hit = (0 until K).map { i =>
      val p = pos(h, i)
      element_at(maskLit, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
    fact.filter(hit)
  }
}
