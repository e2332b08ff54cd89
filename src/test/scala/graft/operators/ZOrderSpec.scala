package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Z-order layout: the key must be a true interleave (invertible), and
  * the clustered write must make file-level min/max boxes narrow enough
  * that a 2-D box predicate skips most files — the property zone-map
  * pruning consumes. */
class ZOrderSpec extends SparkSpec {

  test("zkey/zdecode round-trip across the whole corpus") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_partkey").cast("long").as("a"),
        col("l_suppkey").cast("long").as("b"))
    val (da, db) = ZOrder.zdecode(ZOrder.zkey(col("a"), col("b")))
    val broken = li.select(col("a"), col("b"), da.as("da"), db.as("db"))
      .where(col("a") =!= col("da") || col("b") =!= col("db"))
      .count()
    assert(broken == 0L, s"$broken rows failed the Morton round-trip")
  }

  test("zkey orders locally: adjacent keys stay in a small (a,b) box") {
    // A Morton curve's defining property vs a single-column sort: BOTH
    // dimensions have bounded span inside any aligned key range.
    val n = 1 << 8
    val grid = spark.range(n * n)
      .select((col("id") / n).cast("long").as("a"), (col("id") % n).as("b"))
    val keyed = grid.select(col("a"), col("b"),
      ZOrder.zkey(col("a"), col("b")).as("z"))
    // Aligned 4096-key blocks are 64x64 tiles: span of both dims = 63.
    val spans = keyed.groupBy(shiftright(col("z"), 12).as("blk"))
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .agg(max("sa"), max("sb")).head()
    assert(spans.getLong(0) == 63 && spans.getLong(1) == 63,
      s"aligned Morton blocks must be square tiles, got spans $spans")
  }

  test("z-ordered files let a 2-D box predicate skip most of them") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val (maxP, maxS) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val files = 16
    ZOrder.zorderWrite(li, "l_partkey", "l_suppkey", s"$dir/clustered", files)
    li.repartition(files)
      .write.mode("overwrite").parquet(s"$dir/plain")

    // Per-file min/max boxes (what parquet footers give a reader), then
    // count files whose box intersects a ~1/4 x 1/4 predicate box.
    def touched(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .where(col("p0") <= maxP / 4 && col("p1") >= 1 &&
          col("s0") <= maxS / 4 && col("s1") >= 1)
        .count()
    val clustered = touched(s"$dir/clustered")
    val plain = touched(s"$dir/plain")
    assert(plain >= files - 1,
      s"unclustered files should almost all intersect the box (got $plain/$files)")
    assert(clustered * 2 <= plain,
      s"z-order must at least halve touched files: $clustered vs $plain")
  }
}
