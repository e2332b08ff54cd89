package graft.tools

import org.apache.spark.sql.SparkSession

/** Alternating A/B timer for the x46 family waves (r16 iteration aid). */
object ProfileX46ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Force every standing artifact once (idx economics, untimed here).
    graft.pipeline.IndexArtifacts.builds.foreach(_._2(spark, dir))
    // Warm-up one of each, then alternate 3x.
    run("x46b_curate_v2_incremental"); run("x46c_curate_v2_standing")
    val pairs = (1 to 3).map { i =>
      val b = run("x46b_curate_v2_incremental")
      val c = run("x46c_curate_v2_standing")
      println(f"[ab] round $i: x46b $b%.2f s, x46c $c%.2f s")
      (b, c)
    }
    println(f"[ab] min: x46b ${pairs.map(_._1).min}%.2f s, x46c ${pairs.map(_._2).min}%.2f s")
    val f = run("x46_curate_v2")
    println(f"[ab] x46 full recompute: $f%.2f s")
    spark.stop()
  }
}
