package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch whole-query timer for x46 (not part of the library surface):
  * min-of-3 in one warm JVM, the SCALE.md quiet-bench discipline. */
object ProfileX46 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("x46_curate_v2")(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[x46] run $i: $dt%.2f s ($n rows)")
      dt
    }
    println(f"[x46] min ${times.min}%.2f s")
    spark.stop()
  }
}
