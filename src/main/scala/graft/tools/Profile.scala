package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Ad-hoc profiling harness: times registered queries (or built-in
  * experiments) with the noop sink and can print formatted plans.
  *
  * Usage:
  *   runMain graft.tools.Profile time <sfDir> <query> [query ...]
  *   runMain graft.tools.Profile explain <sfDir> <query>
  *   runMain graft.tools.Profile b23parts <sfDir>
  */
object Profile {
  private def session(): SparkSession = SparkSession.builder()
    .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "time" :: sfDir :: queries =>
        noop(graft.Tables.t(spark, sfDir, "region")) // warmup
        queries.foreach { q =>
          val fn = SparkEntry.queries(q)
          time(q)(noop(fn(spark, sfDir)))
          time(s"$q (2nd)")(noop(fn(spark, sfDir)))
        }
      case "explain" :: sfDir :: q :: Nil =>
        println(SparkEntry.queries(q)(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted")))
      case "b23parts" :: sfDir :: Nil =>
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        noop(li.select(col("l_orderkey")))
        val netDec = col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
        val chargeDec = netDec * (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)"))
        time("scan only")(noop(li))
        time("double math")(noop(li.select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))))
        time("decimal net+charge")(noop(li.select(col("l_orderkey"),
          round(netDec, 2).cast("double").as("net"),
          round(chargeDec, 2).cast("double").as("charge"))))
        time("transcendental only")(noop(li.select(col("l_orderkey"),
          round(log(col("l_extendedprice")), 6).as("ln"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(pow(col("l_quantity"), 2), 2).as("q2"))))
        time("sort only")(noop(li
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")))
        time("full b23")(noop(SparkEntry.queries("b23_math_funcs")(spark, sfDir)))
      case other =>
        System.err.println(s"Unknown args: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
