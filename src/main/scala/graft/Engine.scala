package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing session facade: registers the warehouse tables as temp
  * views and the engine's native functions on a session, so the full
  * surface is reachable from SQL as well as the DataFrame API:
  *
  * {{{
  * graft.Engine.attach(spark, "/data/sf0.01")
  * spark.sql("SELECT sanitize_name(p_type), count(*) FROM part GROUP BY 1")
  * }}}
  *
  * Views are lazy relations over the parquet locations — attaching runs
  * no job; Catalyst sees straight through a view to the scan, so pushdown
  * and pruning behave exactly as with direct reads.
  */
object Engine {

  /** Register every test-data table as a temp view + the native function
    * set ([[graft.functions.GraftFunctions]]). */
  def attach(spark: SparkSession, dir: String): Unit = {
    Tables.all.foreach { name =>
      Tables.t(spark, dir, name).createOrReplaceTempView(name)
    }
    functions.GraftFunctions.register(spark)
  }

  /** Convenience: attach + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    attach(spark, dir)
    spark.sql(query)
  }
}
