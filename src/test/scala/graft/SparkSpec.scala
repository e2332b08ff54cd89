package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkSpec {
  /** Derby in-memory boot-order quirk, measured with standalone JDBC
    * probes: the FIRST memory-database creation in a JVM pins the
    * storage factory's path state. If a NAMED db (`memory:sinktest`)
    * boots first, every later `jdbc:derby:memory:;databaseName=…`
    * attribute-form connection — the URL Spark builds for the
    * execution-Hive metastore behind the Thrift server — dies with
    * XBM0J ("Directory memory:<cwd> already exists"); if an
    * attribute-form db boots first, all later forms work. Priming one
    * attribute-form database here, in the base every suite extends,
    * makes suite order irrelevant. */
  lazy val primeDerbyMemory: Unit =
    try {
      java.sql.DriverManager.getConnection(
        "jdbc:derby:memory:;databaseName=/graft-derby-prime;create=true").close()
    } catch { case _: Throwable => () }
}

/** Shared session base: one SparkSession per suite (lazy), UTC, small
  * shuffle partition count for local runs. */
trait SparkSpec extends AnyFunSuite {
  SparkSpec.primeDerbyMemory
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events TIMESTAMP(NANOS)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}
