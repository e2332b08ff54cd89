package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.{Curation, Similarity}

/** Scratch evidence run (r16): the standing semantic label-map build
  * (idx_sem_labels' shape — LSH pairs at the dedup threshold → min-label
  * propagation) timed at the DEFAULT vs the rule-SELECTED banding
  * layout, so the "un-weakened standing index" claim is a measurement,
  * not an extrapolation. */
object ProfileSemLayout {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.t(spark, dir, "embeddings")
    def build(layout: Similarity.LshLayout): (Double, Long) = {
      val t0 = System.nanoTime()
      val labels = Curation.propagateMinLabels(Curation.undirectedEdges(
        Similarity.embeddingNearDupsLshOn(emb,
            Similarity.SemanticDedupThreshold, layout)
          .select(col("va").as("da"), col("vb").as("db"))))._1
      val n = labels.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    build(Similarity.DefaultLshLayout) // JVM/scan warm-up
    for (_ <- 1 to 2) {
      val (td, nd) = build(Similarity.DefaultLshLayout)
      val (ts, ns) = build(Similarity.SelectedLshLayout)
      println(f"[semlayout] default ${Similarity.DefaultLshLayout}: $td%.2f s ($nd labeled); " +
        f"selected ${Similarity.SelectedLshLayout}: $ts%.2f s ($ns labeled)")
    }
    spark.stop()
  }
}
