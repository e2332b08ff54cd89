package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage timer for the x46b wave (not part of the
  * library surface): forces each tier's frame in sequence in one warm
  * JVM so the wave's 30 s can be attributed to a stage. */
object ProfileX46b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Curation, Dedup, Similarity, Checkpoints, TextStats}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[x46b] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = graft.Tables.t(spark, dir, "documents")
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val corpus = d.filter(col("doc_id") % 97 =!= 0)
    // standing artifacts (timed separately as builds)
    val oldDed = t("idx old_ded")(Curation.x46bOldDed(spark, dir))
    val oldLex = t("idx lex_index")(Curation.x46bLexIndex(spark, dir))
    val oldSemEdges = t("idx sem_edges")(Curation.x46bSemEdges(spark, dir))
    val newDocs = corpus.filter(pmod(col("doc_id"), lit(10)) === 1)
    val newEmb = emb.filter(col("vec_id") % 97 =!= 0)
      .filter(pmod(col("vec_id"), lit(10)) === 1).select("vec_id", "embedding")
    val oldEmb = emb.filter(col("vec_id") % 97 =!= 0)
      .filter(pmod(col("vec_id"), lit(10)) =!= 1).select("vec_id", "embedding")
    val evalDocs = d.filter(col("doc_id") % 97 === 0)
    val evalVecs = emb.filter(col("vec_id") % 97 === 0)

    // ------- wave stages, forced in order
    val quality = TextStats.qualityColumn
    val admittedNew = newDocs.filter(graft.streaming.IngestGate.cleanCond)
    val newMin = admittedNew.groupBy(sha2(col("text"), 256).as("sha"))
      .agg(min("doc_id").as("new_id"))
    val j = newMin.join(oldDed.select(col("sha"), col("doc_id").as("old_id")),
      Seq("sha"), "left")
    val newWin = j.filter(col("old_id").isNull || col("new_id") < col("old_id"))
      .select(col("new_id").as("doc_id"))
    val evicted = j.filter(col("old_id").isNotNull && col("new_id") < col("old_id"))
      .select(col("old_id").as("doc_id"))
    val dedNew = t("1+2 gate+sha dedNew")(Checkpoints.stable(
      admittedNew.join(newWin, Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          quality.as("quality"))))
    val dedUnion = oldDed.join(evicted, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("quality"))
      .union(dedNew)
    val newNew = Dedup.jaccardPairsPrefixOn(dedNew, 0.8, ordered = false)
      .select(col("da"), col("db"))
    t("3a newNew pairs")(force(newNew))
    val cross = Dedup.crossNearDupPairs(dedNew,
      oldDed.select(col("doc_id"), col("text")), 0.8)
      .select(col("da"), col("db"))
    t("3b cross pairs")(force(cross))
    val star = oldLex.filter(col("node") =!= col("lbl"))
      .select(col("node").as("da"), col("lbl").as("db"))
    val lexLabels = t("3c propagate star+delta")(
      Curation.propagateMinLabels(
        Curation.undirectedEdges(newNew.union(cross).union(star)))._1)
    val lexKeep = Curation.dedupClustersKeepByLabels(
      dedUnion.select(col("doc_id"), col("quality")), lexLabels, col("quality"))
      .filter(col("keep")).select("doc_id")
    val lexSurv = dedUnion.join(lexKeep, Seq("doc_id"))
    t("3d keep-best join")(force(lexSurv))
    val stripped = t("4 strip")(Checkpoints.stable(lexSurv
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
      .join(Curation.spanDedupOn(lexSurv, 3, 1, 5), Seq("doc_id"))))
    val ids = stripped.select("doc_id")
    val aliveVec = ids.withColumnRenamed("doc_id", "vec_id")
    val newEmbAlive = newEmb.join(aliveVec, Seq("vec_id"), "left_semi")
    val oldEmbAlive = oldEmb.join(aliveVec, Seq("vec_id"), "left_semi")
    val newNewSem = Similarity.embeddingNearDupsLshOn(newEmbAlive, 0.3)
      .select(col("va").as("da"), col("vb").as("db"))
    t("5a sem newNew")(force(newNewSem))
    val crossSem = Similarity.crossSemanticPairs(newEmbAlive, oldEmbAlive, 0.3)
      .select(col("va").as("da"), col("vb").as("db"))
    t("5b sem cross")(force(crossSem))
    val semPairs = oldSemEdges
      .join(ids.withColumnRenamed("doc_id", "da"), Seq("da"), "left_semi")
      .join(ids.withColumnRenamed("doc_id", "db"), Seq("db"), "left_semi")
      .select(col("da"), col("db"))
      .union(newNewSem).union(crossSem)
    val semKeep = t("5c sem keep-best")(
      Curation.dedupClustersKeepBy(
        stripped.select(col("doc_id"), col("quality")), semPairs, col("quality"))
        .filter(col("keep")).select("doc_id"))
    val semSurv = stripped.join(semKeep, Seq("doc_id"))
    val contam = Curation.contaminationCounts(
      semSurv.select(col("doc_id"), col("clean_text").as("text")),
      evalDocs, 3).select("doc_id")
    val semContam = Similarity.semanticDecon(
      semSurv.select(col("doc_id").as("vec_id")).join(emb, "vec_id"),
      evalVecs, 0.3)
      .filter(col("contaminated"))
      .select(col("vec_id").as("doc_id"))
    val out = semSurv
      .join(contam, Seq("doc_id"), "left_anti")
      .join(semContam, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "quality", "n_tokens", "n_masked",
        "clean_text")
      .orderBy("doc_id")
    t("6 decon+out")(force(out))
    t("FULL wave re-run")(force(graft.SparkEntry
      .queries("x46b_curate_v2_incremental")(spark, dir)))
    t("x46 full recompute")(force(graft.SparkEntry
      .queries("x46_curate_v2")(spark, dir)))
    spark.stop()
  }
}
