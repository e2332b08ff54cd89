package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The r16 LSH layout-governance loop: the x136b profile, the
  * [[Similarity.selectLshLayout]] rule, and the invariants that make the
  * selected layout safe to run (identical-vector recall floor, exact
  * verify unchanged, pair-set soundness vs brute force). */
class SimilarityLayoutSpec extends SparkSpec {

  private val sfd = "/root/testdata/sf0.001"

  test("selectLshLayout on this corpus's profile equals SelectedLshLayout") {
    // Pins the registered constant to the rule's actual output so the
    // x09c/x36b layout can never silently drift from the measurement.
    val prof = Similarity.lshLayoutProfileOn(
      Tables.t(spark, sfd, "embeddings"), Similarity.LshLayoutLadder)
    assert(Similarity.selectLshLayout(prof) == Similarity.SelectedLshLayout)
  }

  test("selected layout cuts candidate mass >= 5x vs the default at sf0.001") {
    val prof = Similarity.lshLayoutProfileOn(
      Tables.t(spark, sfd, "embeddings"), Similarity.LshLayoutLadder)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
    val dft = prof((Similarity.DefaultLshLayout.bands, Similarity.DefaultLshLayout.bits))
    val sel = prof((Similarity.SelectedLshLayout.bands, Similarity.SelectedLshLayout.bits))
    assert(sel * 5 <= dft, s"expected >=5x mass cut, got default=$dft selected=$sel")
  }

  test("diffuse-tail regime prefers bands under a budget, degrades to cheapest") {
    import spark.implicits._
    val prof = Seq(
      (2, 16, 10L, 5L, 1000L, 0L),
      (1, 63, 10L, 5L, 100L, 0L),
      (2, 63, 10L, 5L, 400L, 0L))
      .toDF("bands", "bits", "buckets", "max_bucket", "cand_exact", "floor_pairs")
    // identical-tail regime: min mass wins
    assert(Similarity.selectLshLayout(prof) == Similarity.LshLayout(1, 63))
    // diffuse tail: most bands that fit the budget (2x63 at 400 <= 500)
    assert(Similarity.selectLshLayout(prof, diffuseHighCosineTail = true,
      candBudget = 500L) == Similarity.LshLayout(2, 63))
    // nothing fits: cheapest row, never a failure
    assert(Similarity.selectLshLayout(prof, diffuseHighCosineTail = true,
      candBudget = 1L) == Similarity.LshLayout(1, 63))
  }

  test("diffuse high-cosine tail: more bands keep recall the selected layout loses") {
    import spark.implicits._
    // The behavioral ground for selectLshLayout's diffuse branch: a
    // corpus whose near-dup pairs are NON-identical vectors at cosine
    // ~0.98 (tiny perturbations — re-encodings through a lossy step,
    // the regime where 1 - (1 - p^bits)^bands governs). Deterministic
    // seed; 40 planted pairs.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 40).flatMap { i =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(base.map(x => x * x.toDouble).sum).toFloat
      val u = base.map(_ / norm)
      val twin = u.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      Seq((i.toLong, u), (1000L + i, twin))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val truth = Similarity.embeddingNearDupsAllPairs(emb, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 35, s"the planted tail must exist: ${truth.size}")
    def recall(l: Similarity.LshLayout): Double = {
      val found = Similarity.embeddingNearDupsLshOn(emb, 0.9, l)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & found).size.toDouble / truth.size
    }
    val bands4 = recall(Similarity.LshLayout(4, 16))
    val sel = recall(Similarity.SelectedLshLayout)
    assert(bands4 >= 0.5,
      s"4 bands must keep most of the diffuse tail: $bands4")
    assert(bands4 > 2 * sel,
      s"more bands must beat the min-mass layout on a diffuse tail: $bands4 vs $sel")
  }

  test("identical quantized vectors collide under every ladder layout") {
    import spark.implicits._
    // The recall floor selectLshLayout's default regime rests on: equal
    // arrays -> equal integer projections -> equal bucket ids, per band,
    // at ANY layout. A replayed vector can therefore never escape the
    // x36b dispatch gate whatever layout the rule picks.
    val base = Tables.t(spark, sfd, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(20)
    val replay = base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    for (l <- Similarity.LshLayoutLadder) {
      val b = Similarity.bucketedOf(base.union(replay), l)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val bands = 0 until l.bands
      val collide = base.select("vec_id").as[Long].collect().forall { id =>
        bands.forall(bd => b((id, bd)) == b((id + 1000000L, bd)))
      }
      assert(collide, s"replayed vectors must bucket-collide at layout $l")
    }
  }

  test("x09c pairs are a sound subset of brute force with identical cosines") {
    val emb = Tables.t(spark, sfd, "embeddings")
    val lsh = Similarity.embeddingNearDupsLshOn(emb, 0.3, Similarity.SelectedLshLayout)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = Similarity.embeddingNearDupsAllPairs(emb, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "selected layout should still surface pairs at sf0.001")
    lsh.foreach { case (k, c) =>
      assert(brute.get(k).contains(c),
        s"pair $k cosine $c must appear in brute force with the same value")
    }
  }

  test("x136b floor_pairs counts identical-signature pairs exactly") {
    import spark.implicits._
    // 3 copies of one vector + 2 of another + 1 singleton -> C(3,2)+C(2,2)=4.
    val e = Seq(
      (1L, Array(0.5f, -0.25f)), (2L, Array(0.5f, -0.25f)), (3L, Array(0.5f, -0.25f)),
      (4L, Array(-0.125f, 0.75f)), (5L, Array(-0.125f, 0.75f)),
      (6L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val prof = Similarity.lshLayoutProfileOn(e, Seq(Similarity.DefaultLshLayout))
      .select("floor_pairs").collect()
    assert(prof.head.getLong(0) == 4L)
  }

  test("bucketedOf at the default layout is unchanged by the parameterization") {
    val emb = Tables.t(spark, sfd, "embeddings").limit(50)
    val a = Similarity.bucketedOf(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.bucketedOf(emb, Similarity.DefaultLshLayout).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
