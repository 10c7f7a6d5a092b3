package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Pins the physical-plan property the top-k operators rely on at scale:
  * Spark rewrites `row_number().over(partitionBy(q).orderBy(s)) <= k` into
  * WindowGroupLimit with a PARTIAL pass before the shuffle, so map tasks
  * prune to k rows per query before anything moves. If a future change to
  * the window ordering or filter shape silently defeats that rewrite, the
  * shuffle goes from O(k per query per task) to all scored pairs — this
  * spec turns that regression into a test failure. */
class SimilarityPlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("brute-force and LSH top-k plans contain partial WindowGroupLimit pruning") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    for ((name, df) <- Seq(
        "bruteForce" -> Similarity.bruteForceTopK(emb, queries, 5),
        "lsh" -> Similarity.lshBucketTopK(emb, queries, 5),
        "signBit" -> Similarity.signBitTopK(emb, queries, 5))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name top-k lost the WindowGroupLimit rewrite:\n$plan")
    }
    // the sign-bit rescore must fetch full vectors by broadcasting the
    // small candidate set against the corpus scan, never shuffling it
    val sbPlan = Similarity.signBitTopK(emb, queries, 5)
      .queryExecution.executedPlan.toString
    assert(sbPlan.contains("BroadcastHashJoin"),
      s"signBit rescore lost the broadcast candidate fetch:\n$sbPlan")
  }

  test("signBitTopK: positional column contract and loud failure on a too-wide dim") {
    import spark.implicits._
    // nonstandard column names — the operator must resolve (id, embedding)
    // positionally like marginMinedPairs, not by hard-coded names
    val corpus = Seq(
      (1L, Seq(0.5f, -0.2f, 0.3f, 0.1f)),
      (2L, Seq(-0.5f, 0.2f, -0.3f, 0.4f)),
      (3L, Seq(0.4f, 0.1f, -0.2f, -0.1f))).toDF("my_id", "my_emb")
    val queries = Seq((10L, Seq(0.5f, -0.1f, 0.2f, 0.2f))).toDF("qid", "qemb")
    val out = Similarity.signBitTopK(corpus, queries, k = 2, rescoreFactor = 2, dim = 4)
      .collect()
    assert(out.length === 2)
    // dim wider than the actual embedding: getItem past the end would
    // silently zero the bit — the projection must raise instead
    val err = intercept[Throwable] {
      Similarity.signBitTopK(corpus, queries, k = 1, dim = 8).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${chain(t.getCause)}"
    assert(chain(err).contains("signBitTopK"), chain(err))
  }

  test("LSH candidate volume stays bounded when the corpus doubles (auto-derived bits)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // k = MaxValue disables the rank cut, so the row count IS the number of
    // distinct (query, candidate) pairs the bucket join produced
    def candidates(n: Int): Long =
      Similarity.lshBucketTopK(emb.where(col("vec_id") < n), queries, Int.MaxValue).count()
    val at1k = candidates(1000)
    val at2k = candidates(2000)
    // fixed 4-bit signatures would double the volume here (1000 → 4 bits,
    // 2000 → 5 via bitsForCorpus); occupancy-targeted bits keep it flat
    // modulo bucket skew
    assert(at2k <= at1k * 1.6,
      s"candidate volume grew with the corpus: $at1k -> $at2k")
    assert(at1k > 0)
  }

  test("mmrRerank: the redundant near-duplicate of the top pick is demoted for a diverse result") {
    import spark.implicits._
    // d1 ≈ query; d2 ≈ d1 (redundant, second-most relevant); d3 less
    // relevant but pointing away. Relevance alone ranks (d1, d2); at
    // λ=0.5 MMR must pick (d1, d3).
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f)),            // the query (vec_id 0)
      (1L, Seq(0.995f, 0.1f)),          // d1
      (2L, Seq(0.99f, 0.141f)),         // d2 — near-dup of d1
      (3L, Seq(0.3f, -0.954f))          // d3 — diverse
    ).toDF("vec_id", "embedding")
    val queries = rows.where(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val mmr = Similarity.mmrRerank(rows, queries, candK = 3, k = 2, lambdaPct = 50)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(mmr.toSeq === Seq((1, 1L), (2, 3L)), s"got ${mmr.toSeq}")
    // pure relevance (λ=1) keeps the redundant order — the contrast that
    // proves the diversity term did the work
    val rel = Similarity.mmrRerank(rows, queries, candK = 3, k = 2, lambdaPct = 100)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(rel.toSeq === Seq((1, 1L), (2, 2L)), s"got ${rel.toSeq}")
  }

  test("embeddingProfile: hand-computed per-dimension stats; layout-invariant") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq(1.0f, -2.0f)),
      (1L, Seq(3.0f, 2.0f)),
      (2L, Seq(5.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.embeddingProfile(rows, 2).orderBy("dim")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))
    // dim 1: values 1,3,5 → mean 3, var 8/3, min 1, max 5
    assert(r(0) === ((1L, 3L, 3.0, math.floor(8.0 / 3.0 * 1e6 + 0.5) / 1e6, 1.0, 5.0)))
    // dim 2: values -2,2,0 → mean 0, var 8/3
    assert(r(1)._3 === 0.0 && r(1)._5 === -2.0 && r(1)._6 === 2.0)
    val repart = Similarity.embeddingProfile(rows.repartition(5), 2).orderBy("dim")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5)))
    assert(repart.toSeq === r.toSeq)
  }

  test("trainPca matches a single-node replica bit-for-bit; components orthonormal; layout-invariant") {
    import spark.implicits._
    // anisotropic fixture: variance concentrated in dims 60..63 (the ones
    // prefix truncation throws away), deterministic from the id
    val dim = 8
    def vec(i: Long): Array[Float] = Array.tabulate(dim) { j =>
      val base = (graft.dp.Mix.mix64(i * dim + j) >>> 40).toDouble / (1L << 24).toDouble - 0.5
      (if (j >= dim - 2) base * 4.0 else base * 0.25).toFloat
    }
    val rows = (0L until 200L).map(i => (i, vec(i).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val (mean, comps) = Similarity.trainPca(df, dim, 3, iterations = 200)

    // single-node replica: identical q6 quantization, moment sums, power
    // iteration — must agree to the last bit (long sums commute; driver
    // math is a fixed single-threaded op sequence)
    val xq = rows.map(_._2.map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    val n = xq.length
    val s = Array.tabulate(dim)(j => xq.map(_(j)).sum)
    val cov = Array.ofDim[Double](dim, dim)
    for (j <- 0 until dim; k <- 0 until dim) {
      val mjk = xq.map(r => r(j) * r(k)).sum
      cov(j)(k) = (mjk.toDouble - s(j).toDouble * s(k).toDouble / n.toDouble) / n.toDouble
    }
    val expComps = Array.ofDim[Double](3, dim)
    for (c <- 0 until 3) {
      var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
      var lambda = 0.0
      for (_ <- 0 until 200) {
        val w = Array.tabulate(dim)(a => (0 until dim).map(b => cov(a)(b) * v(b)).sum)
        lambda = math.sqrt(w.map(x => x * x).sum)
        v = if (lambda == 0.0) v else w.map(_ / lambda)
      }
      var best = 0
      for (a <- 1 until dim) if (math.abs(v(a)) > math.abs(v(best))) best = a
      if (v(best) < 0) v = v.map(-_)
      expComps(c) = v
      for (a <- 0 until dim; b <- 0 until dim) cov(a)(b) -= lambda * v(a) * v(b)
    }
    val expMean = s.map(x => x.toDouble / n.toDouble / 1e6)
    assert(mean.toSeq === expMean.toSeq)
    // replica matrix-vector products sum in a different (collection) order
    // than the operator's while-loop — allow ulp-level slack there, exact
    // everywhere it must be
    for (c <- 0 until 3; j <- 0 until dim)
      assert(math.abs(comps(c)(j) - expComps(c)(j)) < 1e-12, s"comp $c dim $j")
    // orthonormal basis (orthogonality to power-iteration convergence
    // tolerance — deflation is exact only at the fixed point)
    for (a <- 0 until 3; b <- 0 until 3) {
      val d = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-6, s"dot($a,$b)=$d")
    }
    // the top components must live in the high-variance subspace the
    // prefix discards — and the learned rotation must therefore beat
    // prefix truncation on this corpus
    val topMass = comps(0).takeRight(2).map(x => x * x).sum
    assert(topMass > 0.9, s"pc1 mass in high-variance dims: $topMass")
    val queries = df.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rec = Similarity.pcaVsPrefixRecall(df, queries, dim, 2, 5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rec("pca") > rec("prefix"),
      s"learned rotation should beat prefix here: $rec")
    // layout invariance of training (exact long sums)
    val (mean2, comps2) = Similarity.trainPca(df.repartition(7), dim, 3, iterations = 200)
    assert(mean2.toSeq === mean.toSeq)
    assert(comps2.map(_.toSeq).toSeq === comps.map(_.toSeq).toSeq)
  }

  test("maintained rotated-PQ codes index: append == rebuild, delete == rebuild, probe == from-scratch") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") % 5 =!= 0)
    val epoch = emb.where(col("vec_id") % 5 === 0)
    // FROZEN model trained on the base corpus only
    val model = Similarity.trainReducedPqModel(base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Seq[Int])].collect().toSet
    val idx = Similarity.reducedPqIndexOf(base, model)
    // encoding under frozen codebooks is per-row ⇒ append == rebuild exactly
    val idx2 = Similarity.reducedPqIndexAppend(idx, epoch, model)
    assert(rows(idx2) === rows(Similarity.reducedPqIndexOf(emb, model)),
      "append != rebuild over corpus ∪ epoch")
    // right-to-be-forgotten delete == rebuild over the filtered corpus
    val removals = Seq(0L, 5L, 10L)
    val idx3 = Similarity.reducedPqIndexDelete(idx2, removals.toDF("vec_id"), "vec_id")
    assert(rows(idx3) === rows(Similarity.reducedPqIndexOf(
        emb.where(!col("vec_id").isin(removals: _*)), model)),
      "delete != rebuild over the filtered corpus")
    // the maintained probe equals a probe over a from-scratch index of the
    // same membership, value for value — and deleted ids never surface
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def probe(i: org.apache.spark.sql.DataFrame) =
      Similarity.reducedPqProbeTopK(emb, i, model, queries, 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val maintained = probe(idx3)
    assert(maintained === probe(Similarity.reducedPqIndexOf(
      emb.where(!col("vec_id").isin(removals: _*)), model)))
    assert(maintained.nonEmpty)
    assert(maintained.forall { case (_, _, nid, _) => !removals.contains(nid) },
      "a deleted vector surfaced as a neighbor")
  }

  test("trainPca moment overflow fails closed; embeddingProfile decimal moments survive past long range (ADVICE r11)") {
    import spark.implicits._
    // a magnitude whose q6 square exceeds 2⁶³ on a single row: the checked
    // accumulation must raise, never wrap into a silently wrong model
    val bad = Seq((0L, Seq(4e9f, 0.5f)), (1L, Seq(0.1f, -0.2f)))
      .toDF("vec_id", "embedding")
    val pcaErr = intercept[org.apache.spark.SparkException] {
      Similarity.trainPca(bad, 2, 1, iterations = 5)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(pcaErr).exists(_.isInstanceOf[ArithmeticException]),
      s"expected a checked-arithmetic overflow, got $pcaErr")
    // the profile's decimal(38,0) moment sum stays EXACT where a long sum
    // would wrap: one row of xq = 4e9 has xq² = 1.6e19 > 2⁶³ (the old
    // long-typed product wrapped right here), while the q6 variance still
    // fits the display rounding's long floor
    val prof2 = Seq((0L, Seq(4000.0f, 0.5f)), (1L, Seq(0.1f, -0.2f)))
      .toDF("vec_id", "embedding")
    val prof = Similarity.embeddingProfile(prof2, 2).orderBy("dim").collect()
    val xq = math.floor(4000.0f.toDouble * 1e6 + 0.5)
    val xq2 = math.floor(0.1f.toDouble * 1e6 + 0.5)
    val m2 = xq * xq + xq2 * xq2 // exact in double here (hand value)
    val s = xq + xq2
    val expVar = math.floor((m2 / 2.0 - (s / 2.0) * (s / 2.0)) / 1e6 + 0.5) / 1e6
    assert(prof(0).getDouble(3) === expVar,
      s"decimal moment path diverged: ${prof(0)}")
  }
}
