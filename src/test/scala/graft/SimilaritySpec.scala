package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorFunctions.vec_dot

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(vs: (Long, Seq[Float])*) = vs.toDF("vec_id", "embedding")

  test("vec_dot matches an independent double-precision fold") {
    val a = Seq(1.5f, -2.25f, 3.75f, 0.125f)
    val b = Seq(0.5f, 4.0f, -1.25f, 8.0f)
    val expected = (a, b).zipped.map((x, y) => x.toDouble * y.toDouble).sum
    val got = vecs((0L, a)).crossJoin(vecs((1L, b)).select(col("embedding").as("e2")))
      .select(vec_dot(col("embedding"), col("e2"))).head().getDouble(0)
    assert(got === expected)
  }

  test("vec_dot null array → null") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val corpus = vecs(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f)))
    val out = Similarity.bruteForceTopK(corpus, vecs((1L, Seq(1f, 0f))), k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L), (2L, 3L), (3L, 4L)))
  }

  test("ivfTopK recall vs brute force on real embeddings") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 10 === 0), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(emb, step = 10, nProbe = 3, k = 5)
      .where(col("q_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // approximate: require reasonable overlap with the exact answer
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall") // random embeddings: cells are weak but not useless
    assert(ivf.nonEmpty)
  }

  test("cosineNearDupPairsLsh recall vs exact pairs on real embeddings") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineNearDupPairs(emb, minSim = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(emb, minSim = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH variant must emit no pair the exact scorer rejects")
    val recall = if (exact.isEmpty) 1.0 else exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall over ${exact.size} exact pairs")
  }

  test("pqTopK recall vs brute force on real embeddings") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 10 === 0), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(emb, step = 10, qStride = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    info(s"PQ recall@5: $recall over ${exact.size} exact pairs")
    // 16 subspaces × 48 codes: measured ≈0.5 on this corpus — the bar
    // leaves slack for corpus regeneration, not for regressions to the
    // old coarse 8×16 book (which sat at ≈0.2)
    assert(recall > 0.35, s"recall $recall")
    assert(pq.nonEmpty)
  }

  test("ivfPqTopK: plain-PQ-level recall at materially fewer scored candidates") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val n = emb.count()
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 10 === 0), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(s: Set[(Long, Long)]) = exact.intersect(s).size.toDouble / exact.size
    val pq = recallOf(Similarity.pqTopK(emb, step = 10, qStride = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    val ivfPq = recallOf(Similarity.ivfPqTopK(emb, step = 10, qStride = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    // the quantity the composition exists to cut: ADC-scored pairs,
    // counted directly (wall-clock asserts are flaky) — full-scan PQ
    // scores nQueries x (N-1); the exact-verify stage adds only
    // rerank·k per query on top
    val nCand = Similarity.ivfPqCandidates(emb, qStride = 10).count()
    val nQueries = emb.where(col("vec_id") % 10 === 0).count()
    val full = nQueries * (n - 1)
    info(s"IVFxPQ recall@5=$ivfPq vs PQ=$pq; ADC candidates $nCand of $full (${nCand * 100 / full}%)")
    assert(nCand < full / 2, s"cell probe pruned too little: $nCand of $full")
    // the exact re-rank stage lifts composed recall ABOVE full-scan PQ
    // even though ADC scores a fraction of the pairs: quantization
    // noise only decides who enters the shortlist, not the final order
    assert(ivfPq >= pq, s"IVFxPQ recall $ivfPq fell below plain PQ $pq")
    // determinism: stride-sampled coarse cells + dense-rank codes
    val run = () => Similarity.ivfPqTopK(emb, step = 10, qStride = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() === run())
  }

  test("persisted IVF×PQ index answers identically to the in-memory build") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 10 === 0)
    val inMem = Similarity.ivfPqTopK(emb, step = 10, qStride = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx-spec").toString
    Similarity.ivfPqWrite(Similarity.ivfPqBuild(emb, step = 10), dir)
    val reloaded = Similarity.ivfPqQuery(
        Similarity.ivfPqRead(TestSpark.spark, dir), queries, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // byte-identical through the parquet roundtrip: ranks, ids, sims
    assert(reloaded === inMem)
  }

  test("ivfPqAppend folds a batch into the frozen index and the batch becomes findable") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // batch residue (7k+3) disjoint from the centroid seed stride
    // (10k): the base build keeps its full coarse geometry
    val base = emb.where(col("vec_id") % 7 =!= 3)
    val batch = emb.where(col("vec_id") % 7 === 3)
    val idx = Similarity.ivfPqBuild(base, step = 10)
    val appended = Similarity.ivfPqAppend(idx, batch)
    // the index grows by exactly the batch, geometry untouched
    assert(appended.cells.count() === emb.count())
    assert(appended.codes.count() === emb.count())
    assert(appended.coarseCents.collect().toSet === idx.coarseCents.collect().toSet)
    // queries are all batch members: before the append they cannot be
    // each other's neighbors; after, they must surface
    val queries = emb.where(col("vec_id") % 70 === 3)
    val before = Similarity.ivfPqQuery(idx, queries, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val after = Similarity.ivfPqQuery(appended, queries, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(before.forall { case (_, c) => c % 7 != 3 })
    assert(after.exists { case (_, c) => c % 7 == 3 },
      "appended vectors never surfaced as neighbors")
    // recall vs the full-corpus truth must not drop when the index
    // grows to cover the whole corpus
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(s: Set[(Long, Long)]) = exact.intersect(s).size.toDouble / exact.size
    info(s"recall@5 base-only=${recall(before)} appended=${recall(after)}")
    assert(recall(after) >= recall(before))
  }

  test("appendDrift: an out-of-distribution batch trips the rebuild trigger, an in-distribution one does not") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val index = Similarity.ivfPqBuild(emb, step = 10)
    val baseline = Similarity.cellResidualEnergy(index, emb)
    // in-distribution: a residue-class sample of the SAME corpus — its
    // per-cell residual energy sits near the baseline, no cell fires
    // (threshold 1.5 leaves headroom for small-sample variance)
    val inDist = Similarity.appendDrift(index, baseline, emb.where(col("vec_id") % 3 === 1))
      .collect().map(r => (r.getLong(0), r.getBoolean(3)))
    assert(inDist.nonEmpty)
    assert(inDist.forall(!_._2), s"in-distribution batch tripped: ${inDist.filter(_._2).mkString(",")}")
    // out-of-distribution: scale the space ×-2 — residuals against the
    // frozen centroids blow up and the trigger must fire somewhere
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => (x * lit(-2.0)).cast("float")).as("embedding"))
    val ood = Similarity.appendDrift(index, baseline, shifted)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(ood.exists(_._3), "shifted batch never tripped the rebuild trigger")
    // and the signal is not a fluke of one cell: median ratio is high
    val ratios = ood.map(_._2).sorted
    assert(ratios(ratios.length / 2) > 1.5, s"median drift ratio ${ratios(ratios.length / 2)}")
  }

  test("ivfPqMaintain: drifted batch forces a retrain that absorbs the new mode; in-distribution batch appends frozen") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val base = emb.where(col("vec_id") % 7 =!= 3)
    val batch = emb.where(col("vec_id") % 7 === 3)
    val idx = Similarity.ivfPqBuild(base, step = 10)
    val baseline = Similarity.cellResidualEnergy(idx, base)
    // in-distribution: the held-out residue class of the same corpus —
    // maintain must take the cheap path (frozen geometry, batch-sized)
    val (appended, carried, rebuilt1) = Similarity.ivfPqMaintain(idx, baseline, base, batch)
    assert(!rebuilt1, "in-distribution batch forced a retrain")
    assert(appended.cells.count() === emb.count())
    assert(appended.coarseCents.collect().toSet === idx.coarseCents.collect().toSet)
    assert(carried eq baseline) // baseline carried forward untouched
    // out-of-distribution: a constant-offset shift — a coherent NEW
    // MODE the frozen centroids cannot represent (every residual holds
    // the full offset), which is exactly the case appends must not
    // paper over. Fresh ids keep the union well-formed and let the
    // retrain's stride sampling seed centroids inside the new mode.
    val ood = batch.select((col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), x => (x + lit(3.0f)).cast("float")).as("embedding"))
    val (retrained, newBaseline, rebuilt2) = Similarity.ivfPqMaintain(idx, baseline, base, ood)
    assert(rebuilt2, "shifted batch did not force a retrain")
    assert(retrained.cells.count() === base.count() + ood.count())
    assert(newBaseline.count() > 0)
    // the retrain must ABSORB the mode: the ood batch's total residual
    // energy under the rebuilt geometry collapses vs the frozen one
    // (frozen residuals carry ~||offset||² each; rebuilt cells sit
    // inside the mode)
    def totalEnergy(i: Similarity.IvfPqIndex) = Similarity.cellResidualEnergy(i, ood)
      .agg(sum(col("n") * col("mean_energy"))).head().getDouble(0)
    val (frozenE, rebuiltE) = (totalEnergy(idx), totalEnergy(retrained))
    info(s"ood batch residual energy: frozen=$frozenE rebuilt=$rebuiltE")
    assert(rebuiltE < frozenE * 0.1,
      s"retrain did not absorb the drift: $frozenE -> $rebuiltE")
  }

  test("Lloyd codebook refinement does not degrade pq recall and stays deterministic") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 10 === 0), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(iters: Int): Double = {
      val pq = Similarity.pqTopK(emb, step = 10, qStride = 10, k = 5,
          refineIters = iters, trainStride = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      exact.intersect(pq).size.toDouble / exact.size
    }
    val (base, refined) = (recallOf(0), recallOf(1))
    info(s"PQ recall@5 base=$base lloyd1=$refined")
    // uniform synthetic data: refinement is roughly neutral; it must
    // never WRECK the book (that would mean assignment/means disagree
    // with the encode metric)
    assert(refined >= base - 0.1, s"lloyd degraded recall: $base -> $refined")
    // decimal-accumulated means: bit-deterministic across runs
    val run = () => Similarity.pqTopK(emb, step = 10, qStride = 10, k = 5, refineIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() === run())
  }

  test("ivfTopK argmax assignment is deterministic across runs") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val run = () => Similarity.ivfTopK(emb, step = 10, nProbe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() === run())
  }

  test("VecSelfDotRule rewrites vec_dot(a, a) to vec_sq_norm with identical values") {
    // parquet-backed source: a literal relation would be constant-folded
    // away before the rewrite is observable in the optimized plan
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(col("vec_id"), vec_dot(col("embedding"), col("embedding")).as("sq"))
    // the injected optimizer rule must fire...
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_sq_norm"),
      df.queryExecution.optimizedPlan.toString)
    // ...and must not change the result (same fold order and arithmetic)
    val rows = emb.limit(5).collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = df.where(col("vec_id").isin(rows.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) === v.map(x => x.toDouble * x.toDouble).sum)
    }
    // genuinely different inputs keep the binary vec_dot
    val ab = emb.select(vec_dot(col("embedding"), slice(col("embedding"), 1, 2)).as("d"))
    val plan = ab.queryExecution.optimizedPlan.toString
    assert(plan.contains("vec_dot") && !plan.contains("vec_sq_norm"), plan)
  }

  test("vec_adc_score matches the interpreted HOF formulation") {
    import graft.functions.VectorFunctions.vec_adc_score
    val df = Seq((Seq(Seq(1.5, 2.5, 3.5), Seq(10.0, 20.0, 30.0)), Seq(2, 0)))
      .toDF("tables", "codes")
    val got = df.select(vec_adc_score(col("tables"), col("codes"))).head().getDouble(0)
    assert(got === 3.5 + 10.0)
    val hof = df.select(expr(
      "aggregate(zip_with(tables, codes, (t, c) -> element_at(t, c + 1)), 0D, (acc, x) -> acc + x)"))
      .head().getDouble(0)
    assert(got === hof)
    // null on either side → null
    val nul = Seq((Option.empty[Seq[Seq[Double]]], Some(Seq(0)))).toDF("tables", "codes")
    assert(nul.select(vec_adc_score(col("tables"), col("codes"))).head().isNullAt(0))
  }

  test("semanticDedup: drops are sound, misses are cross-cell only, result is deterministic") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tau = 0.4
    val out = Similarity.semanticDedup(emb, step = 10, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === emb.count())
    val cell = out.map(r => r._1 -> r._2).toMap
    val dropped = out.filter(!_._3).map(_._1).toSet
    // brute-force ground truth: all (a < b) pairs with cosine >= tau
    val exactPairs = Similarity.cosineNearDupPairs(emb, minSim = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // soundness: every dropped vector has a smaller-id exact neighbor
    // (the within-cell witness is in particular a global near-dup)
    dropped.foreach { d =>
      assert(exactPairs.exists { case (a, b) => b == d && a < d },
        s"vec $d dropped without a smaller-id near-dup witness")
    }
    // the method's contract: a near-dup pair NOT caught must span cells
    exactPairs.foreach { case (a, b) =>
      if (!dropped.contains(b) && cell(a) == cell(b))
        fail(s"same-cell pair ($a,$b) above tau survived both")
    }
    // determinism across runs (stride centroids, no randomness)
    val again = Similarity.semanticDedup(emb, step = 10, tau = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("lshBuckets: identical vectors share a bucket") {
    val b = Similarity.lshBuckets(vecs((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f)),
      (3L, Seq(-1f, -2f, -3f))), nPlanes = 8, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // antipodal vector flips every plane sign
  }

  test("int8QuantizeAudit: byte-bounded codes, error within half a step, constant dims are free") {
    val dim = 4
    val fixture = vecs(
      (0L, Seq(0f, 10f, 5f, 1f)),
      (1L, Seq(255f, -10f, 5f, 1f)),
      (2L, Seq(128f, 0f, 5f, 1f)),
      (3L, Seq(64f, 3f, 5f, 1f)))
    val got = Similarity.int8QuantizeAudit(fixture, dim = dim).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size === 4)
    got.values.foreach { case (_, cmin, cmax, mse) =>
      assert(cmin >= 0L && cmax <= 255L)
      assert(mse >= 0.0)
    }
    // dims 3 and 4 are constant across the corpus: scale 0, code 0,
    // dequant = min = the value itself — zero error contribution.
    // dim 1 spans 255 over 255 codes (step 1): max per-component error
    // 0.5, so mse <= (0.5^2 * 2 active dims) / 4
    got.values.foreach { case (_, _, _, mse) => assert(mse <= (0.25 * 2) / 4 + 1e-9, mse) }
    // exact corners: vec 0 dim1 value 0 = corpus min -> code 0;
    // vec 1 dim1 value 255 = corpus max -> code 255
    assert(got(0L)._2 === 0L)
    assert(got(1L)._3 === 255L)
    // deterministic under repartitioning
    val again = Similarity.int8QuantizeAudit(fixture.repartition(3), dim = dim).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(again === got)
  }

  test("labelCentroids: closed-form means in long format, partitioning-invariant") {
    val fx = Seq(
      (1L, Array(1.0f, 2.0f), 7),
      (2L, Array(3.0f, 6.0f), 7),
      (3L, Array(10.0f, 0.5f), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got((7L, 1L)) === ((2L, 2.0)))    // (1+3)/2
    assert(got((7L, 2L)) === ((2L, 4.0)))    // (2+6)/2
    assert(got((8L, 1L)) === ((1L, 10.0)))
    assert(got((8L, 2L)) === ((1L, 0.5)))
    assert(got.size === 4)
    val again = Similarity.labelCentroids(fx.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(again === got)
  }

  test("embeddingStandardize/embeddingOutliers: unit scale, planted artifact caught") {
    val spark2 = spark; import spark2.implicits._
    // 9 well-behaved vectors + one scale-drifted artifact (vec 10)
    val fx = ((1 to 9).map { i =>
      (i.toLong, Seq(math.sin(i.toDouble), math.cos(i.toDouble), (i % 3).toDouble, 1.0))
    } :+ ((10L, Seq(40.0, -40.0, 40.0, 1.0)))).toDF("vec_id", "embedding")
    val z = Similarity.embeddingStandardize(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // constant dim 4 standardizes to 0 everywhere, not NaN
    assert(z.filter(_._2 == 4L).forall(_._3 === 0.0))
    // per-dim z mean ~0 and population var ~1 on the varying dims
    (1L to 3L).foreach { d =>
      val zs = z.filter(_._2 == d).map(_._3)
      assert(math.abs(zs.sum / zs.length) < 1e-6, s"dim $d mean")
      assert(math.abs(zs.map(v => v * v).sum / zs.length - 1.0) < 1e-6, s"dim $d var")
    }
    val top = Similarity.embeddingOutliers(fx, k = 3).collect()
      .map(r => (r.getLong(2), r.getLong(0))).toMap
    assert(top(1L) === 10L) // the artifact ranks first by a wide margin
  }

  test("embeddingCovariance/pcaTopComponent: exact moments, dominant axis recovered") {
    val spark2 = spark; import spark2.implicits._
    // mass along axis 1 (t = -2..2), a correlated t/10 on axis 2,
    // axes 3-4 constant zero
    val fx = (-2 to 2).map { t =>
      ((t + 3).toLong, Seq(t.toDouble, t / 10.0, 0.0, 0.0))
    }.toDF("vec_id", "embedding")
    val cov = Similarity.embeddingCovariance(fx).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(cov.size === 10) // 4*5/2 upper triangle
    assert(cov((1L, 1L)) === 2.0)      // population var of -2..2
    assert(cov((1L, 2L)) === 0.2)      // exact cross moment
    assert(cov((2L, 2L)) === 0.02)
    assert(cov((3L, 3L)) === 0.0)
    assert(cov((1L, 3L)) === 0.0)
    // partitioning-invariant (the rounded-DECIMAL-sum claim)
    val again = Similarity.embeddingCovariance(fx.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(again === cov)
    val pc = Similarity.pcaTopComponent(fx, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // dominant direction ~ (1, 0.1, 0, 0)/||.||: v1 ≈ 0.995
    assert(math.abs(pc(1L)._1) > 0.99, pc.toString)
    assert(math.abs(pc(2L)._1) < 0.11 && math.abs(pc(2L)._1) > 0.09)
    assert(pc(3L)._1 === 0.0 && pc(4L)._1 === 0.0)
    // λ ≈ top eigenvalue 2.02 (the fixture's exact spectrum)
    assert(math.abs(pc(1L)._2 - 2.02) < 0.01, pc(1L)._2.toString)
  }

  test("bitextMarginMining: margins equal an independent fold; exact twins are mutual best") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val srcRows = Seq(0L -> Array(1.0f, 0.1f, 0.0f, 0.0f),
      2L -> Array(0.0f, 1.0f, 0.2f, 0.0f), 4L -> Array(0.1f, 0.0f, 1.0f, 0.3f))
    val tgtRows = Seq(1L -> Array(1.0f, 0.1f, 0.0f, 0.0f), // exact twin of 0
      3L -> Array(0.0f, 1.0f, 0.2f, 0.0f),                 // exact twin of 2
      5L -> Array(0.5f, 0.5f, 0.5f, 0.5f))
    val got = Similarity.bitextMarginMining(
        srcRows.toDF("vec_id", "embedding"), tgtRows.toDF("vec_id", "embedding"),
        k = 2, minMargin = 0.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // the independent fold: vec_dot's sequential double accumulation,
    // round(·,9) → exact decimal sums → one division → round(·,6)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def r9(x: Double): JBD = JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP)
    val sims = for ((si, se) <- srcRows; (ti, te) <- tgtRows)
      yield (si, ti, r9(dot(se, te) / (math.sqrt(dot(se, se)) * math.sqrt(dot(te, te)))))
    def top2(rows: Seq[(Long, JBD)]): JBD =
      rows.sortWith((a, b) => a._2.compareTo(b._2) > 0 ||
        (a._2.compareTo(b._2) == 0 && a._1 < b._1)).take(2).map(_._2).reduce(_.add(_))
    val degS = sims.groupBy(_._1).map { case (s, l) => s -> top2(l.map(x => (x._2, x._3))) }
    val degT = sims.groupBy(_._2).map { case (t, l) => t -> top2(l.map(x => (x._1, x._3))) }
    val margins = sims.map { case (s, t, sim) =>
      (s, t) -> JBD.valueOf(sim.doubleValue * 2.0 /
        (degS(s).add(degT(t)).doubleValue / 2)).setScale(6, RoundingMode.HALF_UP).doubleValue
    }.toMap
    val expBest = srcRows.map(_._1).map { s =>
      s -> tgtRows.map(_._1).map(t => (t, margins((s, t))))
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)).head
    }.toMap
    assert(got.keySet === Set(0L, 2L, 4L))
    for (s <- Seq(0L, 2L, 4L)) {
      assert(got(s)._1 === expBest(s)._1, s"best target for $s")
      assert(got(s)._2 === expBest(s)._2, s"margin for $s")
    }
    // the exact twins are each other's best in both directions
    assert(got(0L)._1 === 1L && got(0L)._3, got(0L).toString)
    assert(got(2L)._1 === 3L && got(2L)._3, got(2L).toString)
  }

  test("knnHubness: a planted hub dominates the census; histogram covers every vector") {
    // 12 near-orthogonal vectors (e_i + 0.1·1⃗ in 13 dims) + the
    // all-ones hub: cos(v_i, v_j) ≈ 0.25 but cos(v_i, hub) ≈ 0.55, so
    // the hub is EVERY vector's nearest neighbor by construction —
    // the exact geometry hubness emerges from in high dimensions
    val pts = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(13)(d => (if (d == i) 1.0f else 0.0f) + 0.1f))
    }
    val hub = Seq((99L, Array.fill(13)(1.0f)))
    val emb = (pts ++ hub).toDF("vec_id", "embedding")
    val hist = Similarity.knnHubness(emb, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the histogram partitions all 13 vectors
    assert(hist.values.sum === 13L, hist.toString)
    // occurrence conservation: sum(n_k * n_vectors) = 13 queries * k
    assert(hist.map { case (nk, nv) => nk * nv }.sum === 26L, hist.toString)
    // the hub owns the census maximum: recompute its N_k directly
    val occ = Similarity.bruteForceTopK(emb, emb, 2).collect()
      .map(_.getLong(2)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hubNk = occ.getOrElse(99L, 0L)
    assert(hubNk === occ.values.max && hubNk >= 10L, occ.toString)
    assert(hist(hubNk) >= 1L)
  }

  test("bitextMarginMiningLsh: degenerate planes (nPlanes=0) reproduce brute EXACTLY") {
    // with zero planes every vector lands in bucket 0 of the single
    // table, the candidate set IS the cross product, and the shortlist
    // miner must equal the brute miner row for row — the sharpest
    // possible statement that the margin chain is candidate-agnostic
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (src, tgt) = (emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1))
    val brute = Similarity.bitextMarginMining(src, tgt).collect().toSet
    val full = Similarity.bitextMarginMiningLsh(src, tgt, nPlanes = 0, nTables = 1)
      .collect().toSet
    assert(full === brute, s"brute=${brute.size} fullLsh=${full.size}")
  }

  test("bitextMarginMiningLsh recall vs brute mined pairs at default planes") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (src, tgt) = (emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1))
    val brute = Similarity.bitextMarginMining(src, tgt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.bitextMarginMiningLsh(src, tgt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the shortlist miner may rank a different target first where the
    // shortlist k-NN mass shifts the margin, but most mined pairs
    // must survive the candidate cut (4 planes x 8 tables at the
    // corpus's 0.4-0.6 cosine regime)
    val recall = if (brute.isEmpty) 1.0 else brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall over ${brute.size} brute pairs")
    assert(lsh.nonEmpty)
  }

  test("knnHubnessIvf: census totals conserved; shortlist lists overlap brute") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    val hist = Similarity.knnHubnessIvf(emb, k = 5, step = 10, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every vector appears exactly once in the histogram (antihubs too)
    assert(hist.map(_._2).sum === n, hist.toSeq.toString)
    // occurrence mass = the ranked-pair count = ivfTopK's pair count
    val pairs = Similarity.ivfTopK(emb, step = 10, nProbe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(hist.map { case (nk, nv) => nk * nv }.sum === pairs.size.toLong)
    // and those lists are a real approximation of the brute lists
    val brute = Similarity.bruteForceTopK(emb, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(pairs).size.toDouble / brute.size
    assert(recall > 0.2, s"recall $recall")
  }

  test("pqCodeRelation: m codes per vector, all within the stride codebook") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.pqCodeRelation(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = emb.count()
    val nBooks = emb.where(col("vec_id") % 50 === 0).count().min(48)
    assert(codes.length === 16 * n, s"${codes.length} rows for $n vectors")
    assert(codes.forall { case (_, j, c) => j >= 0 && j < 16 && c >= 0 && c < nBooks })
    // each codebook vector encodes to ITSELF in every subspace (its
    // distance is exactly -|c|^2, the unique minimum at that centroid)
    val strideIds = emb.where(col("vec_id") % 50 === 0).orderBy("vec_id")
      .collect().map(_.getLong(0)).take(48).zipWithIndex.toMap
    val self = codes.filter { case (v, _, _) => strideIds.contains(v) }
    assert(self.forall { case (v, _, c) => c === strideIds(v).toLong },
      "a codebook vector failed to encode to its own code")
  }

  test("jlProject: k components, deterministic geometry, unbiased distance estimate on the real fixture") {
    val e = graft.sources.Tables(spark, "/root/testdata/sf0.001").embeddings
    val pr = Similarity.jlProject(e, k = 16)
    val first = pr.orderBy("vec_id").limit(1).collect()(0)
    assert(first.getSeq[Double](1).size === 16)
    // same input → identical projections (plan-build-time plane constants)
    val again = Similarity.jlProject(e.repartition(8), k = 16)
      .orderBy("vec_id").limit(1).collect()(0)
    assert(first.getSeq[Double](1) === again.getSeq[Double](1))
    // JL estimate: mean of (3/k)·|proj diff|² / |diff|² over the
    // adjacent-pair population sits near 1 (k=16 → sd of the MEAN over
    // ~250 pairs is a few percent; band is generous)
    val dots = e.join(pr, "vec_id")
    val a = dots.where(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id_a"), col("embedding").as("ea"), col("proj").as("pa"))
    val b = dots.where(col("vec_id") % 2 === 1)
      .select((col("vec_id") - 1).as("id_a"), col("embedding").as("eb"), col("proj").as("pb"))
    val d2o = vec_dot(col("ea"), col("ea")) + vec_dot(col("eb"), col("eb")) -
      lit(2) * vec_dot(col("ea"), col("eb"))
    val d2p = (1 to 16).map { j =>
      val df = element_at(col("pa"), j) - element_at(col("pb"), j); df * df
    }.reduce(_ + _)
    val mean = a.join(b, "id_a")
      .select((d2p * 3 / 16 / d2o).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean")
  }

  test("strideCentroids cap: the IVF cell count is kCent-bounded however large the corpus") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // 500 dense vec_ids at step 10 would be 50 uncapped cells; kCent = 4
    // must bound the geometry to the stride points inside [0, 40)
    val cells = Similarity.ivfProbeCells(emb, step = 10, nProbe = 3, kCent = 4)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(Set(0L, 10L, 20L, 30L)), cells.toString)
    assert(cells.size === 4)
    // the ranked answer stays complete under the cap: every vector still
    // probes nProbe distinct capped cells
    val probed = Similarity.ivfProbeCells(emb, step = 10, nProbe = 3, kCent = 4).collect()
    assert(probed.length === 3 * emb.count())
    // and ivfTopK's census mass is conserved on the same capped geometry
    val pairs = Similarity.ivfTopK(emb, step = 10, nProbe = 3, k = 5, kCent = 4)
    assert(pairs.groupBy("q_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("rankTopK finish: GroupedTopK heap equals the window formulation on a real ranker") {
    import graft.functions.VectorFunctions.vec_norm
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val viaOp = Similarity.lshTopK(emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // independent window-rank replication of lshTopK's candidate chain
    // — identical double arithmetic, so exact set equality is required
    val b = Similarity.lshBuckets(emb, nPlanes = 8) // lshTopK's own plane count
      .withColumn("nrm", vec_norm(col("embedding")))
    val pairs = b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("c_id"),
        (vec_dot(col("x.embedding"), col("y.embedding")) / (col("x.nrm") * col("y.nrm"))).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(desc("sim"), asc("c_id"))
    val ref = pairs.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id"), round(col("sim"), 4).as("sim_r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaOp === ref)
  }

  test("hashRankedCentroids: the IVF×PQ coarse set is kCoarse-bounded, hash-ranked, and a no-op at fixture scale") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // small cap: selection must be the k stride points with the
    // SMALLEST xxhash64(vec_id) — checked against a Scala-side sort of
    // the hashes (independent of the TakeOrderedAndProject plan)
    val idx = Similarity.ivfPqBuild(emb, coarseStep = 10, kCoarse = 7)
    val got = idx.coarseCents.collect().map(_.getLong(0)).toSet
    val ref = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), xxhash64(col("vec_id")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted.take(7).map(_._2).toSet
    assert(got === ref)
    assert(got.size === 7)
    // hash ranking spans the WHOLE id space: a drifted batch appended
    // at high ids stays eligible to seed rebuild centroids (the
    // ivfPqMaintain mode-absorption contract an id-window cap breaks)
    val core = emb.select(col("vec_id"), col("embedding"))
    val shifted = core.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val both = Similarity.ivfPqBuild(core.unionAll(shifted), coarseStep = 10, kCoarse = 40)
      .coarseCents.collect().map(_.getLong(0))
    assert(both.exists(_ >= 1000000L), "high-id vectors never become centroids")
    assert(both.length === 40)
    // and the DEFAULT cap is a provable no-op at fixture scale — the
    // regime under which the DuckDB twins replay the plain stride rule
    val full = Similarity.ivfPqBuild(emb)
    assert(full.coarseCents.count() === emb.where(col("vec_id") % 10 === 0).count())
  }

  test("coarseAssign probe pick: GroupedTopK shortlist equals the window formulation exactly") {
    import graft.functions.VectorFunctions.vec_norm
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.ivfProbeCells(emb, step = 10, nProbe = 3, kCent = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent reference: the same capped geometry through the
    // window formulation GroupedTopK replaces — identical double
    // arithmetic (vec_dot / vec_norm), so the sets must match exactly
    val cents = emb.where(col("vec_id") % 10 === 0 && col("vec_id") < 40)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      .orderBy(desc("cent_sim"), asc("cent_id"))
    val ref = emb.crossJoin(cents)
      .select(col("vec_id"), col("cent_id"),
        (vec_dot(col("embedding"), col("cent_emb")) /
          (vec_norm(col("embedding")) * vec_norm(col("cent_emb")))).as("cent_sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1))).toSet
    assert(got === ref)
  }

  test("ivfProbeCells: nProbe ranked centroid cells per vector, rank 1 = home cell") {
    val emb = TestSpark.spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cells = Similarity.ivfProbeCells(emb, step = 10, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = emb.count()
    assert(cells.length === 3 * n, s"${cells.length} rows for $n vectors")
    val byVec = cells.groupBy(_._1)
    assert(byVec.values.forall { rows =>
      rows.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L) && // ranks are 1..nProbe
        rows.map(_._3).distinct.length == 3 &&          // probes are distinct cells
        rows.forall(_._3 % 10 == 0)                     // cells are stride centroids
    })
  }
}
