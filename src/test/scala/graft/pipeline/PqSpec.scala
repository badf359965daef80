package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: the q83 oracle pins the seed-codebook dataflow
  * bit-for-bit; these specs cover what the oracle can't — the
  * Lloyd-trained codebooks and the fused ADC expression on them.
  */
class PqSpec extends SparkSpec {

  private val (m, ksub, dim, k) = (4, 8, 64, 5)

  private def emb = graft.queries.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  /** Total squared reconstruction error sum(|x - x̂|²) for a codebook —
    * integer-exact: |x|² - 2·dot(x, x̂) + |x̂|², summed per subspace
    * (subvectors partition the vector, so per-subspace terms add up). */
  private def reconstructionError(cb: DataFrame): Long = {
    val codes = Similarity.pqEncode(emb, cb, m, dim)
      .select(col("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("cid"))
    val subs = emb
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qe"))
      .select(col("vec_id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("s"), slice(col("qe"), s * (dim / m) + 1, dim / m).as("sv"))
      }: _*)).as("p"))
      .select(col("vec_id"), col("p.s").as("s"), col("p.sv").as("sv"))
    subs.join(codes, Seq("vec_id", "s")).join(broadcast(cb), Seq("s", "cid"))
      .select((graft.expressions.functions.dot_long(col("sv"), col("sv"))
        - lit(2) * graft.expressions.functions.dot_long(col("sv"), col("cv"))
        + graft.expressions.functions.dot_long(col("cv"), col("cv"))).as("e"))
      .agg(sum(col("e"))).head.getLong(0)
  }

  test("trained codebooks reconstruct no worse than the seeds, deterministically") {
    val seedCb = Similarity.pqCodebookSeed(emb, m, ksub, dim)
    val trained = Similarity.pqTrain(emb, m, ksub, dim, iters = 2)
    val trained2 = Similarity.pqTrain(emb, m, ksub, dim, iters = 2)
    val t1 = trained.orderBy("s", "cid").collect().map(_.toString).toSeq
    assert(t1 == trained2.orderBy("s", "cid").collect().map(_.toString).toSeq,
      "pqTrain is not deterministic")
    val (es, et) = (reconstructionError(seedCb), reconstructionError(trained))
    assert(et <= es, s"Lloyd training raised reconstruction error: $et > $es")
    assert(et < es, s"training changed nothing (suspicious on real data): $et == $es")
  }

  test("fused ADC score == dot(q, reconstruction), trained codebooks") {
    val cb = Similarity.pqTrain(emb, m, ksub, dim, iters = 1)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val enc = Similarity.pqEncode(emb, cb, m, dim)
    val got = Similarity.pqTopKDot(queries, enc, cb, m, ksub, dim, k)
      .select("q_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // recompute each returned score as an explicit join-sum over the
    // chosen centroids (the q83 oracle shape, but in Spark on the
    // TRAINED codebook)
    val codes = enc.select(col("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("cid"))
    val qsubs = queries
      .select(col("q_id"), Similarity.quantize(col("embedding")).as("qe"))
      .select(col("q_id"), explode(array((0 until m).map { s =>
        struct(lit(s).as("s"), slice(col("qe"), s * (dim / m) + 1, dim / m).as("sv"))
      }: _*)).as("p"))
      .select(col("q_id"), col("p.s").as("s"), col("p.sv").as("sv"))
    val expected = codes.join(broadcast(cb), Seq("s", "cid"))
      .join(broadcast(qsubs), "s")
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(graft.expressions.functions.dot_long(col("sv"), col("cv"))).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (key, s) =>
      assert(expected(key) == s, s"ADC score mismatch for $key: $s vs ${expected(key)}")
    }
  }

  test("residual coupling (IVFADC) approximates exact dots strictly better than raw PQ") {
    // Residual coupling presumes the coarse quantizer actually reduces
    // energy (|x − c| < |x|). The driver's embeddings fixture is
    // near-isotropic (measured: avg |residual|² 1.7× avg |raw|² under a
    // 4-centroid quantizer — no structure for a 4-list IVF to exploit),
    // so — like the DedupSpec recall tests — this spec PLANTS the
    // structure the operator exists for: 4 orthogonal cluster centers
    // plus a 1-D detail component t·u with t varying per member. Raw
    // PQ's 4 codewords are spent saying "which center" and the detail is
    // invisible; coupled PQ's coarse term handles the center exactly and
    // its 4 codewords quantize the detail line. The deterministic,
    // tie-robust measure of that advantage is ADC approximation error —
    // Σ|score − exact_dot| over ALL query×candidate pairs (k = corpus,
    // nProbe = nList, so both variants score every pair) — which
    // coupling must strictly reduce.
    val (nList, ks) = (4, 4)
    val n = 400
    import spark.implicits._
    // orthogonal centers: c_g lives on dims i ≡ g (mod 4)
    def center(g: Int, i: Int): Double = if (i % 4 == g) 1.0 else 0.0
    // shared detail direction, nonlinear per-id magnitude in [-0.5, 0.5)
    def u(i: Int): Double = if ((i * 7) % 3 == 0) 0.15 else -0.15
    def t(id: Int): Double = ((7 * id * id + 13 * id) % 100) / 100.0 - 0.5
    val clustered = (0 until n).map { id =>
      (id.toLong, Array.tabulate(dim)(i => (center(id % 4, i) + t(id) * u(i)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = clustered.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val q = queries.select(col("q_id"), Similarity.quantize(col("embedding")).as("qe"))
    val c = clustered.select(col("vec_id"), Similarity.quantize(col("embedding")).as("ce"))
    val exact = c.join(broadcast(q), lit(true))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.functions.dot_long(col("qe"), col("ce")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def totalErr(scored: org.apache.spark.sql.DataFrame): (Long, Int) = {
      val rows = scored.select("q_id", "vec_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      (rows.map { case (key, s) => math.abs(s - exact(key)) }.sum, rows.length)
    }
    val rawCb = Similarity.pqCodebookSeed(clustered, m, ks, dim)
    val (rawErr, rawN) = totalErr(Similarity.pqTopKDot(
      queries, Similarity.pqEncode(clustered, rawCb, m, dim), rawCb, m, ks, dim, k = n))
    val (resErr, resN) = totalErr(Similarity.ivfPqTopKDot(
      queries, clustered, nList, m, ks, dim, k = n, nProbe = nList))
    assert(rawN == resN && rawN == exact.size,
      s"variants scored different pair sets: raw=$rawN residual=$resN exact=${exact.size}")
    assert(resErr < rawErr,
      s"residual coupling did not improve ADC fidelity: $resErr >= $rawErr")
    assert(resErr * 2 <= rawErr, // the planted structure should be decisive
      s"residual improvement implausibly small: $resErr vs $rawErr")
    // trainIters=1 runs the integer-exact Lloyd step (q106's convention)
    // on the RESIDUAL codebook: k-means on the planted 1-D detail line
    // must place quantization levels no worse than the 4 arbitrary seed
    // residuals — and strictly better on this fixture.
    val (trainedErr, trainedN) = totalErr(Similarity.ivfPqTopKDot(
      queries, clustered, nList, m, ks, dim, k = n, nProbe = nList, trainIters = 1))
    assert(trainedN == resN, s"trained variant scored a different pair set: $trainedN")
    assert(trainedErr < resErr,
      s"Lloyd step on residuals did not tighten ADC fidelity: $trainedErr >= $resErr")
  }

  test("integer-exact Lloyd iteration reconstructs no worse than the seeds") {
    // pqTrainIterExact is the oracle-pinnable single-step twin of
    // pqTrain; the Lloyd property (assignment-then-mean never raises
    // total squared error vs the codebook it assigned against) must
    // hold for the integer round-half-up mean too, up to the +-0.5
    // per-component rounding — on real data the improvement dominates.
    val ks = 8
    val seedCb = Similarity.pqCodebookSeed(emb, m, ks, dim)
    val exact = Similarity.pqTrainIterExact(emb, m, ks, dim)
    val (es, ee) = (reconstructionError(seedCb), reconstructionError(exact))
    assert(ee <= es, s"exact Lloyd step raised reconstruction error: $ee > $es")
    assert(ee < es, s"exact Lloyd step changed nothing (suspicious on real data)")
    // and iteration keeps descending (up to ±0.5/component rounding)
    val e2 = reconstructionError(Similarity.pqTrainExact(emb, m, ks, dim, iters = 2))
    assert(e2 <= ee, s"second exact Lloyd step raised reconstruction error: $e2 > $ee")
  }

  test("PQ top-k recall against brute-force cosine is non-trivial") {
    val cb = Similarity.pqTrain(emb, m, ksub, dim, iters = 2)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val enc = Similarity.pqEncode(emb, cb, m, dim)
    val pq = Similarity.pqTopKDot(queries, enc, cb, m, ksub, dim, k)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopK(queries, emb, k)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.2, s"implausibly low PQ recall: $recall")
  }
}
