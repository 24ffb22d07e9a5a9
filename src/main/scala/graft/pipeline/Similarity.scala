package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline: brute-force cosine top-k — exact, one wide join, the
  * correctness oracle. Scale paths: random-hyperplane LSH bucketing and
  * IVF coarse quantization — candidates only meet inside a bucket, so
  * the join is bucket-partitioned instead of all-pairs. Candidate
  * generation shuffles ONLY ids+bucket keys; vectors are joined back in
  * exactly once for scoring (a 64-dim float array never rides through
  * the distinct).
  *
  * Ranking ties are broken on the 4-dp-rounded cosine + neighbor id, so
  * an independent engine (the DuckDB oracle) computing the same floating
  * point dot products reproduces ranks exactly.
  *
  * All vector math is native codegen expressions
  * ([[graft.functions.VectorFunctions]]) — no UDF, no driver-side state.
  */
object Similarity {

  import graft.functions.VectorFunctions.{vec_dot, vec_cosine}

  /** Σ aᵢ·bᵢ as double — native codegen expression (fused primitive loop;
    * the zip_with/aggregate composition costs one interpreted lambda call
    * per element and is ~40× slower on 64-dim pair joins). */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(a: Column): Column = sqrt(vec_dot(a, a))

  /** One-pass cosine similarity (dot and both norms fused into a single
    * loop), null for zero vectors — never a divide-by-zero. */
  def cosine(a: Column, b: Column): Column = vec_cosine(a, b)

  /** Cosine rounded to 4 dp — the cross-engine-stable ranking key (a
    * last-ulp difference can never flip a rank; id breaks rounded ties). */
  private def cosine4(a: Column, b: Column): Column = round(vec_cosine(a, b), 4)

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Exact top-k neighbors for each query row against the corpus
    * (brute force; both sides are (id, vec) frames). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .crossJoin(corpus.select(col("id").as("neighbor_id"), col("vec").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine4(col("qv"), col("nv")))
    rankTopK(joined, k)
  }

  /** Int8 scalar quantization of an embedding column — the memory-side
    * scale move for ANN at 100 TB (64-dim float32 → 64 bytes + one
    * scale, 4× smaller, SIMD-friendly integer dots downstream). Per
    * vector: scale = 127 / max|xᵢ| (a single IEEE division — identical
    * in any engine), qᵢ = floor(xᵢ·scale + 0.5) ∈ [-127, 127]. Emits
    * deterministic integer summaries (L1, squared L2) plus the scale
    * ×10⁹ — all exact, so an independent engine reproduces the rows
    * bit-for-bit. A narrow map stage: no shuffle, no UDF. Zero vectors
    * yield null scale/stats rather than a divide-by-zero. */
  def int8Quantize(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withMax = vecs.select(col(idCol).as("id"),
      col(vecCol).as("v"),
      array_max(transform(col(vecCol), x => abs(x.cast("double")))).as("m"))
    val scale = lit(127.0) / when(col("m") =!= 0.0, col("m"))
    // two-step select: `q` references the materialized scale column, not
    // the array_max expression (lambda CSE cannot hoist, see TextAnalysis)
    val withQ = withMax.withColumn("scale", scale)
      .withColumn("q", transform(col("v"),
        x => floor(x.cast("double") * col("scale") + 0.5).cast("long")))
    withQ.select(col("id"),
      floor(col("scale") * 1e9 + 0.5).cast("long").as("scale_e9"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x * x).as("q_l2sq"))
  }

  /** Deterministic random hyperplanes (seeded), as literal array columns —
    * shipped to executors as constants, no RNG on workers. Exposed to
    * [[graft.SparkEntry]] so the DuckDB oracle embeds the SAME literal
    * planes and reproduces bucket ids exactly. */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The planes of each LSH table: table t uses `bits` planes seeded
    * `seed + t*7919`. */
  private[graft] def tablePlanes(tables: Int, bits: Int, dim: Int,
      seed: Long): Seq[(Int, Seq[Array[Double]])] =
    (0 until tables).map(t => t -> hyperplanes(bits, dim, seed + t * 7919L))

  /** Sign-LSH bucket id: one bit per hyperplane (same-bucket vectors are
    * near-duplicate candidates). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    bucketOf(vec, hyperplanes(nPlanes, dim, seed))

  private def bucketOf(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Pinned partition count for candidate fan-out stages. A bucket join
    * multiplies rows AFTER the shuffle, so AQE — which coalesces on
    * pre-join input bytes — would collapse the tiny exploded-key frame to
    * one partition and serialize the whole fan-out on one core. Pinning
    * to the session's shuffle parallelism keeps the multiply distributed
    * regardless of the input's file layout. */
  private def fanoutParallelism(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Multi-table bucket assignment: `tables` independent sign-LSH hashes
    * of `bits` hyperplanes each, flattened to ONE long key
    * (`tbl << bits | bkt` — long-keyed hash joins beat struct keys). A
    * row lands in one bucket per table; two rows are candidates when ANY
    * table agrees — the classic recall/cost dial (recall ≈
    * 1−(1−p^bits)^tables for per-plane agreement p = 1−θ/π). Returns
    * (idAs, key) — ids only; vectors are joined back at scoring time. */
  private def bucketed(df: DataFrame, idAs: String,
      tables: Int, bits: Int, dim: Int, seed: Long): DataFrame = {
    // one fused native expression for ALL table keys — the composed
    // per-plane Column tree costs tables×bits planning/codegen per query
    // (dominant at the selective 24×8 setting)
    val planes = tablePlanes(tables, bits, dim, seed).flatMap(_._2)
    df.select(col("id").as(idAs),
      explode(graft.functions.VectorFunctions.sign_lsh_keys(
        col("vec"), planes, bits)).as("key"))
  }

  /** ANN top-k via multi-table sign-LSH: candidates are pairs sharing at
    * least one (table, bucket); exact cosine ranks the candidates.
    * Approximate — recall vs brute force measured in PipelineSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int, bits: Int, dim: Int, seed: Long = 42L): DataFrame = {
    // repartition by bucket key: full parallelism on the candidate
    // fan-out even off a single-file corpus, skew split at scale
    val cb = bucketed(corpus, "neighbor_id", tables, bits, dim, seed)
      .repartition(fanoutParallelism(corpus), col("key"))
    val qb = bucketed(queries, "query_id", tables, bits, dim, seed)
    // a pair can collide in several tables — dedup on (ids) BEFORE the
    // vectors are fetched, so only 8-byte ids ride the wide shuffle
    val cand = qb.join(cb, "key")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cand
      .join(queries.select(col("id").as("query_id"), col("vec").as("qv")), "query_id")
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("nv")), "neighbor_id")
      .withColumn("cosine", cosine4(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  /** Spherical k-means over a deterministic id-ordered corpus sample, run
    * on the driver (the sample is bounded; at 100 TB you fit on ~100k
    * sampled rows and the ASSIGNMENT stays fully distributed — the
    * centroids are broadcast literals either way).
    *
    * Spherical (assign by max cosine, centroid = normalized mean of unit
    * vectors) rather than Lloyd/L2, because IVF assignment and the final
    * ranking are both cosine — an L2 fit over unnormalized vectors
    * fragments direction space and costs recall. Deterministic:
    * farthest-point init from the first sample vector, fixed iteration
    * count, empty clusters keep their centroid. Returned centroids are
    * unit-norm, so max-dot assignment == max-cosine assignment. */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 15,
      maxSample: Int = 4096): Array[Array[Double]] = {
    val raw: Array[Array[Double]] = corpus.orderBy(col("id")).limit(maxSample)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(raw.length >= nlist, s"need >= $nlist sample vectors")
    val dim = raw.head.length
    def normalize(a: Array[Double]): Array[Double] = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * a(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) a.clone() else a.map(_ / n)
    }
    val sample = raw.map(normalize)
    def dotv(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    // farthest-point init (deterministic k-means++ analog) in angle space
    val cents = scala.collection.mutable.ArrayBuffer(sample(0).clone())
    while (cents.length < nlist) {
      var best = -1; var bestSim = Double.MaxValue
      var i = 0
      while (i < sample.length) {
        var nearest = -1.0
        cents.foreach(c => nearest = math.max(nearest, dotv(sample(i), c)))
        if (nearest < bestSim) { bestSim = nearest; best = i }
        i += 1
      }
      cents += sample(best).clone()
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      var i = 0
      while (i < sample.length) {
        var bc = 0; var bd = Double.MinValue; var c = 0
        while (c < nlist) {
          val d = dotv(sample(i), cents(c)); if (d > bd) { bd = d; bc = c }; c += 1
        }
        counts(bc) += 1
        var j = 0
        while (j < dim) { sums(bc)(j) += sample(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < nlist) {
        if (counts(c) > 0) cents(c) = normalize(sums(c))
        c += 1
      }
      it += 1
    }
    cents.toArray
  }

  /** The enforced 100 TB contract for IVF blocking: when a caller
    * leaves `nlist = 0` (the new default on every IVF entry point), it
    * is derived from the corpus as ≈√n, clamped to [16, 65536]. √n
    * balances the two costs that bound an IVF pass — brute-force coarse
    * assignment (n·nlist·dim flops) against same-cell candidate volume
    * (Σ|cell|² ≈ n²·r²/nlist) — at n^1.5 each; a PINNED nlist leaves
    * candidates quadratic the moment the corpus outgrows the config,
    * which is how a 16-cell default would melt at 10⁹ vectors. Callers
    * may still pin nlist (the oracle batteries do, with literal
    * centroids); the contract is that leaving it unset is SAFE at any
    * scale, the same stance as [[graft.plans.RangeJoinRewrite]]'s auto
    * bin width and the reference LSM sizing its levels from data
    * (`levels/levels.go`), not config. */
  def autoNlist(n: Long): Int =
    math.max(16L, math.min(65536L, math.round(math.sqrt(n.toDouble)))).toInt

  /** `nlist` deterministic unit-norm centroids sampled by hash order:
    * rows ranked by xxhash64(id) (uniform in hash space ⇒ a uniform,
    * reproducible corpus sample — no RNG, no collect of the corpus),
    * then normalized. The auto-nlist coarse quantizer past the k-means
    * budget: cell BLOCKING needs cells that partition direction space
    * roughly evenly, not optimal ones, and a sampled coarse quantizer
    * is the standard large-nlist fallback — while the driver k-means
    * fit's farthest-point init is O(sample·nlist²·dim), unaffordable
    * past ~10² cells. TakeOrdered collects exactly nlist vectors. */
  def sampledCentroids(corpus: DataFrame, nlist: Int): Array[Array[Double]] = {
    val rows = corpus.orderBy(xxhash64(col("id")), col("id")).limit(nlist)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.nonEmpty, "sampledCentroids: empty corpus")
    rows.map { a =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) a else a.map(_ / n)
    }
  }

  /** Centroids for an auto-resolved `nlist`: spherical k-means while the
    * quadratic init is affordable, sampled coarse quantizer beyond. */
  def autoCentroids(corpus: DataFrame, nlist: Int): Array[Array[Double]] =
    if (nlist <= 64) kmeansCentroids(corpus, nlist)
    else sampledCentroids(corpus, nlist)

  /** Resolve an entry point's `nlist`/`centroids` pair: explicit
    * centroids win; an explicit positive nlist keeps the k-means quality
    * default; `nlist = 0` derives [[autoNlist]] from one bounded count
    * and fits [[autoCentroids]]. */
  private def resolveCentroids(vecs: DataFrame, nlist: Int,
      centroids: Option[Array[Array[Double]]]): Array[Array[Double]] =
    centroids.getOrElse {
      if (nlist > 0) kmeansCentroids(vecs, nlist)
      else autoCentroids(vecs, autoNlist(vecs.count()))
    }

  /** The first `nlist` corpus vectors by id — a deterministic,
    * data-dependent-but-order-insensitive centroid choice that an
    * independent SQL engine can reproduce exactly (used by the oracled
    * battery entry; [[kmeansCentroids]] is the quality default). */
  def firstNCentroids(corpus: DataFrame, nlist: Int): Array[Array[Double]] =
    corpus.orderBy(col("id")).limit(nlist).select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** IVF (inverted-file) ANN: corpus is bucketed by nearest centroid(s),
    * queries probe their `nprobe` nearest centroid lists, exact cosine
    * ranks the candidates — the coarse-quantizer half of FAISS-style IVF
    * (no product quantization; vectors stay exact).
    *
    * `centroids` defaults to a seeded driver-side spherical k-means fit
    * ([[kmeansCentroids]]); pass [[firstNCentroids]] for the
    * oracle-reproducible variant. `replicate` indexes each corpus vector
    * under its top-r cells (r× index size for a large recall boost near
    * cell boundaries — the standard multi-assignment dial; r=1 is the
    * classic single-cell IVF). Assignment is a narrow map stage against
    * broadcast literal centroids; the candidate join is hash-partitioned
    * by centroid id, scanning ~(replicate·nprobe/nlist) of the corpus per
    * query, and only ids travel through the candidate dedup. */
  /** Per-row array of the `n` nearest centroid cell ids (max dot,
    * ties → lowest cid) — the fused [[graft.functions.IvfAssign]]
    * native: centroids ride as ONE reference object, so nlist in the
    * thousands costs FLOPs, not expression nodes (the earlier
    * literal-struct `array_sort` form cost nlist×dim `lit()` nodes to
    * plan and codegen, capping practical nlist near 10² — exactly the
    * wall the auto-nlist contract has to climb past). Assignment is
    * bit-identical to the literal form: same sequential dot
    * accumulation, same (dot desc, cid asc) order. */
  private def nearestCells(cents: Array[(Int, Array[Double])])(
      vec: Column, n: Int): Column =
    graft.functions.VectorFunctions.ivf_assign(vec,
      cents.sortBy(_._1).map(_._2), n) // row i == cid i, IvfAssign returns indices

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int, nprobe: Int,
      centroids: Option[Array[Array[Double]]] = None,
      replicate: Int = 2): DataFrame = {
    val cents: Array[(Int, Array[Double])] =
      resolveCentroids(corpus, nlist, centroids).zipWithIndex.map(_.swap)
    require(nprobe <= cents.length && replicate >= 1 && replicate <= cents.length)
    val nearest = nearestCells(cents) _
    val cb = corpus.select(col("id").as("neighbor_id"),
      explode(nearest(col("vec"), replicate)).as("cid"))
      .repartition(fanoutParallelism(corpus), col("cid")) // parallel fan-out off any layout
    val qb = queries.select(col("id").as("query_id"),
      explode(nearest(col("vec"), nprobe)).as("cid"))
    // a pair can meet in several probed cells once replicate > 1 — dedup
    // on ids, then fetch vectors exactly once for scoring
    val cand = qb.join(cb, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val scored = cand
      .join(queries.select(col("id").as("query_id"), col("vec").as("qv")), "query_id")
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("nv")), "neighbor_id")
      .withColumn("cosine", cosine4(col("qv"), col("nv")))
    rankTopK(scored, k)
  }

  // ---- IVF-PQ: product-quantized ADC ranking under IVF blocking -------

  /** Deterministic per-subspace PQ codebooks from the first `ks` corpus
    * vectors by id — the oracle-reproducible analog of
    * [[firstNCentroids]] (an independent engine derives the SAME
    * codebooks from the same table). Returns codebooks(j)(c) = the j-th
    * `dim/m`-wide slice of the c-th vector. Production fits would train
    * per-subspace k-means instead; the transform/scoring machinery below
    * is identical either way. */
  def firstKsCodebooks(corpus: DataFrame, m: Int, ks: Int): Array[Array[Array[Double]]] =
    codebooksOfVecs(firstVecs(corpus, ks), m)

  /** The first `n` corpus vectors by id — ONE TakeOrdered collect. The
    * deterministic trainer seed shared by [[firstKsCodebooks]] and
    * [[firstNCentroids]]: a caller needing both (the PQ battery queries
    * pass ks == nlist) collects once instead of running the same
    * driver-side job twice (r18). */
  def firstVecs(corpus: DataFrame, n: Int): Array[Array[Double]] =
    corpus.orderBy(col("id")).limit(n).select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** [[firstKsCodebooks]] over an already-collected vector seed. */
  def codebooksOfVecs(vecs: Array[Array[Double]], m: Int): Array[Array[Array[Double]]] = {
    require(vecs.nonEmpty && vecs.head.length % m == 0,
      s"dim ${vecs.headOption.fold(0)(_.length)} not divisible by m=$m")
    val sub = vecs.head.length / m
    Array.tabulate(m)(j => vecs.map(_.slice(j * sub, (j + 1) * sub)))
  }

  /** Trained per-subspace PQ codebooks: plain Euclidean Lloyd iterations
    * over a driver-side sample's subvectors (farthest-point init, empty
    * cells keep their previous codeword) — L2 is PQ's actual
    * reconstruction objective, unlike the spherical [[kmeansCentroids]]
    * used for IVF cells. Deterministic for a given corpus: the sample is
    * the first `maxSample` vectors by id and every step is
    * order-insensitive arithmetic. The quality default;
    * [[firstKsCodebooks]] remains the oracle-reproducible pin. */
  def trainedCodebooks(corpus: DataFrame, m: Int, ks: Int, iters: Int = 15,
      maxSample: Int = 4096): Array[Array[Array[Double]]] = {
    val raw: Array[Array[Double]] = corpus.orderBy(col("id")).limit(maxSample)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(raw.length >= ks, s"need >= $ks sample vectors, got ${raw.length}")
    val dim = raw.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < sub) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    Array.tabulate(m) { j =>
      val pts = raw.map(_.slice(j * sub, (j + 1) * sub))
      val cents = scala.collection.mutable.ArrayBuffer(pts(0).clone())
      while (cents.length < ks) {
        var best = 0; var bestD = -1.0
        var i = 0
        while (i < pts.length) {
          var nearest = Double.MaxValue
          cents.foreach(c => nearest = math.min(nearest, d2(pts(i), c)))
          if (nearest > bestD) { bestD = nearest; best = i }
          i += 1
        }
        cents += pts(best).clone()
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](sub))
        val counts = new Array[Long](ks)
        var i = 0
        while (i < pts.length) {
          var bc = 0; var bd = Double.MaxValue; var c = 0
          while (c < ks) {
            val d = d2(pts(i), cents(c)); if (d < bd) { bd = d; bc = c }; c += 1
          }
          counts(bc) += 1
          var k = 0
          while (k < sub) { sums(bc)(k) += pts(i)(k); k += 1 }
          i += 1
        }
        var c = 0
        while (c < ks) {
          if (counts(c) > 0) {
            var k = 0
            while (k < sub) { cents(c)(k) = sums(c)(k) / counts(c); k += 1 }
          }
          c += 1
        }
        it += 1
      }
      cents.toArray.map(_.clone())
    }
  }

  /** codes(j) = argmin_c ‖vec[j·sub,(j+1)·sub) − codebook(j)(c)‖²,
    * squared L2 expanded as x·x − 2·x·c + c·c (the same three-dot
    * formula, in the same IEEE order, the oracle uses — so the doubles,
    * and any argmin tie broken on code asc, are bit-identical
    * cross-engine). Fused native expression ([[graft.functions.PqCodes]])
    * — the compositional m×ks literal-array Column tree costs a
    * planning/codegen floor per query, the same disease `SignLshKeys`
    * cured for the LSH keys. */
  private def pqCodes(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.VectorFunctions.pq_codes(vec, codebooks)

  /** PQ-encode a corpus: (id, codes array<int>) — m bytes of payload per
    * vector instead of dim floats, the 100 TB memory move (64-dim f32 →
    * 8 codes is 32×). */
  def pqEncode(corpus: DataFrame, m: Int, ks: Int,
      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val cb = codebooks.getOrElse(firstKsCodebooks(corpus, m, ks))
    corpus.select(col("id"), pqCodes(col("vec"), cb).as("codes"))
  }

  /** IVF-PQ top-k: IVF cells block the candidate set (same coarse
    * quantizer as [[ivfTopK]]), then ASYMMETRIC DISTANCE COMPUTATION
    * ranks candidates — each query precomputes an m×ks table of
    * subspace dot products once (a narrow projection), and scoring a
    * candidate is m table lookups over its codes, never touching the
    * corpus vector. Candidates therefore ride the shuffle as m 1-byte
    * codes; the full-precision corpus is read exactly once (encode) —
    * the FAISS IVFADC layout (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", PAMI'11) re-expressed as dataframe ops.
    *
    * Scores are integer e4 partials: per subspace,
    * ⌊dot·10⁴+0.5⌋ as a long, summed over subspaces. Integer summation
    * is order-free, so the score — and the (adc_e4 desc, neighbor_id)
    * ranking — is deterministic under ANY parallelism and reproducible
    * by an independent engine; at 1e-4 resolution the quantization is
    * far below PQ's own approximation error. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int, ks: Int, nlist: Int, nprobe: Int,
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      centroids: Option[Array[Array[Double]]] = None,
      replicate: Int = 1): DataFrame = {
    require(nprobe <= nlist && replicate >= 1 && replicate <= nlist)
    val cb = codebooks.getOrElse(firstKsCodebooks(corpus, m, ks))
    val cents: Array[(Int, Array[Double])] =
      centroids.getOrElse(kmeansCentroids(corpus, nlist)).zipWithIndex.map(_.swap)
    // corpus: one narrow pass emits (cell, codes) — the stored index
    val enc = pqCells(corpus, cb, cents, replicate)
      .repartition(fanoutParallelism(corpus), col("cid"))
    pqAdcRank(queries, enc, cb, cents, k, nprobe)
  }

  /** Two-stage retrieval with exact refinement (the FAISS
    * `IndexRefineFlat` pattern): the compressed IVF-PQ index shortlists
    * `refine`·k candidates per query by ADC, then ONLY the shortlist
    * joins back to the full-precision vectors for an exact cosine
    * re-rank. This removes PQ quantization error from the FINAL
    * ordering while keeping the scan economics of the compressed index:
    * the exact pass touches |queries|·refine·k rows — never the corpus
    * — so at 100 TB the full-precision vectors are read through an
    * id-equality join (broadcast of shortlist ids against the vector
    * table), not a scan of every embedding. Ranking uses the same
    * 4-dp-rounded cosine + neighbor-id tie-break as [[bruteTopK]], so
    * an independent engine reproduces ranks exactly. */
  def pqTopKRefined(queries: DataFrame, corpus: DataFrame, k: Int,
      refine: Int, m: Int, ks: Int, nlist: Int, nprobe: Int,
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      centroids: Option[Array[Array[Double]]] = None,
      replicate: Int = 1): DataFrame = {
    require(refine >= 1, s"refine factor $refine must be >= 1")
    val shortlist = pqTopK(queries, corpus, k * refine, m, ks, nlist, nprobe,
        codebooks, centroids, replicate)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = shortlist
      .join(queries.select(col("id").as("query_id"), col("vec").as("qv")),
        "query_id")
      .join(corpus.select(col("id").as("neighbor_id"), col("vec").as("nv")),
        "neighbor_id")
      .withColumn("cosine", cosine4(col("qv"), col("nv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
    rankTopK(rescored, k)
  }

  /** (neighbor_id, cid, codes): the corpus side of the IVF-PQ index —
    * one narrow pass over the vectors. */
  private def pqCells(corpus: DataFrame, cb: Array[Array[Array[Double]]],
      cents: Array[(Int, Array[Double])], replicate: Int): DataFrame =
    corpus.select(col("id").as("neighbor_id"),
      explode(nearestCells(cents)(col("vec"), replicate)).as("cid"),
      pqCodes(col("vec"), cb).as("codes"))

  /** Probe + ADC-score + rank queries against an encoded cell frame. */
  private def pqAdcRank(queries: DataFrame, enc: DataFrame,
      cb: Array[Array[Array[Double]]], cents: Array[(Int, Array[Double])],
      k: Int, nprobe: Int): DataFrame = {
    // queries: probed cells + the ADC lookup table (m×ks e4 longs),
    // one fused native expression per row
    val adcTable = graft.functions.VectorFunctions.pq_adc_table(col("vec"), cb)
    val qb = queries.select(col("id").as("query_id"),
      explode(nearestCells(cents)(col("vec"), nprobe)).as("cid"), adcTable.as("adc"))
    val scored = qb.join(enc, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      // replicate>1 can surface a pair in several probed cells; the
      // score is identical in each, so dedup AFTER scoring stays cheap
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("adc"), col("codes"),
            (t, c) => element_at(t, c + 1)),
          lit(0L), (acc, x) => acc + x).as("adc_e4"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_e4").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_e4"))
  }

  /** `_index.json` marker of a materialized ANN index: quantizer
    * geometry + the trained centroids/codebooks, so query batches need
    * NO access to the original vectors. */
  /** `distortion` is the mean ADC encode distortion (1 − cosine between
    * a vector and its code reconstruction) of a training-corpus sample,
    * recorded at build time — the baseline the drift gauge
    * [[annIndexDistortionRatio]] compares appends against. Defaults 0
    * so pre-r16 markers still read (their gauge reports a benign 1.0
    * via the ratio floor). */
  /** `skew` is the cell-size skew measured right after the build —
    * concentrated corpora are INHERENTLY skewed (k-means allocates few
    * angular cells to a tight cluster), so the drift gauge compares
    * against this baseline as a RATIO, exactly like `distortion`
    * (an absolute bound would re-trigger forever on such data — the
    * rebuild-churn mode `ProbeAnnDrift` exposed when the √n rebuild of
    * an orthant-concentrated corpus measured 22.8). Both default 0 for
    * pre-r16 markers (gauges then report benign ratios). */
  final case class AnnIndexMarker(m: Int, ks: Int, nlist: Int,
      replicate: Int, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      distortion: Double = 0.0,
      skew: Double = 0.0)

  /** Materialize the IVF-PQ index of a corpus: `cells/` parquet of
    * (neighbor_id, codes) PARTITIONED BY cid, plus `_index.json`
    * (centroids + codebooks). The 100 TB shape: the full-precision
    * corpus is read exactly once, ever; each stored row is m bytes of
    * codes; a query batch's probed cells become a partition-pruned scan
    * (nprobe/nlist of the index, the on-disk analog of FAISS's inverted
    * lists). Append increments by writing their [[pqCells]] rows under
    * the same root — cell assignment depends only on the frozen
    * quantizer, never on corpus membership, so incremental rows are
    * index-identical to a full rebuild (same contract as
    * [[graft.pipeline.Dedup.writeDedupIndex]]). */
  def writeAnnIndex(corpus: DataFrame, path: String,
      m: Int, ks: Int, nlist: Int,
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      centroids: Option[Array[Array[Double]]] = None,
      replicate: Int = 1): Unit = {
    val spark = corpus.sparkSession
    val fs = fsOf(spark, path)
    // versioned by default; a pre-r16 FLAT root (marker at the root, no
    // version dirs) keeps its layout and rebuilds in place
    val cur = currentVersion(spark, path)
    val flatLegacy = cur.isEmpty && fs.exists(markerPath(path))
    val target =
      if (flatLegacy) path else versionDir(path, cur.getOrElse(0) + 1)
    val cb = codebooks.getOrElse(firstKsCodebooks(corpus, m, ks))
    val cents: Array[(Int, Array[Double])] =
      centroids.getOrElse(kmeansCentroids(corpus, nlist)).zipWithIndex.map(_.swap)
    pqCells(corpus, cb, cents, replicate)
      .repartition(col("cid"))
      .write.partitionBy("cid").mode("overwrite").parquet(s"$target/cells")
    // build-time baselines for the drift gauges: both are RATIO
    // denominators (see AnnIndexMarker doc). Skew comes from the
    // parquet FOOTERS of the files just written — per-cell row counts
    // are metadata, and a Spark job here would ride inside every
    // index build (the battery's indexed query builds one per run)
    writeMarker(spark, target,
      AnnIndexMarker(m, ks, nlist, replicate, cents.map(_._2), cb,
        distortion = sampleAdcDistortion(corpus, cb),
        skew = footerCellSkew(spark, target)))
    // marker+cells complete under the version dir — now visible
    if (!flatLegacy) publishVersion(spark, path, cur.getOrElse(0) + 1)
  }

  /** Per-cell row counts from parquet FOOTER metadata (no Spark job,
    * no data read): one listing per `cid=` directory plus one footer
    * read per file — O(files) driver-side, used at build time where
    * the file set was just written and is small per cell. */
  private def footerCellSkew(spark: org.apache.spark.sql.SparkSession,
      dir: String): Double = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, dir)
    val cells = new Path(s"$dir/cells")
    if (!fs.exists(cells)) return 0.0
    val counts = fs.listStatus(cells).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cid="))
      .map { d =>
        fs.listStatus(d.getPath).toSeq
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(f, spark.sparkContext.hadoopConfiguration)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRecordCount finally r.close()
          }.sum
      }
    if (counts.isEmpty) 0.0
    else counts.max.toDouble / (counts.sum.toDouble / counts.length)
  }

  /** Mean ADC encode distortion (1 − cos(v, reconstruction(codes(v))))
    * of a hash-ordered sample — how much resolution the codebooks have
    * WHERE `df`'s vectors live. Driver-side over ≤ `maxSample` vectors
    * (same budget discipline as the quantizer trainers). */
  def sampleAdcDistortion(df: DataFrame, cb: Array[Array[Array[Double]]],
      maxSample: Int = 1024): Double = {
    val raw = df.orderBy(xxhash64(col("id")), col("id")).limit(maxSample)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    if (raw.isEmpty) return 0.0
    val m = cb.length
    val sub = raw.head.length / m
    val per = raw.map { v =>
      val rec = new Array[Double](v.length)
      var j = 0
      while (j < m) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cb(j).length) {
          var s = 0.0; var i = 0
          while (i < sub) {
            val d = v(j * sub + i) - cb(j)(c)(i); s += d * d; i += 1
          }
          if (s < bd) { bd = s; best = c }
          c += 1
        }
        System.arraycopy(cb(j)(best), 0, rec, j * sub, sub)
        j += 1
      }
      var dv = 0.0; var nv = 0.0; var nr = 0.0; var i = 0
      while (i < v.length) {
        dv += v(i) * rec(i); nv += v(i) * v(i); nr += rec(i) * rec(i)
        i += 1
      }
      val den = math.sqrt(nv) * math.sqrt(nr)
      if (den == 0.0) 1.0 else 1.0 - dv / den
    }
    per.sum / per.length
  }

  /** Drift gauge #2: the ADC distortion of `df` (typically an increment
    * about to be appended) relative to the marker's build-time training
    * distortion. ≈1 while new data lives where the quantizer was
    * trained; rises as the distribution moves somewhere the codebooks
    * cannot resolve — the failure mode CELL SKEW misses entirely
    * (`ProbeAnnDrift`: an orthant-folded increment kept skew at 3.2,
    * under the bound, while its recall@10 sat at the full-probe
    * ceiling — pure code error, distortion ratio >2). Markers from
    * before the distortion field read as baseline 0 → the max() floor
    * makes the gauge report a benign 1.0 rather than divide by zero. */
  def annIndexDistortionRatio(df: DataFrame, path: String): Double = {
    val mk = readMarker(df.sparkSession,
      resolveIndexDir(df.sparkSession, path))
    if (mk.distortion <= 0.0) 1.0
    else sampleAdcDistortion(df, mk.codebooks) / mk.distortion
  }

  /** Marker IO goes through the Hadoop FileSystem resolved from the
    * session (NOT java.nio): an index root on hdfs:// or s3a:// — the
    * deployment shape the cells writer already supports — must carry its
    * `_index.json` on the same filesystem as the parquet it describes. */
  private def markerPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_index.json")
  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMarker(spark: org.apache.spark.sql.SparkSession,
      path: String, mk: AnnIndexMarker): Unit = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val out = fsOf(spark, path).create(markerPath(path), true)
    try out.write(org.json4s.jackson.Serialization.write(mk).getBytes("UTF-8"))
    finally out.close()
  }

  private def readMarker(spark: org.apache.spark.sql.SparkSession,
      path: String): AnnIndexMarker = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val in = fsOf(spark, path).open(markerPath(path))
    try org.json4s.jackson.Serialization.read[AnnIndexMarker](
      new java.io.InputStreamReader(in, "UTF-8"))
    finally in.close()
  }

  // ---- versioned index root ------------------------------------------------
  //
  // A rebuild replaces marker AND cells; in one flat directory a reader
  // can pair the new marker with old cells (mixed geometries — wrong
  // answers, the r16 maintenance-window restriction). The root is
  // therefore VERSIONED: `<path>/v00001/{_index.json,cells}`, with an
  // advisory `_current` pointer — a rebuild writes the next version
  // COMPLETELY, then flips the pointer, so every reader resolves one
  // immutable marker+cells pair (the same files-before-manifest shape
  // as TxLog commits; Delta's versioned-table answer to the same race).
  // The PREVIOUS version survives one rebuild for in-flight readers
  // (TxLog keepCheckpoints discipline); older ones are GC'd at flip.
  // Pre-r16 flat roots (marker at `<path>/_index.json`, no pointer)
  // keep reading and rebuilding IN PLACE — their documented
  // maintenance-window contract is unchanged.

  private def currentPtr(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_current")
  private def versionDir(path: String, v: Int) = f"$path/v$v%05d"

  /** Live version number of a versioned root: the `_current` pointer
    * when valid, else the newest listed `v*` directory carrying a
    * marker (a torn/missing pointer costs a listing, never
    * correctness); None for flat/fresh roots. */
  private def currentVersion(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Int] = {
    val fs = fsOf(spark, path)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val fromPtr = scala.util.Try {
      val in = fs.open(currentPtr(path))
      try (org.json4s.jackson.JsonMethods.parse(
        new java.io.InputStreamReader(in, "UTF-8")) \ "version").extract[Int]
      finally in.close()
    }.toOption.filter(v => fs.exists(markerPath(versionDir(path, v))))
    fromPtr.orElse {
      scala.util.Try(fs.listStatus(new org.apache.hadoop.fs.Path(path)))
        .toOption.toSeq.flatten
        .map(_.getPath.getName)
        .filter(n => n.length == 6 && n.startsWith("v") &&
          n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toInt).sorted.reverseIterator
        .find(v => fs.exists(markerPath(versionDir(path, v))))
    }
  }

  /** Directory holding the index's LIVE marker+cells pair: the current
    * version dir of a versioned root, or the root itself for a pre-r16
    * flat layout. Public — operational tooling pins a version by
    * resolving once. */
  def resolveIndexDir(spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    currentVersion(spark, path).map(versionDir(path, _)).getOrElse(path)

  /** Flip `_current` to `v` and GC versions older than the one just
    * superseded (the previous version stays for in-flight readers). */
  private def publishVersion(spark: org.apache.spark.sql.SparkSession,
      path: String, v: Int): Unit = {
    val fs = fsOf(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/._current-${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"""{"version":$v}""".getBytes("UTF-8"))
    finally out.close()
    // rename-over is not universal on Hadoop filesystems: delete+rename,
    // with the listing fallback in currentVersion covering the window
    fs.delete(currentPtr(path), false)
    if (!fs.rename(tmp, currentPtr(path)))
      throw new java.io.IOException(s"cannot publish index version $v at $path")
    (1 until v - 1).foreach { old =>
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(path, old)), true)
    }
  }

  /** Append an increment to a materialized [[writeAnnIndex]]: encode the
    * new vectors under the index's FROZEN quantizer and append their
    * cell rows. Assignment depends only on the marker's centroids and
    * codebooks, never on corpus membership, so the grown index is
    * row-identical to a full rebuild over old ∪ new (spec-asserted) —
    * the 100 TB maintenance contract: daily increments cost one narrow
    * encode of the new data, the existing cells are never rewritten. */
  def appendAnnIndex(increment: DataFrame, path: String): Unit = {
    val dir = resolveIndexDir(increment.sparkSession, path)
    val mk = readMarker(increment.sparkSession, dir)
    pqCells(increment, mk.codebooks, mk.centroids.zipWithIndex.map(_.swap),
        mk.replicate)
      .repartition(col("cid"))
      .write.partitionBy("cid").mode("append").parquet(s"$dir/cells")
  }

  /** Fold the per-append file sets of a materialized index: every
    * [[appendAnnIndex]] leaves one more file set inside each touched
    * `cid=` partition, and daily increments at 100 TB accumulate small
    * files with nothing to merge them — the same pressure the engine's
    * level compaction answers for data files
    * (reference `engine2/compaction_manager.go:144-262`). One shuffled
    * rewrite repartitioned on `cid` lands each cell in exactly one task →
    * one file per partition; the rewrite stages to a sibling directory
    * and swaps via two renames, so a crash leaves either the old or the
    * new file set, never a mix (the marker — quantizer geometry — is
    * untouched: compaction moves rows, it never re-encodes). Row content
    * is exactly the pre-compaction index; [[pqTopKIndexed]] answers are
    * spec-asserted identical, file counts collapse to one per cell. */
  def compactAnnIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = resolveIndexDir(spark, path)
    val cells = s"$dir/cells"
    val staged = s"$dir/cells_compacting"
    val retired = s"$dir/cells_retired"
    val fs = fsOf(spark, path)
    // a crash between the two renames strands the cells under _retired;
    // restore before clearing leftovers (same recovery as the dedup index)
    graft.pipeline.Dedup.recoverStagedSwap(fs, new Path(cells))
    fs.delete(new Path(staged), true)
    fs.delete(new Path(retired), true)
    spark.read.parquet(cells)
      .repartition(col("cid"))
      .write.partitionBy("cid").mode("overwrite").parquet(staged)
    if (!fs.rename(new Path(cells), new Path(retired)))
      throw new java.io.IOException(s"compactAnnIndex: cannot retire $cells")
    if (!fs.rename(new Path(staged), new Path(cells))) {
      fs.rename(new Path(retired), new Path(cells)) // roll back
      throw new java.io.IOException(s"compactAnnIndex: cannot publish $staged")
    }
    fs.delete(new Path(retired), true)
  }

  /** Max-cell / mean-cell row-count skew of a materialized index — the
    * drift gauge for the frozen-quantizer append model: appends assign
    * new vectors to the EXISTING centroids, so a distribution shift
    * piles them into the few cells nearest the new mass. Skewed cells
    * hurt twice — probed-cell scans read more rows than nprobe/nlist
    * promises, and recall for shifted queries decays because their true
    * neighbors concentrate where the quantizer has no resolution
    * (measured: `ProbeAnnDrift`). Balanced ≈ 1; the documented rebuild
    * bound is [[DefaultAnnRebuildSkew]]. One groupBy over the code rows
    * — cheap next to any query batch. */
  def annIndexCellSkew(spark: org.apache.spark.sql.SparkSession,
      path: String): Double = {
    val counts = spark.read.parquet(s"${resolveIndexDir(spark, path)}/cells")
      .groupBy("cid").count().select("count").collect().map(_.getLong(0))
    if (counts.isEmpty) 0.0
    else counts.max.toDouble / (counts.sum.toDouble / counts.length)
  }

  /** Sampled ground-truth recall audit of a materialized index: take
    * `nQueries` hash-ordered sample vectors from `corpus`, answer them
    * through [[pqTopKIndexed]] AND through exact [[bruteTopK]] over the
    * same corpus, return mean recall@k. The reliable drift detector —
    * `ProbeAnnDrift` measured a drift mode (orthant-folded appends:
    * neighbor SEPARATION shrinks while absolute distortion doesn't)
    * that neither cell skew (3.2, under bound) nor the distortion
    * ratio (1.15) flags, while recall@10 for the shifted mass sat at
    * its full-probe ceiling. Cost is one narrow pass of the corpus'
    * vec column against `nQueries` broadcast queries — run it per
    * maintenance window, not per query batch (the FAISS-style index
    * health check, amortized like the engine's checkpointing). */
  def annIndexRecallAudit(corpus: DataFrame, path: String, k: Int,
      nprobe: Int, nQueries: Int = 32): Double = {
    val spark = corpus.sparkSession
    val qs = corpus.orderBy(xxhash64(col("id")), col("id")).limit(nQueries)
      .select("id", "vec").cache()
    try {
      def sets(df: DataFrame): Map[Long, Set[Long]] =
        df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long")).collect()
          .groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val ann = sets(pqTopKIndexed(spark, path, qs, k, nprobe))
      val exact = sets(bruteTopK(qs, corpus, k))
      val per = exact.map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
      if (per.isEmpty) 0.0 else per.sum / per.size
    } finally { qs.unpersist(); () }
  }

  /** Rebuild trigger for drifted indexes, three gauges in cost order
    * (all measured in `ProbeAnnDrift`, SCALE.md r16):
    *
    *  - CELL SKEW RATIO (current skew / build-time baseline from the
    *    marker, floored at 1) > `maxSkew` — one groupBy over code
    *    rows: appended mass concentrated into few cells means probed
    *    scans read more than nprobe/nlist promises and coarse routing
    *    loses resolution. A ratio, not an absolute: inherently
    *    concentrated corpora build skewed (k-means gives a tight
    *    cluster few angular cells) and an absolute bound would
    *    re-trigger forever;
    *  - ENCODE DISTORTION RATIO of the latest increment >
    *    `maxDistortionRatio` (driver-side sample; pass via
    *    `increment`): the codebooks cannot resolve where the new data
    *    lives relative to where they were trained;
    *  - RECALL AUDIT < `minRecall` (one corpus pass; opt-in): the
    *    ground truth, catching drift modes the cheap gauges miss —
    *    the probe's orthant fold held skew at 3.2 and distortion ratio
    *    at 1.15 while shifted-query recall@10 sat at 0.06, its
    *    full-probe ceiling (neighbor separation shrank, not absolute
    *    distortion).
    *
    * When any bound is crossed, RETRAIN the quantizer on the full
    * current corpus and rewrite the index (code geometry m/ks kept
    * from the marker; nlist re-derived as max(marker, ⌈√n⌉) per the
    * [[autoNlist]] contract — a drift rebuild is exactly when the
    * corpus has outgrown its cell count); otherwise a no-op. Like the engine's threshold compaction
    * this is the maintenance hook to drive from a scheduler (append →
    * cheap gauges per append, recall audit per window → maybe rebuild).
    * On a VERSIONED root (every root built since r16) the rebuild is
    * concurrent-reader-safe: the next version is written completely,
    * then the `_current` pointer flips, and in-flight readers keep the
    * previous version's immutable marker+cells pair. Only pre-r16 FLAT
    * roots rebuild in place and keep the maintenance-window contract.
    * Returns true when a rebuild ran. */
  val DefaultAnnRebuildSkew = 4.0
  val DefaultAnnRebuildDistortion = 2.0
  def maybeRebuildAnnIndex(corpus: DataFrame, path: String,
      maxSkew: Double = DefaultAnnRebuildSkew,
      increment: Option[DataFrame] = None,
      maxDistortionRatio: Double = DefaultAnnRebuildDistortion,
      minRecall: Option[Double] = None, auditK: Int = 10,
      auditNprobe: Int = 0): Boolean = {
    val spark = corpus.sparkSession
    lazy val mk = readMarker(spark, resolveIndexDir(spark, path))
    val drifted =
      annIndexCellSkew(spark, path) > maxSkew * math.max(1.0, mk.skew) ||
      increment.exists(annIndexDistortionRatio(_, path) > maxDistortionRatio) ||
      minRecall.exists(floor => annIndexRecallAudit(corpus, path, auditK,
        if (auditNprobe > 0) auditNprobe else math.max(1, mk.nlist / 4)) < floor)
    if (!drifted) false
    else {
      // re-derive nlist at rebuild time: a drift-triggered rebuild is
      // exactly the moment the corpus has outgrown its cell count, and
      // a frozen nlist contradicts the √n contract ([[autoNlist]] —
      // pinned cells leave per-cell volume quadratic once the corpus
      // outgrows the config). The marker's nlist is kept as a floor so
      // a deliberately over-provisioned index never shrinks. Code
      // geometry (m, ks) is a storage-format choice and stays.
      val nlist = math.max(mk.nlist, autoNlist(corpus.count()))
      val cents =
        if (nlist <= 128) kmeansCentroids(corpus, nlist)
        else sampledCentroids(corpus, nlist) // k-means init is O(nlist²)
      writeAnnIndex(corpus, path, mk.m, mk.ks, nlist,
        codebooks = Some(trainedCodebooks(corpus, mk.m, mk.ks)),
        centroids = Some(cents),
        replicate = mk.replicate)
      true
    }
  }

  /** Top-k against a materialized [[writeAnnIndex]] — identical ranks to
    * [[pqTopK]] with the same quantizer, but the corpus side is a
    * partition-pruned parquet scan of code rows: the probed cell ids are
    * collected (≤ |queries|·nprobe values, bounded by nlist) and pushed
    * as a static `cid` filter, so only nprobe/nlist of the index is
    * read. */
  def pqTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // resolve ONCE: marker and cells are read from the same immutable
    // version dir, so a concurrent rebuild's flip cannot mix geometries
    val dir = resolveIndexDir(spark, path)
    graft.pipeline.Dedup.recoverStagedSwap(fsOf(spark, dir),
      new org.apache.hadoop.fs.Path(s"$dir/cells"))
    val mk = readMarker(spark, dir)
    require(nprobe <= mk.nlist, s"nprobe $nprobe > nlist ${mk.nlist}")
    val cents = mk.centroids.zipWithIndex.map(_.swap)
    val probed = queries
      .select(explode(nearestCells(cents)(col("vec"), nprobe)).as("cid"))
      .distinct().collect().map(_.getInt(0)).sorted
    val enc = spark.read.parquet(s"$dir/cells")
      .filter(col("cid").isin(probed.map(Integer.valueOf).toSeq: _*))
    pqAdcRank(queries, enc, mk.codebooks, cents, k, nprobe)
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection),
    * exact baseline: block-nested cross join. Kept as the small-sf oracle
    * anchor; the battery/scale contract is [[cosinePairsBucketed]]. */
  def cosinePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), col("vec").as("va"))
    val b = vecs.select(col("id").as("id_b"), col("vec").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Near-dup pairs via multi-table sign-LSH candidates + exact cosine
    * verification — the scale path: the join is bucket-equality (hash),
    * never a cartesian product, and only ids travel through the candidate
    * distinct. With T tables of b bits, a pair at angle θ is missed with
    * probability (1−(1−θ/π)^b)^T — the defaults (b=2, T=24) push that
    * below 1e-5 at cosine 0.45, so at verification thresholds the result
    * matches the exact join (checked against [[cosinePairs]] in tests and
    * against the brute-force oracle in the driver battery).
    *
    * Plan shape, tuned on the executed plan: the bucket key is ONE long
    * (`tbl << bits | bkt` — a long-keyed HashedRelation beats a struct
    * key), and the exploded frame is hash-repartitioned by that key so
    * the candidate fan-out runs at full parallelism even when the input
    * is a single file/partition (also the skew split at scale). */
  def cosinePairsBucketed(vecs: DataFrame, threshold: Double, dim: Int,
      tables: Int = 24, bits: Int = 2, seed: Long = 42L): DataFrame = {
    val planes = tablePlanes(tables, bits, dim, seed).flatMap(_._2)
    val bk = vecs.select(col("id"),
        explode(graft.functions.VectorFunctions.sign_lsh_keys(
          col("vec"), planes, bits)).as("key"))
      .repartition(fanoutParallelism(vecs), col("key"))
    val cand = bk.as("x").join(bk.as("y"), col("x.key") === col("y.key")
        && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Near-dup pairs via IVF cell blocking: every vector is assigned to
    * its `replicate` nearest k-means cells (multi-assignment softens the
    * cell-boundary misses), candidates are same-cell pairs, exact cosine
    * verifies. Candidate volume is Σ_cells |cell|² · replicate² ≈
    * n²·replicate²/nlist — sizing nlist ∝ n keeps it LINEAR in n, which
    * is why this (not sign-LSH) is the scale path for LOW thresholds:
    * at e.g. cosine ≥ 0.45 a sign-LSH table with few bits collides ~half
    * of all random pairs (candidates ≈ T·n²/2^bits ≥ the brute-force
    * join), while more bits kill recall faster than tables restore it.
    * Cell blocking instead exploits that near-dup pairs rank the same
    * centroids nearly identically. Approximate: cross-cell pairs beyond
    * the replicate overlap are missed (recall vs the exact join is
    * asserted in PipelineSpec; the battery entry pins candidates exactly
    * via literal first-N centroids the oracle reproduces). */
  /** Threshold-routed near-dup pairs — the single entry point that picks
    * the blocking scheme the threshold can actually afford. Sign-LSH
    * bucket collision for RANDOM pairs is ~2^-bits per table regardless
    * of the threshold, so selectivity comes only from spending bits —
    * and a pair at angle θ survives b bits with p^b (p = 1−θ/π), so
    * bits are only affordable when p is close to 1, i.e. at HIGH
    * thresholds. Hence the route:
    *
    *  - `threshold >= routeAt` (default 0.85): sign-LSH with SELECTIVE
    *    tables (8 bits × 24 tables — candidates ~T·n²/2^(b+1) ≈ n²/21,
    *    ~64× fewer than the 2-bit default's ~3n²). Per-pair miss
    *    probability (1−p^b)^T is ≤ 0.4% at 0.85 and ≤ 3e-4 at 0.9 —
    *    the classic n^(1+ρ) LSH trade; verification stays exact.
    *  - `threshold < routeAt`: IVF cell blocking ([[cosinePairsIvf]]).
    *    At e.g. cosine ≥ 0.45 NO affordable bit count keeps recall
    *    (p^b collapses), and the 2-bit table collides ~¼ of random
    *    pairs (measured 75× slower than IVF at 10× data, SCALE.md).
    *    Cell candidates are n²·replicate²/nlist; sizing nlist ∝ n
    *    keeps the pass linear — the 100 TB default at ANY threshold.
    *
    * Both branches verify candidates with exact cosine; `centroids`
    * passes through to the IVF branch (literal first-N for an
    * oracle-pinned result, k-means default for recall). */
  def cosinePairsAuto(vecs: DataFrame, threshold: Double, dim: Int,
      nlist: Int = 0, replicate: Int = 2,
      centroids: Option[Array[Array[Double]]] = None,
      routeAt: Double = 0.85): DataFrame =
    if (threshold >= routeAt)
      cosinePairsBucketed(vecs, threshold, dim, tables = 24, bits = 8)
    else cosinePairsIvf(vecs, threshold, nlist, replicate, centroids)

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): embeddings are coarse-clustered, near-duplicate
    * pairs are found ONLY within shared cells (the paper's
    * within-cluster pairwise pass — here [[cosinePairsIvf]], so the
    * candidate volume is n²·replicate²/nlist, linear when nlist ∝ n),
    * duplicate groups are resolved to connected components, and one
    * representative per component is kept. Representative policy:
    * component-minimum id — deterministic and engine-independent (the
    * paper keeps the copy farthest from the cluster centroid; plug a
    * score into [[graft.pipeline.Dedup.canonicalDocs]] for a
    * quality-ranked policy).
    *
    * Returns one row per input vector: (vec_id, cluster_id,
    * cluster_size, keep) — `keep = 1` marks the retained representative
    * (every singleton keeps itself). Dropping `keep = 0` rows applies
    * the dedup.
    *
    * Scale shape: pair generation is the IVF bucketed join (ids-only
    * shuffle), component resolution is
    * [[graft.pipeline.Dedup.connectedComponents]] over (long, long)
    * edges (driver union-find within budget, O(log n)-round
    * large/small-star beyond it), and the final keep flag is one hash
    * join of labels against component sizes. Vectors never ride any
    * shuffle past the candidate verify. */
  def semanticDedup(vecs: DataFrame, threshold: Double, nlist: Int = 0,
      replicate: Int = 2,
      centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val pairs = cosinePairsIvf(vecs, threshold, nlist, replicate, centroids)
    val nodes = vecs.select(col("id").as("node"))
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
    val labeled = Dedup.connectedComponents(nodes, edges)
      .select(col("node").as("vec_id"), col("label").as("cluster_id"))
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        (col("vec_id") === col("cluster_id")).cast("long").as("keep"))
  }

  def cosinePairsIvf(vecs: DataFrame, threshold: Double, nlist: Int = 0,
      replicate: Int = 2,
      centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val cents: Array[(Int, Array[Double])] =
      resolveCentroids(vecs, nlist, centroids).zipWithIndex.map(_.swap)
    require(replicate >= 1 && replicate <= cents.length)
    val assigned = vecs
      .select(col("id"), explode(nearestCells(cents)(col("vec"), replicate)).as("cid"))
      .repartition(fanoutParallelism(vecs), col("cid"))
    val cand = assigned.as("x").join(assigned.as("y"),
        col("x.cid") === col("y.cid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    cand
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
