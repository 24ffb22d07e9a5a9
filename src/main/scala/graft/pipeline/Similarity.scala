package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline: brute-force cosine top-k — exact, one wide join, the
  * correctness oracle. Scale path: random-hyperplane LSH bucketing —
  * candidates only meet inside a bucket, so the join is
  * bucket-partitioned instead of all-pairs (recall traded for a
  * ~(buckets)× cost cut; verified against brute force in tests).
  * All vector math is `zip_with`/`aggregate` column algebra (codegen,
  * no UDF, no driver-side state — executor-parallel at any scale).
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

  /** Exact top-k neighbors for each query row against the corpus
    * (brute force; both sides are (id, vec) frames). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .crossJoin(corpus.select(col("id").as("neighbor_id"), col("vec").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic random hyperplanes (seeded), as literal array columns —
    * shipped to executors as constants, no RNG on workers. */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (same-bucket vectors are
    * near-duplicate candidates). */
  def lshBucket(vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nPlanes, dim, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Multi-table bucket assignment: `tables` independent sign-LSH hashes
    * of `bits` hyperplanes each. A row lands in one bucket per table;
    * queries and corpus meet when ANY table agrees — the classic
    * recall/cost dial (recall ≈ 1−(1−p^bits)^tables for per-plane
    * agreement p = 1−θ/π). Returns (id, vec, table, bucket) exploded. */
  private def bucketed(df: DataFrame, idAs: String, vecAs: String,
      tables: Int, bits: Int, dim: Int, seed: Long): DataFrame = {
    val buckets = (0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("vec"), bits, dim, seed + t * 7919L).as("bkt"))
    }
    df.select(col("id").as(idAs), col("vec").as(vecAs),
      explode(array(buckets: _*)).as("tb"))
  }

  /** ANN top-k via multi-table sign-LSH: candidates are pairs sharing at
    * least one (table, bucket); exact cosine ranks the candidates.
    * Approximate — recall vs brute force measured in PipelineSpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int, bits: Int, dim: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = bucketed(corpus, "neighbor_id", "nv", tables, bits, dim, seed)
    val qb = bucketed(queries, "query_id", "qv", tables, bits, dim, seed)
    val joined = qb.join(cb, qb("tb") === cb("tb"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv"))
      .distinct() // a pair can collide in several tables — score once
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF (inverted-file) ANN: corpus is bucketed by nearest centroid,
    * queries probe their `nprobe` nearest centroid lists, exact cosine
    * ranks the candidates — the coarse-quantizer half of FAISS-style IVF
    * (no product quantization; vectors stay exact).
    *
    * Centroids here are a deterministic sample (first `nlist` corpus
    * vectors by id) — at real scale swap in a k-means fit over a sample;
    * the assignment/probe plan is unchanged. Assignment is a narrow map
    * stage against broadcast literal centroids; the candidate join is
    * hash-partitioned by centroid id, scanning ~nprobe/nlist of the
    * corpus per query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe <= nlist)
    val cents: Array[(Int, Array[Double])] = corpus.orderBy(col("id")).limit(nlist)
      .select(col("vec")).collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).map(_.toDouble).toArray }
    def centArr(c: Array[Double]) = array(c.map(lit): _*)
    // per-row (centroid id, -similarity) ranking against the literal centroids
    def nearest(vec: Column, n: Int): Column = {
      val scored = array(cents.map { case (cid, c) =>
        struct((dot(vec, centArr(c)) * -1).as("negSim"), lit(cid).as("cid"))
      }: _*)
      slice(array_sort(scored), 1, n)
    }
    val cb = corpus.select(col("id").as("neighbor_id"), col("vec").as("nv"),
      element_at(nearest(col("vec"), 1), 1).getField("cid").as("cid"))
    val qb = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      explode(nearest(col("vec"), nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("probe").getField("cid").as("cid"))
    val joined = qb.join(cb, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection).
    * Exact baseline: block-nested cross join; at scale swap the cross
    * join for `lshBucket` equality + verification (same contract). */
  def cosinePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), col("vec").as("va"))
    val b = vecs.select(col("id").as("id_b"), col("vec").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
