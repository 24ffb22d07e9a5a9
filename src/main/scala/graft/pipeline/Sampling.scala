package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything keys off a content-independent hash bucket of the row id:
  * `bucket = int(md5(seed:id)[0:8]) % 100`. Determinism is the point —
  * the same row lands in the same split on every run, on any engine, at
  * any parallelism, so train/val/test membership is stable across
  * reprocessing (the property `df.sample`/`TABLESAMPLE` cannot give).
  * md5-hex parsing is engine-agnostic, so a SQL oracle reproduces the
  * assignment bit-for-bit. All operators are narrow (no shuffle): they
  * compose with any downstream partitioning.
  */
object Sampling {

  /** Deterministic [0,100) bucket for an id under a seed namespace. */
  def hashBucket(id: Column, seed: String): Column =
    pmod(conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(100L))

  /** Train/val/test assignment: bucket < trainPct → train,
    * < trainPct+valPct → val, else test. Adds `bucket` and `split`. */
  def datasetSplit(df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10, seed: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100)
    val b = hashBucket(col(idCol), seed)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Stratified sample: keep a row when its bucket falls under the
    * stratum's percentage rate (`sampleBy` with deterministic hashing
    * instead of RNG). Unlisted strata use `defaultPct`. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int = 100,
      seed: String = "samp"): DataFrame = {
    val b = hashBucket(col(idCol), seed)
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", b).filter(col("bucket") < rate)
  }

  /** Per-group cap (the CommonCrawl-style per-source/per-domain quota:
    * "keep at most k documents per domain"): rank each group's rows by
    * the deterministic md5 of the id under `seed` (a uniform,
    * data-independent order — NOT first-k by id, which would bias toward
    * old documents) and keep ranks ≤ k. One hash exchange on the group
    * key; Spark's WindowGroupLimit prunes rows past rank k BEFORE the
    * sort buffer, so a pathological mega-group costs its scan, not its
    * sort. Deterministic: same corpus + seed → same sample, any
    * parallelism. Output keeps all input columns plus `sample_rank`. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int,
      seed: String = "cap"): DataFrame = {
    require(k > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
        col(idCol)) // id tiebreak: md5 collisions can't reorder nondeterministically
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic [0, 1e6) bucket (parts-per-million resolution) for an
    * id under a seed namespace — 12 md5 hex chars (48 bits) so the mod
    * is unbiased to ~2⁻²⁸. */
  def hashPpm(id: Column, seed: String): Column =
    pmod(conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 12),
      16, 10).cast("long"), lit(1000000L))

  /** Temperature-weighted mixture sampling (T = 2, the mT5/multi-source
    * rebalancing default): resample a multi-source corpus so source s is
    * kept at a rate targeting mixture share q_s ∝ √n_s — low-resource
    * sources are upweighted relative to their natural share, dominant
    * sources downsampled — while keeping ~`keepPpm`·N rows overall.
    *
    * Everything is computed IN-PLAN and engine-exactly, so a SQL oracle
    * reproduces row membership bit-for-bit:
    *   - per-source counts `n` (one tiny groupBy; #sources rows),
    *   - scaled integer sqrt `sq = floor(√(n·10⁶))` (IEEE sqrt is
    *     correctly rounded — identical across engines),
    *   - integer totals N = Σn, S = Σsq (order-independent),
    *   - target rows `t = floor(N·keepPpm/10⁶)` and keep-rate
    *     `rate_ppm = min(10⁶, floor(((t·10⁶)·sq) / (S·n)))` — double
    *     products with PINNED parenthesization (deterministic IEEE ops,
    *     no overflow at any corpus size),
    *   - row selection `hashPpm(id) < rate_ppm` (broadcast rate join —
    *     the corpus side never shuffles; the whole operator is one tiny
    *     aggregation plus a narrow filtered scan).
    *
    * Rows whose source weight caps at 10⁶ keep ALL rows (a source too
    * small to fill its target share cannot be upsampled without
    * replacement), so the realized total can undershoot `keepPpm`·N —
    * standard temperature-sampling behavior. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      keepPpm: Long, seed: String = "mix"): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm must be in [0, 1e6]")
    // totals use distinct names (tot_n/tot_s, never a case-variant of a
    // per-source column) — Spark's default case-insensitive resolution
    // treats `n` vs `N` as one ambiguous name after the cross join
    val counts = df.groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("src_n"))
      .withColumn("sq", floor(sqrt(col("src_n") * lit(1000000L))).cast("long"))
    val tot = counts.agg(sum("src_n").as("tot_n"), sum("sq").as("tot_s"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("target",
        floor((col("tot_n") * lit(keepPpm.toDouble)) / lit(1000000.0)).cast("long"))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          floor(((col("target") * lit(1000000.0)) * col("sq")) /
            (col("tot_s").cast("double") * col("src_n"))).cast("long")))
      .select(col("__src"), col("rate_ppm"))
    df.withColumn("ppm", hashPpm(col(idCol), seed))
      .join(broadcast(rates), col(sourceCol).cast("string") === col("__src"))
      .filter(col("ppm") < col("rate_ppm"))
      .drop("__src", "ppm", "rate_ppm")
  }
}
