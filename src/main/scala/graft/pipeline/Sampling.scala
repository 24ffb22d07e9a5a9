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
}
