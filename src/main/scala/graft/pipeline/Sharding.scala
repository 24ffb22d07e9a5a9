package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing: assign every document to an output shard so
  * each shard holds ~`shardBudget` tokens of consecutive (by id) docs —
  * the materialization step that turns a filtered/deduped corpus into
  * fixed-size training shards.
  *
  * The core is a GLOBAL running sum, which naive Spark
  * (`sum over (order by id)` with no partition) computes in a single
  * task — a non-starter at 100 TB. Here it is the classic two-level
  * scan: ids are range-bucketed (`floor(id / bucketWidth)`), each
  * bucket's subtotal is aggregated in parallel (map-side combine), the
  * per-bucket prefix offsets are computed over the TINY bucket frame
  * (n/bucketWidth rows — the only sequential window, e.g. 100k rows for
  * 100 G docs at width 2²⁰) and broadcast back, and each bucket then
  * computes its local running sum in parallel under
  * `Window.partitionBy(bucket)`. Net: two narrow shuffles of (id, long)
  * pairs, no global sort, no single-partition stage over the data.
  */
object Sharding {

  /** Adds `weight`, `cum_weight` (inclusive global running sum in id
    * order), and `shard` = floor(exclusive-prefix / shardBudget): a doc
    * opens shard k when the tokens before it fill k budgets. Requires a
    * numeric id. Cumulative weights are exact integer sums; the shard
    * division is double `floor`, exact below 2⁵³ total tokens (≫ any
    * real corpus; a 100 T-token corpus is 2⁴⁷). */
  def shardAssign(df: DataFrame, idCol: String, weight: Column,
      shardBudget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(shardBudget > 0 && bucketWidth > 0)
    val w = df.select(col(idCol).cast("long").as("id"), weight.cast("long").as("w"))
      .withColumn("bucket", floor(col("id") / bucketWidth).cast("long"))
    val offsets = w.groupBy("bucket").agg(sum("w").as("bw"))
      .withColumn("offset",
        coalesce(sum("bw").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bucket", "offset")
    val local = Window.partitionBy("bucket").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w.join(broadcast(offsets), "bucket")
      .withColumn("cum_weight", col("offset") + sum("w").over(local))
      .select(col("id").as(idCol), col("w").as("weight"), col("cum_weight"),
        floor((col("cum_weight") - col("w")) / shardBudget.toDouble)
          .cast("long").as("shard"))
  }

  /** Fixed-budget training-SEQUENCE packing: place each doc whole into a
    * sequence of at most `seqBudget` tokens (greedy next-fit in id order
    * — a doc that would overflow the open sequence closes it), emitting
    * `(id, weight, truncated, seq_id, offset)`. This is the example-
    * construction step after sharding: training rows are fixed-length
    * contexts of concatenated docs, and `offset` is where each doc's
    * tokens start inside its sequence. Docs longer than the budget are
    * capped at `seqBudget` tokens (`truncated` flags them) so every
    * sequence is ≤ budget — the hard invariant training loaders assume
    * (unlike [[shardAssign]], which lets a doc straddle shard
    * boundaries).
    *
    * Greedy packing is inherently sequential, so a global pass cannot
    * be distributed. Instead docs are range-bucketed
    * (`floor(id / bucketWidth)`) and each bucket packs independently —
    * embarrassingly parallel, deterministic at any parallelism, at the
    * cost of at most one under-filled sequence per bucket (waste
    * fraction ≤ budget/(bucketWidth·E[w]) — negligible at the 2²⁰
    * production width). Sequence ids are globally unique via
    * `bucket · bucketWidth + seq_in_bucket` (a bucket holds at most
    * `bucketWidth` ids, so at most that many sequences). The only wide
    * ops are the bucket repartition + in-partition sort of (id, long)
    * pairs; the greedy scan itself is a per-partition iterator
    * (genuine imperative state — the documented mapPartitions case). */
  def packSequences(df: DataFrame, idCol: String, weight: Column,
      seqBudget: Long, bucketWidth: Long = 1L << 20): DataFrame = {
    require(seqBudget > 0 && bucketWidth > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val w = df.select(col(idCol).cast("long").as("id"),
        least(weight.cast("long"), lit(seqBudget)).as("w"),
        (weight.cast("long") > seqBudget).as("truncated"))
      .withColumn("bucket", floor(col("id") / bucketWidth).cast("long"))
    w.select(col("bucket"), col("id"), col("w"), col("truncated"))
      .as[(Long, Long, Long, Boolean)]
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "id")
      .mapPartitions { it =>
        // partitions hold whole buckets (hash-partitioned on bucket),
        // sorted so each bucket is a contiguous run; reset state per run
        var curBucket = Long.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (b, id, wt, tr) =>
          if (b != curBucket) { curBucket = b; seq = 0L; fill = 0L }
          if (fill + wt > seqBudget) { seq += 1; fill = 0L }
          val off = fill
          fill += wt
          (id, wt, tr, b * bucketWidth + seq, off)
        }
      }
      .toDF(idCol, "weight", "truncated", "seq_id", "offset")
  }

  /** Materialize a corpus as training shards: every input column plus the
    * shard id, written as parquet partitioned by `shard=` directories —
    * the layout a training loader consumes (one directory per ~budget
    * tokens, shard membership deterministic). The write repartitions by
    * shard so each shard directory is produced by one task (one file per
    * shard, no small-file spray); at 100 TB raise `bucketWidth` and let
    * multi-file shards ride `maxRecordsPerFile` instead. */
  def writeShards(df: DataFrame, idCol: String, weight: Column,
      shardBudget: Long, outDir: String, bucketWidth: Long = 1L << 20): Unit = {
    val assigned = shardAssign(df, idCol, weight, shardBudget, bucketWidth)
      .select(col(idCol), col("shard"))
    df.join(assigned, idCol)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
