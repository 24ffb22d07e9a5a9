package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * co-pruning on several columns at once — the `OPTIMIZE ZORDER BY`
  * capability of lakehouse table formats, built from Spark primitives.
  *
  * Why it matters at 100 TB: the engine's storage prunes on ONE
  * physical order per table — date partitions + the within-file sort.
  * A scan filtered on a second dimension (user, device, region) reads
  * every file of every matching date because each file spans the whole
  * second dimension. Z-ordering interleaves the bits of k normalized
  * dimensions into one sort key, so files own small HYPER-RECTANGLES of
  * the key space instead of slabs: parquet min/max stats on EVERY
  * z-ordered column become tight, and a 2-dim box predicate skips most
  * files/row-groups on either dimension (asserted by LayoutSpec's
  * intersection count).
  *
  * All plan, no driver loops: one footer-stat min/max agg job, then a
  * narrow bit-interleave expression (codegen'd shift/or tree), a range
  * repartition on the z-value (contiguous z ranges → one file each),
  * and a within-partition sort. Quantization uses double scaling — the
  * z-value is a LAYOUT key, not a semantic value; ties and rounding
  * only move rows between adjacent cells.
  */
object ZOrder {

  /** Bit-interleaved Morton code over pre-quantized cell coordinates
    * (each in [0, 2^bits)): bit i of column j lands at position
    * i*k + j. Pure shift/or expression tree — whole-stage codegen
    * keeps it in the scan stage. */
  private[graft] def interleave(cells: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cells.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
          i * cells.length + j))
      }
    }

  /** Quantize a numeric column to a [0, 2^bits) cell index given its
    * observed [min, max]. Constant columns collapse to cell 0. */
  private[graft] def quantize(c: Column, mn: Double, mx: Double,
      bits: Int): Column = {
    val cells = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else least(lit(cells), floor((c.cast("double") - lit(mn)) /
      lit(mx - mn) * lit(cells + 1.0)).cast("long"))
  }

  /** The z-value column for `cols`, with per-column [min,max] resolved
    * by one aggregate over `df` (footer stats make this cheap on
    * parquet). k * bits must fit a long. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits must fit a signed long")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val cells = cols.zipWithIndex.map { case (c, i) =>
      val mn = stats.getDouble(2 * i); val mx = stats.getDouble(2 * i + 1)
      quantize(col(c), mn, mx, bits)
    }
    interleave(cells, bits)
  }

  /** Rewrite `df` into `path` as `numFiles` parquet files clustered by
    * the z-order of `cols`: range-repartition on the z-value (each file
    * owns one contiguous z range = one hyper-rectangle batch), sort
    * within partitions so row groups nest the same property. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    df.withColumn("__z", zvalue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] of `cols` for a parquet directory — the pruning
    * surface a z-order claim is judged by. One job, grouped on
    * input_file_name. */
  def fileStats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** How many files of `path` a box predicate (per-column inclusive
    * [lo, hi]) could NOT skip by file-level min/max stats. */
  def filesTouched(df: DataFrame, box: Map[String, (Double, Double)]): Long =
    fileStats(df, box.keys.toSeq)
      .filter(box.map { case (c, (lo, hi)) =>
        col(s"max_$c").cast("double") >= lo && col(s"min_$c").cast("double") <= hi
      }.reduce(_ && _))
      .count()
}

/** Hash-bucketed table layout — the co-location tool for the tables a
  * training pipeline joins REPEATEDLY on the same key (documents ⋈
  * embeddings ⋈ quality scores ⋈ dedup verdicts, always on doc_id).
  *
  * A plain parquet directory forces every such join to shuffle both
  * sides; a bucketed table records `hash(key) % n` in the catalog, so
  * Spark plans bucket-wise joins and aggregations with ZERO exchanges —
  * each task reads bucket i of both sides (spec-pinned in PlanSpec).
  * With `sortBy` the per-bucket files are also key-sorted, eliding the
  * join's sort as well. At 100 TB this converts the pipeline's dominant
  * repeated cost (all-to-all shuffles of the widest tables) into
  * embarrassingly-parallel co-located reads; the write-side cost is one
  * shuffle paid ONCE at layout time.
  *
  * The engine's storage solves the same problem differently (one
  * explicit repartition reused by every downstream clustering,
  * `QueryEngine.partitionedInput`); bucketing is the CATALOG-visible
  * variant for tables shared across many independent jobs, which can't
  * assume each other's in-plan partitioning. */
object Bucketing {

  /** Write `df` as a bucketed external parquet table (`buckets` buckets
    * on `bucketCol`, per-bucket files sorted by `sortCols`, catalog name
    * `table`, data under `path`). Overwrites both. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // the name is spliced into DROP TABLE SQL — keep it identifier-shaped
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a plain identifier, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
