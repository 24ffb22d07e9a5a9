package graft.tsdb

import graft.model.{DataPoint, FieldValue}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.JavaConverters._

/** Parquet-backed storage engine with the reference's observable
  * semantics (SURVEY §1, §2.1, §2.3):
  *
  *  - `put*` appends versioned rows (monotonic `seq`, the reference's
  *    write sequence, `engine2/adapter.go:465`); readers always see
  *    latest-version-wins via [[QueryEngine]]'s merge (M1);
  *  - deletes are TOMBSTONE rows in a side table (M2-M4) with the
  *    sequence-shadowing rule — a point written after a delete survives;
  *  - `compact()` plays the role of the LSM compaction
  *    (`engine2/compaction_manager.go`): rewrites storage dropping
  *    shadowed versions and tombstoned rows, then clears tombstones;
  *  - `snapshot`/`restore` copy the storage directory wholesale
  *    (`snapshot/manager.go`, `RESTORE FROM '<path>' WITH OVERWRITE`).
  *
  * The LSM mechanisms themselves (WAL, memtable, SSTables, bloom filters,
  * block cache) are deliberately absent: parquet row groups + footer
  * stats give the pruning, the filesystem gives durability, and at real
  * scale this directory becomes a Delta table (append/DELETE/OPTIMIZE)
  * partitioned by metric + date with the identical read semantics.
  *
  * Writes here are driver-mediated (Seq[DataPoint] → small parquet
  * appends): the high-volume path is [[graft.streaming.Ingest]], which
  * streams a DataFrame straight to the same layout.
  */
class TsdbEngine(val spark: SparkSession, val rootDir: String) {
  import TsdbEngine._

  private val pointsDir = s"$rootDir/points"
  private val tombsDir = s"$rootDir/tombstones"

  private val seqCounter = new java.util.concurrent.atomic.AtomicLong(initialSeq())

  /** Bumped by every mutation; orphans older [[QueryCache]] entries. */
  private val writeEpoch = new java.util.concurrent.atomic.AtomicLong(0L)
  private val resultCache = new QueryCache()
  def epoch: Long = writeEpoch.get()
  def cacheStats: (Long, Long) = resultCache.stats

  private def initialSeq(): Long = {
    val p = loadPoints()
    val t = loadTombstones()
    val maxP = if (p.isEmpty) 0L else p.get.agg(max(col("seq"))).head().getLong(0)
    val maxT = t.map(_.seq).foldLeft(0L)(math.max)
    math.max(maxP, maxT)
  }

  def nextSeq(): Long = seqCounter.incrementAndGet()

  /** Reserve a block of sequence space for a streaming micro-batch: every
    * row gets `base + monotonically_increasing_id()`. m_i_i is
    * (partitionId << 33) + rowInPartition, so a 2^45 block keeps ids of
    * batches disjoint for up to 4096 partitions/8G rows per batch while
    * leaving room for 2^18 batches — later batches always carry higher
    * seqs, preserving latest-version-wins across restarts. */
  def reserveSeqBlock(): Long = seqCounter.getAndAdd(1L << 45)

  // ---- write path -------------------------------------------------------

  /** Validate + append a batch (one parquet append per batch — the
    * analog of PutBatch, `engine2/adapter.go:635`). */
  def putBatch(points: Seq[DataPoint]): Either[String, Long] = {
    val bad = points.iterator.map(DataPoint.validate).collectFirst {
      case Left(err) => err }
    if (bad.isDefined) return Left(bad.get)
    import spark.implicits._
    val rows = points.map { p =>
      StoredPoint(p.metric, p.tags, p.timestamp,
        p.fields.map { case (k, v) => k -> StoredValue(v.d, v.l, v.s, v.b) },
        nextSeq())
    }
    rows.toDF().write.mode(SaveMode.Append).partitionBy("metric").parquet(pointsDir)
    writeEpoch.incrementAndGet()
    Right(rows.size.toLong)
  }

  def put(p: DataPoint): Either[String, Long] = putBatch(Seq(p))

  /** Append an arbitrary DataFrame already in canonical shape
    * (metric, tags, timestamp, fields, seq) — the bulk/streaming path.
    * The pre-write repartition clusters rows by their partition value so
    * each metric directory receives ONE file per batch instead of one per
    * (shuffle partition × metric) — fewer, bigger parquet files, which is
    * both the faster write and the healthier read layout. */
  def putDF(df: DataFrame): Unit = {
    df.repartition(col("metric"))
      .write.mode(SaveMode.Append).partitionBy("metric").parquet(pointsDir)
    writeEpoch.incrementAndGet()
  }

  // ---- delete path (tombstones) ----------------------------------------

  def deletePoint(metric: String, tags: Map[String, String], tsNs: Long): Unit =
    appendTombstone(TombRow("point", metric, tags, tsNs, tsNs, nextSeq()))

  def deleteSeries(metric: String, tags: Map[String, String]): Unit =
    appendTombstone(TombRow("series", metric, tags, 0L, 0L, nextSeq()))

  def deleteRange(metric: String, tags: Map[String, String], fromNs: Long, toNs: Long): Unit =
    appendTombstone(TombRow("range", metric, tags, fromNs, toNs, nextSeq()))

  private def appendTombstone(t: TombRow): Unit = {
    import spark.implicits._
    Seq(t).toDF().write.mode(SaveMode.Append).parquet(tombsDir)
    writeEpoch.incrementAndGet()
  }

  // ---- read path --------------------------------------------------------

  /** Storage is hive-partitioned by metric: `metric=<name>/part-*.parquet`
    * — a metric-equality query prunes at the DIRECTORY level before any
    * footer is read (the file-level analog of the reference's tag index;
    * at real scale a date sub-partition joins it). Partition-column type
    * inference is disabled so a numeric-looking metric name stays a
    * string. */
  def loadPoints(): Option[DataFrame] = {
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    if (hasPartitionedParquet(pointsDir)) Some(spark.read.parquet(pointsDir)) else None
  }

  def loadTombstones(): Seq[Tombstone] =
    if (!hasParquet(tombsDir)) Seq.empty
    else spark.read.parquet(tombsDir).collect().toSeq.map(rowToTombstone)

  /** Execute a query with full merge/tombstone semantics. */
  def query(params: QueryParams): DataFrame = {
    val pts = loadPoints().getOrElse(emptyPoints(spark))
    QueryEngine.run(pts, params, loadTombstones())
  }

  /** Query through the result cache (serving-layer path): collected rows,
    * canonical-key lookup, epoch invalidation on any mutation. RELATIVE
    * queries with an un-pinned `now` are never cached (non-deterministic). */
  def queryCached(params: QueryParams): Array[Row] = {
    val cacheable = params.relativeNs.isEmpty || params.nowNs.isDefined
    val e = epoch
    if (cacheable) resultCache.get(params, e) match {
      case Some(rows) => return rows
      case None => ()
    }
    val df = query(params)
    val rows = df.collect()
    if (cacheable) resultCache.put(params, e, rows, df.schema.treeString)
    rows
  }

  // ---- introspection (SURVEY §2.8) --------------------------------------

  def showMetrics(): DataFrame =
    loadPoints().getOrElse(emptyPoints(spark))
      .select(col("metric")).distinct().orderBy("metric")

  def showTagKeys(metric: String): DataFrame =
    loadPoints().getOrElse(emptyPoints(spark))
      .filter(col("metric") === metric)
      .select(explode(map_keys(col("tags"))).as("tag_key"))
      .distinct().orderBy("tag_key")

  def showTagValues(metric: Option[String], key: String): DataFrame = {
    val base = loadPoints().getOrElse(emptyPoints(spark))
    metric.fold(base)(m => base.filter(col("metric") === m))
      .select(col("tags").getItem(key).as("tag_value"))
      .filter(col("tag_value").isNotNull)
      .distinct().orderBy("tag_value")
  }

  def getSeriesByTags(metric: String, tags: Map[String, String]): DataFrame = {
    var df = loadPoints().getOrElse(emptyPoints(spark))
      .filter(col("metric") === metric)
    tags.foreach { case (k, v) => df = df.filter(col("tags").getItem(k) === v) }
    df.withColumn("series_key",
        QueryEngine.seriesKeyCol(col("metric"), col("tags")))
      .select("series_key").distinct().orderBy("series_key")
  }

  // ---- maintenance ------------------------------------------------------

  /** LSM-compaction analog: rewrite points keeping only the winning
    * version of each (series, ts) with tombstoned rows dropped, then
    * clear the tombstone log. Observable state is unchanged; storage
    * shrinks and reads stop paying the merge. */
  def compact(): Unit = {
    val pts = loadPoints().getOrElse(return)
    val tombstones = loadTombstones()
    val survivors = QueryEngine.mergedView(pts, tombstones)
      .select("metric", "tags", "timestamp", "fields", "seq")
    val tmp = s"$rootDir/points_compact_tmp"
    survivors.write.mode(SaveMode.Overwrite).partitionBy("metric").parquet(tmp)
    deleteDir(Paths.get(pointsDir))
    Files.move(Paths.get(tmp), Paths.get(pointsDir))
    deleteDir(Paths.get(tombsDir))
  }

  /** Snapshot = full copy of the storage directory (cf. `SNAPSHOT`,
    * `snapshot/manager.go`). */
  def snapshot(destDir: String): Unit = {
    val dst = Paths.get(destDir)
    deleteDir(dst)
    copyDir(Paths.get(rootDir), dst)
  }

  /** `RESTORE FROM '<path>' [WITH OVERWRITE]` (`api/nbql/executor.go:53-81`). */
  def restore(srcDir: String, overwrite: Boolean): Either[String, Unit] = {
    if (!Files.isDirectory(Paths.get(srcDir))) return Left(s"no snapshot at $srcDir")
    if (hasParquet(pointsDir) && !overwrite) return Left("target not empty; use WITH OVERWRITE")
    deleteDir(Paths.get(rootDir))
    copyDir(Paths.get(srcDir), Paths.get(rootDir))
    seqCounter.set(initialSeq())
    Right(())
  }

  private def hasParquet(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.isDirectory(p) && Files.list(p).iterator().asScala.exists(
      f => f.getFileName.toString.endsWith(".parquet"))
  }

  /** True when the dir holds parquet files directly or in partition
    * subdirectories (metric=...). */
  private def hasPartitionedParquet(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.isDirectory(p) && Files.walk(p, 2).iterator().asScala.exists(
      f => f.getFileName.toString.endsWith(".parquet"))
  }
}

object TsdbEngine {
  /** Parquet row shapes (Options encode the FieldValue union). */
  final case class StoredValue(d: Option[Double], l: Option[Long],
      s: Option[String], b: Option[Boolean])
  final case class StoredPoint(metric: String, tags: Map[String, String],
      timestamp: Long, fields: Map[String, StoredValue], seq: Long)
  final case class TombRow(kind: String, metric: String,
      tags: Map[String, String], fromNs: Long, toNs: Long, seq: Long)

  def rowToTombstone(r: Row): Tombstone = {
    val tags = r.getAs[Map[String, String]]("tags")
    val m = r.getAs[String]("metric")
    val seq = r.getAs[Long]("seq")
    r.getAs[String]("kind") match {
      case "point" => PointTombstone(m, tags, r.getAs[Long]("fromNs"), seq)
      case "series" => SeriesTombstone(m, tags, seq)
      case "range" =>
        RangeTombstone(m, tags, r.getAs[Long]("fromNs"), r.getAs[Long]("toNs"), seq)
    }
  }

  def emptyPoints(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], DataPoint.storageSchema)

  private def deleteDir(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).iterator().asScala.foreach { s =>
      val d = dst.resolve(src.relativize(s))
      if (Files.isDirectory(s)) Files.createDirectories(d)
      else {
        Files.createDirectories(d.getParent)
        Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
