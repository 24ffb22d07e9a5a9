package graft.nbql

import graft.model.DataPoint
import graft.tsdb._
import org.apache.spark.sql.DataFrame

/** NBQL executor: parse → AST → engine calls, mirroring
  * `api/nbql/executor.go:131-172` (QUERY), `:174-205` (REMOVE),
  * `:207-258` (SHOW/FLUSH), `:53-81` (SNAPSHOT/RESTORE).
  *
  * Result rows stream back as a DataFrame; the reference's framed
  * row-at-a-time TCP/gRPC transport (S9) is a serving-layer concern on
  * top of `toLocalIterator`. `LIMIT` is enforced here (the reference
  * engine never truncates and only uses it for cursor bookkeeping —
  * SURVEY §2.5 W2 treats that as a bug and enforces). */
class NbqlExecutor(engine: TsdbEngine, snapshotDir: String => String = identity) {

  /** Injectable clock for RELATIVE queries (determinism in tests). */
  @volatile var nowNs: Option[Long] = None

  sealed trait ExecResult
  final case class Rows(df: DataFrame) extends ExecResult
  final case class Ack(message: String) extends ExecResult

  def execute(nbql: String): Either[String, ExecResult] =
    NbqlParser.parse(nbql).flatMap(run)

  /** Execute a `;`-separated script, stopping at the first failure (the
    * reference's PutBatch stop-on-first-error shape, `engine2/adapter.go:635`). */
  def executeScript(nbql: String): Either[String, Seq[ExecResult]] =
    NbqlParser.parseScript(nbql).flatMap { stmts =>
      val out = Vector.newBuilder[ExecResult]
      for (st <- stmts) run(st) match {
        case Right(r) => out += r
        case Left(e) => return Left(e)
      }
      Right(out.result())
    }

  def run(st: Statement): Either[String, ExecResult] = st match {
    case PushStatement(metric, tags, fields, at) =>
      val ts = at.getOrElse(nowNs.getOrElse(System.currentTimeMillis() * 1000000L))
      engine.put(DataPoint(metric, tags, ts, fields)).map(n => Ack(s"OK $n"))

    case q: QueryStatement =>
      val unknown = q.aggs.find(s =>
        !AggFunctions.named.contains(s.func) && s.percentile.isEmpty)
      if (unknown.isDefined)
        return Left(s"unknown aggregation function: ${unknown.get.func}")
      if (q.byIntervalNs.exists(_ <= 0))
        return Left("downsample interval must be positive")
      if (q.byIntervalNs.isDefined && q.aggs.isEmpty)
        return Left("AGGREGATE BY requires at least one aggregation function")
      val params = QueryParams(
        metric = q.metric,
        tags = q.tags,
        startNs = q.fromNs.getOrElse(0L),
        endNs = q.toNs,
        relativeNs = q.relativeNs,
        aggs = q.aggs,
        downsampleNs = q.byIntervalNs,
        emitEmptyWindows = q.emitEmptyWindows,
        order = q.order,
        limit = q.limit,
        afterKey = q.after.map(Cursor.decode),
        nowNs = nowNs)
      Right(Rows(engine.query(params)))

    case RemoveSeriesStatement(m, tg) =>
      engine.deleteSeries(m, tg); Right(Ack("OK"))
    case RemovePointStatement(m, tg, ts) =>
      engine.deletePoint(m, tg, ts); Right(Ack("OK"))
    case RemoveRangeStatement(m, tg, a, b) =>
      engine.deleteRange(m, tg, a, b); Right(Ack("OK"))

    case ShowMetricsStatement => Right(Rows(engine.showMetrics()))
    case ShowTagKeysStatement(m) => Right(Rows(engine.showTagKeys(m)))
    case ShowTagValuesStatement(m, k) => Right(Rows(engine.showTagValues(m, k)))

    case FlushStatement(_) =>
      // memtable/disk flush is meaningless on parquet storage; compaction
      // is the nearest admin analog (cf. FLUSH triggering compaction)
      engine.compact(); Right(Ack("OK"))

    case SnapshotStatement =>
      val dest = snapshotDir(s"${engine.rootDir}_snapshot_${engine.nextSeq()}")
      engine.snapshot(dest); Right(Ack(dest))

    case RestoreStatement(path, overwrite) =>
      engine.restore(path, overwrite).map(_ => Ack("OK"))
  }
}
