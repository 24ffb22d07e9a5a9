package graft.nbql

import graft.model.FieldValue
import graft.tsdb.{AggSpec, SortOrder, Ascending}

/** AST for the NBQL statement surface, mirroring the shape used by the
  * reference executor (`api/nbql/executor.go:29-50`, `core/query.go:29-42`;
  * grammar reconstructed in SURVEY §3.4 — the reference's parser lives in
  * an un-vendored submodule). */
sealed trait Statement

/** `PUSH m [TAGGED (k=v,…)] SET (f=v,…) [AT ts]` */
final case class PushStatement(
    metric: String,
    tags: Map[String, String],
    fields: Map[String, FieldValue],
    atNs: Option[Long]) extends Statement

/** `PUSHS item[, item…]` — the batch push. In the reference PUSHS is a
  * binary-framed command (`api/nbql/nbql.go:100,631`,
  * `server/tcp_connection_handler.go:134-151`) carrying N point items
  * that execute as ONE batch; this text form is its grammar projection
  * (each item has PUSH's shape), and the executor applies the whole
  * batch in a single storage commit. */
final case class PushsStatement(items: Seq[PushStatement]) extends Statement

/** `QUERY m [FROM a TO b | FROM RELATIVE(d)] [TAGGED(…)]
  *  [AGGREGATE [BY iv] (f(x) [AS a],…)] [GROUP BY TAGS (k,…)]
  *  [FILTER (field <op> v)] [EMIT EMPTY WINDOWS]
  *  [FILL(NONE|PREVIOUS|LINEAR)] [ASC|DESC] [LIMIT n] [AFTER cursor]` */
final case class QueryStatement(
    metric: String,
    fromNs: Option[Long] = None,
    toNs: Option[Long] = None,
    relativeNs: Option[Long] = None,
    tags: Map[String, String] = Map.empty,
    aggs: Seq[AggSpec] = Seq.empty,
    byIntervalNs: Option[Long] = None,
    emitEmptyWindows: Boolean = false,
    fill: graft.tsdb.FillMode = graft.tsdb.FillNone,
    order: SortOrder = Ascending,
    limit: Option[Long] = None,
    after: Option[String] = None,
    /** `GROUP BY TAGS (k, …)` — aggregate ACROSS series sharing the named
      * tag values (extension; `Some(Nil)` collapses every series). */
    groupByTags: Option[Seq[String]] = None,
    /** `FILTER (field <op> v)` clauses, ANDed — post-merge value
      * predicates (extension; the query surface of the reference's
      * `filter.Filter`). */
    valueFilters: Seq[graft.tsdb.ValueFilter] = Nil,
    /** `ANALYZE RATE(f)|EWMA(f,α)|HOLT(f,α,β)|TWA(f) BY d|CUMSUM(f)|
      * ZSCORE(f,n,t)` — the time-series analytics pack on the wire
      * (extension; [[graft.tsdb.AnalyzeSpec]]). */
    analyze: Option[graft.tsdb.AnalyzeSpec] = None,
    /** `… SPLIT <dur>` or `… SPLIT AUTO` after an ANALYZE clause —
      * hot-series time-splitting for the per-series ordered analytics
      * (extension; [[graft.tsdb.TsAnalytics]] `splitNs`): chunk the
      * series on duration boundaries so one pathological series runs
      * multi-task. RATE/TWA/ZSCORE are bit-identical under the split;
      * EWMA/HOLT/CUMSUM's running sums agree to 1e-9 relative (FP
      * re-association — see `ewmaSmoothSplit`'s note). AUTO derives
      * the width from the query's actual range
      * ([[graft.tsdb.TsAnalytics.autoSplitNs]]). */
    analyzeSplitNs: Option[Long] = None) extends Statement

/** `EXPLAIN QUERY …` (extension): the formatted physical plan of the
  * RAW engine query — one `plan` line per row. Serving-tier shortcuts
  * (result cache, driver-resident tiers) are execution paths, not
  * plans, so the explained plan is the full Spark one. */
final case class ExplainStatement(query: QueryStatement) extends Statement

/** `REMOVE SERIES m TAGGED (…)` */
final case class RemoveSeriesStatement(metric: String, tags: Map[String, String])
  extends Statement
/** `REMOVE FROM m TAGGED (…) AT ts` (point) */
final case class RemovePointStatement(metric: String, tags: Map[String, String],
    atNs: Long) extends Statement
/** `REMOVE FROM m TAGGED (…) FROM a TO b` (range) */
final case class RemoveRangeStatement(metric: String, tags: Map[String, String],
    fromNs: Long, toNs: Long) extends Statement

sealed trait ShowStatement extends Statement
case object ShowMetricsStatement extends ShowStatement
final case class ShowTagKeysStatement(metric: String) extends ShowStatement
final case class ShowTagValuesStatement(metric: Option[String], key: String)
  extends ShowStatement
/** `SHOW CARDINALITY [ESTIMATE] [FROM m] [BY dur]` — distinct active
  * series (and point volume) per metric, windowed when `BY` is given
  * (extension; the tabular view of the reference's cardinality-alerter
  * signal). `ESTIMATE` serves from the registered HLL summary's sketch
  * unions when one covers the window — the 100 TB path — and exact
  * counts otherwise. */
final case class ShowCardinalityStatement(metric: Option[String],
    byNs: Option[Long], estimate: Boolean = false) extends ShowStatement

/** `CREATE ROLLUP <metric> BY <interval> (field, ...) [WITH DIGESTS]
  * [SMOOTH EWMA(f, α) | HOLT(f, α, β), ...]` —
  * engine extension with no reference analog: registers materialized
  * downsample partials so covered `AGGREGATE BY` queries re-aggregate the
  * rollup instead of scanning raw points ([[graft.tsdb.Rollup]]).
  * `WITH DIGESTS` adds per-window t-digest sketches, making `p<N>`
  * downsamples rollup-eligible (approximate contract). `SMOOTH` stores
  * exact EWMA/Holt fold states per window, making the matching
  * `ANALYZE … BY` queries rollup-served bit-identically
  * ([[graft.tsdb.SmoothSpec]]; forces full rebuilds on commit). */
final case class CreateRollupStatement(metric: String, intervalNs: Long,
    fields: Seq[String], withDigests: Boolean = false,
    smooth: Seq[graft.tsdb.SmoothSpec] = Nil) extends Statement
final case class DropRollupStatement(metric: String) extends Statement
case object ShowRollupsStatement extends Statement

/** `CREATE CARDINALITY SUMMARY BY <dur> [LGK n]` / `DROP CARDINALITY
  * SUMMARY` — registers (drops) the engine's HLL cardinality summary so
  * `SHOW CARDINALITY ESTIMATE` serves from sketch unions
  * ([[graft.tsdb.TsAnalytics.cardinalitySummary]]). */
final case class CreateCardinalitySummaryStatement(baseWindowNs: Long,
    lgK: Option[Int] = None) extends Statement
case object DropCardinalitySummaryStatement extends Statement

/** `FLUSH [MEMTABLE|DISK|ALL]` */
final case class FlushStatement(target: String) extends Statement
case object SnapshotStatement extends Statement
final case class RestoreStatement(path: String, overwrite: Boolean) extends Statement
