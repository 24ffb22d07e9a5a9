package graft.tsdb

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Driver-resident rollup serving: answer a [[Rollup.supports]]-eligible
  * downsample query by re-aggregating COLLECTED rollup partial rows in
  * pure Scala — no Spark job, no plan, no codegen.
  *
  * Why it exists: a materialized rollup is small BY CONSTRUCTION
  * (|series| × range/interval rows, independent of raw point count), so
  * for dashboard-hot metrics the whole frame fits on the driver the same
  * way [[TsdbEngine]]'s raw-scan local tier does. Re-aggregating a few
  * thousand partial rows takes microseconds; the Spark path pays a
  * ~100 ms+ fixed planning/codegen/scheduling floor per query REGARDLESS
  * of data volume — which is exactly why the routed-vs-raw serving win
  * was invisible at bench density. Serving rollups driver-side removes
  * that floor entirely while raw queries keep paying it in proportion to
  * their (at 100 TB: enormous) scan.
  *
  * Semantics are a row-for-row mirror of [[Rollup.run]] +
  * [[QueryEngine.shapeDownsampled]] + [[QueryEngine.applyCursorLimit]]
  * (spec-asserted identical): same window math, same NaN/empty-set
  * conventions, same first/last stream-order merge, same empty-window
  * fill, ordering, cursor keyset and limit. Percentile (`p<N>`) specs on
  * a WITH DIGESTS rollup merge their t-digest sketches driver-side with
  * the same replace-empty/merge fold as `TDigestMergeQuantileAgg`; like
  * the Spark path they follow the APPROXIMATE digest contract — and
  * since [[graft.functions.TDigest.compress]] sorts centroids by mean,
  * small-window sketches (singleton centroids) reproduce the Spark
  * merge bit-for-bit.
  */
object LocalRollup {

  /** Output schema of [[run]] — matches the Spark downsample path's
    * column order and types (count → long, all else → double). */
  def outputSchema(p: QueryParams): StructType = StructType(
    Seq(StructField("metric", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("series_key", StringType),
      StructField("window_start", LongType),
      StructField("window_end", LongType)) ++
      p.aggs.map(s => StructField(s.outputName,
        if (s.func == "count") LongType else DoubleType)))

  /** Column ordinals of one field's stored partials (`tdigest` = -1
    * when the frame stores no sketches or no percentile spec needs it). */
  private final case class FieldIdx(cntAny: Int, cnt: Int, sum: Int,
      sumsq: Int, mn: Int, mx: Int, firstOrd: Int, first: Int,
      lastOrd: Int, last: Int, tdigest: Int)

  /** Merged partial state for one (series, target window) group. */
  private final class FieldState {
    var cntAny = 0L; var cnt = 0L
    var sum = 0.0; var hasSum = false
    var sumsq = 0.0; var hasSumsq = false
    var mn = Double.MaxValue; var hasMin = false
    var mx = Double.MinValue; var hasMax = false
    var firstOrd: (Long, String, Long) = null; var first = 0.0
    var lastOrd: (Long, String, Long) = null; var last = 0.0
    var digest: graft.functions.TDigest = null
  }
  private final class GroupState(val metric: String, val tags: Any) {
    var cntStar = 0L
    val fields = scala.collection.mutable.HashMap.empty[String, FieldState]
  }

  // string components compare as UTF-8 bytes ([[Utf8Order]]) — the
  // Spark path's ordering for the same first/last and sort semantics
  private val ordOrdering: Ordering[(Long, String, Long)] =
    Ordering.Tuple3(Ordering.Long, Utf8Order, Ordering.Long)

  private def ordOf(r: Row, i: Int): (Long, String, Long) =
    if (r.isNullAt(i)) null
    else { val s = r.getStruct(i); (s.getLong(0), s.getString(1), s.getLong(2)) }

  /** Mirror of [[Rollup.run]] over collected rollup rows. `rows` is the
    * materialized rollup frame for the metric (the full frame or any
    * window-range slice covering [startNs, endNs]); `p` must pass
    * [[Rollup.supports]] against the frame's spec. */
  def run(rows: Array[Row], schema: StructType, p: QueryParams,
      rollupIntervalNs: Long): Array[Row] = {
    val interval = p.downsampleNs.get
    val endNs = p.endNs.get
    val iSk = schema.fieldIndex("series_key")
    // windowBounds: aligned may precede startNs when interval > rollup's
    val aligned = startAligned(p, interval)
    val lastW = if (endNs <= aligned) aligned
                else aligned + ((endNs - 1 - aligned) / interval) * interval
    val groups = accumulate(rows, schema, p, interval, lastW,
      r => r.getString(iSk))
    runShaped(groups, p, interval, aligned, lastW)
  }

  /** Shared accumulation: filter (metric/tags/window range) and fold
    * partial rows into per-(key, target window) [[GroupState]]s. The key
    * extractor is the only difference between per-series serving
    * ([[run]] — series_key) and tag-grouped serving ([[runByTags]] —
    * the tag-value tuple). */
  private def accumulate(rows: Array[Row], schema: StructType,
      p: QueryParams, interval: Long, lastW: Long, keyOf: Row => AnyRef):
      scala.collection.mutable.HashMap[(AnyRef, Long), GroupState] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iStar = schema.fieldIndex("__cnt_star")
    val digestFields = p.aggs.filter(_.percentile.isDefined).map(_.field).toSet
    val fieldIdx = p.aggs.map(_.field).distinct.filter(_ != "*").map { f =>
      f -> FieldIdx(schema.fieldIndex(s"${f}__cnt_any"),
        schema.fieldIndex(s"${f}__cnt"), schema.fieldIndex(s"${f}__sum"),
        schema.fieldIndex(s"${f}__sumsq"), schema.fieldIndex(s"${f}__min"),
        schema.fieldIndex(s"${f}__max"), schema.fieldIndex(s"${f}__first_ord"),
        schema.fieldIndex(s"${f}__first"), schema.fieldIndex(s"${f}__last_ord"),
        schema.fieldIndex(s"${f}__last"),
        if (digestFields.contains(f)) schema.fieldIndex(s"${f}__tdigest") else -1)
    }.toMap

    val groups = scala.collection.mutable.HashMap.empty[(AnyRef, Long), GroupState]
    var ri = 0
    while (ri < rows.length) {
      val r = rows(ri); ri += 1
      if (r.getString(iMetric) == p.metric) {
        val ws = r.getLong(iWs)
        if (ws >= p.startNs && ws <= endNs) {
          val target = ws - java.lang.Math.floorMod(ws, interval)
          if (target <= lastW && tagsMatch(r, iTags, p)) {
            val g = groups.getOrElseUpdate((keyOf(r), target),
              new GroupState(r.getString(iMetric), r.get(iTags)))
            g.cntStar += r.getLong(iStar)
            fieldIdx.foreach { case (f, ix) =>
              val st = g.fields.getOrElseUpdate(f, new FieldState)
              st.cntAny += r.getLong(ix.cntAny)
              st.cnt += r.getLong(ix.cnt)
              if (!r.isNullAt(ix.sum)) { st.sum += r.getDouble(ix.sum); st.hasSum = true }
              if (!r.isNullAt(ix.sumsq)) { st.sumsq += r.getDouble(ix.sumsq); st.hasSumsq = true }
              if (!r.isNullAt(ix.mn)) {
                val v = r.getDouble(ix.mn)
                if (!st.hasMin || v < st.mn) st.mn = v
                st.hasMin = true
              }
              if (!r.isNullAt(ix.mx)) {
                val v = r.getDouble(ix.mx)
                if (!st.hasMax || v > st.mx) st.mx = v
                st.hasMax = true
              }
              val fo = ordOf(r, ix.firstOrd)
              if (fo != null && (st.firstOrd == null || ordOrdering.lt(fo, st.firstOrd))) {
                st.firstOrd = fo; st.first = r.getDouble(ix.first)
              }
              val lo = ordOf(r, ix.lastOrd)
              if (lo != null && (st.lastOrd == null || ordOrdering.gt(lo, st.lastOrd))) {
                st.lastOrd = lo; st.last = r.getDouble(ix.last)
              }
              if (ix.tdigest >= 0 && !r.isNullAt(ix.tdigest)) {
                val in = graft.functions.TDigest.deserialize(
                  r.getAs[Array[Byte]](ix.tdigest))
                if (st.digest == null) st.digest = in else st.digest.merge(in)
              }
            }
          }
        }
      }
    }

    groups
  }

  /** Finalize + shape (fill / order / cursor / limit) — the back half of
    * the per-series serving path. */
  private def runShaped(
      groups: scala.collection.mutable.HashMap[(AnyRef, Long), GroupState],
      p: QueryParams, interval: Long, aligned: Long, lastW: Long): Array[Row] = {
    def finalized(g: GroupState): Seq[Any] = finalizeGroup(g, p)
    shapeEmitted(groups, finalized, p, interval, aligned, lastW)
  }

  /** reAgg mirror shared by the per-series and tag-grouped paths. */
  private def finalizeGroup(g: GroupState, p: QueryParams): Seq[Any] =
    p.aggs.map { s =>
      val st = if (s.field == "*") null else g.fields(s.field)
      s.func match {
        case "count" if s.field == "*" => g.cntStar
        case "count" => st.cntAny
        case "sum"   => if (st.hasSum) st.sum else 0.0
        case "avg"   => if (st.cnt > 0) st.sum / st.cnt else Double.NaN
        case "min"   => if (st.hasMin) st.mn else Double.NaN
        case "max"   => if (st.hasMax) st.mx else Double.NaN
        case "first" => if (st.firstOrd != null) st.first else Double.NaN
        case "last"  => if (st.lastOrd != null) st.last else Double.NaN
        case "frac" =>
          if (st.cnt < 2) Double.NaN
          else {
            val fst = st.first; val lst = st.last
            if (fst == 0.0 && lst == 0.0) 0.0
            else if (fst == 0.0 && lst > 0.0) Double.PositiveInfinity
            else if (fst == 0.0 && lst < 0.0) Double.NegativeInfinity
            else (lst - fst) / fst
          }
        case "stddev" =>
          if (st.cnt < 2) Double.NaN
          else math.sqrt(math.max(
            (st.sumsq - st.sum * st.sum / st.cnt) / (st.cnt - 1), 0.0))
        case _ if s.percentile.isDefined =>
          if (st.digest == null) Double.NaN
          else st.digest.quantile(s.percentile.get / 100.0)
        case other =>
          throw new IllegalArgumentException(
            s"not decomposable from rollup partials: $other")
      }
    }

  /** Emission + empty-window fill + presentation order + cursor + limit
    * (the per-series serving shapes). */
  private def shapeEmitted(
      groups: scala.collection.mutable.HashMap[(AnyRef, Long), GroupState],
      finalized: GroupState => Seq[Any], p: QueryParams,
      interval: Long, aligned: Long, lastW: Long): Array[Row] = {
    val emitted: Iterator[Row] =
      if (!p.emitsWindows)
        groups.iterator.map { case ((sk, w), g) =>
          Row.fromSeq(Seq(g.metric, g.tags, sk, w, w + interval) ++ finalized(g))
        }
      else {
        // series drawn from the filled groups (shapeDownsampled passes the
        // AGGREGATED frame as seriesSource on the rollup path)
        val series = scala.collection.mutable.LinkedHashMap.empty[AnyRef, (String, Any)]
        groups.foreach { case ((sk, _), g) =>
          if (!series.contains(sk)) series.put(sk, (g.metric, g.tags))
        }
        val windows = (aligned to lastW by interval).toArray
        val n = windows.length
        // fill replaces only aggregates undefined over an empty set —
        // count/sum of an empty window are 0 by definition
        // (shapeDownsampled mirror, same formula and association order)
        val fillable = p.aggs.map(s => s.func != "count" && s.func != "sum").toArray
        val defaults: IndexedSeq[Any] = p.aggs.toIndexedSeq.map(_.func match {
          case "count" => 0L
          case "sum" => 0.0
          case _ => Double.NaN
        })
        series.iterator.flatMap { case (sk, (m, tg)) =>
          val present: Array[Option[IndexedSeq[Any]]] =
            windows.map(w => groups.get((sk, w)).map(g => finalized(g).toIndexedSeq))
          // nearest present slot at-or-before / at-or-after each window
          val prevIdx = new Array[Int](n); val nextIdx = new Array[Int](n)
          var seen = -1
          var i = 0
          while (i < n) { if (present(i).isDefined) seen = i; prevIdx(i) = seen; i += 1 }
          seen = n
          i = n - 1
          while (i >= 0) { if (present(i).isDefined) seen = i; nextIdx(i) = seen; i -= 1 }
          windows.indices.iterator.map { wi =>
            val w = windows(wi)
            val vals: IndexedSeq[Any] = present(wi) match {
              case Some(v) => v
              case None => p.aggs.indices.map { ai =>
                if (!fillable(ai)) defaults(ai)
                else p.fill match {
                  case FillNone => Double.NaN
                  case FillPrevious =>
                    if (prevIdx(wi) >= 0) present(prevIdx(wi)).get(ai) else Double.NaN
                  case FillLinear =>
                    if (prevIdx(wi) >= 0 && nextIdx(wi) < n) {
                      val pv = present(prevIdx(wi)).get(ai).asInstanceOf[Double]
                      val nv = present(nextIdx(wi)).get(ai).asInstanceOf[Double]
                      val pw = windows(prevIdx(wi)); val nw = windows(nextIdx(wi))
                      pv + (nv - pv) * ((w - pw).toDouble / (nw - pw).toDouble)
                    } else Double.NaN
                }
              }
            }
            Row.fromSeq(Seq(m, tg, sk, w, w + interval) ++ vals)
          }
        }
      }

    // presentation order, cursor keyset, limit (applyCursorLimit mirror)
    var out = emitted.toArray
    val ord = Ordering.Tuple2(Ordering.Long, Utf8Order)
      .on[Row](r => (r.getLong(3), r.getString(2)))
    out = out.sorted(if (p.order == Descending) ord.reverse else ord)
    p.afterKey.foreach { c =>
      out = out.filter { r =>
        val w = r.getLong(3); val sk = r.getString(2)
        val skc = Utf8Order.compare(sk, c.seriesKey)
        if (p.order == Ascending)
          w > c.timestamp || (w == c.timestamp && skc > 0)
        else w < c.timestamp || (w == c.timestamp && skc < 0)
      }
    }
    p.limit.foreach(n => out = out.take(n.toInt))
    out
  }

  /** Output schema of [[runByTags]] — matches [[Rollup.runByTags]]. */
  def outputSchemaByTags(p: QueryParams, tagKeys: Seq[String]): StructType =
    StructType(
      (StructField("metric", StringType) +:
        tagKeys.map(k => StructField(s"tag_$k", StringType))) ++
      Seq(StructField("window_start", LongType),
        StructField("window_end", LongType)) ++
      p.aggs.map(s => StructField(s.outputName,
        if (s.func == "count") LongType else DoubleType)))

  /** Driver-resident mirror of [[Rollup.runByTags]]: tag-grouped
    * downsample re-aggregated from collected partials in pure Scala —
    * same group key (tag-value tuple × target window), same reAgg
    * semantics via the shared [[accumulate]]/finalize fold, same
    * (window ±, tag values asc nulls-first) presentation order and
    * LIMIT. The per-series fill/cursor shapes don't exist on this path
    * (rejected upstream). */
  def runByTags(rows: Array[Row], schema: StructType, p: QueryParams,
      rollupIntervalNs: Long, tagKeys: Seq[String]): Array[Row] = {
    require(p.fill == FillNone && !p.emitEmptyWindows && p.afterKey.isEmpty,
      "per-series shapes don't apply to GROUP BY TAGS")
    val interval = p.downsampleNs.get
    val endNs = p.endNs.get
    val iTags = schema.fieldIndex("tags")
    val aligned = startAligned(p, interval)
    val lastW = if (endNs <= aligned) aligned
                else aligned + ((endNs - 1 - aligned) / interval) * interval
    def tagTuple(r: Row): AnyRef = {
      val tg =
        if (r.isNullAt(iTags)) null
        else r.getAs[scala.collection.Map[String, String]](iTags)
      tagKeys.map(k => if (tg == null) null else tg.get(k).orNull).toVector
    }
    val groups = accumulate(rows, schema, p, interval, lastW, tagTuple)

    val out = groups.iterator.map { case ((key, w), g) =>
      val tags = key.asInstanceOf[Vector[String]]
      Row.fromSeq((p.metric +: tags) ++ Seq(w, w + interval) ++
        finalizeGroup(g, p))
    }.toArray

    // window (query order) then tag values asc, nulls first, UTF-8 bytes
    // — the Spark path's orderBy on the same columns
    val nullFirst: Ordering[String] = (a: String, b: String) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else Utf8Order.compare(a, b)
    val rowOrd: Ordering[Row] = (x: Row, y: Row) => {
      val wc = java.lang.Long.compare(x.getLong(1 + tagKeys.length),
        y.getLong(1 + tagKeys.length))
      val wd = if (p.order == Descending) -wc else wc
      if (wd != 0) wd
      else {
        var i = 0; var c = 0
        while (i < tagKeys.length && c == 0) {
          c = nullFirst.compare(x.getString(1 + i), y.getString(1 + i)); i += 1
        }
        c
      }
    }
    val sorted = out.sorted(rowOrd)
    p.limit.fold(sorted)(n => sorted.take(n.toInt))
  }

  /** Output schema of [[runDelta]] — matches [[Rollup.runDelta]]. */
  def outputSchemaDelta: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("n_points", LongType),
    StructField("first_ts", LongType),
    StructField("last_ts", LongType),
    StructField("delta", DoubleType),
    StructField("increase", DoubleType)))

  private final class DeltaState(val metric: String, val tags: Any) {
    var n = 0L
    var firstOrd: (Long, String, Long) = null; var firstVal = 0.0
    var lastOrd: (Long, String, Long) = null; var lastVal = 0.0
    var inc = 0.0
    var prevLast = 0.0; var hasPrevLast = false
  }

  /** Driver-resident mirror of [[Rollup.runDelta]]: whole-range
    * delta/increase folded from resident partial rows in pure Scala —
    * the same in-window `__inc` + boundary-pair decomposition, no Spark
    * job. `rows` must be sorted by window_start (the resident tier's
    * invariant), so each series' windows arrive in order and the
    * boundary fold is a single pass. */
  def runDelta(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iFo = schema.fieldIndex(s"${field}__first_ord")
    val iFv = schema.fieldIndex(s"${field}__first")
    val iLo = schema.fieldIndex(s"${field}__last_ord")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iInc = schema.fieldIndex(s"${field}__inc")
    val bySeries =
      scala.collection.mutable.LinkedHashMap.empty[String, DeltaState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val st = bySeries.getOrElseUpdate(r.getString(iSk),
          new DeltaState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        val fo = ordOf(r, iFo)
        if (fo != null) { // window has numeric samples
          val fv = r.getDouble(iFv)
          if (st.firstOrd == null || ordOrdering.lt(fo, st.firstOrd)) {
            st.firstOrd = fo; st.firstVal = fv
          }
          // boundary pair: previous non-empty window's last → this first
          if (st.hasPrevLast)
            st.inc += (if (fv < st.prevLast) fv else fv - st.prevLast)
          val lo = ordOf(r, iLo)
          if (st.lastOrd == null || ordOrdering.gt(lo, st.lastOrd)) {
            st.lastOrd = lo; st.lastVal = r.getDouble(iLv)
          }
          st.prevLast = r.getDouble(iLv); st.hasPrevLast = true
        }
        if (!r.isNullAt(iInc)) st.inc += r.getDouble(iInc)
      }
    }
    val out = bySeries.iterator
      .filter(_._2.n > 0)
      .toArray
      .sortBy(_._1)(Utf8Order)
      .map { case (sk, st) =>
        Row(st.metric, st.tags, sk, st.n, st.firstOrd._1, st.lastOrd._1,
          st.lastVal - st.firstVal, st.inc)
      }
    // LIMIT parity with the Spark path ([[TsdbEngine.analyze]]'s df.limit)
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runTransitions]] — matches
    * [[Rollup.runTransitions]] projected to the verb's column
    * (`keep` = "resets" | "changes"), the [[TsdbEngine.analyze]] output
    * shape for ANALYZE RESETS/CHANGES. */
  def outputSchemaTransitions(keep: String): StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("n_points", LongType),
    StructField(keep, LongType)))

  private final class TransState(val metric: String, val tags: Any) {
    var n = 0L
    var resets = 0L; var changes = 0L
    var prevLast = 0.0; var hasPrevLast = false
  }

  /** Driver-resident mirror of [[Rollup.runTransitions]]: counter
    * reset/change counts folded from resident partial rows — in-window
    * `__resets`/`__changes` partials plus boundary-pair comparisons
    * (previous non-empty window's last value vs this window's first).
    * Long counts: BIT-identical to both the Spark rollup route and the
    * raw analytic. `rows` sorted by window_start. */
  def runTransitions(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String, keep: String): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iFo = schema.fieldIndex(s"${field}__first_ord")
    val iFv = schema.fieldIndex(s"${field}__first")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iRst = schema.fieldIndex(s"${field}__resets")
    val iChg = schema.fieldIndex(s"${field}__changes")
    val bySeries =
      scala.collection.mutable.LinkedHashMap.empty[String, TransState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val st = bySeries.getOrElseUpdate(r.getString(iSk),
          new TransState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        if (ordOf(r, iFo) != null) { // window has numeric samples
          val fv = r.getDouble(iFv)
          if (st.hasPrevLast) { // boundary pair
            if (fv < st.prevLast) st.resets += 1L
            if (fv != st.prevLast) st.changes += 1L
          }
          if (!r.isNullAt(iRst)) st.resets += r.getLong(iRst)
          if (!r.isNullAt(iChg)) st.changes += r.getLong(iChg)
          st.prevLast = r.getDouble(iLv); st.hasPrevLast = true
        }
      }
    }
    val out = bySeries.iterator
      .filter(_._2.n > 0)
      .toArray
      .sortBy(_._1)(Utf8Order)
      .map { case (sk, st) =>
        Row(st.metric, st.tags, sk, st.n,
          if (keep == "resets") st.resets else st.changes)
      }
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of the DERIV projection of [[runPredict]] —
    * [[outputSchemaPredict]] without the forecast column. */
  def outputSchemaDeriv: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("n_points", LongType),
    StructField("last_ts", LongType),
    StructField("slope_per_sec", DoubleType)))

  /** Output schema of [[runPredict]] — matches [[Rollup.runPredict]]. */
  def outputSchemaPredict: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("n_points", LongType),
    StructField("last_ts", LongType),
    StructField("slope_per_sec", DoubleType),
    StructField("predicted", DoubleType)))

  private final class PredictState(val metric: String, val tags: Any) {
    var n = 0L
    var lastOrd: (Long, String, Long) = null
    var st = 0.0; var sv = 0.0; var stv = 0.0; var stt = 0.0
  }

  /** Driver-resident mirror of [[Rollup.runPredict]]: least-squares
    * trend + horizon forecast folded from resident moment partials in
    * pure Scala (same anchor-shift algebra), no Spark job. */
  def runPredict(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String, horizonNs: Long): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iLo = schema.fieldIndex(s"${field}__last_ord")
    val iSv = schema.fieldIndex(s"${field}__sum")
    val iSt = schema.fieldIndex(s"${field}__tsum")
    val iStv = schema.fieldIndex(s"${field}__tvsum")
    val iStt = schema.fieldIndex(s"${field}__ttsum")
    val bySeries =
      scala.collection.mutable.LinkedHashMap.empty[String, PredictState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val st = bySeries.getOrElseUpdate(r.getString(iSk),
          new PredictState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        val lo = ordOf(r, iLo)
        if (lo != null &&
            (st.lastOrd == null || ordOrdering.gt(lo, st.lastOrd))) st.lastOrd = lo
        if (!r.isNullAt(iSt)) st.st += r.getDouble(iSt)
        if (!r.isNullAt(iSv)) st.sv += r.getDouble(iSv)
        if (!r.isNullAt(iStv)) st.stv += r.getDouble(iStv)
        if (!r.isNullAt(iStt)) st.stt += r.getDouble(iStt)
      }
    }
    val s = p.startNs.toDouble / 1e9
    val out = bySeries.iterator
      .filter(_._2.n > 0)
      .toArray
      .sortBy(_._1)(Utf8Order)
      .map { case (sk, g) =>
        val n = g.n.toDouble
        val mt = (g.st - s * n) / n
        val mv = g.sv / n
        val mtv = (g.stv - s * g.sv) / n
        val mtt = (g.stt - 2.0 * s * g.st + s * s * n) / n
        val varT = mtt - mt * mt
        val lastTs = g.lastOrd._1
        if (g.n >= 2 && varT > 0) {
          val slope = (mtv - mt * mv) / varT
          val targetT = (lastTs - p.startNs + horizonNs).toDouble / 1e9
          Row(g.metric, g.tags, sk, g.n, lastTs,
            slope, mv + slope * (targetT - mt))
        } else Row(g.metric, g.tags, sk, g.n, lastTs, null, null)
      }
    // LIMIT parity with the Spark path ([[TsdbEngine.analyze]]'s df.limit)
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runDeltaBy]] — matches [[Rollup.runDeltaBy]]. */
  /** Output schema of the RATE BY projection of [[runDeltaBy]] —
    * windowed increase over the window duration. */
  def outputSchemaRateBy: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("window_start", LongType),
    StructField("n_points", LongType),
    StructField("rate_per_sec", DoubleType)))

  def outputSchemaDeltaBy: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("window_start", LongType),
    StructField("n_points", LongType),
    StructField("delta", DoubleType),
    StructField("increase", DoubleType)))

  private final class DeltaByState(val metric: String, val tags: Any) {
    var n = 0L
    var firstOrd: (Long, String, Long) = null; var firstVal = 0.0
    var lastOrd: (Long, String, Long) = null; var lastVal = 0.0
    var inc = 0.0
  }

  /** Driver-resident mirror of [[Rollup.runDeltaBy]]: windowed
    * delta/increase folded from resident partial rows in pure Scala —
    * the [[runDelta]] decomposition grouped into target windows, the
    * boundary pair landing in the LATER point's target
    * (continuous-counter contract). `windowNs` must be a multiple of the
    * rollup grain (caller-gated); `rows` sorted by window_start. */
  def runDeltaBy(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String, windowNs: Long): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iFo = schema.fieldIndex(s"${field}__first_ord")
    val iFv = schema.fieldIndex(s"${field}__first")
    val iLo = schema.fieldIndex(s"${field}__last_ord")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iInc = schema.fieldIndex(s"${field}__inc")
    // per-series boundary carry runs across the WHOLE range
    val prevLast = scala.collection.mutable.HashMap.empty[String, Double]
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[(String, Long), DeltaByState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val sk = r.getString(iSk)
        val target = ws - java.lang.Math.floorMod(ws, windowNs)
        val st = groups.getOrElseUpdate((sk, target),
          new DeltaByState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        val fo = ordOf(r, iFo)
        if (fo != null) { // window has numeric samples
          val fv = r.getDouble(iFv)
          if (st.firstOrd == null || ordOrdering.lt(fo, st.firstOrd)) {
            st.firstOrd = fo; st.firstVal = fv
          }
          prevLast.get(sk).foreach { pl =>
            st.inc += (if (fv < pl) fv else fv - pl)
          }
          val lo = ordOf(r, iLo)
          if (st.lastOrd == null || ordOrdering.gt(lo, st.lastOrd)) {
            st.lastOrd = lo; st.lastVal = r.getDouble(iLv)
          }
          prevLast(sk) = r.getDouble(iLv)
        }
        if (!r.isNullAt(iInc)) st.inc += r.getDouble(iInc)
      }
    }
    val out = groups.iterator
      .filter(_._2.n > 0)
      .toArray
      .sortBy { case ((sk, w), _) => (sk, w) }(
        Ordering.Tuple2(Utf8Order, Ordering.Long))
      .map { case ((sk, w), st) =>
        Row(st.metric, st.tags, sk, w, st.n, st.lastVal - st.firstVal, st.inc)
      }
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runTransitionsBy]] — matches
    * [[Rollup.runTransitionsBy]] projected to the verb's column. */
  def outputSchemaTransitionsBy(keep: String): StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("window_start", LongType),
    StructField("n_points", LongType),
    StructField(keep, LongType)))

  private final class TransByState(val metric: String, val tags: Any) {
    var n = 0L; var resets = 0L; var changes = 0L
  }

  /** Driver-resident mirror of [[Rollup.runTransitionsBy]]: windowed
    * reset/change counts folded from resident partials — the
    * [[runTransitions]] decomposition grouped by target window, boundary
    * pairs (previous non-empty window's last vs this window's first)
    * landing in the LATER point's target. Long counts: BIT-identical to
    * the Spark routes. `rows` sorted by window_start. */
  def runTransitionsBy(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String, windowNs: Long, keep: String): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iFo = schema.fieldIndex(s"${field}__first_ord")
    val iFv = schema.fieldIndex(s"${field}__first")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iRst = schema.fieldIndex(s"${field}__resets")
    val iChg = schema.fieldIndex(s"${field}__changes")
    // per-series boundary carry runs across the WHOLE range
    val prevLast = scala.collection.mutable.HashMap.empty[String, Double]
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[(String, Long), TransByState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val sk = r.getString(iSk)
        val target = ws - java.lang.Math.floorMod(ws, windowNs)
        val st = groups.getOrElseUpdate((sk, target),
          new TransByState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        if (ordOf(r, iFo) != null) { // window has numeric samples
          val fv = r.getDouble(iFv)
          prevLast.get(sk).foreach { pl =>
            if (fv < pl) st.resets += 1L
            if (fv != pl) st.changes += 1L
          }
          if (!r.isNullAt(iRst)) st.resets += r.getLong(iRst)
          if (!r.isNullAt(iChg)) st.changes += r.getLong(iChg)
          prevLast(sk) = r.getDouble(iLv)
        }
      }
    }
    val out = groups.iterator
      .filter(_._2.n > 0)
      .toArray
      .sortBy { case ((sk, w), _) => (sk, w) }(
        Ordering.Tuple2(Utf8Order, Ordering.Long))
      .map { case ((sk, w), st) =>
        Row(st.metric, st.tags, sk, w, st.n,
          if (keep == "resets") st.resets else st.changes)
      }
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runSmoothBy]] — matches [[Rollup.runSmoothBy]]. */
  def outputSchemaSmooth(kind: String): StructType = {
    val base = Seq(
      StructField("metric", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("series_key", StringType),
      StructField("window_start", LongType),
      StructField("n_points", LongType),
      StructField("last_ts", LongType),
      StructField("value", DoubleType))
    StructType(base ++ (kind match {
      case "ewma" => Seq(StructField("ewma", DoubleType))
      case _ => Seq(StructField("level", DoubleType),
        StructField("trend", DoubleType), StructField("forecast", DoubleType))
    }))
  }

  private final class SmoothByState(val metric: String, val tags: Any) {
    var n = 0L; var lastTs = 0L; var value = 0.0; var state: Any = null
  }

  /** Driver-resident EWMA/HOLT … BY ([[Rollup.runSmoothBy]]'s output
    * shape) folded from resident partial rows in pure Scala — no Spark
    * job. The stored fold state of a target window's LAST non-empty
    * rollup window IS the raw analytic's value at that sample
    * ([[SmoothSpec]] contract), so the fold only picks states — rows
    * arrive sorted by window_start (the resident tier's invariant), so
    * the last matched row per (series, target) wins. The CALLER must
    * have verified the range-start condition (no matched non-empty
    * window before startNs) — the prefix sits outside this slice. */
  def runSmoothBy(rows: Array[Row], schema: StructType, p: QueryParams,
      s: SmoothSpec, windowNs: Long): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${s.field}__cnt")
    val iLo = schema.fieldIndex(s"${s.field}__last_ord")
    val iLv = schema.fieldIndex(s"${s.field}__last")
    val iSt = schema.fieldIndex(Rollup.smoothStateCol(s))
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[(String, Long), SmoothByState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          r.getLong(iCnt) > 0 && tagsMatch(r, iTags, p)) {
        val target = ws - java.lang.Math.floorMod(ws, windowNs)
        val st = groups.getOrElseUpdate((r.getString(iSk), target),
          new SmoothByState(r.getString(iMetric), r.get(iTags)))
        st.n += r.getLong(iCnt)
        st.lastTs = ordOf(r, iLo)._1
        st.value = r.getDouble(iLv)
        st.state = r.get(iSt)
      }
    }
    val out = groups.iterator
      .toArray
      .sortBy { case ((sk, w), _) => (sk, w) }(
        Ordering.Tuple2(Utf8Order, Ordering.Long))
      .map { case ((sk, w), st) =>
        if (s.kind == "ewma")
          Row(st.metric, st.tags, sk, w, st.n, st.lastTs, st.value,
            st.state.asInstanceOf[Double])
        else {
          val h = st.state.asInstanceOf[Row]
          val (lvl, trd) = (h.getDouble(0), h.getDouble(1))
          Row(st.metric, st.tags, sk, w, st.n, st.lastTs, st.value,
            lvl, trd, lvl + trd)
        }
      }
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runTwa]] — matches [[Rollup.runTwa]]. */
  def outputSchemaTwa: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("window_start", LongType),
    StructField("twa", DoubleType),
    StructField("n_points", LongType)))

  private final class TwaGroup(val metric: String, val tags: Any) {
    var num = 0.0; var den = 0.0; var n = 0L
  }
  /** One non-empty rollup window pending its successor's first-ts. */
  private final class TwaPending(var target: Long, var firstTs: Long,
      var lastTs: Long, var lastVal: Double, var area: Double, var cnt: Long)

  /** Driver-resident mirror of [[Rollup.runTwa]]: LOCF time-weighted
    * averages folded from resident partial rows — in-window `__area`
    * integrals plus the last sample's carry to min(next non-empty
    * window's first sample, target end). Windows are processed in
    * window_start order per series, holding each non-empty window
    * pending until its successor is known (the lead over the rollup
    * frame, as a one-pass fold). `p.downsampleNs` (a multiple of the
    * grain) is the target interval; `rows` sorted by window_start. */
  def runTwa(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String): Array[Row] = {
    val interval = p.downsampleNs.get
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iCnt = schema.fieldIndex(s"${field}__cnt")
    val iFo = schema.fieldIndex(s"${field}__first_ord")
    val iLo = schema.fieldIndex(s"${field}__last_ord")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iArea = schema.fieldIndex(s"${field}__area")
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[(String, Long), TwaGroup]
    val pending = scala.collection.mutable.HashMap.empty[String, TwaPending]
    val meta = scala.collection.mutable.HashMap.empty[String, (String, Any)]
    def close(sk: String, pd: TwaPending, nextFirstTs: Long): Unit = {
      val wEnd = pd.target + interval
      val closeTs = math.min(nextFirstTs, wEnd)
      val (m, tg) = meta(sk)
      val g = groups.getOrElseUpdate((sk, pd.target), new TwaGroup(m, tg))
      g.num += pd.area + pd.lastVal * (closeTs - pd.lastTs).toDouble
      g.den += (closeTs - pd.firstTs).toDouble
      g.n += pd.cnt
    }
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p) && r.getLong(iCnt) > 0) {
        val sk = r.getString(iSk)
        meta.getOrElseUpdate(sk, (r.getString(iMetric), r.get(iTags)))
        val fo = ordOf(r, iFo)
        val lo = ordOf(r, iLo)
        pending.get(sk).foreach(pd => close(sk, pd, fo._1))
        pending(sk) = new TwaPending(
          ws - java.lang.Math.floorMod(ws, interval), fo._1, lo._1,
          r.getDouble(iLv),
          if (r.isNullAt(iArea)) 0.0 else r.getDouble(iArea),
          r.getLong(iCnt))
      }
    }
    pending.foreach { case (sk, pd) => close(sk, pd, Long.MaxValue) }
    val out = groups.iterator
      .toArray
      .sortBy { case ((sk, w), _) => (sk, w) }(
        Ordering.Tuple2(Utf8Order, Ordering.Long))
      .map { case ((sk, w), g) =>
        Row(g.metric, g.tags, sk, w, g.num / g.den, g.n)
      }
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  /** Output schema of [[runIrate]] — matches [[TsAnalytics.irate]]. */
  def outputSchemaIrate: StructType = StructType(Seq(
    StructField("metric", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("series_key", StringType),
    StructField("timestamp", LongType),
    StructField("value", DoubleType),
    StructField("delta", DoubleType),
    StructField("rate_per_sec", DoubleType)))

  private final class IrateState(val metric: String, val tags: Any) {
    // latest and second-latest numeric sample (ord, value) in range
    var ord1: (Long, String, Long) = null; var v1 = 0.0
    var ord2: (Long, String, Long) = null; var v2 = 0.0
  }

  /** Driver-resident IRATE ([[TsAnalytics.irate]]'s output shape) folded
    * from resident partial rows in pure Scala — no Spark job. Each
    * series' trailing sample PAIR is recoverable exactly from partials:
    * a window with ≥ 2 numeric samples carries both its last
    * (`__last_ord`/`__last`) and second-to-last (`__plast_ord`/
    * `__plast`); a 1-sample window pairs with the previous non-empty
    * window's last. `rows` must be sorted by window_start (the resident
    * tier's invariant). Series with < 2 numeric samples emit no row;
    * counter resets clamp to the new value (the engine's default irate
    * contract). */
  def runIrate(rows: Array[Row], schema: StructType, p: QueryParams,
      field: String): Array[Row] = {
    val endNs = p.endNs.get
    val iWs = schema.fieldIndex("window_start")
    val iSk = schema.fieldIndex("series_key")
    val iMetric = schema.fieldIndex("metric")
    val iTags = schema.fieldIndex("tags")
    val iLo = schema.fieldIndex(s"${field}__last_ord")
    val iLv = schema.fieldIndex(s"${field}__last")
    val iPo = schema.fieldIndex(s"${field}__plast_ord")
    val iPv = schema.fieldIndex(s"${field}__plast")
    val bySeries =
      scala.collection.mutable.LinkedHashMap.empty[String, IrateState]
    rows.foreach { r =>
      val ws = r.getLong(iWs)
      if (ws >= p.startNs && ws <= endNs && r.getString(iMetric) == p.metric &&
          tagsMatch(r, iTags, p)) {
        val lo = ordOf(r, iLo)
        if (lo != null) { // window has ≥1 numeric sample
          val st = bySeries.getOrElseUpdate(r.getString(iSk),
            new IrateState(r.getString(iMetric), r.get(iTags)))
          val po = ordOf(r, iPo)
          if (po != null) { // ≥2 samples: pair is internal to the window
            st.ord2 = po; st.v2 = r.getDouble(iPv)
          } else { // 1 sample: pairs with the previous window's last
            st.ord2 = st.ord1; st.v2 = st.v1
          }
          st.ord1 = lo; st.v1 = r.getDouble(iLv)
        }
      }
    }
    val out = bySeries.iterator
      .filter(_._2.ord2 != null)
      .toArray
      .sortBy(_._1)(Utf8Order)
      .map { case (sk, st) =>
        val delta = if (st.v1 < st.v2) st.v1 else st.v1 - st.v2
        val dtNs = st.ord1._1 - st.ord2._1
        // zero-dt guard mirroring the raw operator (TsAnalytics.irate
        // wraps the divisor in when(dt =!= 0L, ...) → null rate): a
        // same-timestamp trailing pair must not emit ±Inf/NaN here
        val rate: java.lang.Double =
          if (dtNs == 0L) null else delta * 1e9 / dtNs.toDouble
        Row(st.metric, st.tags, sk, st.ord1._1, st.v1, delta, rate)
      }
    // LIMIT parity with the Spark path ([[TsdbEngine.analyze]]'s df.limit)
    p.limit.fold(out)(n => out.take(n.toInt))
  }

  private def startAligned(p: QueryParams, interval: Long): Long =
    p.startNs - java.lang.Math.floorMod(p.startNs, interval)

  private[tsdb] def tagsMatch(r: Row, iTags: Int, p: QueryParams): Boolean =
    p.tags.isEmpty || {
      val tg = r.getAs[scala.collection.Map[String, String]](iTags)
      p.tags.forall { case (k, v) =>
        tg != null && TagMatch.matches(v, tg.get(k).orNull) }
    }
}
