package graft.nbql

import graft.model.FieldValue
import graft.tsdb.{AggSpec, AnalyzeChanges, AnalyzeChangesBy,
  AnalyzeCorrelate, AnalyzeCumsum,
  AnalyzeDelta, AnalyzeDeltaBy, AnalyzeDeriv,
  AnalyzeEwma, AnalyzeEwmaBy, AnalyzeHolt, AnalyzeHoltBy,
  AnalyzeIrate, AnalyzePredict, AnalyzeRate,
  AnalyzeRateBy, AnalyzeResets, AnalyzeResetsBy,
  AnalyzeRatio, AnalyzeSpec, AnalyzeTopK,
  AnalyzeTwa, AnalyzeZScore, Ascending, Descending,
  FillLinear, FillNone, FillPrevious}
import scala.util.parsing.combinator.RegexParsers

/** NBQL text parser (grammar per SURVEY §3.4, reconstructed from the
  * reference's AST usage and the literal query strings in its tests, e.g.
  * `server/app_server_tcp_test.go:169`, `clients/nbql/golang/example/
  * main.go:88`). Keywords are case-insensitive; metric names are bare
  * dotted identifiers or quoted strings; durations accept ns/us/ms/s/m/h/d;
  * bare timestamps are ns since epoch. */
object NbqlParser extends RegexParsers {

  private def kw(s: String): Parser[String] = (s"(?i)${java.util.regex.Pattern.quote(s)}\\b").r

  private val identifier: Parser[String] = """[A-Za-z_][A-Za-z0-9_.\-]*""".r
  /** Quoted strings unescape a DOUBLED quote to a literal one — the
    * convention the reference clients emit when substituting `?` params
    * (`clients/nbql/python/nbql/client.py:_quote_param`), so a value
    * containing a quote can never break out of its string. */
  private val quoted: Parser[String] =
    "\"" ~> """(?:[^"]|"")*""".r <~ "\"" ^^ (_.replace("\"\"", "\"")) |
      "'" ~> """(?:[^']|'')*""".r <~ "'" ^^ (_.replace("''", "'"))
  private val name: Parser[String] = quoted | identifier
  /** Metric SELECTOR: a metric name optionally ending in `*` (prefix
    * fan-out — read paths only; writes keep exact [[name]]). */
  private val metricSel: Parser[String] =
    quoted | """[A-Za-z_][A-Za-z0-9_.\-]*\*?""".r

  private val longNum: Parser[Long] = """-?\d+""".r ^^ (_.toLong)
  private val doubleNum: Parser[Double] = """-?\d+\.\d+([eE][+-]?\d+)?""".r ^^ (_.toDouble)

  /** `1h` `30s` `500ms` `10us` `100ns` `2d` → nanoseconds. */
  private val duration: Parser[Long] =
    """(\d+)(ns|us|ms|s|m|h|d)""".r ^^ { s =>
      val m = """(\d+)(ns|us|ms|s|m|h|d)""".r.findFirstMatchIn(s).get
      val v = m.group(1).toLong
      m.group(2) match {
        case "ns" => v
        case "us" => v * 1000L
        case "ms" => v * 1000000L
        case "s"  => v * 1000000000L
        case "m"  => v * 60L * 1000000000L
        case "h"  => v * 3600L * 1000000000L
        case "d"  => v * 86400L * 1000000000L
      }
    }

  private val fieldValue: Parser[FieldValue] =
    kw("TRUE") ^^^ FieldValue.ofBool(true) |
    kw("FALSE") ^^^ FieldValue.ofBool(false) |
    kw("NULL") ^^^ FieldValue.NilValue |
    doubleNum ^^ FieldValue.ofDouble |
    longNum ^^ FieldValue.ofLong |
    quoted ^^ FieldValue.ofString

  private val tagPair: Parser[(String, String)] =
    (name <~ "=") ~ (quoted | identifier | """-?\d+""".r) ^^ { case k ~ v => k -> v }
  private val tagged: Parser[Map[String, String]] =
    kw("TAGGED") ~> "(" ~> repsep(tagPair, ",") <~ ")" ^^ (_.toMap)

  private val setPair: Parser[(String, FieldValue)] =
    (name <~ "=") ~ fieldValue ^^ { case k ~ v => k -> v }

  private val pushItem: Parser[PushStatement] =
    name ~ opt(tagged) ~
      (kw("SET") ~> "(" ~> repsep(setPair, ",") <~ ")") ~
      opt(kw("AT") ~> longNum) ^^ {
      case m ~ tg ~ fs ~ at => PushStatement(m, tg.getOrElse(Map.empty), fs.toMap, at)
    }

  private val push: Parser[PushStatement] = kw("PUSH") ~> pushItem

  /** Batch push — text form of the reference's binary PUSHS frame
    * (`api/nbql/nbql.go:631`): N PUSH-shaped items, one storage commit. */
  private val pushs: Parser[PushsStatement] =
    kw("PUSHS") ~> rep1sep(pushItem, ",") ^^ PushsStatement

  /** `avg(load1)`, `count(*)`, `p99.9(lat) AS p_lat` */
  private val aggSpec: Parser[AggSpec] =
    ("""[A-Za-z_][A-Za-z0-9_.]*""".r <~ "(") ~ (("*": Parser[String]) | name) ~ (")" ~>
      opt(kw("AS") ~> name)) ^^ {
      case f ~ fld ~ alias => AggSpec(f.toLowerCase, fld, alias)
    }

  private val timeRange: Parser[QueryStatement => QueryStatement] =
    kw("FROM") ~> kw("RELATIVE") ~> "(" ~> duration <~ ")" ^^ {
      d => (q: QueryStatement) => q.copy(relativeNs = Some(d))
    } |
    (kw("FROM") ~> longNum) ~ (kw("TO") ~> longNum) ^^ {
      case a ~ b => (q: QueryStatement) => q.copy(fromNs = Some(a), toNs = Some(b))
    }

  private val aggregateClause: Parser[QueryStatement => QueryStatement] =
    kw("AGGREGATE") ~> opt(kw("BY") ~> duration) ~
      ("(" ~> rep1sep(aggSpec, ",") <~ ")") ^^ {
      case by ~ specs => (q: QueryStatement) => q.copy(aggs = specs, byIntervalNs = by)
    }

  /** `ANALYZE RATE(f) | DELTA(f) | IRATE(f) | RESETS(f) | CHANGES(f) |
    * PREDICT(f, <dur>) |
    * EWMA(f, α) | HOLT(f, α, β) | TWA(f) BY <dur> |
    * CUMSUM(f) | ZSCORE(f, lookback, threshold)` — the TS analytics pack
    * ([[graft.tsdb.AnalyzeSpec]]). The field is explicit, like the
    * AGGREGATE grammar's `avg(load1)`; numeric parameters accept int or
    * decimal literals; TWA reuses the AGGREGATE BY duration grammar.
    * An optional `SPLIT <dur>` anywhere in the query tail turns on
    * hot-series time-splitting for RATE/EWMA/HOLT/TWA
    * ([[graft.tsdb.TsAnalytics]] `splitNs`). */
  private val numLit: Parser[Double] = doubleNum | longNum ^^ (_.toDouble)
  private val analyzeSpec: Parser[AnalyzeSpec] =
    kw("RATE") ~> ("(" ~> name <~ ")") ~ opt(kw("BY") ~> duration) ^^ {
      case f ~ None => AnalyzeRate(f)
      case f ~ Some(d) => AnalyzeRateBy(f, d) } |
    kw("DELTA") ~> ("(" ~> name <~ ")") ~ opt(kw("BY") ~> duration) ^^ {
      case f ~ None => AnalyzeDelta(f)
      case f ~ Some(d) => AnalyzeDeltaBy(f, d) } |
    kw("IRATE") ~> "(" ~> name <~ ")" ^^ AnalyzeIrate |
    kw("RESETS") ~> ("(" ~> name <~ ")") ~ opt(kw("BY") ~> duration) ^^ {
      case f ~ None => AnalyzeResets(f)
      case f ~ Some(d) => AnalyzeResetsBy(f, d) } |
    kw("CHANGES") ~> ("(" ~> name <~ ")") ~ opt(kw("BY") ~> duration) ^^ {
      case f ~ None => AnalyzeChanges(f)
      case f ~ Some(d) => AnalyzeChangesBy(f, d) } |
    kw("DERIV") ~> "(" ~> name <~ ")" ^^ AnalyzeDeriv |
    kw("PREDICT") ~> "(" ~> (name <~ ",") ~ duration <~ ")" ^^ {
      case f ~ h => AnalyzePredict(f, h) } |
    kw("EWMA") ~> ("(" ~> (name <~ ",") ~ numLit <~ ")") ~
        opt(kw("BY") ~> duration) ^^ {
      case f ~ a ~ None => AnalyzeEwma(f, a)
      case f ~ a ~ Some(d) => AnalyzeEwmaBy(f, a, d) } |
    kw("HOLT") ~> ("(" ~> (name <~ ",") ~ (numLit <~ ",") ~ numLit <~ ")") ~
        opt(kw("BY") ~> duration) ^^ {
      case f ~ a ~ b ~ None => AnalyzeHolt(f, a, b)
      case f ~ a ~ b ~ Some(d) => AnalyzeHoltBy(f, a, b, d) } |
    kw("TWA") ~> ("(" ~> name <~ ")") ~ (kw("BY") ~> duration) ^^ {
      case f ~ d => AnalyzeTwa(f, d) } |
    kw("CUMSUM") ~> "(" ~> name <~ ")" ^^ AnalyzeCumsum |
    kw("ZSCORE") ~> "(" ~> (name <~ ",") ~ (longNum <~ ",") ~ numLit <~ ")" ^^ {
      case f ~ n ~ t => AnalyzeZScore(f, n.toInt, t) } |
    kw("CORRELATE") ~> ("(" ~> (name <~ ",") ~ (name <~ ",") ~ name ~
        opt("," ~> longNum) <~ ")") ~ (kw("BY") ~> duration) ^^ {
      case f ~ b ~ k ~ mb ~ d =>
        AnalyzeCorrelate(f, b, k, d, mb.map(_.toInt).getOrElse(8)) } |
    kw("RATIO") ~> ("(" ~> (name <~ ",") ~ (name <~ ",") ~ name <~ ")") ~
        (kw("BY") ~> duration) ^^ {
      case f ~ b ~ k ~ d => AnalyzeRatio(f, b, k, d) } |
    kw("TOPK") ~> "(" ~> (longNum <~ ",") ~ name <~ ")" ^^ {
      case k ~ by => AnalyzeTopK(k.toInt, by) } |
    kw("BOTTOMK") ~> "(" ~> (longNum <~ ",") ~ name <~ ")" ^^ {
      case k ~ by => AnalyzeTopK(k.toInt, by, ascending = true) }

  private val queryTail: Parser[QueryStatement => QueryStatement] =
    tagged ^^ { tg => (q: QueryStatement) => q.copy(tags = tg) } |
    kw("ANALYZE") ~> analyzeSpec ^^ {
      sp => (q: QueryStatement) => q.copy(analyze = Some(sp)) } |
    kw("SPLIT") ~> (kw("AUTO") ^^^ graft.tsdb.TsAnalytics.SplitAuto | duration) ^^ {
      d => (q: QueryStatement) => q.copy(analyzeSplitNs = Some(d)) } |
    aggregateClause |
    kw("EMIT") ~ kw("EMPTY") ~ kw("WINDOWS") ^^^ {
      (q: QueryStatement) => q.copy(emitEmptyWindows = true) } |
    kw("FILL") ~> "(" ~> (
      kw("NONE") ^^^ FillNone | kw("PREVIOUS") ^^^ FillPrevious |
      kw("LINEAR") ^^^ FillLinear) <~ ")" ^^ {
      f => (q: QueryStatement) => q.copy(fill = f) } |
    kw("GROUP") ~> kw("BY") ~> kw("TAGS") ~> "(" ~> repsep(name, ",") <~ ")" ^^ {
      ks => (q: QueryStatement) => q.copy(groupByTags = Some(ks)) } |
    kw("FILTER") ~> "(" ~> name ~ ("""(>=|<=|!=|>|<|=)""".r) ~
      (doubleNum | longNum ^^ (_.toDouble)) <~ ")" ^^ {
      case f ~ op ~ v => (q: QueryStatement) =>
        q.copy(valueFilters = q.valueFilters :+ graft.tsdb.ValueFilter(f, op, v)) } |
    kw("ASC") ^^^ { (q: QueryStatement) => q.copy(order = Ascending) } |
    kw("DESC") ^^^ { (q: QueryStatement) => q.copy(order = Descending) } |
    kw("LIMIT") ~> longNum ^^ { n => (q: QueryStatement) => q.copy(limit = Some(n)) } |
    kw("AFTER") ~> (quoted | """[A-Za-z0-9+/=]+""".r) ^^ {
      c => (q: QueryStatement) => q.copy(after = Some(c)) } |
    timeRange

  private val query: Parser[QueryStatement] =
    kw("QUERY") ~> metricSel ~ rep(queryTail) ^^ {
      case m ~ mods => mods.foldLeft(QueryStatement(m))((q, f) => f(q))
    }

  private val remove: Parser[Statement] =
    kw("REMOVE") ~> kw("SERIES") ~> name ~ opt(tagged) ^^ {
      case m ~ tg => RemoveSeriesStatement(m, tg.getOrElse(Map.empty))
    } |
    kw("REMOVE") ~> kw("FROM") ~> name ~ opt(tagged) ~ (kw("AT") ~> longNum) ^^ {
      case m ~ tg ~ ts => RemovePointStatement(m, tg.getOrElse(Map.empty), ts)
    } |
    kw("REMOVE") ~> kw("FROM") ~> name ~ opt(tagged) ~
      (kw("FROM") ~> longNum) ~ (kw("TO") ~> longNum) ^^ {
      case m ~ tg ~ a ~ b => RemoveRangeStatement(m, tg.getOrElse(Map.empty), a, b)
    }

  private val show: Parser[Statement] =
    kw("SHOW") ~> kw("METRICS") ^^^ ShowMetricsStatement |
    kw("SHOW") ~> kw("CARDINALITY") ~> opt(kw("ESTIMATE")) ~
      opt(kw("FROM") ~> metricSel) ~ opt(kw("BY") ~> duration) ^^ {
      case est ~ m ~ d => ShowCardinalityStatement(m, d, est.isDefined)
    } |
    kw("SHOW") ~> kw("TAG") ~> kw("KEYS") ~> kw("FROM") ~> name ^^ ShowTagKeysStatement |
    kw("SHOW") ~> kw("TAG") ~> kw("VALUES") ~> opt(kw("FROM") ~> name) ~
      (kw("WITH") ~> kw("KEY") ~> "=" ~> name) ^^ {
      case m ~ k => ShowTagValuesStatement(m, k)
    }

  private val smoothSpecP: Parser[graft.tsdb.SmoothSpec] =
    kw("EWMA") ~> "(" ~> (name <~ ",") ~ numLit <~ ")" ^^ {
      case f ~ a => graft.tsdb.SmoothSpec(f, "ewma", a) } |
    kw("HOLT") ~> "(" ~> (name <~ ",") ~ (numLit <~ ",") ~ numLit <~ ")" ^^ {
      case f ~ a ~ b => graft.tsdb.SmoothSpec(f, "holt", a, b) }

  private val rollup: Parser[Statement] =
    kw("CREATE") ~> kw("ROLLUP") ~> name ~ (kw("BY") ~> duration) ~
      ("(" ~> rep1sep(name, ",") <~ ")") ~
      opt(kw("WITH") ~> kw("DIGESTS")) ~
      opt(kw("SMOOTH") ~> rep1sep(smoothSpecP, ",")) ^^ {
      case m ~ d ~ fs ~ dig ~ sm =>
        CreateRollupStatement(m, d, fs, dig.isDefined, sm.getOrElse(Nil))
    } |
    kw("DROP") ~> kw("ROLLUP") ~> name ^^ DropRollupStatement |
    kw("SHOW") ~> kw("ROLLUPS") ^^^ ShowRollupsStatement |
    kw("CREATE") ~> kw("CARDINALITY") ~> kw("SUMMARY") ~>
      (kw("BY") ~> duration) ~ opt(kw("LGK") ~> longNum) ^^ {
      case d ~ k => CreateCardinalitySummaryStatement(d, k.map(_.toInt))
    } |
    kw("DROP") ~> kw("CARDINALITY") ~> kw("SUMMARY") ^^^
      DropCardinalitySummaryStatement

  private val flush: Parser[Statement] =
    kw("FLUSH") ~> opt(kw("MEMTABLE") | kw("DISK") | kw("ALL")) ^^ {
      t => FlushStatement(t.map(_.toUpperCase).getOrElse("ALL"))
    }

  private val snapshotRestore: Parser[Statement] =
    kw("SNAPSHOT") ^^^ SnapshotStatement |
    kw("RESTORE") ~> kw("FROM") ~> quoted ~ opt(kw("WITH") ~> kw("OVERWRITE")) ^^ {
      case p ~ ow => RestoreStatement(p, ow.isDefined)
    }

  private val explain: Parser[Statement] =
    kw("EXPLAIN") ~> query ^^ ExplainStatement

  private val statement: Parser[Statement] =
    (pushs | push | explain | query | remove | rollup | show | flush |
      snapshotRestore) <~ opt(";")

  def parse(input: String): Either[String, Statement] =
    parseAll(statement, input) match {
      case Success(s, _) => Right(s)
      case NoSuccess(msg, next) =>
        Left(s"parse error at ${next.pos.line}:${next.pos.column}: $msg")
      case other => Left(s"parse error: $other")
    }

  /** A whole `;`-separated script (quoted strings may contain `;`). */
  def parseScript(input: String): Either[String, Seq[Statement]] =
    parseAll(rep1(statement), input) match {
      case Success(s, _) => Right(s)
      case NoSuccess(msg, next) =>
        Left(s"parse error at ${next.pos.line}:${next.pos.column}: $msg")
      case other => Left(s"parse error: $other")
    }
}
