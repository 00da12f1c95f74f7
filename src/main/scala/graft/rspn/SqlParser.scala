package graft.rspn

import graft.schema.SchemaGraph
import java.time.LocalDate
import scala.util.matching.Regex

/** SQL-text entry point for the model plane — the reference's
  * evaluation/utils.py::parse_query analog: the restricted query class
  * (COUNT/SUM/AVG over PK–FK join trees with conjunctive predicates and
  * optional GROUP BY) parsed from ANSI SQL text into a `ParsedQuery`, then
  * compiled to model-plane estimates. The same SQL string runs verbatim on
  * the exact plane (spark.sql / DuckDB), which is how the accuracy spec
  * cross-checks it.
  *
  * Deliberately NOT a general SQL parser: unsupported constructs throw with
  * a message, exactly as the reference's sqlparse-based extractor only
  * accepts its benchmark query shapes.
  */
object SqlParser {

  sealed trait Agg
  case object Count extends Agg
  final case class Sum(table: String, col: String) extends Agg
  final case class Avg(table: String, col: String) extends Agg
  /** SUM(a*b) — SSB-style revenue (reference parse_query accepts the same
    * product form for its SSB workload).
    */
  final case class SumProduct(ta: String, ca: String, tb: String, cb: String) extends Agg
  /** COUNT(DISTINCT col) — exact plane: countDistinct; model plane: the size
    * of the nonzero-probability group enumeration over `col` (a categorical
    * dictionary is the column's complete domain, so the enumeration IS the
    * distinct set under the predicates).
    */
  final case class CountDistinct(table: String, col: String) extends Agg
  /** `±` combination of two aggregate terms — the reference's
    * `AggregationOperationType.PLUS/MINUS` chains (graph_representation.py):
    * COUNT/SUM/SUM(a*b) terms, plus AVG since r17 (a ratio of two linear
    * estimates; COUNT(DISTINCT) stays rejected — a set size carries no
    * interval arithmetic).
    */
  final case class Combo(plus: Boolean, left: Agg, right: Agg) extends Agg

  /** `preds` and `orPreds`: when `orPreds` is empty the WHERE clause is the
    * conjunction `preds`; otherwise it is `(preds) OR (orPreds)` — common
    * conjuncts outside the parenthesized OR group are distributed into BOTH
    * branches (C ∧ (A ∨ B) ≡ (C∧A) ∨ (C∧B)), which is exactly the shape
    * inclusion–exclusion needs.
    */
  final case class ParsedQuery(
      agg: Agg,
      from: String,
      tables: Set[String],
      joins: Seq[JoinEdge],
      preds: Seq[Pred],
      orPreds: Seq[Pred],
      groupBy: Seq[(String, String)],
      groupMode: GroupMode = GroupFlat,
      having: Option[Having] = None,
      orderBy: Seq[OrderKey] = Nil,
      limit: Option[Int] = None,
      /** `GROUP BY year(col)/month(col)/quarter(col)[, cal2, cal3][, dims...]`
        * — the SQL-text plane's calendar grouping (r14; THREE since r15):
        * up to three leading (fn, table, days column) calendar expressions
        * composing as a bucket cross product (per-column interval meets,
        * the Catalyst seasonal-matrix fold), with `groupBy` carrying any
        * trailing dictionary dimension columns.
        * The estimate plane buckets the model's realized date domain; the
        * exact plane groups by the matching Spark functions.
        */
      calGroup: Seq[(String, String, String)] = Nil,
      /** Independent parenthesized OR groups in their UNDISTRIBUTED form
        * (r18, generalizing the r17 pair slots): each group a list of
        * branch conjunctions, every branch raw — the common conjuncts stay
        * in `preds` (with `orPreds` empty) and conjoin into every signed
        * product term downstream. Populated whenever the WHERE holds ≥2
        * effective groups OR any group with ≥3 branches; the single
        * 2-branch-group WHERE keeps the legacy distributed (preds, orPreds)
        * spelling for the inclusion–exclusion plane. Non-empty routes the
        * estimator to the signed-expansion machinery, whose total term
        * product Π_g (2^{k_g}−1) the parser caps at 27.
        */
      orGroupsN: Seq[Seq[Seq[Pred]]] = Nil)

  /** `HAVING <agg> <cmp> <number>` — a post-aggregation filter. The
    * reference's parse_query has no HAVING arm (its benchmark class stops at
    * GROUP BY), but the exact plane is a general entry point and a user's
    * first real query has one.
    */
  final case class Having(agg: Agg, op: String, value: Double)

  /** One ORDER BY key: the aggregate value (`byAgg`, matched by the SELECT
    * alias, the literal aggregate expression, or the output name `val`) or a
    * GROUP BY column.
    */
  final case class OrderKey(byAgg: Boolean, table: String, col: String, asc: Boolean)

  /** How the GROUP BY columns combine: flat (plain GROUP BY), or the
    * ROLLUP/CUBE grouping-set hierarchies (SQL sugar over the model plane's
    * estRollup/estCube and the exact plane's rollup/cube operators).
    */
  sealed trait GroupMode
  case object GroupFlat extends GroupMode
  case object GroupRollup extends GroupMode
  case object GroupCube extends GroupMode

  /** One JOIN clause: `table` newly joined into scope on `a = b`. */
  final case class JoinEdge(table: String, a: String, b: String)

  /** One conjunct, pre-encoding: values still carry their SQL literal form. */
  final case class Pred(table: String, col: String, range: RangeSpec)

  sealed trait RangeSpec
  final case class NumR(lo: Double, hi: Double, loIncl: Boolean, hiIncl: Boolean) extends RangeSpec
  final case class DateR(lo: Double, hi: Double, loIncl: Boolean, hiIncl: Boolean) extends RangeSpec
  final case class StrIn(values: Seq[String]) extends RangeSpec
  /** SQL LIKE pattern (`%`/`_` wildcards, no escape syntax). On the model
    * plane this compiles to the set of dictionary codes matching the
    * pattern — a NominalSet, so the leaf machinery is untouched.
    */
  final case class StrLike(pattern: String) extends RangeSpec
  /** `!=` / `<>` / `NOT IN` over string literals: the dictionary complement
    * on the model plane. SQL three-valued logic excludes NULLs from both
    * planes (a NominalSet's mass never includes the null mass).
    */
  final case class StrNotIn(values: Seq[String]) extends RangeSpec
  /** `!=` / `<>` / `NOT IN` over NUMERIC or DATE literals: the
    * multi-interval point complement (the reference's
    * `ranges.py::NumericRange` negation). Values are in the MODEL's
    * numeric encoding — raw doubles for "num" columns, epoch days for
    * dates.
    */
  final case class NumNotIn(values: Seq[Double], isDate: Boolean = false) extends RangeSpec
  /** `IS NOT NULL` — the reference's `*_nn` indicator predicate, mapped
    * straight onto the model plane's NotNullRange.
    */
  case object NotNull extends RangeSpec
  /** Union of intervals on ONE numeric or date column — the CNF
    * pre-simplification's absorption target (r18): a parenthesized
    * same-column disjunction `(a < 5 OR a > 10)` collapses to one plain
    * conjunct instead of costing a 3^N expansion slot. Intervals are
    * (lo, hi, loIncl, hiIncl) in the parser's literal units; `isDate`
    * mirrors the NumR/DateR encoding split (epoch days, scaled against
    * the modeled encoding at compile time). The model plane normalizes to
    * a NumRange/MultiRange; the exact plane compiles an OR of bounds.
    */
  final case class NumUnion(
      intervals: Seq[(Double, Double, Boolean, Boolean)],
      isDate: Boolean) extends RangeSpec

  /** The dataset whose schema resolves columns/edges for the CURRENT parse
    * call — set by [[parseQuery]]/[[parse]], defaulting to the testdata
    * binding, so any sidecar-declared dataset (schema/DatasetSpec.scala)
    * gets the full SQL-text surface with no parser changes.
    */
  private val activeSpec =
    new scala.util.DynamicVariable[graft.schema.DatasetSpec](graft.schema.DatasetSpec.testdata)

  /** column → owning table, built from everything a spec DECLARES: modeled
    * columns, primary keys, relationship endpoints, irrelevant columns.
    * Ambiguous names (declared by several tables) resolve to None and fail
    * at lookup with the ambiguity named.
    */
  private val ownerCache =
    new java.util.concurrent.ConcurrentHashMap[graft.schema.SchemaGraph, Map[String, Option[String]]]()

  private def columnOwners(spec: graft.schema.DatasetSpec): Map[String, Option[String]] =
    ownerCache.computeIfAbsent(spec.graph, _ => {
      val pairs =
        spec.modeled.toSeq.flatMap { case (t, cs) => cs.map { case (c, _) => (c, t) } } ++
          spec.graph.tables.flatMap(t => t.primaryKey.map(c => (c, t.name))) ++
          spec.graph.tables.flatMap(t => t.irrelevant.map(c => (c, t.name))) ++
          spec.graph.relationships.flatMap(r => Seq((r.fk, r.many), (r.pk, r.one)))
      pairs.groupBy(_._1).map { case (c, owners) =>
        val ts = owners.map(_._2).distinct
        c -> (if (ts.length == 1) Some(ts.head) else None)
      }
    })

  /** Column → table resolution over the active dataset's declared schema;
    * the testdata binding keeps its TPC-H-style prefix fallback for columns
    * the spec does not declare (e.g. r_name — never modeled, never a key).
    */
  def tableOf(col: String): String = {
    val spec = activeSpec.value
    columnOwners(spec).get(col) match {
      case Some(Some(t)) => t
      case Some(None) => fail(s"column '$col' is declared by more than one table")
      case None if spec eq graft.schema.DatasetSpec.testdata =>
        col.takeWhile(_ != '_') match {
          case "r" => "region"
          case "n" => "nation"
          case "s" => "supplier"
          case "c" => "customer"
          case "p" => "part"
          case "o" => "orders"
          case "l" => "lineitem"
          case _   => fail(s"cannot resolve table of column '$col'")
        }
      case None => fail(s"cannot resolve table of column '$col' in the active dataset's schema")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"unsupported SQL: $msg")

  private val selectRe: Regex =
    // one GROUP BY item is a bare column or a single-level function call
    // (YEAR(d), FLOOR(x/100), WIDTH_BUCKET(x, lo, hi, n), ROUND(x, -2) —
    // r16); ROLLUP/CUBE ride the same fn-call alternative, their argument
    // commas sitting inside the parens, and groupSetRe re-discriminates
    // the captured text downstream
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(.*?)(?:\s+WHERE\s+(.*?))?(?:\s+GROUP\s+BY\s+((?:\w+\s*\([^()]*\)|\w+)(?:\s*,\s*(?:\w+\s*\([^()]*\)|\w+))*))?(?:\s+HAVING\s+(.*?))?(?:\s+ORDER\s+BY\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""".r
  private val selAliasRe: Regex = """(?is)^(.*?)\s+AS\s+(\w+)\s*$""".r
  private val leadColRe: Regex = """(?is)^(?:\w+\.)?(\w+)$""".r
  private val havingRe: Regex = """(?is)^(.+?)\s*(<=|>=|<|>|=)\s*(-?\d+(?:\.\d+)?)$""".r
  private val orderKeyRe: Regex = """(?is)^(.*?)(?:\s+(ASC|DESC))?\s*$""".r

  /** selectRe is quote-blind: a literal containing ' GROUP BY ', ' ORDER
    * BY ' etc. would be torn apart by the clause regex. Mask every quoted
    * literal to a keyword-free token before matching and unmask the captured
    * groups after (escape syntax is unsupported throughout this parser).
    */
  private def maskLiterals(s: String): (String, IndexedSeq[String]) = {
    val lits = scala.collection.mutable.ArrayBuffer.empty[String]
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        val j = s.indexOf('\'', i + 1)
        if (j < 0) { out.append(s.substring(i)); i = s.length } // unbalanced: leave as-is
        else {
          out.append('\'').append('\u0001').append(lits.length).append('\'')
          lits += s.substring(i + 1, j)
          i = j + 1
        }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    (out.toString, lits.toIndexedSeq)
  }

  private def unmask(s: String, lits: IndexedSeq[String]): String =
    "\u0001(\\d+)".r.replaceAllIn(s, m => Regex.quoteReplacement(lits(m.group(1).toInt)))
  private val groupSetRe: Regex = """(?is)^(ROLLUP|CUBE)\s*\((.*)\)$""".r
  private val calGroupRe: Regex =
    """(?i)^(YEAR|MONTH|QUARTER|HOUR|MINUTE|DAYOFMONTH)\s*\(\s*(\w+)\s*\)$""".r
  // arithmetic-bin grouping expressions over num-modeled columns (r16,
  // parity with the Catalyst plane's binned fold): FLOOR(col[/w]),
  // WIDTH_BUCKET(col, lo, hi, n), ROUND(col, -k). Encoded into the
  // calGroup fn slot as "floor:<w>" / "width_bucket:<lo>:<hi>:<n>" /
  // "round:<scale>" so the tuple shape (fn, table, col) is unchanged.
  private val binFloorRe: Regex =
    """(?i)^FLOOR\s*\(\s*(\w+)\s*(?:/\s*([0-9]*\.?[0-9]+(?:[eE][+-]?[0-9]+)?)\s*)?\)$""".r
  private val binWidthRe: Regex =
    """(?i)^WIDTH_BUCKET\s*\(\s*(\w+)\s*,\s*(-?[0-9]*\.?[0-9]+)\s*,\s*(-?[0-9]*\.?[0-9]+)\s*,\s*([0-9]+)\s*\)$""".r
  private val binRoundRe: Regex = """(?i)^ROUND\s*\(\s*(\w+)\s*,\s*(-?[0-9]+)\s*\)$""".r
  // tumbling/sliding `WINDOW(ts, '<size>'[, '<slide>'])` grouping (r16
  // late, parity with the Catalyst window folds): durations parse to
  // WHOLE SECONDS (the model encodes epoch seconds; a fractional-second
  // step would regroup within FP noise) and encode into the calGroup fn
  // slot as "window:<sizeSec>:<slideSec>". The 4-arg startTime spelling
  // is NOT parsed — it fails on the uniform unsupported-shape channel.
  private val windowRe: Regex =
    """(?i)^WINDOW\s*\(\s*(\w+)\s*,\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)$""".r
  // `DATE_FORMAT(col, '<fmt>')` grouping (r16 late, parity with the
  // Catalyst date_format fold): any format WITHOUT sub-day or zone
  // pattern letters is constant within a day, so daily buckets keyed by
  // the format's own value (evaluated through Spark's formatter) merge on
  // equal keys. Encoded as "datefmt:<fmt>" — consumers substring past the
  // prefix rather than split on ':' (a format may contain colons).
  private val dateFmtRe: Regex =
    """(?i)^DATE_FORMAT\s*\(\s*(\w+)\s*,\s*'([^']*)'\s*\)$""".r
  private def dayGranular(fmt: String): Boolean =
    !"HkKhmsSaAVzOXxZn".exists(ch => fmt.contains(ch))
  // SUB-DAY formats (r17; seconds r19): finest letter hour (H/k/K/h;
  // 'a'/'A' am-pm markers ride along, constant within the hour), minute
  // (m), or second (s — folds only when the predicate-narrowed span fits
  // the bucket cap at a 1-second step, i.e. spans under ~33 minutes; the
  // cap check lives with the bucket generator) — encoded
  // "datefmtsub:<fmt>", secs-modeled columns only. Fraction/zone letters
  // still fail (sub-second regroups within the model's second encoding;
  // zone renders need a zone the fold does not model).
  private def subDayGranular(fmt: String): Boolean =
    "HkKhms".exists(ch => fmt.contains(ch)) &&
      !"SVzOXxZn".exists(ch => fmt.contains(ch))
  private val durationRe: Regex = """(?i)^\s*(\d+)\s*(second|minute|hour|day)s?\s*$""".r
  private def durationSec(s: String): Long = s match {
    case durationRe(n, unit) =>
      n.toLong * (unit.toLowerCase match {
        case "second" => 1L
        case "minute" => 60L
        case "hour"   => 3600L
        case "day"    => 86400L
      })
    case other => fail(s"WINDOW duration '$other': expected '<n> second|minute|hour|day[s]'")
  }

  /** One bucket grouping expression — calendar or arithmetic-bin — as its
    * encoded (fn, column) pair, or None when the item is not a bucket
    * expression (a plain column, or an unsupported shape that fails later
    * on the parser's uniform channel). ROUND with a positive scale is NOT
    * a bucket expression (fractional bins regroup within FP noise of the
    * realized values — the Catalyst plane falls back there too).
    */
  private def bucketExprOf(item: String): Option[(String, String)] = item.trim match {
    case calGroupRe(fn, c)        => Some((fn.toLowerCase, c))
    case binFloorRe(c, w)         => Some((s"floor:${Option(w).getOrElse("1")}", c))
    case binWidthRe(c, lo, hi, n) => Some((s"width_bucket:$lo:$hi:$n", c))
    case binRoundRe(c, s) if s.toInt <= 0 && s.toInt >= -15 => Some((s"round:$s", c))
    case windowRe(c, size, slide) =>
      val sz = durationSec(size)
      Some((s"window:$sz:${Option(slide).map(durationSec).getOrElse(sz)}", c))
    case dateFmtRe(c, fmt) if dayGranular(fmt) => Some((s"datefmt:$fmt", c))
    case dateFmtRe(c, fmt) if subDayGranular(fmt) => Some((s"datefmtsub:$fmt", c))
    case _                        => None
  }

  private def isCalendarFn(fn: String): Boolean =
    fn == "year" || fn == "month" || fn == "quarter" ||
      fn == "hour" || fn == "minute" || fn == "dayofmonth"
  private val aggRe: Regex =
    """(?i)^(COUNT\(\s*DISTINCT\s+(\w+)\s*\)|COUNT\(\s*\*\s*\)|SUM\(\s*(\w+)(?:\s*\*\s*(\w+))?\s*\)|AVG\(\s*(\w+)\s*\))(?:\s+AS\s+\w+)?$""".r
  private val joinRe: Regex = """(?i)\s+JOIN\s+""".r
  private val onRe: Regex = """(?i)^(\w+)\s+ON\s+(\w+)\s*=\s*(\w+)$""".r

  private def parseAggTerm(s: String): Agg = s.trim match {
    case aggRe(whole, distinctCol, sumCol, sumCol2, avgCol) =>
      if (distinctCol != null) CountDistinct(tableOf(distinctCol), distinctCol)
      else if (whole.toUpperCase.startsWith("COUNT")) Count
      else if (sumCol2 != null) {
        // a repeated column would need the E[x²] moment on the feature
        // pass; downstream feature Maps would silently collapse it to
        // SUM(a), so reject it uniformly at parse time
        if (sumCol.equalsIgnoreCase(sumCol2)) fail(s"SUM($sumCol * $sumCol2): repeated product column")
        SumProduct(tableOf(sumCol), sumCol, tableOf(sumCol2), sumCol2)
      }
      else if (sumCol != null) Sum(tableOf(sumCol), sumCol)
      else Avg(tableOf(avgCol), avgCol)
    case other => fail(s"aggregate '$other' (COUNT(*)/SUM(col)/SUM(a*b)/AVG(col) only)")
  }

  /** Split on commas at paren-depth 0 outside quotes — the SELECT-list
    * separator; commas inside function parens or string literals never
    * split.
    */
  private def splitTopCommas(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    s.foreach { c =>
      if (c == '\'') { inQ = !inQ; cur.append(c) }
      else if (!inQ && c == '(') { depth += 1; cur.append(c) }
      else if (!inQ && c == ')') { depth -= 1; cur.append(c) }
      else if (!inQ && depth == 0 && c == ',') { parts += cur.toString; cur.clear() }
      else cur.append(c)
    }
    parts += cur.toString
    parts.toSeq
  }

  /** One `+`/`-` at paren-depth 0 outside quotes, if any (the SUM(a)±SUM(b)
    * split point; `*` inside SUM(a*b) never reaches depth 0).
    */
  private def splitTopPlusMinus(s: String): Option[(String, Char, String)] = {
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') depth -= 1
      else if (!inQ && depth == 0 && (c == '+' || c == '-') && i > 0)
        return Some((s.substring(0, i), c, s.substring(i + 1)))
      i += 1
    }
    None
  }

  def parse(sql: String): ParsedQuery = {
    val (maskedSql, lits) = maskLiterals(sql)
    maskedSql match {
      case selectRe(sel0m, from, whereM, group, havingM, orderM, limitS) =>
        parseClauses(
          unmask(sel0m, lits), from,
          Option(whereM).map(unmask(_, lits)).orNull,
          // GROUP BY carries literals since the WINDOW grouping (duration
          // strings); unmasking is a no-op for every other group syntax
          Option(group).map(unmask(_, lits)).orNull,
          Option(havingM).map(unmask(_, lits)).orNull,
          Option(orderM).map(unmask(_, lits)).orNull,
          limitS)
      case _ => fail("expected SELECT <agg> FROM <join tree> [WHERE ...] [GROUP BY cols] [HAVING ...] [ORDER BY ...] [LIMIT n]")
    }
  }

  private def parseClauses(
      sel0: String, from: String, where: String, group: String,
      havingS: String, orderS: String, limitS: String): ParsedQuery = {
    {
      // benchmark GROUP BY files list the group columns before the
      // aggregate (SELECT g1, g2, AGG(...) ... GROUP BY g1, g2) — accept
      // leading bare (optionally alias-qualified) columns as display
      // columns, validated below to equal the GROUP BY list in order
      val selParts = splitTopCommas(sel0)
      // a bucket GROUP BY's display column (`SELECT year(d), COUNT(*)` /
      // `SELECT floor(x/100), COUNT(*)`) is accepted when it repeats the
      // grouping expression verbatim; bucket expressions (calendar or
      // arithmetic bins, r16) lead the GROUP BY list, optionally followed
      // by dimension columns (`GROUP BY year(d), dim, ...`). Top-level
      // comma split: WIDTH_BUCKET's own argument commas sit inside parens.
      val groupParts: Seq[String] =
        Option(group).map(_.trim).toSeq.flatMap(splitTopCommas).map(_.trim)
      val calSyntax: Seq[(String, String)] =
        groupParts.iterator.map(bucketExprOf).takeWhile(_.isDefined).flatten.toSeq
      // three compose like two (per-column interval meets prune the cube —
      // year × quarter × month survives as ~84 tuples); calendarGroups'
      // 400-tuple cap still fails loudly on genuinely fine products
      if (calSyntax.length > 3) fail(
        "at most three bucket grouping expressions (the bucket cross product)")
      // Spark itself rejects >1 window expression per query — the planes
      // must fail uniformly on that shape, not diverge (r16 ADVICE)
      if (calSyntax.count(_._1.startsWith("window:")) > 1) fail(
        "multiple WINDOW(...) grouping expressions (Spark allows one window per query)")
      if (selParts.length > 1) calSyntax.zipWithIndex.foreach { case ((fn, c), i) =>
        val leads = selParts.lift(i).exists(bucketExprOf(_).contains((fn, c)))
        if (!leads) fail(
          s"bucket GROUP BY: SELECT item ${i + 1} must repeat the grouping " +
            s"expression over $c so result columns match the grouping order")
      }
      val leadCols = selParts.init.map(_.trim).filterNot(item =>
        bucketExprOf(item).exists(calSyntax.contains)).map {
        case leadColRe(c) => c
        case other => fail(
          s"SELECT list item '$other' (only GROUP BY columns may precede the aggregate)")
      }
      // a trailing `AS alias` names the aggregate for ORDER BY resolution
      val (sel, aggAlias) = selParts.last.trim match {
        case selAliasRe(e, a) => (e, Some(a))
        case e                => (e, None)
      }
      val agg = splitTopPlusMinus(sel.trim) match {
        case Some((l, op, r)) =>
          // parseAggTerm returns only leaf aggregates. AVG rides a ±
          // combination since r17 (each AVG is a ratio of two linear
          // estimates — the Catalyst plane's ExprOut already composed it);
          // COUNT(DISTINCT) rides since r18 — scalar AND per group/bucket
          // (a set size is a degenerate interval, evaluated per group by
          // the dictionary/realized-support enumeration and unioned over
          // branches, matching the Catalyst ExprOut fold's distinct
          // leaves), so every term builder on the estimate plane accepts
          // the full leaf class.
          Combo(op == '+', parseAggTerm(l), parseAggTerm(r))
        case None => parseAggTerm(sel.trim)
      }
      val (fromTable, tables, joins) = parseFrom(from.trim)
      val (preds, orPreds, orGroupsN) =
        Option(where).map(parseWhere).getOrElse((Nil, Nil, Nil))
      (preds ++ orPreds ++ orGroupsN.flatten.flatten).foreach(p =>
        if (!tables(p.table)) fail(s"predicate on ${p.col}: table ${p.table} not in FROM"))
      val (mode, groupCols) = Option(group).map(_.trim) match {
        case Some(groupSetRe(kind, cols)) =>
          (if (kind.equalsIgnoreCase("ROLLUP")) GroupRollup else GroupCube, Some(cols))
        case other => (GroupFlat, other)
      }
      val calGroup: Seq[(String, String, String)] = calSyntax.map { case (fn, c) =>
        val t = tableOf(c)
        if (!tables(t)) fail(s"GROUP BY $fn($c): table $t not in FROM")
        // kind dispatch (r16): calendar expressions need a date-encoded
        // source column ("days", or "secs" since the sub-day widening —
        // hour/minute are secs-ONLY, a day-granular encoding cannot
        // express their boundaries), arithmetic bins a num-modeled one
        val okKinds: Set[String] =
          if (fn.startsWith("window:")) Set("secs") // step-aligned epoch-second slices
          else if (fn.startsWith("datefmt:")) Set("days", "secs") // day-granular formats
          else if (fn.startsWith("datefmtsub:")) Set("secs") // hour/minute-step formats (r17)
          else if (!isCalendarFn(fn)) Set("num")
          else if (fn == "hour" || fn == "minute") Set("secs")
          else Set("days", "secs")
        if (!activeSpec.value.modeled.getOrElse(t, Nil)
              .exists(x => x._1 == c && okKinds(x._2)))
          fail(s"GROUP BY $fn($c): $c is not a ${okKinds.mkString("/")}-modeled column")
        (fn, t, c)
      }
      val groupBy = {
        val plain = if (calGroup.nonEmpty) groupParts.drop(calGroup.length)
                    else groupCols.toSeq.flatMap(_.split(",")).map(_.trim)
        plain.map { g =>
          val t = tableOf(g)
          if (!tables(t)) fail(s"GROUP BY $g: table $t not in FROM")
          (t, g)
        }
      }
      if (mode != GroupFlat && groupBy.isEmpty) fail("empty ROLLUP/CUBE column list")
      if (leadCols.nonEmpty && leadCols.map(c => (tableOf(c), c)) != groupBy) fail(
        s"SELECT columns ${leadCols.mkString(", ")} must equal the GROUP BY columns in order")
      val having = Option(havingS).map(_.trim).map {
        case havingRe(term, op, v) => Having(parseAggTerm(term), op, v.toDouble)
        case other                 => fail(s"HAVING '$other' (<agg> <cmp> <number> only)")
      }
      // a calendar expression IS a grouping — HAVING over `GROUP BY
      // year(d)` alone is legal SQL both planes post-filter (r15)
      if (having.isDefined && groupBy.isEmpty && calSyntax.isEmpty)
        fail("HAVING requires GROUP BY")
      val orderBy = Option(orderS).toSeq.flatMap(_.split(",")).map(_.trim).map {
        case orderKeyRe(expr0, dir) =>
          val expr = expr0.trim
          val asc = dir == null || dir.equalsIgnoreCase("ASC")
          if (expr.isEmpty) fail("empty ORDER BY key")
          val namesAgg = expr.equalsIgnoreCase("val") || aggAlias.exists(_.equalsIgnoreCase(expr))
          scala.util.Try(parseAggTerm(expr)).toOption match {
            case _ if namesAgg => OrderKey(byAgg = true, "", "", asc)
            case Some(a) =>
              // only the SELECT aggregate is computed — a different one has
              // no output column to sort on
              if (a != agg) fail(s"ORDER BY $expr: must match the SELECT aggregate")
              OrderKey(byAgg = true, "", "", asc)
            case None =>
              val t = tableOf(expr)
              if (!groupBy.contains((t, expr)))
                fail(s"ORDER BY $expr: not a GROUP BY column or the aggregate")
              OrderKey(byAgg = false, t, expr, asc)
          }
      }
      val limit = Option(limitS).map { l =>
        // the \d+ arm admits literals past Int range — keep the failure on
        // the parser's uniform unsupported-SQL channel
        val v = try l.toLong catch { case _: NumberFormatException => fail(s"LIMIT $l") }
        if (v < 1 || v > Int.MaxValue) fail(s"LIMIT $l out of range")
        v.toInt
      }
      // an un-ordered LIMIT returns engine-dependent rows — reject it rather
      // than break the determinism contract every declared query carries
      if (limit.isDefined && orderBy.isEmpty && (groupBy.nonEmpty || calGroup.nonEmpty))
        fail("LIMIT requires ORDER BY on a grouped query")
      ParsedQuery(agg, fromTable, tables, joins, preds, orPreds, groupBy, mode,
        having, orderBy, limit, calGroup, orGroupsN)
    }
  }

  private def parseFrom(from: String): (String, Set[String], Seq[JoinEdge]) = {
    val parts = joinRe.split(from).map(_.trim)
    val first = parts.head
    if (!first.matches("""\w+""")) fail(s"FROM clause '$first' (aliases/subqueries unsupported)")
    var tables = Set(first)
    val joins = parts.tail.map {
      case onRe(t, a, b) =>
        val (ta, tb) = (tableOf(a), tableOf(b))
        if (!(ta == t || tb == t)) fail(s"JOIN $t ON $a=$b does not reference $t")
        val other = if (ta == t) tb else ta
        if (!tables(other)) fail(s"JOIN $t ON $a=$b: $other not yet in scope")
        val isEdge = activeSpec.value.graph.relationships.exists(r =>
          (r.many == ta && r.one == tb && r.fk == a && r.pk == b) ||
            (r.many == tb && r.one == ta && r.fk == b && r.pk == a))
        if (!isEdge) fail(s"$a=$b is not a PK–FK edge of the schema graph")
        tables += t
        JoinEdge(t, a, b)
      case other => fail(s"join clause '$other' (INNER JOIN t ON fk = pk only)")
    }
    (first, tables, joins.toSeq)
  }

  // WHERE: conjunctions of col op literal | BETWEEN | IN, plus
  // parenthesized OR groups (n branches each, bounded by parseWhere's
  // signed-term-product cap). Split on a keyword OUTSIDE string
  // literals (a literal may contain the word AND) and OUTSIDE parens (an OR
  // group's internal ANDs belong to its branches), then glue back the "AND"
  // that belongs to a BETWEEN.
  private def splitTopLevel(w: String, word: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    var depth = 0
    def boundary(c: Char): Boolean = c.isWhitespace || c == '(' || c == ')'
    while (i < w.length) {
      val c = w.charAt(i)
      if (c == '\'') { inQ = !inQ; cur += c; i += 1 }
      else if (!inQ && c == '(') { depth += 1; cur += c; i += 1 }
      else if (!inQ && c == ')') { depth -= 1; cur += c; i += 1 }
      else if (!inQ && depth == 0 && (i == 0 || boundary(w.charAt(i - 1))) &&
        w.regionMatches(true, i, word, 0, word.length) &&
        i + word.length < w.length && boundary(w.charAt(i + word.length))) {
        out += cur.toString.trim; cur.clear(); i += word.length
      } else { cur += c; i += 1 }
    }
    out += cur.toString.trim
    out.toList
  }

  /** Strip outer parens that wrap the WHOLE fragment (repeatedly). */
  private def stripOuter(s0: String): String = {
    var s = s0.trim
    var again = true
    while (again && s.length >= 2 && s.head == '(' && s.last == ')') {
      again = false
      var depth = 0
      var inQ = false
      var wraps = true
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') inQ = !inQ
        else if (!inQ && c == '(') depth += 1
        else if (!inQ && c == ')') { depth -= 1; if (depth == 0 && i < s.length - 1) wraps = false }
        i += 1
      }
      if (wraps && depth == 0) { s = s.substring(1, s.length - 1).trim; again = true }
    }
    s
  }

  /** True when `word` occurs outside single-quoted literals. */
  private def hasUnquoted(s: String, word: String): Boolean = {
    var i = 0
    var inQ = false
    while (i < s.length) {
      if (s.charAt(i) == '\'') inQ = !inQ
      else if (!inQ && s.regionMatches(true, i, word, 0, word.length) &&
        (i == 0 || !s.charAt(i - 1).isLetterOrDigit) &&
        (i + word.length == s.length || !s.charAt(i + word.length).isLetterOrDigit))
        return true
      i += 1
    }
    false
  }

  /** AND-split with BETWEEN glue: a fragment whose (unquoted) BETWEEN lacks
    * its (unquoted) AND is incomplete — glue the next fragment back.
    */
  private def conjuncts(s: String): List[String] =
    splitTopLevel(s, "AND").foldLeft(List.empty[String]) { (acc, part) =>
      acc match {
        case head :: rest if hasUnquoted(head, "BETWEEN") && !hasUnquoted(head, "AND") =>
          s"$head AND $part" :: rest
        case _ => part :: acc
      }
    }.reverse

  /** A conjunction string (an OR branch) → predicates. */
  private def parseConjunction(s: String): Seq[Pred] =
    conjuncts(stripOuter(s)).map(c => parseConjunct(stripOuter(c)))

  /** Every top-level branch of a parenthesized OR conjunct — `(A) OR (B)
    * [OR (C)...]` or `(A OR B[ OR C...])`. A bare `a OR b` stays
    * unsupported (fails in parseConjunct), matching the reference's
    * conjunctive-only parse_query plus our parenthesized extension. No
    * per-group branch cap here: the absorption pass may collapse an n-way
    * same-column disjunction to zero slots, and surviving groups are
    * bounded by [[parseWhere]]'s total signed-term-product cap.
    */
  private def orAllBranches(c: String): Option[Seq[String]] =
    if (!c.trim.startsWith("(")) None
    else splitTopLevel(stripOuter(c), "OR") match {
      case xs if xs.length >= 2 => Some(xs)
      case _                    => None
    }

  /** Union of two same-column RangeSpecs as ONE RangeSpec, when
    * expressible. Every RangeSpec kind matches only non-NULL rows (SQL
    * 3VL), so NotNull absorbs anything, and a complement pair whose
    * excluded sets cancel collapses to NotNull — semantics identical on
    * both planes.
    */
  private def unionSpec(x: RangeSpec, y: RangeSpec): Option[RangeSpec] = (x, y) match {
    case _ if x == y                 => Some(x)
    case (NotNull, _) | (_, NotNull) => Some(NotNull)
    case (StrIn(a), StrIn(b))        => Some(StrIn((a ++ b).distinct))
    // ¬A ∨ ¬B ≡ ¬(A ∧ B); an empty intersection constrains nothing beyond
    // non-nullness
    case (StrNotIn(a), StrNotIn(b)) =>
      val both = a.filter(b.contains)
      Some(if (both.isEmpty) NotNull else StrNotIn(both.distinct))
    // v ∈ A ∨ v ∉ B ≡ v ∉ (B \ A)
    case (StrIn(in), StrNotIn(ex)) =>
      val rem = ex.filterNot(in.contains)
      Some(if (rem.isEmpty) NotNull else StrNotIn(rem))
    case (StrNotIn(_), StrIn(_)) => unionSpec(y, x)
    case (NumNotIn(a, d1), NumNotIn(b, d2)) if d1 == d2 =>
      val both = a.filter(b.contains)
      Some(if (both.isEmpty) NotNull else NumNotIn(both.distinct, d1))
    case (NumR(l1, h1, i1, j1), NumR(l2, h2, i2, j2)) =>
      Some(NumUnion(Seq((l1, h1, i1, j1), (l2, h2, i2, j2)), isDate = false))
    case (DateR(l1, h1, i1, j1), DateR(l2, h2, i2, j2)) =>
      Some(NumUnion(Seq((l1, h1, i1, j1), (l2, h2, i2, j2)), isDate = true))
    case (NumUnion(ivs, d1), NumR(l, h, i, j)) if !d1 =>
      Some(NumUnion(ivs :+ ((l, h, i, j)), d1))
    case (NumUnion(ivs, d1), DateR(l, h, i, j)) if d1 =>
      Some(NumUnion(ivs :+ ((l, h, i, j)), d1))
    case (_: NumR, _: NumUnion) | (_: DateR, _: NumUnion) => unionSpec(y, x)
    case _ => None
  }

  /** CNF pre-simplification (r18, VERDICT missing #1): a parenthesized OR
    * group absorbs into plain conjuncts — costing NO 3^N expansion slot —
    * when one branch's conjunction subsumes the other (`(A∧B) ∨ A ≡ A`),
    * or when every branch is a single predicate on the SAME column whose
    * running union stays expressible as one RangeSpec.
    */
  private def absorbGroup(branches: Seq[Seq[Pred]]): Option[Seq[Pred]] =
    branches.map(Option(_)).reduceLeft { (accOpt, nextOpt) =>
      for {
        acc  <- accOpt
        next <- nextOpt
        merged <-
          if (acc.toSet.subsetOf(next.toSet)) Some(acc)
          else if (next.toSet.subsetOf(acc.toSet)) Some(next)
          else (acc, next) match {
            case (Seq(pa), Seq(pb)) if pa.table == pb.table && pa.col == pb.col =>
              unionSpec(pa.range, pb.range).map(r => Seq(Pred(pa.table, pa.col, r)))
            case _ => None
          }
      } yield merged
    }

  /** Partial same-column absorption (r19, ADVICE r18): when full
    * absorption fails (mixed columns / conjunction branches),
    * SINGLE-predicate branches on one column still union into one branch —
    * (a<5 ∨ a>10 ∨ b=1) becomes ((a<5∨a>10) ∨ b=1), two slots instead of
    * three — so the Π(2^k−1) cap charges the semantically effective
    * branch count (parity with the Catalyst plane's regroupOr, which
    * column-groups such disjuncts before they cost branches). Branches
    * whose union is inexpressible, and multi-pred branches, stay as
    * written; the merged branch sits at its column's first appearance.
    */
  private def partialAbsorb(branches: Seq[Seq[Pred]]): Seq[Seq[Pred]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Pred]]
    val idxByCol = scala.collection.mutable.Map.empty[(String, String), Int]
    branches.foreach {
      case b @ Seq(p) =>
        idxByCol.get((p.table, p.col)) match {
          case Some(i) => (out(i), unionSpec(out(i).head.range, p.range)) match {
            case (Seq(_), Some(u)) => out(i) = Seq(Pred(p.table, p.col, u))
            case _                 => out += b // union inexpressible: own branch
          }
          case None =>
            idxByCol((p.table, p.col)) = out.length
            out += b
        }
      case b => out += b
    }
    // within-group branch subsumption ((A∧B) ∨ A ≡ A, r19): a branch
    // whose Pred set STRICTLY contains another branch's adds nothing to
    // the union — absorbGroup catches this only when the whole group
    // reduces; here it composes with residual branches
    val sets = out.map(_.toSet)
    out.indices.filterNot(i =>
      sets.indices.exists(j => j != i && sets(j).subsetOf(sets(i)) && sets(j) != sets(i)))
      .map(out).toSeq
  }

  /** Independent parenthesized OR groups per WHERE, counted AFTER the CNF
    * absorption pass (r18): a WHERE with four written disjunctions that is
    * semantically fewer effective groups still folds. The accuracy bound is
    * the total signed-term product Π_g (2^{k_g}−1) ≤ 27 over the surviving
    * groups' branch counts (r18, generalizing the r17 three-2-branch-group
    * 3^N cap: each group expands by full inclusion–exclusion, and the
    * per-term relative error compounds with the term count) — three
    * 2-branch groups sit exactly at the cap, a single disjunction may hold
    * up to four branches (15 terms), while a genuinely-4-group clause
    * (81 terms) keeps failing loudly.
    *
    * The lone 2-branch group keeps the legacy distributed-common-conjuncts
    * convention in (preds, orPreds) — the inclusion–exclusion single-OR
    * plane consumes that shape directly. Any other surviving layout
    * returns (common, Nil, allGroups) with every group raw in the third
    * slot; the estimator conjoins `common` into each signed product term.
    */
  private def parseWhere(where: String)
      : (Seq[Pred], Seq[Pred], Seq[Seq[Seq[Pred]]]) = {
    val parts = conjuncts(where)
    val classified: Seq[Either[Seq[Pred], Seq[Seq[Pred]]]] = parts.map { p =>
      orAllBranches(p) match {
        case None => Left(Seq(parseConjunct(stripOuter(p))))
        case Some(branches) =>
          // dedupe order-insensitively at the Pred layer (A∨A≡A) before
          // absorption and the cap count — spelling variants that still
          // differ HERE (BETWEEN vs paired bounds) dedupe again at the
          // compiled layer (Ensemble.signedPicks), where both the text and
          // Catalyst planes expand over distinct branch maps (r19)
          val parsed = branches.map(parseConjunction).distinctBy(_.toSet)
          absorbGroup(parsed) match {
            case Some(preds) => Left(preds) // absorbed: plain conjuncts
            case None => partialAbsorb(parsed) match {
              // same-column singles may collapse the group entirely (a
              // residual multi-pred branch equal to the merged single
              // cannot arise here — distinctBy deduped — but stay safe)
              case Seq(only) => Left(only)
              case reduced   => Right(reduced) // a genuine disjunction group
            }
          }
      }
    }
    val common = classified.collect { case Left(ps) => ps }.flatten
    val orGroupsRaw = classified.collect { case Right(g) => g }
    // cross-group subsumption (r19, the one absorption law r18 left
    // uncovered): group i drops when another group j IMPLIES it — every
    // branch of j carries some branch of i as a sub-conjunction (b_i ⊆
    // b_j at the Pred-set level), so whenever j holds, i holds. The
    // branch-set-containment form ((A∨B)∧(A∨B∨C) ≡ (A∨B)) is the
    // b_i = b_j special case; the general law also catches
    // (A∧B ∨ C)∧(A ∨ C) ≡ (A∧B ∨ C). Likewise a group one of whose
    // branches is implied by the plain conjuncts is always true —
    // A∧(A∨C) ≡ A. Both drop BEFORE the cap count, so e.g.
    // (A∨B)∧(A∨B∨C)∧(D∨E) folds at 9 terms instead of failing loudly at
    // 63. Mutually-implying (equivalent) groups keep the first.
    val commonSet = common.toSet
    val keyed = orGroupsRaw.map(_.map(_.toSet).toSet)
    def implies(j: Set[Set[Pred]], i: Set[Set[Pred]]): Boolean =
      j.forall(bj => i.exists(bi => bi.subsetOf(bj)))
    val orGroups = orGroupsRaw.indices.filterNot { i =>
      keyed(i).exists(_.subsetOf(commonSet)) ||
        keyed.indices.exists(j => j != i &&
          implies(keyed(j), keyed(i)) && (!implies(keyed(i), keyed(j)) || j < i))
    }.map(orGroupsRaw).toSeq
    // saturating product (a pathological 80-branch OR must not wrap Long)
    val termProduct = orGroups.foldLeft(1L) { (acc, g) =>
      math.min(acc * ((1L << math.min(g.length, 20)) - 1), 1L << 40)
    }
    if (termProduct > 27) fail(
      s"${orGroups.length} effective parenthesized OR groups with " +
        s"${orGroups.map(_.length).mkString("/")} branches after same-column absorption: " +
        s"$termProduct signed expansion terms (at most 27 — the accuracy cap)")
    orGroups match {
      case Nil => (common, Nil, Nil)
      case Seq(Seq(a, b)) => (common ++ a, common ++ b, Nil)
      case gs => (common, Nil, gs)
    }
  }

  private val cmpRe: Regex = """(?i)^(\w+)\s*(<=|>=|<|>|=)\s*(.+)$""".r
  private val betweenRe: Regex = """(?i)^(\w+)\s+BETWEEN\s+(.+?)\s+AND\s+(.+)$""".r
  private val inRe: Regex = """(?i)^(\w+)\s+IN\s*\((.+)\)$""".r
  private val likeRe: Regex = """(?i)^(\w+)\s+LIKE\s+'([^']*)'$""".r
  private val neqRe: Regex = """(?i)^(\w+)\s*(?:!=|<>)\s*'([^']*)'$""".r
  private val neqAnyRe: Regex = """(?i)^(\w+)\s*(?:!=|<>)\s*(.+)$""".r
  private val notInRe: Regex = """(?i)^(\w+)\s+NOT\s+IN\s*\((.+)\)$""".r
  private val notNullRe: Regex = """(?i)^(\w+)\s+IS\s+NOT\s+NULL$""".r
  private val strLit: Regex = """^'(.*)'$""".r
  private val dateLit: Regex = """(?i)^(?:DATE\s+)?'(\d{4}-\d{2}-\d{2})'$""".r

  private def days(d: String): Double = LocalDate.parse(d).toEpochDay.toDouble

  /** Comma-separated string-literal list of an IN / NOT IN clause. Commas are
    * list separators only OUTSIDE single quotes (same quote-aware scan as
    * splitTopLevel), so IN ('A, B', 'C') parses as two values.
    */
  private def strList(vs: String, ctx: String): Seq[String] = {
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    vs.foreach { c =>
      if (c == '\'') { inQ = !inQ; cur += c }
      else if (c == ',' && !inQ) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    parts += cur.toString
    parts.map(_.trim).map {
      case strLit(s) => s
      case other     => fail(s"$ctx list value '$other' (string literals only)")
    }.toSeq
  }

  /** A NOT IN list is either ALL string literals (dictionary complement)
    * or ALL numeric/date literals (multi-interval point complement in the
    * model's encoding); a mixed list fails loudly.
    */
  private def litList(vs: String, ctx: String): Either[Seq[String], (Seq[Double], Boolean)] = {
    val raw = {
      val parts = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var inQ = false
      vs.foreach { c =>
        if (c == '\'') { inQ = !inQ; cur += c }
        else if (c == ',' && !inQ) { parts += cur.toString; cur.clear() }
        else cur += c
      }
      parts += cur.toString
      parts.map(_.trim).toSeq
    }
    if (raw.forall { case dateLit(_) => false; case strLit(_) => true; case _ => false })
      Left(raw.map { case strLit(s) => s })
    else {
      val parsed = raw.map(lit)
      // a mixed date/number list has no single model encoding
      if (parsed.exists(_.isLeft) && parsed.exists(_.isRight))
        fail(s"$ctx list mixes date and numeric literals")
      Right((parsed.map {
        case Right(d) => days(d)
        case Left(n)  => n
      }, parsed.headOption.exists(_.isRight)))
    }
  }

  private def parseConjunct(c: String): Pred = c match {
    case betweenRe(col, lo, hi) =>
      val t = tableOf(col)
      (lit(lo), lit(hi)) match {
        case (Left(l), Left(h))   => Pred(t, col, NumR(l, h, loIncl = true, hiIncl = true))
        case (Right(l), Right(h)) => Pred(t, col, DateR(days(l), days(h), loIncl = true, hiIncl = true))
        case _                    => fail(s"BETWEEN bounds of mixed type in '$c'")
      }
    case inRe(col, vs) =>
      Pred(tableOf(col), col, StrIn(strList(vs, "IN")))
    case likeRe(col, pat) =>
      Pred(tableOf(col), col, StrLike(pat))
    case neqRe(col, v) =>
      Pred(tableOf(col), col, StrNotIn(Seq(v)))
    // numeric/date != — the string-literal form is matched above
    case neqAnyRe(col, rawLit) =>
      val t = tableOf(col)
      lit(rawLit.trim) match {
        case Right(d) => Pred(t, col, NumNotIn(Seq(days(d)), isDate = true))
        case Left(n)  => Pred(t, col, NumNotIn(Seq(n)))
      }
    case notInRe(col, vs) =>
      val t = tableOf(col)
      litList(vs, "NOT IN") match {
        case Left(strs)             => Pred(t, col, StrNotIn(strs))
        case Right((nums, isDate))  => Pred(t, col, NumNotIn(nums, isDate))
      }
    case notNullRe(col) =>
      Pred(tableOf(col), col, NotNull)
    case cmpRe(col, op, rawLit) =>
      val t = tableOf(col)
      lit(rawLit.trim) match {
        case Right(d) => Pred(t, col, dateRange(op, days(d)))
        case Left(n)  => Pred(t, col, numRange(op, n))
      }
    case other => fail(s"predicate '$other'")
  }

  /** Left(number) | Right(date string); bare strings are only legal with
    * '=' (rewritten to IN by parseQuery) or inside IN lists.
    */
  private def lit(s: String): Either[Double, String] = s match {
    case dateLit(d) => Right(d)
    case strLit(_)  => fail(s"string literal $s only supported with = or IN")
    case _ =>
      try Left(s.toDouble)
      catch { case _: NumberFormatException => fail(s"literal '$s'") }
  }

  private def numRange(op: String, v: Double): RangeSpec = op match {
    case "="  => NumR(v, v, loIncl = true, hiIncl = true)
    case "<"  => NumR(Double.NegativeInfinity, v, loIncl = true, hiIncl = false)
    case "<=" => NumR(Double.NegativeInfinity, v, loIncl = true, hiIncl = true)
    case ">"  => NumR(v, Double.PositiveInfinity, loIncl = false, hiIncl = true)
    case ">=" => NumR(v, Double.PositiveInfinity, loIncl = true, hiIncl = true)
    case _    => fail(s"operator '$op'")
  }
  private def dateRange(op: String, v: Double): RangeSpec = numRange(op, v) match {
    case NumR(lo, hi, li, hi2) => DateR(lo, hi, li, hi2)
    case r                     => r
  }

  /** Public entry that also handles `col = 'string'` and the JOB-light
    * comma-join form (`FROM a x, b y WHERE x.k = y.k AND ...` — the exact
    * shape of the reference's benchmarks/job-light/sql files, parsed by
    * evaluation/utils.py::parse_query): aliases are stripped (columns carry
    * globally-unique table prefixes here, as in the reference's schemas) and
    * WHERE equijoin conjuncts are hoisted into ordered JOIN ... ON clauses,
    * after which the strict JOIN-form parser — including its PK–FK edge
    * validation — sees a single canonical shape.
    */
  def parseQuery(
      sql: String,
      spec: graft.schema.DatasetSpec = graft.schema.DatasetSpec.testdata): ParsedQuery =
    activeSpec.withValue(spec) {
      // pre-rewrite string equality into IN form so parseConjunct stays total
      val rewritten = """(?i)(\w+)\s*=\s*('(?!\d{4}-\d{2}-\d{2}')[^']*')""".r
        .replaceAllIn(sql, m => Regex.quoteReplacement(s"${m.group(1)} IN (${m.group(2)})"))
      parse(desugarCommaJoins(rewritten))
    }

  private def isColumn(x: String): Boolean = scala.util.Try(tableOf(x)).isSuccess

  private val fromEntryRe: Regex = """^(\w+)(?:\s+(?:(?i)AS\s+)?(\w+))?$""".r
  private val colEqColRe: Regex = """^(\w+)\s*=\s*(\w+)$""".r
  private val qualifiedRe: Regex = """(\w+)\.(\w+)""".r

  /** Rewrite `FROM a [x], b [y] WHERE x.j = y.k AND …` into the canonical
    * `FROM a JOIN b ON j = k WHERE …` form. No-op for JOIN-form (or
    * single-table) SQL.
    */
  private[rspn] def desugarCommaJoins(sql: String): String = {
    // literals are masked around the clause match (same reason as parse):
    // the rewrite below is regex/string surgery that must never see one
    val (maskedSql, lits) = maskLiterals(sql)
    maskedSql match {
    case selectRe(sel, from, where, group, having, order, limitS) if joinRe.findFirstIn(from).isEmpty &&
        (from.contains(",") ||
          // single aliased table (`FROM lineitem l`) — the JOB-light files
          // alias every table, including one-table queries
          fromEntryRe.findFirstMatchIn(from.trim).exists(_.group(2) != null)) =>
      // table list with optional aliases (alias lookup is case-insensitive,
      // like every keyword in this parser)
      val entries = from.split(",").map(_.trim).map {
        case fromEntryRe(t, alias) => (Option(alias).getOrElse(t).toLowerCase, t)
        case other                 => fail(s"FROM entry '$other'")
      }
      val aliasMap = entries.toMap
      if (aliasMap.size != entries.length) fail("duplicate table alias in FROM")
      val fromTables = entries.map(_._2).toSet
      // strip alias qualifiers OUTSIDE string literals only (the quote-blind
      // regex would corrupt a literal like '%o.k%'); non-alias dotted tokens
      // (e.g. the decimal literal 0.05) are left untouched
      def strip(s: String): String =
        s.split("'", -1).zipWithIndex.map { case (seg, i) =>
          if (i % 2 == 1) seg // inside quotes
          else qualifiedRe.replaceAllIn(seg, m =>
            Regex.quoteReplacement(aliasMap.get(m.group(1).toLowerCase) match {
              case Some(table) =>
                // a qualifier must agree with its column's table — a
                // mismatch (e.g. customer-aliased `c.o_custkey`) is a
                // malformed query, not something to silently rebind
                val c = m.group(2)
                if (!isColumn(c) || tableOf(c) != table)
                  fail(s"'${m.matched}': $c is not a column of $table")
                c
              case None => m.matched
            }))
        }.mkString("'")
      val selS = strip(sel)
      val groupS = Option(group).map(strip)
      val (joinEdges, restConj) = Option(where).map(strip) match {
        case None => (Nil, Nil)
        case Some(w) =>
          conjuncts(w).partitionMap {
            case c @ colEqColRe(a, b) if isColumn(a) && isColumn(b) =>
              // an equijoin may only reference declared FROM tables — the
              // same invariant parse enforces for filter predicates
              Seq(a, b).map(tableOf).find(!fromTables(_)).foreach(t =>
                fail(s"equijoin '$c' references $t, which is not in FROM"))
              Left((a, b))
            case c => Right(c)
          }
      }
      // order the equijoin edges so each JOIN attaches one new table to the
      // running scope (what the strict parser requires of ON clauses)
      val pending = scala.collection.mutable.ListBuffer(joinEdges: _*)
      val firstTable = entries.head._2
      var scope = Set(firstTable)
      val joinClauses = scala.collection.mutable.ListBuffer.empty[String]
      while (pending.nonEmpty) {
        val i = pending.indexWhere { case (a, b) =>
          scope(tableOf(a)) ^ scope(tableOf(b))
        }
        if (i < 0) fail(
          "comma-join FROM is disconnected or cyclic (every remaining equijoin " +
            "references zero or two in-scope tables)")
        val (a, b) = pending.remove(i)
        val newT = if (scope(tableOf(a))) tableOf(b) else tableOf(a)
        scope += newT
        joinClauses += s"JOIN $newT ON $a = $b"
      }
      val missing = fromTables -- scope
      if (missing.nonEmpty) fail(
        s"comma-join FROM leaves ${missing.mkString(", ")} unjoined (cartesian products unsupported)")
      val whereS = restConj match {
        case Nil => ""
        case cs  => " WHERE " + cs.mkString(" AND ")
      }
      val groupS2 = groupS.map(g => s" GROUP BY $g").getOrElse("")
      val tailS = Option(having).map(h => s" HAVING ${strip(h)}").getOrElse("") +
        Option(order).map(o => s" ORDER BY ${strip(o)}").getOrElse("") +
        Option(limitS).map(l => s" LIMIT $l").getOrElse("")
      unmask(s"SELECT $selS FROM $firstTable ${joinClauses.mkString(" ")}$whereS$groupS2$tailS", lits)
    case _ => sql
    }
  }
}
