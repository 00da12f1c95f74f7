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

  final case class ParsedQuery(
      agg: Agg,
      from: String,
      tables: Set[String],
      joins: Seq[JoinEdge],
      preds: Seq[Pred],
      groupBy: Option[(String, String)])

  /** One JOIN clause: `table` newly joined into scope on `a = b`. */
  final case class JoinEdge(table: String, a: String, b: String)

  /** One conjunct, pre-encoding: values still carry their SQL literal form. */
  final case class Pred(table: String, col: String, range: RangeSpec)

  sealed trait RangeSpec
  final case class NumR(lo: Double, hi: Double, loIncl: Boolean, hiIncl: Boolean) extends RangeSpec
  final case class DateR(lo: Double, hi: Double, loIncl: Boolean, hiIncl: Boolean) extends RangeSpec
  final case class StrIn(values: Seq[String]) extends RangeSpec

  /** Column → table resolution over the testdata schema (globally unique
    * TPC-H-style prefixes; the reference resolves via its hand-declared
    * SchemaGraph the same way).
    */
  def tableOf(col: String): String = col.takeWhile(_ != '_') match {
    case "r" => "region"
    case "n" => "nation"
    case "s" => "supplier"
    case "c" => "customer"
    case "p" => "part"
    case "o" => "orders"
    case "l" => "lineitem"
    case _   => fail(s"cannot resolve table of column '$col'")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"unsupported SQL: $msg")

  private val selectRe: Regex =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(.*?)(?:\s+WHERE\s+(.*?))?(?:\s+GROUP\s+BY\s+(\w+))?\s*;?\s*$""".r
  private val aggRe: Regex = """(?i)^(COUNT\(\s*\*\s*\)|SUM\(\s*(\w+)\s*\)|AVG\(\s*(\w+)\s*\))(?:\s+AS\s+\w+)?$""".r
  private val joinRe: Regex = """(?i)\s+JOIN\s+""".r
  private val onRe: Regex = """(?i)^(\w+)\s+ON\s+(\w+)\s*=\s*(\w+)$""".r

  def parse(sql: String): ParsedQuery = sql match {
    case selectRe(sel, from, where, group) =>
      val agg = sel.trim match {
        case aggRe(whole, sumCol, avgCol) =>
          if (whole.toUpperCase.startsWith("COUNT")) Count
          else if (sumCol != null) Sum(tableOf(sumCol), sumCol)
          else Avg(tableOf(avgCol), avgCol)
        case other => fail(s"aggregate '$other' (COUNT(*)/SUM(col)/AVG(col) only)")
      }
      val (fromTable, tables, joins) = parseFrom(from.trim)
      val preds = Option(where).map(parseWhere).getOrElse(Nil)
      preds.foreach(p => if (!tables(p.table)) fail(s"predicate on ${p.col}: table ${p.table} not in FROM"))
      val groupBy = Option(group).map { g =>
        val t = tableOf(g)
        if (!tables(t)) fail(s"GROUP BY $g: table $t not in FROM")
        (t, g)
      }
      ParsedQuery(agg, fromTable, tables, joins, preds, groupBy)
    case _ => fail("expected SELECT <agg> FROM <join tree> [WHERE ...] [GROUP BY col]")
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
        val isEdge = SchemaGraph.testdata.relationships.exists(r =>
          (r.many == ta && r.one == tb && r.fk == a && r.pk == b) ||
            (r.many == tb && r.one == ta && r.fk == b && r.pk == a))
        if (!isEdge) fail(s"$a=$b is not a PK–FK edge of the schema graph")
        tables += t
        JoinEdge(t, a, b)
      case other => fail(s"join clause '$other' (INNER JOIN t ON fk = pk only)")
    }
    (first, tables, joins.toSeq)
  }

  // WHERE: conjunctions of col op literal | BETWEEN | IN. Split on AND
  // OUTSIDE string literals (a literal may contain the word AND), then glue
  // back the "AND" that belongs to a BETWEEN.
  private def splitOnAnd(w: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < w.length) {
      val c = w.charAt(i)
      if (c == '\'') { inQ = !inQ; cur += c; i += 1 }
      else if (!inQ && (i == 0 || w.charAt(i - 1).isWhitespace) &&
        w.regionMatches(true, i, "AND", 0, 3) &&
        i + 3 < w.length && w.charAt(i + 3).isWhitespace) {
        out += cur.toString.trim; cur.clear(); i += 3
      } else { cur += c; i += 1 }
    }
    out += cur.toString.trim
    out.toList
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

  private def parseWhere(where: String): Seq[Pred] = {
    val glued = splitOnAnd(where).foldLeft(List.empty[String]) { (acc, part) =>
      acc match {
        // a fragment whose (unquoted) BETWEEN lacks its (unquoted) AND is
        // incomplete: glue the next fragment back
        case head :: rest if hasUnquoted(head, "BETWEEN") && !hasUnquoted(head, "AND") =>
          s"$head AND $part" :: rest
        case _ => part :: acc
      }
    }.reverse
    glued.map(parseConjunct)
  }

  private val cmpRe: Regex = """(?i)^(\w+)\s*(<=|>=|<|>|=)\s*(.+)$""".r
  private val betweenRe: Regex = """(?i)^(\w+)\s+BETWEEN\s+(.+?)\s+AND\s+(.+)$""".r
  private val inRe: Regex = """(?i)^(\w+)\s+IN\s*\((.+)\)$""".r
  private val strLit: Regex = """^'(.*)'$""".r
  private val dateLit: Regex = """(?i)^(?:DATE\s+)?'(\d{4}-\d{2}-\d{2})'$""".r

  private def days(d: String): Double = LocalDate.parse(d).toEpochDay.toDouble

  private def parseConjunct(c: String): Pred = c match {
    case betweenRe(col, lo, hi) =>
      val t = tableOf(col)
      (lit(lo), lit(hi)) match {
        case (Left(l), Left(h))   => Pred(t, col, NumR(l, h, loIncl = true, hiIncl = true))
        case (Right(l), Right(h)) => Pred(t, col, DateR(days(l), days(h), loIncl = true, hiIncl = true))
        case _                    => fail(s"BETWEEN bounds of mixed type in '$c'")
      }
    case inRe(col, vs) =>
      val values = vs.split(",").map(_.trim).map {
        case strLit(s) => s
        case other     => fail(s"IN list value '$other' (string literals only)")
      }
      Pred(tableOf(col), col, StrIn(values.toSeq))
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

  /** Public entry that also handles `col = 'string'`. */
  def parseQuery(sql: String): ParsedQuery = {
    // pre-rewrite string equality into IN form so parseConjunct stays total
    val rewritten = """(?i)(\w+)\s*=\s*('(?!\d{4}-\d{2}-\d{2}')[^']*')""".r
      .replaceAllIn(sql, m => Regex.quoteReplacement(s"${m.group(1)} IN (${m.group(2)})"))
    parse(rewritten)
  }
}
