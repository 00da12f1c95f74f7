package graft.rspn

import graft.schema.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SqlParser._

/** Exact-plane compilation of a ParsedQuery — the second target of the SQL
  * entry point (the reference validates every model estimate against exact
  * SQL on Postgres via physical_db.py; here the same parsed form compiles to
  * a DataFrame plan Catalyst optimizes: broadcast dim joins, pushed filters).
  *
  * Determinism for the DuckDB oracle (SURVEY §7.4): float aggregates are
  * summed as DECIMAL(38,12), rounded while still decimal, then cast DOUBLE.
  */
object SqlExact {

  def compile(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    // column/edge resolution follows the dataset's declared schema
    // (registration → graft_schema.json sidecar → testdata default)
    val q = SqlParser.parseQuery(sql, graft.schema.DatasetSpec.forDir(spark, sfDir))
    var df = Tables(spark, sfDir, q.from)
    q.joins.foreach { j =>
      df = df.join(Tables(spark, sfDir, j.table), col(j.a) === col(j.b))
    }
    val schema = df.schema
    if (q.orPreds.isEmpty) q.preds.foreach(p => df = df.filter(predCol(p, schema)))
    else {
      // (A) OR (B): one disjunctive filter — still a pushable predicate
      val a = q.preds.map(predCol(_, schema)).reduce(_ && _)
      val b = q.orPreds.map(predCol(_, schema)).reduce(_ && _)
      df = df.filter(a || b)
    }
    // undistributed OR groups (r18): each conjoins as one disjunctive
    // filter over its branch conjunctions — still a pushable predicate.
    // (The common conjuncts are already applied above via q.preds.)
    q.orGroupsN.foreach { branches =>
      df = df.filter(branches.map(_.map(predCol(_, schema)).reduce(_ && _)).reduce(_ || _))
    }
    val aggCol = q.agg match {
      case Count => count(lit(1)).cast("double").as("val")
      case CountDistinct(_, c) => countDistinct(col(c)).cast("double").as("val")
      case Sum(_, c) =>
        round(sum(col(c).cast("decimal(38,12)")), 2).cast("double").as("val")
      case Avg(_, c) =>
        round(avg(col(c).cast("decimal(38,12)")), 2).cast("double").as("val")
      case Combo(plus, l, r) =>
        val e = if (plus) decimalTerm(l) + decimalTerm(r) else decimalTerm(l) - decimalTerm(r)
        round(e, 2).cast("double").as("val")
      case SumProduct(_, ca, _, cb) =>
        // DECIMAL(18,6)×DECIMAL(18,6) stays inside decimal-38 (the DuckDB
        // oracle computes the identical widened product — SURVEY §7.4)
        round(sum(col(ca).cast("decimal(18,6)") * col(cb).cast("decimal(18,6)")), 2)
          .cast("double").as("val")
    }
    // calendar grouping keys are the matching Spark functions over the raw
    // columns — calendar keys first, dimension columns behind; every key
    // is named grp, grp2, ... like any other grouping, and the SHARED
    // HAVING / ORDER BY / total-order machinery below applies to calendar
    // and plain groupings alike (r15 ADVICE: the calendar branch used to
    // ignore q.having/q.orderBy while SqlEstimate.post applied both — the
    // planes diverged on e.g. `... GROUP BY year(d), dim ORDER BY n DESC
    // LIMIT 3`, with the EXACT plane wrong)
    val calKeys: Seq[Column] = q.calGroup.map { case (fn, _, c) =>
      // arithmetic-bin fns arrive encoded as "floor:<w>" /
      // "width_bucket:<lo>:<hi>:<n>" / "round:<scale>" (r16) — the exact
      // plane groups by the matching Spark functions
      val parts = fn.split(':')
      parts(0) match {
        // the format substring may itself contain colons — substring past
        // the prefix, never split
        case "datefmt"      => date_format(col(c), fn.substring("datefmt:".length))
        case "datefmtsub"   => date_format(col(c), fn.substring("datefmtsub:".length))
        case "year"         => year(col(c))
        case "month"        => month(col(c))
        case "quarter"      => quarter(col(c))
        case "hour"         => hour(col(c))
        case "minute"       => minute(col(c))
        case "dayofmonth"   => dayofmonth(col(c))
        // durations re-spell from the parser's whole-second encoding; the
        // struct key groups/sorts/prints by (start, end) field order
        case "window"       => window(col(c), s"${parts(1)} seconds", s"${parts(2)} seconds")
        case "floor"        => floor(col(c) / lit(parts(1).toDouble))
        case "width_bucket" => width_bucket(col(c),
          lit(parts(1).toDouble), lit(parts(2).toDouble), lit(parts(3).toInt))
        case _              => round(col(c), parts(1).toInt)
      }
    }
    val out =
      if (calKeys.isEmpty && q.groupBy.isEmpty) df.agg(aggCol)
      else {
        // first group column keeps the name "grp" (single-column callers
        // pattern-match on it), the rest are grp2, grp3, …
        val rawKeys = calKeys ++ q.groupBy.map { case (_, g) => col(g) }
        val names = rawKeys.indices.map(i => if (i == 0) "grp" else s"grp${i + 1}")
        val gcols = rawKeys.zip(names).map { case (k, n) => k.as(n) }
        val grouped = q.groupMode match {
          case GroupRollup => df.rollup(gcols: _*)
          case GroupCube   => df.cube(gcols: _*)
          case GroupFlat   => df.groupBy(gcols: _*)
        }
        // HAVING and the ORDER BY aggregate ride the same aggregation as
        // hidden columns — one pass, never a second scan. Sorting uses the
        // RAW (unrounded) aggregate: the rounded output column would rank
        // sub-cent-separated groups as ties, diverging from any engine
        // ordering by the true value.
        val needsOrd = q.orderBy.exists(_.byAgg)
        val hidden =
          q.having.map(h => aggTermDouble(h.agg).as("__hv")).toSeq ++
            (if (needsOrd) Seq(rawAgg(q.agg).as("__ord")) else Nil)
        val aggd0 = grouped.agg(aggCol, hidden: _*)
        val aggd = q.having.fold(aggd0)(h =>
          aggd0.filter(cmp(col("__hv"), h.op, h.value)).drop("__hv"))
        // non-agg ORDER BY keys are dimension columns (the parser rejects
        // calendar expressions there), whose names sit BEHIND the calendar
        // keys
        val nameOf = q.groupBy.zip(names.drop(calKeys.length)).toMap
        val orderCols = q.orderBy match {
          case Nil => names.map(col)
          case ks =>
            // user keys first, then the remaining group columns ascending —
            // a total order, so a LIMIT cut is engine-independent (SURVEY
            // §7.4 determinism contract); calendar key names participate
            // in the padding like any other group column
            val userKeys = ks.map { k =>
              val c = if (k.byAgg) col("__ord") else col(nameOf((k.table, k.col)))
              if (k.asc) c.asc else c.desc
            }
            val used = q.orderBy.collect { case k if !k.byAgg => nameOf((k.table, k.col)) }.toSet
            userKeys ++ names.filterNot(used).map(col(_).asc)
        }
        val sorted = aggd.orderBy(orderCols: _*)
        if (needsOrd) sorted.drop("__ord") else sorted
      }
    q.limit.fold(out)(out.limit)
  }

  /** A linear term as an exact decimal aggregate, combined BEFORE the final
    * round so SUM(a) ± SUM(b) rounds once, like the DuckDB oracle.
    */
  private def decimalTerm(a: SqlParser.Agg): Column = a match {
    case Count     => count(lit(1)).cast("decimal(38,12)")
    // COUNT(DISTINCT) rides scalar ± combos since r18 — an integer set
    // size, decimal-cast like every other term
    case CountDistinct(_, c) => countDistinct(col(c)).cast("decimal(38,12)")
    case Sum(_, c) => sum(col(c).cast("decimal(38,12)"))
    case SumProduct(_, ca, _, cb) =>
      sum(col(ca).cast("decimal(18,6)") * col(cb).cast("decimal(18,6)"))
    // AVG rides a ± combination since r17 (text-plane parity with the
    // Catalyst ExprOut tree); decimal-exact like every other term
    case Avg(_, c) => avg(col(c).cast("decimal(38,12)"))
    case other =>
      throw new IllegalArgumentException(s"unsupported SQL: non-linear ± term $other")
  }

  /** The SELECT aggregate UNROUNDED, for ORDER BY ranking (every leaf is
    * the same decimal-exact form the output column rounds from).
    */
  private def rawAgg(a: SqlParser.Agg): Column = a match {
    case Count     => count(lit(1))
    case CountDistinct(_, c) => countDistinct(col(c))
    case Sum(_, c) => sum(col(c).cast("decimal(38,12)"))
    case Avg(_, c) => avg(col(c).cast("decimal(38,12)"))
    case SumProduct(_, ca, _, cb) =>
      sum(col(ca).cast("decimal(18,6)") * col(cb).cast("decimal(18,6)"))
    case Combo(plus, l, r) =>
      if (plus) decimalTerm(l) + decimalTerm(r) else decimalTerm(l) - decimalTerm(r)
  }

  /** A HAVING aggregate as a double column, same decimal-exact summation
    * discipline as the SELECT aggregate.
    */
  private def aggTermDouble(a: SqlParser.Agg): Column = a match {
    case Count     => count(lit(1)).cast("double")
    case CountDistinct(_, c) => countDistinct(col(c)).cast("double")
    case Sum(_, c) => sum(col(c).cast("decimal(38,12)")).cast("double")
    case Avg(_, c) => avg(col(c).cast("decimal(38,12)")).cast("double")
    case SumProduct(_, ca, _, cb) =>
      sum(col(ca).cast("decimal(18,6)") * col(cb).cast("decimal(18,6)")).cast("double")
    case other =>
      throw new IllegalArgumentException(s"unsupported SQL: HAVING term $other")
  }

  private def cmp(c: Column, op: String, v: Double): Column = op match {
    case "<"  => c < v
    case "<=" => c <= v
    case ">"  => c > v
    case ">=" => c >= v
    case _    => c === v
  }

  private def predCol(p: Pred, schema: org.apache.spark.sql.types.StructType): Column = p.range match {
    case NumR(lo, hi, li, hi2) => boundCol(col(p.col), lo, hi, li, hi2, identity)
    case DateR(lo, hi, li, hi2) =>
      // epoch days back to a timestamp literal against the raw column
      boundCol(col(p.col), lo, hi, li, hi2,
        d => lit(java.time.LocalDate.ofEpochDay(d.toLong).toString).cast("timestamp"))
    case StrIn(values)    => col(p.col).isin(values: _*)
    case StrNotIn(values) => !col(p.col).isin(values: _*) // SQL 3VL drops NULLs
    case NumNotIn(values, isDate) =>
      // values arrive in the MODEL encoding (epoch days for dates). A
      // date-SHAPED literal list over a STRING column (a dictionary of
      // ISO-date-like strings) is a string complement, not a timestamp
      // one — the parser cannot see the column's kind, so it resolves
      // HERE against the actual schema (r13 ADVICE; SqlEstimate applies
      // the same resolution against the modeled kind)
      if (!isDate) !col(p.col).isin(values: _*)
      else schema.find(_.name == p.col).map(_.dataType) match {
        case Some(org.apache.spark.sql.types.StringType) =>
          !col(p.col).isin(values.map(d =>
            java.time.LocalDate.ofEpochDay(d.toLong).toString): _*)
        case _ =>
          !values
            .map(d => col(p.col) ===
              lit(java.time.LocalDate.ofEpochDay(d.toLong).toString).cast("timestamp"))
            .reduce(_ || _)
      }
    case StrLike(pat)     => col(p.col).like(pat)
    case NotNull          => col(p.col).isNotNull
    // CNF-absorbed same-column disjunction (r18): OR of the per-interval
    // bound predicates — identical rows to the original parenthesized
    // disjunction (NULLs fail every bound, matching SQL 3VL)
    case NumUnion(ivs, isDate) =>
      ivs.map { case (lo, hi, li, hi2) =>
        if (isDate)
          boundCol(col(p.col), lo, hi, li, hi2,
            d => lit(java.time.LocalDate.ofEpochDay(d.toLong).toString).cast("timestamp"))
        else boundCol(col(p.col), lo, hi, li, hi2, identity)
      }.reduce(_ || _)
  }

  private def boundCol(
      c: Column, lo: Double, hi: Double, loIncl: Boolean, hiIncl: Boolean,
      litOf: Double => Any): Column = {
    def l(v: Double): Column = litOf(v) match {
      case cc: Column => cc
      case v2         => lit(v2)
    }
    val conds = Seq(
      if (lo.isNegInfinity) None else Some(if (loIncl) c >= l(lo) else c > l(lo)),
      if (hi.isPosInfinity) None else Some(if (hiIncl) c <= l(hi) else c < l(hi))).flatten
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}
