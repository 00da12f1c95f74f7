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
    val q = SqlParser.parseQuery(sql)
    var df = Tables(spark, sfDir, q.from)
    q.joins.foreach { j =>
      df = df.join(Tables(spark, sfDir, j.table), col(j.a) === col(j.b))
    }
    q.preds.foreach(p => df = df.filter(predCol(p)))
    val aggCol = q.agg match {
      case Count => count(lit(1)).cast("double").as("val")
      case Sum(_, c) =>
        round(sum(col(c).cast("decimal(38,12)")), 2).cast("double").as("val")
      case Avg(_, c) =>
        round(avg(col(c).cast("decimal(38,12)")), 2).cast("double").as("val")
    }
    q.groupBy match {
      case None => df.agg(aggCol)
      case Some((_, g)) =>
        df.groupBy(col(g).as("grp")).agg(aggCol).orderBy("grp")
    }
  }

  private def predCol(p: Pred): Column = p.range match {
    case NumR(lo, hi, li, hi2) => boundCol(col(p.col), lo, hi, li, hi2, identity)
    case DateR(lo, hi, li, hi2) =>
      // epoch days back to a timestamp literal against the raw column
      boundCol(col(p.col), lo, hi, li, hi2,
        d => lit(java.time.LocalDate.ofEpochDay(d.toLong).toString).cast("timestamp"))
    case StrIn(values) => col(p.col).isin(values: _*)
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
