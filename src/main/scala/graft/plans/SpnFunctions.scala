package graft.plans

import graft.rspn.Ensemble
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, ExpressionInfo, GreaterThanOrEqual, LessThanOrEqual, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, NullType}
import org.apache.spark.unsafe.types.UTF8String

/** Model-plane aggregates inside SQL TEXT — the reference's `maqp.py`
  * answers arbitrary benchmark SQL strings against the model plane; the
  * Spark-native form is a family of registered scalar functions
  * (SURVEY §7.6):
  *
  * {{{
  *   SELECT spn_count('orders', "o_totalprice < 2000 AND o_orderstatus = 'F'")
  *   SELECT spn_count('lineitem,orders', 'l_quantity <= 10')   -- join card.
  *   SELECT spn_count('customer')                              -- table card.
  *   SELECT spn_sum('lineitem', 'l_extendedprice', 'l_quantity < 25')
  *   SELECT spn_avg('orders', 'o_totalprice')
  * }}}
  *
  * Mechanics: `injectFunction` registers a placeholder expression; an
  * injected RESOLUTION rule folds it to a `Literal` during analysis by
  * parsing the predicate with Spark's own SQL parser and running the RSPN
  * estimator driver-side. The model never ships to executors and the query
  * never scans data — exactly the reference's sub-millisecond answer path —
  * and because the result is a literal before optimization, the folded
  * value composes with any surrounding SQL (arithmetic over estimates is
  * the reference's PLUS/MINUS aggregation surface).
  *
  * All arguments must be string LITERALS (enforced loudly): the estimate
  * is a driver-side planning-time act, not a per-row function. A request
  * the model cannot answer (unmodeled column/table, unsupported predicate
  * shape) throws with the offending fragment — an explicit estimator call
  * must fail loudly, never silently fall back to a scan.
  */
object SpnFunctions {

  /** Unevaluable placeholder; always replaced during analysis. */
  final case class SpnEstExpr(fn: String, children: Seq[Expression])
      extends Expression with Unevaluable {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = fn
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  private val functions = Seq("spn_count", "spn_sum", "spn_avg")

  def register(e: SparkSessionExtensions): Unit = {
    functions.foreach { fn =>
      e.injectFunction((
        FunctionIdentifier(fn),
        new ExpressionInfo(SpnEstExpr.getClass.getName, fn),
        (args: Seq[Expression]) => SpnEstExpr(fn, args)))
    }
    e.injectResolutionRule(replaceRule)
  }

  private def replaceRule(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case SpnEstExpr(fn, args) => Literal(compute(session, fn, args), DoubleType)
    }
  }

  private def litString(fn: String, e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case Literal(s: String, _)     => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a string literal, got ${other.sql}")
  }

  private[plans] def compute(session: SparkSession, fn: String, args: Seq[Expression]): Double = {
    val isCount = fn == "spn_count"
    val (minArgs, maxArgs, usage) =
      if (isCount) (1, 2, s"$fn(tables[, predicate])")
      else (2, 3, s"$fn(tables, column[, predicate])")
    if (args.size < minArgs || args.size > maxArgs)
      throw new IllegalArgumentException(s"$usage: got ${args.size} arguments")
    val sfDir = session.conf.getOption("spark.graft.spn.sfDir").getOrElse(
      throw new IllegalStateException(
        s"$fn requires spark.graft.spn.sfDir to point at the trained dataset"))
    val tables = litString(fn, args.head, "tables")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val modeled = graft.schema.DatasetSpec.forDir(session, sfDir).modeled
    def tableOf(column: String): String =
      tables.find(t => modeled.getOrElse(t, Seq.empty).exists(_._1 == column))
        .getOrElse(throw new IllegalArgumentException(
          s"$fn: column '$column' is not a modeled column of ${tables.mkString("{", ",", "}")}"))
    val aggCol = if (isCount) None else {
      val c = litString(fn, args(1), "column")
      Some((tableOf(c), c))
    }
    val predicate = args.lift(if (isCount) 1 else 2).map(litString(fn, _, "predicate"))
    val atoms = predicate.map(atomsOfSql(session, fn, _)).getOrElse(Seq.empty)
    // assign each atom to its table by the dataset's modeled-column registry
    // (column names are globally unique across a schema's modeled tables)
    val byTable = atoms.groupBy(a => tableOf(a.column))
    val spns = Ensemble.get(session, sfDir)
    val preds = SpnCardinality.predsFor(spns, tables, byTable, modeled)
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: the model cannot answer tables=${tables.mkString(",")}" +
          predicate.fold("")(p => s" predicate=[$p]")))
    aggCol match {
      case None         => math.max(Ensemble.estCount(spns, tables, preds).value, 0.0)
      case Some(c) if fn == "spn_sum" => Ensemble.estSum(spns, tables, c, preds).value
      case Some(c)      => Ensemble.estAvg(spns, tables, c, preds).value
    }
  }

  /** Parse a predicate string with Spark's SQL parser and lower it to the
    * estimator's atoms. Unresolved attributes become bare name-carrying
    * refs so [[SpnCardinality.atomsOf]]'s literal/attribute patterns apply
    * unchanged; IN/AND desugar in the parser itself, BETWEEN below.
    */
  private[plans] def atomsOfSql(
      session: SparkSession, fn: String, predicate: String): Seq[SpnCardinality.Atom] = {
    val parsed = session.sessionState.sqlParser.parseExpression(predicate)
    val named = parsed.transformUp {
      case u: UnresolvedAttribute => AttributeReference(u.name, NullType)()
      // BETWEEN parses to unresolved function between(x, lo, hi) in Spark 4
      // — lower it to the two comparisons the atom patterns know
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") && f.arguments.size == 3 =>
        org.apache.spark.sql.catalyst.expressions.And(
          GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
          LessThanOrEqual(f.arguments(0), f.arguments(2)))
    }
    SpnCardinality.atomsOf(SpnCardinality.splitConj(named)).getOrElse(
      throw new IllegalArgumentException(
        s"$fn: unsupported predicate shape [$predicate] — use conjunctions of " +
          "col (=,<,<=,>,>=) literal, col IN (...), col BETWEEN a AND b"))
  }
}
