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

/** `spn_count(...)` inside SQL TEXT — the reference's `maqp.py` answers
  * arbitrary benchmark SQL strings against the model plane; the Spark-native
  * form is a registered scalar function (SURVEY §7.6):
  *
  * {{{
  *   SELECT spn_count('orders', "o_totalprice < 2000 AND o_orderstatus = 'F'")
  *   SELECT spn_count('lineitem,orders', 'l_quantity <= 10')   -- join card.
  *   SELECT spn_count('customer')                              -- table card.
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
  * Both arguments must be string LITERALS (enforced loudly): the estimate
  * is a driver-side planning-time act, not a per-row function. A predicate
  * the model cannot answer (unmodeled column/table, unsupported shape)
  * throws with the offending fragment — an explicit estimator call must
  * fail loudly, never silently fall back to a scan.
  */
object SpnFunctions {

  /** Unevaluable placeholder; always replaced during analysis. */
  final case class SpnCountExpr(children: Seq[Expression]) extends Expression with Unevaluable {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "spn_count"
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
  }

  def register(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("spn_count"),
      new ExpressionInfo(SpnCountExpr.getClass.getName, "spn_count"),
      (args: Seq[Expression]) => SpnCountExpr(args)))
    e.injectResolutionRule(replaceRule)
  }

  private def replaceRule(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case SpnCountExpr(args) => Literal(compute(session, args), DoubleType)
    }
  }

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case Literal(s: String, _)     => s.toString
    case other => throw new IllegalArgumentException(
      s"spn_count: $what must be a string literal, got ${other.sql}")
  }

  private[plans] def compute(session: SparkSession, args: Seq[Expression]): Double = {
    if (args.isEmpty || args.size > 2)
      throw new IllegalArgumentException(
        "spn_count(tables[, predicate]): expected 1 or 2 arguments")
    val sfDir = session.conf.getOption("spark.graft.spn.sfDir").getOrElse(
      throw new IllegalStateException(
        "spn_count requires spark.graft.spn.sfDir to point at the trained dataset"))
    val tables = litString(args.head, "tables").split(",").map(_.trim).filter(_.nonEmpty).toSet
    val predicate = args.lift(1).map(litString(_, "predicate"))
    val atoms = predicate.map(atomsOfSql(session, _)).getOrElse(Seq.empty)
    // assign each atom to its table by the dataset's modeled-column registry
    // (column names are globally unique across a schema's modeled tables)
    val modeled = graft.schema.DatasetSpec.forDir(session, sfDir).modeled
    val byTable = atoms.groupBy { a =>
      tables.find(t => modeled.getOrElse(t, Seq.empty).exists(_._1 == a.column))
        .getOrElse(throw new IllegalArgumentException(
          s"spn_count: column '${a.column}' is not a modeled column of ${tables.mkString("{", ",", "}")}"))
    }
    SpnCardinality.estimateJoin(Ensemble.get(session, sfDir), tables, byTable, modeled)
      .getOrElse(throw new IllegalArgumentException(
        s"spn_count: the model cannot answer tables=${tables.mkString(",")}" +
          predicate.fold("")(p => s" predicate=[$p]")))
  }

  /** Parse a predicate string with Spark's SQL parser and lower it to the
    * estimator's atoms. Unresolved attributes become bare name-carrying
    * refs so [[SpnCardinality.atomsOf]]'s literal/attribute patterns apply
    * unchanged; BETWEEN/IN/AND desugar in the parser itself.
    */
  private[plans] def atomsOfSql(session: SparkSession, predicate: String): Seq[SpnCardinality.Atom] = {
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
        s"spn_count: unsupported predicate shape [$predicate] — use conjunctions of " +
          "col (=,<,<=,>,>=) literal, col IN (...), col BETWEEN a AND b"))
  }
}
