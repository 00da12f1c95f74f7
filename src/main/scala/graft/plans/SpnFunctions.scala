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

  /** `_ci_lo`/`_ci_hi` companions expose the estimator's 95% confidence
    * interval at the SQL surface — the reference's `--confidence_intervals`
    * flag attaches CIs to every estimate, so a SQL-only user must be able
    * to read uncertainty, not just the point value. All nine fold from the
    * SAME driver-side `Ensemble` Estimate, so lo ≤ value ≤ hi by
    * construction.
    */
  private val functions = Seq("spn_count", "spn_sum", "spn_avg")
    .flatMap(f => Seq(f, s"${f}_ci_lo", s"${f}_ci_hi"))

  def register(e: SparkSessionExtensions): Unit = {
    functions.foreach { fn =>
      e.injectFunction((
        FunctionIdentifier(fn),
        new ExpressionInfo(SpnEstExpr.getClass.getName, fn),
        (args: Seq[Expression]) => SpnEstExpr(fn, args)))
    }
    // table-valued form: the reference's model-answered GROUP BY as a FROM
    // source — `SELECT * FROM spn_groupby('lineitem', 'l_returnflag',
    // 'l_quantity < 10')` yields (group cols..., est, ci95_lo, ci95_hi)
    // rows materialized driver-side from the model (zero data scanned).
    // The builder runs during resolution, so the result is an ordinary
    // LocalRelation any SQL can join/filter/aggregate over. The _sum/_avg
    // companions take the aggregate column as a third argument — the
    // reference's grouped AQP class (SUM/AVG per group) at the SQL surface,
    // per-group CIs included.
    Seq("spn_groupby" -> "count", "spn_groupby_sum" -> "sum",
        "spn_groupby_avg" -> "avg").foreach { case (name, mode) =>
      e.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(SpnEstExpr.getClass.getName, name),
        (args: Seq[Expression]) => groupByRelation(SparkSession.active, name, mode, args)))
    }
    // grouping-set companions: model-answered ROLLUP/CUBE as table sources
    // — one expectation memo spans every subset driver-side, rows carry
    // NULL markers for columns absent from a subset (the SQL convention)
    Seq("spn_rollup", "spn_cube").foreach { name =>
      e.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(SpnEstExpr.getClass.getName, name),
        (args: Seq[Expression]) => groupSetsRelation(SparkSession.active, name, args)))
    }
    // model-store introspection: `SELECT * FROM spn_models()` lists the
    // trained ensemble (the reference's ensemble pickle is opaque; a SQL
    // user of this engine can ASK what models back their estimates —
    // name, covered tables, calibrated rows, training sample size, and
    // tree shape, one row per SPN)
    e.injectTableFunction((
      FunctionIdentifier("spn_models"),
      new ExpressionInfo(SpnEstExpr.getClass.getName, "spn_models"),
      (args: Seq[Expression]) => modelsRelation(SparkSession.active, args)))
    e.injectResolutionRule(replaceRule)
  }

  private def modelsRelation(
      session: SparkSession, args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    import graft.rspn.{ProductNode, SpnNode, SumNode}
    if (args.nonEmpty) throw new IllegalArgumentException(
      s"spn_models(): takes no arguments, got ${args.size}")
    val sfDir = session.conf.getOption("spark.graft.spn.sfDir").getOrElse(
      throw new IllegalStateException(
        "spn_models requires spark.graft.spn.sfDir to point at the trained dataset"))
    def shape(n: SpnNode): (Long, Int) = n match {
      case SumNode(_, ch, _) =>
        val s = ch.map(shape); (1L + s.map(_._1).sum, 1 + s.map(_._2).max)
      case ProductNode(ch, _) =>
        val s = ch.map(shape); (1L + s.map(_._1).sum, 1 + s.map(_._2).max)
      case _ => (1L, 1)
    }
    val rows = graft.rspn.Ensemble.get(session, sfDir).values.toSeq.sortBy(_.name)
      .map { m =>
        val (nodes, depth) = shape(m.root)
        InternalRow.fromSeq(Seq(
          UTF8String.fromString(m.name),
          UTF8String.fromString(m.tables.toSeq.sorted.mkString(",")),
          m.cols.length,
          math.round(m.scaleRows),
          m.sampleRows,
          nodes,
          depth))
      }
    val output = Seq(
      AttributeReference("name", StringType)(),
      AttributeReference("tables", StringType)(),
      AttributeReference("n_columns", IntegerType)(),
      AttributeReference("scale_rows", LongType)(),
      AttributeReference("sample_rows", LongType)(),
      AttributeReference("n_nodes", LongType)(),
      AttributeReference("depth", IntegerType)())
    LocalRelation(output, rows)
  }

  private def groupByRelation(
      session: SparkSession, fn: String, mode: String,
      args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types.StringType
    val isCount = mode == "count"
    val (minArgs, maxArgs, usage) =
      if (isCount) (2, 3, s"$fn(tables, group_columns[, predicate])")
      else (3, 4, s"$fn(tables, group_columns, agg_column[, predicate])")
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
    val groupCols = litString(fn, args(1), "group_columns")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map(c => (tableOf(c), c))
    if (groupCols.isEmpty)
      throw new IllegalArgumentException(s"$fn: no group columns given")
    val aggCol = if (isCount) None else {
      val c = litString(fn, args(2), "agg_column")
      Some((tableOf(c), c))
    }
    val atoms = args.lift(if (isCount) 2 else 3)
      .map(e => atomsOfSql(session, fn, litString(fn, e, "predicate")))
      .getOrElse(Seq.empty)
    val byTable = atoms.groupBy(a => tableOf(a.column))
    val spns = Ensemble.get(session, sfDir)
    val preds = SpnCardinality.predsFor(spns, tables, byTable, modeled)
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: the model cannot answer the given predicate over ${tables.mkString(",")}"))
    val rows = (mode match {
      case "count" => Ensemble.estGroupByMulti(spns, tables, groupCols, preds)
      case "sum" =>
        Ensemble.estGroupByAgg(spns, tables, groupCols, Map(aggCol.get -> 1), preds)
      case "avg" =>
        Ensemble.estGroupByAvg(spns, tables, groupCols, aggCol.get, preds)
    }).sortBy(_._1.mkString("\u0000"))
    val output = groupCols.map { case (_, c) => AttributeReference(c, StringType)() } ++
      Seq(AttributeReference("est", DoubleType)(),
        AttributeReference("ci95_lo", DoubleType)(),
        AttributeReference("ci95_hi", DoubleType)())
    val data = rows.map { case (gs, e) =>
      InternalRow.fromSeq(gs.map(UTF8String.fromString) ++ Seq(e.value, e.ci95Lo, e.ci95Hi))
    }
    LocalRelation(output, data)
  }

  private def groupSetsRelation(
      session: SparkSession, fn: String, args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.types.StringType
    if (args.size < 2 || args.size > 3)
      throw new IllegalArgumentException(
        s"$fn(tables, group_columns[, predicate]): got ${args.size} arguments")
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
    val groupCols = litString(fn, args(1), "group_columns")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map(c => (tableOf(c), c))
    if (groupCols.isEmpty)
      throw new IllegalArgumentException(s"$fn: no group columns given")
    val atoms = args.lift(2).map(e => atomsOfSql(session, fn, litString(fn, e, "predicate")))
      .getOrElse(Seq.empty)
    val byTable = atoms.groupBy(a => tableOf(a.column))
    val spns = Ensemble.get(session, sfDir)
    val preds = SpnCardinality.predsFor(spns, tables, byTable, modeled)
      .getOrElse(throw new IllegalArgumentException(
        s"$fn: the model cannot answer the given predicate over ${tables.mkString(",")}"))
    val rows = (if (fn == "spn_rollup")
        Ensemble.estRollup(spns, tables, groupCols, preds)
      else Ensemble.estCube(spns, tables, groupCols, preds))
      .sortBy(_._1.map(_.getOrElse("")).mkString("\u0000"))
    val output = groupCols.map { case (_, c) =>
      AttributeReference(c, StringType, nullable = true)() } ++
      Seq(AttributeReference("est", DoubleType)(),
        AttributeReference("ci95_lo", DoubleType)(),
        AttributeReference("ci95_hi", DoubleType)())
    val data = rows.map { case (gs, e) =>
      InternalRow.fromSeq(
        gs.map(_.map(UTF8String.fromString).orNull) ++ Seq(e.value, e.ci95Lo, e.ci95Hi))
    }
    LocalRelation(output, data)
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
    val (base, part) =
      if (fn.endsWith("_ci_lo")) (fn.dropRight(6), "lo")
      else if (fn.endsWith("_ci_hi")) (fn.dropRight(6), "hi")
      else (fn, "value")
    val est = estimateOf(session, base, fn, args)
    part match {
      case "lo" => est.ci95Lo
      case "hi" => est.ci95Hi
      case _    => est.value
    }
  }

  /** The full driver-side Estimate behind every scalar function — point
    * value and its CI bounds come from ONE inference pass, never two
    * independent estimates that could disagree.
    */
  private def estimateOf(
      session: SparkSession, base: String, fn: String,
      args: Seq[Expression]): Ensemble.Estimate = {
    val isCount = base == "spn_count"
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
      case None =>
        // a cardinality (and its CI bounds) can never be negative
        val e = Ensemble.estCount(spns, tables, preds)
        Ensemble.Estimate(
          math.max(e.value, 0.0), math.max(e.ci95Lo, 0.0), math.max(e.ci95Hi, 0.0))
      case Some(c) if base == "spn_sum" => Ensemble.estSum(spns, tables, c, preds)
      case Some(c)                      => Ensemble.estAvg(spns, tables, c, preds)
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
