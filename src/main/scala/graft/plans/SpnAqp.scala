package graft.plans

import graft.rspn.Ensemble
import graft.schema.{DatasetSpec, Relationship}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, ExprId, GreaterThan, LessThan, NamedExpression, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType, StringType}

import scala.util.Try

/** Transparent approximate query answering — the reference's END-GAME
  * surface. `deepdb-public::maqp.py --evaluate_aqp_queries` reads ordinary
  * benchmark SQL and answers it from the model plane without touching the
  * data; the Spark-native re-expression is an optimizer rule that rewrites
  * a plain, unannotated aggregate — `spark.sql("SELECT count(*), avg(x)
  * FROM t WHERE p")`, or the identical DataFrame chain — into its model
  * answer whenever the session has opted in:
  *
  * {{{
  *   spark.conf.set("spark.graft.spn.sfDir", dir)   // trained dataset
  *   spark.conf.set("spark.graft.aqp.enabled", "true")
  *   spark.sql("SELECT l_returnflag, count(*) AS n FROM lineitem " +
  *             "WHERE l_quantity < 24 GROUP BY l_returnflag")  // no scan
  * }}}
  *
  * Unlike the explicit `spn_count(...)` functions (which FAIL loudly when
  * the model cannot answer — the caller asked for an estimate), transparent
  * mode must preserve the query's meaning for every query in the session:
  * any shape outside the model's answerable class — an unmodeled column, a
  * LIKE predicate, a non-FK join, a MIN/MAX aggregate — leaves the plan
  * untouched and Spark executes it exactly. Approximate-when-possible,
  * exact-otherwise is precisely the reference's deployment posture (it
  * routes the benchmark queries it can answer to the model and the rest to
  * the DBMS).
  *
  * Recognized shape (after operator optimization, so filters sit directly
  * on the scans and projections are pruned):
  *
  *   Aggregate(group: dictionary-modeled string cols,
  *             aggs:  COUNT(*) | SUM(modeled num) | AVG(modeled num),
  *             Project/Filter chain over a modeled scan
  *               | Inner equi-joins over declared FK edges of such scans)
  *
  * The rewrite folds the whole subtree to a [[LocalRelation]] carrying the
  * Aggregate's OWN output attributes (exprIds preserved, so enclosing
  * sorts/filters/projections still resolve) with rows computed driver-side
  * from the RSPN ensemble. At 100 TB this is the reference's whole value
  * proposition made native: a dashboard query over the full corpus answers
  * in milliseconds with ZERO bytes scanned, and the SAME query text runs
  * exact the moment the flag is off.
  *
  * Reference anchors: `maqp.py --evaluate_aqp_queries` (entry),
  * `evaluation/aqp_evaluation.py` (query routing),
  * `ensemble_compilation/graph_representation.py::Query` (the answerable
  * class this rule's guards mirror).
  */
object SpnAqpRule {

  /** Conf-gated wrapper registered at builder time (inert until the session
    * opts in — same pattern as [[SpnStatsRule.fromSession]]).
    */
  def fromSession(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val conf = session.conf
      if (!conf.getOption("spark.graft.aqp.enabled").contains("true")) plan
      else conf.getOption("spark.graft.spn.sfDir") match {
        case None        => plan
        case Some(sfDir) => SpnAqpRule(session, sfDir)(plan)
      }
    }
  }

  /** Spark orders StringType by UTF-8 BINARY; Scala's default String
    * ordering compares UTF-16 code units. The two disagree exactly where a
    * supplementary character (4-byte UTF-8; surrogate pair starting at
    * 0xD800 in UTF-16) meets U+E000..U+FFFF (3-byte UTF-8; a single unit
    * ≥ 0xE000), so a folded MIN/MAX must compare the way the exact plane
    * sorts or the two planes disagree on such dictionaries.
    */
  private[graft] val utf8Ordering: Ordering[String] =
    Ordering.comparatorToOrdering((a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)))

  private[graft] def utf8Extreme(support: Iterable[String], isMin: Boolean): Any =
    if (support.isEmpty) null
    else if (isMin) support.min(utf8Ordering)
    else support.max(utf8Ordering)

  /** An annotated fold's per-output estimator Estimates — the "how sure?"
    * channel the transparent plane otherwise loses: a folded
    * `LocalRelation` must match the query's own schema, so CI bounds can't
    * ride the result rows. With `spark.graft.aqp.annotate=true` every fold
    * class records its recipe here (per group × per aggregate output: the
    * SAME estimator calls the fold's own values came from, so point values
    * match the folded cells by construction) — plain-conjunctive,
    * single-OR (inclusion-exclusion CIs), multi-OR (conservative signed
    * interval combination), grouping sets (per set, absent key columns
    * NULL), and calendar buckets (per bucket, key stringified) — queryable
    * via `SELECT * FROM spn_last_fold()`. Row universe and per-aggregate
    * gates mirror the fold exactly: a group the fold dropped, or an output
    * it returned as NULL, gets no annotation row.
    *
    * CONTRACT — support-enumeration outputs NEVER annotate (r15, pinned by
    * spec): COUNT(DISTINCT) and MIN/MAX (dictionary or realized-value
    * enumerations) are set-size/extreme statistics, not scaled
    * expectations — a CLT interval around them would be degenerate (the
    * enumeration is exact ON THE REALIZED DOMAIN) while their actual
    * failure mode (the sampled support missing a realized value) is
    * one-sided and not expressible as a symmetric interval, so emitting
    * one would misstate the error. Other outputs of the same fold still
    * annotate; the absence of a row for a distinct/extreme output is the
    * documented contract, not staleness. Expression trees are likewise
    * skipped rather than guessed (their leaves' errors are correlated
    * through shared predicates in ways a per-leaf interval sum would
    * misstate).
    *
    * STALENESS: any Aggregate the rule processes WITHOUT folding clears
    * the entry, so the TVF can never serve an earlier query's intervals
    * after a fallback. The entry is keyed per query TAG
    * (`spark.graft.aqp.tag`, default "") — two annotated folds under
    * different tags never clobber each other, eliminating the
    * concurrent-fold race on one session; `spn_last_fold()` reads the
    * session's CURRENT tag. Reference posture: `--confidence_intervals`
    * (evaluation/confidence_interval_evaluation.py) attaches CIs to every
    * reported estimate.
    */
  /** `biasBlind` (r19 contract): true when the annotated fold routed
    * through the MULTI-OR signed expansion, whose conservative interval
    * combination is MODEL-BIAS-BLIND — BENCH_SCALING r18 measured
    * nominal-95% coverage degrading to 4/8 at sf10, where the ~1–3%
    * per-term model bias exceeds the narrowing sampling-width term.
    * Consumers (spn_last_fold's bias_blind column, QErrorEval's ci
    * block) should treat such intervals at extreme scale as optimistic;
    * the conjunctive and legacy single-OR channels keep their measured
    * coverage gates and report false.
    */
  final case class FoldAnnotation(
      groupNames: Seq[String],
      rows: Seq[(Seq[String], String, Ensemble.Estimate)],
      biasBlind: Boolean = false)

  // the stored value is PLAIN DATA (a WeakHashMap value must not reach
  // back to its session key, or the entry is pinned forever); annotate is
  // opt-in and the estimator calls are memoized driver-side milliseconds,
  // so the annotation materializes eagerly at fold time
  private val lastFold =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Map[String, FoldAnnotation]]())

  private[graft] def tagOf(session: SparkSession): String =
    session.conf.getOption("spark.graft.aqp.tag").getOrElse("")

  private[plans] def record(session: SparkSession, fa: FoldAnnotation): Unit =
    lastFold.synchronized {
      val m = Option(lastFold.get(session)).getOrElse(Map.empty[String, FoldAnnotation])
      lastFold.put(session, m.updated(tagOf(session), fa))
    }
  private[plans] def clearAnnotation(session: SparkSession): Unit =
    lastFold.synchronized {
      Option(lastFold.get(session)).foreach(m => lastFold.put(session, m - tagOf(session)))
    }
  private[graft] def lastFoldOf(session: SparkSession): Option[FoldAnnotation] =
    Option(lastFold.get(session)).flatMap(_.get(tagOf(session)))
}

/** Internal SURROGATE grouping expression for the sliding-window fold
  * (r16): [[SpnAqpRule.rewriteSliding]] verifies the analyzer's
  * TimeWindowing Expand lowering NUMERICALLY (probe evaluation, like the
  * tumbling recognizer) and re-expresses the plan as
  * `Aggregate → Project(Alias(thisMarker))` so the calendar fold's whole
  * pipeline — dimension columns, OR composition, null-mass gates,
  * annotation — serves sliding windows unchanged. Never executed and never
  * visible outside the rewrite: on any fold failure the rule falls back to
  * the ORIGINAL aggregate, so the marker cannot leak into a physical plan.
  * Sliding buckets OVERLAP (each row belongs to size/slide windows) —
  * that is exact, not an approximation artifact: each bucket's aggregate
  * is an independent range query over [start, start+size).
  */
private[plans] final case class SlidingWindowMark(
    ts: AttributeReference, slideSec: Double, sizeSec: Double, stSec: Double,
    keyOf: Double => Any, structType: org.apache.spark.sql.types.StructType)
  extends Expression with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def children: Seq[Expression] = Seq(ts)
  override def dataType: DataType = structType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head.asInstanceOf[AttributeReference])
}

final case class SpnAqpRule(session: SparkSession, sfDir: String)
    extends Rule[LogicalPlan] {

  import SpnCardinality.{atomsOf, splitConj, Atom, ScanShape}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // estimation failures must never fail the QUERY — any miss falls back
    // to the exact plan (Try is the catch-all guard; every structural
    // mismatch already returns None before estimation starts). An Expand
    // child is the analyzer's GROUP BY ROLLUP/CUBE/GROUPING SETS shape —
    // folded per grouping set through the same estimators. A Filter
    // BETWEEN the Aggregate and the Expand is what the optimizer makes of
    // `HAVING GROUPING(c) = 0` / `HAVING grouping_id() = ...`
    // (PushPredicateThroughNonJoin pushes the gid-only condition below the
    // Aggregate): the condition is a per-SET constant, so rewriteSets
    // evaluates it per Expand projection and folds only the surviving
    // grouping sets — the "drop the total row" idiom stays zero-scan.
    case agg: Aggregate => Try(agg.child match {
      // an Expand under the Aggregate is EITHER the grouping-sets lowering
      // (spark_grouping_id slot — rewriteSets returns None without one) or
      // the sliding-window lowering (r16, rewriteSliding); the
      // sliding shape may also carry a containment Filter and a pruning
      // pure-attribute Project between the Aggregate and the Expand
      case ex: org.apache.spark.sql.catalyst.plans.logical.Expand =>
        rewriteSets(agg, ex, setFilter = None)
          .orElse(rewriteSliding(agg, None, ex))
      case Filter(cond, ex: org.apache.spark.sql.catalyst.plans.logical.Expand) =>
        rewriteSets(agg, ex, setFilter = Some(cond))
          .orElse(rewriteSliding(agg, Some(cond), ex))
      case Project(pl, Filter(cond, ex: org.apache.spark.sql.catalyst.plans.logical.Expand))
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewriteSliding(agg, Some(cond), ex)
      case Project(pl, ex: org.apache.spark.sql.catalyst.plans.logical.Expand)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewriteSliding(agg, None, ex)
      case _ =>
        rewrite(agg).orElse {
          val inlined = inlineProjectAliases(agg)
          if (inlined eq agg) None else rewrite(inlined)
        }.orElse(rewriteCalendar(agg)).orElse(rewriteNumericGroup(agg))
    }).toOption.flatten match {
      case Some(folded) => folded
      case None =>
        // STALENESS: an Aggregate the rule saw but did NOT fold must not
        // leave an earlier fold's intervals queryable under this tag —
        // spn_last_fold() after a fallback query would otherwise attribute
        // the previous query's CIs to the latest one
        SpnAqpRule.clearAnnotation(session)
        agg
    }
  }

  /** Inline computed aliases the analyzer/optimizer extracted into a
    * Project under the Aggregate — `count_if`'s `_common_expr` boolean,
    * common-subexpression projections — by substituting each alias's
    * defining child back into the aggregate and grouping expressions and
    * re-exposing the source attributes the aliases consumed. The
    * resulting Aggregate keeps its OUTPUT exprIds (only inner references
    * change), so the fold's LocalRelation still resolves for enclosing
    * operators; the rewritten child Project is pure attributes, which the
    * walk accepts. Tried only after the original shape fails — pure
    * renames already resolve through the Shape's rename layer.
    */
  private def inlineProjectAliases(agg: Aggregate): Aggregate = agg.child match {
    case Project(pl, inner)
        if pl.exists(_.isInstanceOf[Alias]) && pl.forall(_.deterministic) =>
      val subs: Map[ExprId, Expression] =
        pl.collect { case al @ Alias(child, _) => al.exprId -> child }.toMap
      def sub(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if subs.contains(a.exprId) => subs(a.exprId)
      }
      val aggExprs = agg.aggregateExpressions.map { ne =>
        sub(ne) match {
          // a BARE computed-alias output substitutes to a non-named
          // expression — re-wrap under the SAME exprId so the Aggregate's
          // output contract survives the inlining
          case nn: NamedExpression => nn
          case e                   => Alias(e, ne.name)(exprId = ne.exprId)
        }
      }
      val groups = agg.groupingExpressions.map(sub)
      val keep = (pl.filterNot(_.isInstanceOf[Alias]) ++
        (aggExprs ++ groups).flatMap(_.references)
          .filterNot(a => subs.contains(a.exprId)))
        .foldLeft(Vector.empty[NamedExpression]) { (acc, ne) =>
          if (acc.exists(_.exprId == ne.exprId)) acc else acc :+ ne
        }
      Aggregate(groups, aggExprs, Project(keep, inner))
    case _ => agg
  }

  /** Join subtree summary: tables touched, understood filter atoms per
    * table, and each output attribute's SOURCE (table, scan column) —
    * exprId keyed (name lookup would break on self-joins, which are
    * rejected anyway), and carrying the scan-level column name so PURE
    * RENAMES (`SELECT l_returnflag AS flag FROM ...` in a derived table /
    * view) resolve to the modeled column the estimator knows.
    */
  private case class Shape(
      tables: Set[String],
      atoms: Map[String, Seq[Atom]],
      attrTable: Map[ExprId, (String, String)],
      /** understood independent disjunctions ride along, each group a
        * list of branch conjunctions (n-branch since r18). One 2-branch
        * group answers through the estimator's shared-memo
        * inclusion-exclusion path (estCountOr/estAggOr/estAvgOr); any
        * other layout answers through the product-form signed expansion
        * (scalar AND grouped), each group expanded by full
        * inclusion–exclusion into 2^k−1 signed picks. The total term
        * product Π_g (2^{k_g}−1) is capped at 27 — the r17 three-group
        * 3^N bound generalized; past it the rewrite falls back to exact:
        * the expansion stays exact in expectation at any size, but each
        * signed term's relative error compounds with the term count, so
        * the cap is an accuracy bound, not a structural one. */
      orBranches: Seq[Seq[Map[String, Seq[Atom]]]] = Nil,
      /** `isnotnull(key)` atoms on UNMODELED declared key columns, parked
        * until an inner equi-join on that very column discharges them (the
        * join implies them); any still pending at the top mean the user
        * wrote an explicit IS NOT NULL the model cannot see — fall back. */
      pendingKeyNotNull: Set[(String, String)] = Set.empty)

  /** Per-table declared key columns: `isnotnull(key)` conjuncts that
    * predicate pushdown strews onto the scans of an inner equi-join are
    * implied by the join itself (and by the FK integrity the estimator
    * already assumes), so they are dropped instead of blocking the rewrite.
    */
  private def keyColsOf(spec: DatasetSpec): Map[String, Set[String]] = {
    val fromRels = spec.graph.relationships
      .flatMap(r => Seq(r.many -> r.fk, r.one -> r.pk))
    val fromPks = spec.graph.tables.flatMap(t => t.primaryKey.map(t.name -> _))
    (fromRels ++ fromPks).groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).toSet }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val spec = DatasetSpec.forDir(session, sfDir)
    val keyCols = keyColsOf(spec)
    for {
      sh <- walk(agg.child, spec.modeled, spec.graph.relationships, keyCols)
      // an undischarged key IS NOT NULL is a real predicate, not join noise
      if sh.pendingKeyNotNull.isEmpty
      groups <- groupCols(agg, sh, spec.modeled)
      groupIdx = agg.groupingExpressions.collect {
        case a: AttributeReference => a.exprId
      }.zipWithIndex.toMap
      cols <- outputCols(agg, sh, spec.modeled, groupIdx)
      rows <- estimate(sh, groups.map(_._2), cols, agg.output.map(_.dataType))
    } yield {
      annotate(sh, groups, cols, agg)
      LocalRelation(agg.output, rows)
    }
  }

  /** Record the fold's CI annotation for `spn_last_fold()` (see
    * [[SpnAqpRule.FoldAnnotation]] for the contract): the SAME estimator
    * calls the fold's own values came from — so point values equal the
    * folded cells — with the SAME row universe and per-aggregate gates (a
    * group the fold dropped, or an output it returned as NULL, gets no
    * annotation row), across every shape class the fold dispatch serves:
    * plain-conjunctive, single-OR (the inclusion-exclusion estimators
    * carry CIs), and the multi-OR signed expansion (conservative interval
    * combination per signed term — signs flip bounds, intervals add).
    * AVG-of-linear-form outputs annotate by the interval quotient of the
    * combined term sum over the NN-gated count (skipped on a
    * sign-crossing denominator). Outputs without a one-call CI channel
    * (expression trees, distinct counts, MIN/MAX) are skipped rather than
    * guessed. With the annotate conf OFF a fold CLEARS the current tag's
    * entry — an earlier annotated query's intervals must not survive a
    * newer un-annotated fold.
    */
  private def annotate(
      sh: Shape, groups: Seq[(AttributeReference, (String, String))],
      cols: Seq[OutCol], agg: Aggregate): Unit = {
    if (!session.conf.getOption("spark.graft.aqp.annotate").contains("true")) {
      SpnAqpRule.clearAnnotation(session)
      return
    }
    val spns = Ensemble.get(session, sfDir)
    val spec = DatasetSpec.forDir(session, sfDir)
    SpnAqpRule.record(session, SpnAqpRule.FoldAnnotation(
      groups.map(_._1.name),
      annotationRows(spns, spec, sh, groups.map(_._2),
        cols.zip(agg.aggregateExpressions.map(_.name))),
      biasBlind = signedExpansionShape(sh)))
  }

  /** True when this shape's CI channel is the multi-OR SIGNED expansion
    * (anything past the legacy lone-2-branch inclusion–exclusion) — the
    * [[SpnAqpRule.FoldAnnotation.biasBlind]] trigger.
    */
  private def signedExpansionShape(sh: Shape): Boolean = sh.orBranches match {
    case Seq()          => false
    case Seq(Seq(_, _)) => false
    case _              => true
  }

  // ---- interval algebra for annotation combination ----
  // coefficient scaling and conservative interval ADDITION for linear
  // forms and signed expansions (the SqlEstimate Combo convention: terms
  // share predicates, so their errors are positively correlated and the
  // summed interval can only over-cover); a negative coefficient or sign
  // FLIPS the bounds
  private def scaleE(cf: Double, e: Ensemble.Estimate): Ensemble.Estimate =
    if (cf >= 0) Ensemble.Estimate(cf * e.value, cf * e.ci95Lo, cf * e.ci95Hi)
    else Ensemble.Estimate(cf * e.value, cf * e.ci95Hi, cf * e.ci95Lo)
  private def addE(a: Ensemble.Estimate, b: Ensemble.Estimate): Ensemble.Estimate =
    Ensemble.Estimate(a.value + b.value, a.ci95Lo + b.ci95Lo, a.ci95Hi + b.ci95Hi)
  private val zeroE = Ensemble.Estimate(0.0, 0.0, 0.0)
  /** The fold clamps count POINT values at zero; the interval keeps its
    * conservative bounds.
    */
  private def clamp0(e: Ensemble.Estimate): Ensemble.Estimate =
    if (e.value < 0) e.copy(value = 0.0) else e
  /** Conservative interval quotient for the AVG ratio under the signed
    * expansion — only when the fold emitted the cell (den >= half a row)
    * AND the denominator interval is strictly positive (a sign-crossing
    * denominator has no finite quotient interval → skip, never guess).
    */
  private def ratioE(
      num: Ensemble.Estimate, den: Ensemble.Estimate): Option[Ensemble.Estimate] =
    if (den.value < 0.5 || den.ci95Lo <= 0) None
    else {
      val qs = for { n <- Seq(num.ci95Lo, num.ci95Hi); d <- Seq(den.ci95Lo, den.ci95Hi) }
        yield n / d
      Some(Ensemble.Estimate(num.value / den.value, qs.min, qs.max))
    }

  /** Per-output (group key, output name, Estimate) annotation rows — see
    * [[annotate]]. Shape-parameterized so the grouping-set fold (per set)
    * and the calendar fold (per bucket) reuse it with their conjoined
    * atoms and effective dictionary group columns.
    */
  private def annotationRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec,
      sh: Shape, gcols: Seq[(String, String)],
      colPairs: Seq[(OutCol, String)]): Seq[(Seq[String], String, Ensemble.Estimate)] =
    sh.orBranches match {
      case Seq()           => annPlain(spns, spec, sh, gcols, colPairs)
      case Seq(Seq(a, b))  => annSingleOr(spns, spec, sh, a, b, gcols, colPairs)
      case gs              => annMultiOr(spns, spec, sh, gs, gcols, colPairs)
    }

  private def annPlain(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      gcols: Seq[(String, String)], colPairs: Seq[(OutCol, String)])
      : Seq[(Seq[String], String, Ensemble.Estimate)] = {
    def predsOf(m: Map[String, Seq[Atom]]) =
      SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
    def scalarEst(atoms: Map[String, Seq[Atom]])(c: OutCol): Option[Ensemble.Estimate] = c match {
      case FilteredOut(extra, inner) => scalarEst(mergeAtoms(atoms, extra))(inner)
      case CountOut() => predsOf(atoms).map(Ensemble.estCount(spns, sh.tables, _))
      case CountColOut(cc) =>
        predsOf(withNotNull(atoms, Seq(cc))).map(Ensemble.estCount(spns, sh.tables, _))
      case SumOut(terms, refCols) =>
        predsOf(withNotNull(atoms, refCols)).flatMap { p =>
          if (Ensemble.estCount(spns, sh.tables, p).value < 0.5) None // fold: NULL
          else Some(terms.map {
            case (cf, Seq())   => scaleE(cf, Ensemble.estCount(spns, sh.tables, p))
            case (cf, Seq(c1)) => scaleE(cf, Ensemble.estSum(spns, sh.tables, c1, p))
            case (cf, cs)      => scaleE(cf, Ensemble.estSumProduct(spns, sh.tables, cs, p))
          }.reduce(addE))
        }
      case AvgOut(ac) =>
        predsOf(withNotNull(atoms, Seq(ac))).flatMap { p =>
          if (Ensemble.estCount(spns, sh.tables, p).value < 0.5) None // fold: NULL
          else Some(Ensemble.estAvg(spns, sh.tables, ac, p))
        }
      // AVG of a linear form: the fold divides the combined term sum by
      // the NN-gated count — annotate with the interval quotient (skipped
      // on a sign-crossing denominator, never guessed)
      case AvgExprOut(terms, refCols) =>
        predsOf(withNotNull(atoms, refCols)).flatMap { p =>
          val den = Ensemble.estCount(spns, sh.tables, p)
          if (den.value < 0.5) None // fold: NULL
          else ratioE(terms.map {
            case (cf, Seq())   => scaleE(cf, Ensemble.estCount(spns, sh.tables, p))
            case (cf, Seq(c1)) => scaleE(cf, Ensemble.estSum(spns, sh.tables, c1, p))
            case (cf, cs)      => scaleE(cf, Ensemble.estSumProduct(spns, sh.tables, cs, p))
          }.reduce(addE), den)
        }
      case _ => None
    }
    def groupEst(atoms: Map[String, Seq[Atom]])(c: OutCol)
        : Option[Map[Seq[String], Ensemble.Estimate]] = c match {
      case FilteredOut(extra, inner) => groupEst(mergeAtoms(atoms, extra))(inner)
      case CountOut() =>
        predsOf(atoms).map(Ensemble.estGroupByMulti(spns, sh.tables, gcols, _).toMap)
      case CountColOut(cc) =>
        predsOf(withNotNull(atoms, Seq(cc)))
          .map(Ensemble.estGroupByMulti(spns, sh.tables, gcols, _).toMap)
      case SumOut(terms, refCols) =>
        predsOf(withNotNull(atoms, refCols)).map { p =>
          // per-group SUM gate mirrors the fold: a gate-failing group's
          // cell folded to NULL, so it gets no annotation row
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> e.value }.toMap
          val perTerm: Seq[Map[Seq[String], Ensemble.Estimate]] = terms.map {
            case (cf, Seq()) =>
              Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
                .map { case (k, e) => k -> scaleE(cf, e) }.toMap
            case (cf, cs) =>
              Ensemble.estGroupByAgg(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, p)
                .map { case (k, e) => k -> scaleE(cf, e) }.toMap
          }
          perTerm.flatMap(_.keys).distinct.collect {
            case k if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> perTerm.map(_.getOrElse(k, zeroE)).reduce(addE)
          }.toMap
        }
      case AvgOut(ac) =>
        predsOf(withNotNull(atoms, Seq(ac))).map { p =>
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> e.value }.toMap
          Ensemble.estGroupByAvg(spns, sh.tables, gcols, ac, p)
            .collect { case (k, e) if gate.getOrElse(k, 0.0) >= 0.5 => k -> e }.toMap
        }
      case AvgExprOut(terms, refCols) =>
        predsOf(withNotNull(atoms, refCols)).map { p =>
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p).toMap
          val perTerm: Seq[Map[Seq[String], Ensemble.Estimate]] = terms.map {
            case (cf, Seq()) =>
              Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
                .map { case (k, e) => k -> scaleE(cf, e) }.toMap
            case (cf, cs) =>
              Ensemble.estGroupByAgg(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, p)
                .map { case (k, e) => k -> scaleE(cf, e) }.toMap
          }
          perTerm.flatMap(_.keys).distinct.flatMap { k =>
            gate.get(k).filter(_.value >= 0.5).flatMap { den =>
              ratioE(perTerm.map(_.getOrElse(k, zeroE)).reduce(addE), den)
            }.map(k -> _)
          }.toMap
        }
      case _ => None
    }
    if (gcols.isEmpty)
      colPairs.flatMap { case (c, nm) =>
        scalarEst(sh.atoms)(c).map(e => (Seq.empty[String], nm, e)) }
    else {
      // the folded ROW UNIVERSE: base-count groups at >= half a row —
      // exactly plainGroupRows' assembly gate, so the annotation can never
      // list a group the fold dropped
      val universe: Set[Seq[String]] = predsOf(sh.atoms).map(p =>
        Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
          .collect { case (k, e) if e.value >= 0.5 => k }.toSet).getOrElse(Set.empty)
      colPairs.flatMap { case (c, nm) =>
        groupEst(sh.atoms)(c).map(_.collect {
          case (k, e) if universe(k) => (k, nm, e)
        }.toSeq).getOrElse(Nil)
      }
    }
  }

  /** One disjunction: the inclusion-exclusion estimators carry CIs too
    * (estCountOr/estAggOr/estAvgOr and the grouped forms — the same calls
    * the fold made), with the fold's universe and per-aggregate gates.
    */
  private def annSingleOr(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      orA: Map[String, Seq[Atom]], orB: Map[String, Seq[Atom]],
      gcols: Seq[(String, String)], colPairs: Seq[(OutCol, String)])
      : Seq[(Seq[String], String, Ensemble.Estimate)] = {
    def predsOf(m: Map[String, Seq[Atom]]) =
      SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
    def pairFor(base: Map[String, Seq[Atom]], cs: Seq[(String, String)]) = for {
      nA <- predsOf(withNotNull(mergeAtomMaps(base, orA), cs))
      nB <- predsOf(withNotNull(mergeAtomMaps(base, orB), cs))
    } yield (nA, nB)
    def scalarEst(base: Map[String, Seq[Atom]])(c: OutCol): Option[Ensemble.Estimate] = c match {
      case FilteredOut(extra, inner) => scalarEst(mergeAtoms(base, extra))(inner)
      case CountOut() => pairFor(base, Nil).map { case (pA, pB) =>
        Ensemble.estCountOr(spns, sh.tables, pA, pB) }
      case CountColOut(cc) => pairFor(base, Seq(cc)).map { case (nA, nB) =>
        Ensemble.estCountOr(spns, sh.tables, nA, nB) }
      case SumOut(terms, refCols) => pairFor(base, refCols).flatMap { case (nA, nB) =>
        if (Ensemble.estCountOr(spns, sh.tables, nA, nB).value < 0.5) None // fold: NULL
        else Some(terms.map {
          case (cf, Seq()) => scaleE(cf, Ensemble.estCountOr(spns, sh.tables, nA, nB))
          case (cf, cs) =>
            scaleE(cf, Ensemble.estAggOr(spns, sh.tables, nA, nB, cs.map(_ -> 1).toMap))
        }.reduce(addE))
      }
      case AvgOut(ac) => pairFor(base, Seq(ac)).flatMap { case (nA, nB) =>
        if (Ensemble.estCountOr(spns, sh.tables, nA, nB).value < 0.5) None
        else Some(Ensemble.estAvgOr(spns, sh.tables, ac, nA, nB))
      }
      case AvgExprOut(terms, refCols) => pairFor(base, refCols).flatMap { case (nA, nB) =>
        val den = Ensemble.estCountOr(spns, sh.tables, nA, nB)
        if (den.value < 0.5) None
        else ratioE(terms.map {
          case (cf, Seq()) => scaleE(cf, den)
          case (cf, cs) =>
            scaleE(cf, Ensemble.estAggOr(spns, sh.tables, nA, nB, cs.map(_ -> 1).toMap))
        }.reduce(addE), den)
      }
      case _ => None
    }
    def groupEst(base: Map[String, Seq[Atom]])(c: OutCol)
        : Option[Map[Seq[String], Ensemble.Estimate]] = c match {
      case FilteredOut(extra, inner) => groupEst(mergeAtoms(base, extra))(inner)
      case CountOut() => pairFor(base, Nil).map { case (pA, pB) =>
        Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, pA, pB)
          .map { case (k, e) => k -> clamp0(e) }.toMap }
      case CountColOut(cc) => pairFor(base, Seq(cc)).map { case (nA, nB) =>
        Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, nA, nB)
          .map { case (k, e) => k -> clamp0(e) }.toMap }
      case SumOut(terms, refCols) => pairFor(base, refCols).map { case (nA, nB) =>
        val gate = Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, nA, nB)
          .map { case (k, e) => k -> e.value }.toMap
        val perTerm = terms.map { case (cf, cs) =>
          Ensemble.estGroupByAggOr(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, nA, nB)
            .map { case (k, e) => k -> scaleE(cf, e) }.toMap
        }
        perTerm.flatMap(_.keys).distinct.collect {
          case k if gate.getOrElse(k, 0.0) >= 0.5 =>
            k -> perTerm.map(_.getOrElse(k, zeroE)).reduce(addE)
        }.toMap
      }
      case AvgOut(ac) => pairFor(base, Seq(ac)).map { case (nA, nB) =>
        val gate = Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, nA, nB)
          .map { case (k, e) => k -> e.value }.toMap
        Ensemble.estGroupByAvgOr(spns, sh.tables, gcols, ac, nA, nB)
          .collect { case (k, e) if gate.getOrElse(k, 0.0) >= 0.5 => k -> e }.toMap
      }
      case AvgExprOut(terms, refCols) => pairFor(base, refCols).map { case (nA, nB) =>
        val gate = Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, nA, nB).toMap
        val perTerm = terms.map {
          case (cf, Seq()) => gate.map { case (k, e) => k -> scaleE(cf, e) }
          case (cf, cs) =>
            Ensemble.estGroupByAggOr(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, nA, nB)
              .map { case (k, e) => k -> scaleE(cf, e) }.toMap
        }
        perTerm.flatMap(_.keys).toSeq.distinct.flatMap { k =>
          gate.get(k).filter(_.value >= 0.5).flatMap { den =>
            ratioE(perTerm.map(_.getOrElse(k, zeroE)).reduce(addE), den)
          }.map(k -> _)
        }.toMap
      }
      case _ => None
    }
    if (gcols.isEmpty)
      colPairs.flatMap { case (c, nm) =>
        scalarEst(sh.atoms)(c).map(e => (Seq.empty[String], nm, e)) }
    else {
      // the fold's row universe: the ungated IE count at >= half a row
      // (singleOrGroupRows' baseKeys convention)
      val universe: Set[Seq[String]] = pairFor(sh.atoms, Nil).map { case (pA, pB) =>
        Ensemble.estGroupByAggOr(spns, sh.tables, gcols, Map.empty, pA, pB)
          .collect { case (k, e) if e.value >= 0.5 => k }.toSet
      }.getOrElse(Set.empty)
      colPairs.flatMap { case (c, nm) =>
        groupEst(sh.atoms)(c).map(_.collect {
          case (k, e) if universe(k) => (k, nm, e)
        }.toSeq).getOrElse(Nil)
      }
    }
  }

  /** Multiple (or 3+-branch) disjunctions: the signed expansion's per-term
    * Estimates combine through scaleE/addE — signs flip bounds, intervals
    * add — so the compounded signed error is covered CONSERVATIVELY; the
    * AVG ratio gets the interval quotient (skipped on a sign-crossing
    * denominator).
    */
  private def annMultiOr(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      groups: Seq[Seq[Map[String, Seq[Atom]]]],
      gcols: Seq[(String, String)], colPairs: Seq[(OutCol, String)])
      : Seq[(Seq[String], String, Ensemble.Estimate)] = {
    def predsOf(m: Map[String, Seq[Atom]]) =
      SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
    def termsFor(base: Map[String, Seq[Atom]]): Seq[(Double, Map[String, Seq[Atom]])] =
      signedAtomTerms(base, groups)
    def estOfE(cs: Seq[(String, String)])(
        p: Map[(String, String), graft.rspn.ColRange]): Ensemble.Estimate = cs match {
      case Seq()  => Ensemble.estCount(spns, sh.tables, p)
      case Seq(c) => Ensemble.estSum(spns, sh.tables, c, p)
      case more   => Ensemble.estSumProduct(spns, sh.tables, more, p)
    }
    def signedE(base: Map[String, Seq[Atom]], nnCols: Seq[(String, String)],
        feature: Seq[(String, String)]): Option[Ensemble.Estimate] =
      termsFor(base).foldLeft(Option(zeroE)) { case (acc, (sgn, m)) =>
        for { a <- acc; p <- predsOf(withNotNull(m, nnCols)) }
          yield addE(a, scaleE(sgn, estOfE(feature)(p)))
      }
    def signedGE(base: Map[String, Seq[Atom]], nnCols: Seq[(String, String)],
        feature: Seq[(String, String)]): Option[Map[Seq[String], Ensemble.Estimate]] =
      termsFor(base).foldLeft(Option(Map.empty[Seq[String], Ensemble.Estimate])) {
        case (acc, (sgn, m)) =>
          for { a <- acc; p <- predsOf(withNotNull(m, nnCols)) } yield {
            val enumed =
              if (feature.isEmpty) Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
              else Ensemble.estGroupByAgg(spns, sh.tables, gcols, feature.map(_ -> 1).toMap, p)
            enumed.foldLeft(a) { case (mm, (k, e)) =>
              mm.updated(k, addE(mm.getOrElse(k, zeroE), scaleE(sgn, e)))
            }
          }
      }
    def scalarEst(base: Map[String, Seq[Atom]])(c: OutCol): Option[Ensemble.Estimate] = c match {
      case FilteredOut(extra, inner) => scalarEst(mergeAtoms(base, extra))(inner)
      case CountOut()      => signedE(base, Nil, Nil).map(clamp0)
      case CountColOut(cc) => signedE(base, Seq(cc), Nil).map(clamp0)
      case SumOut(terms, refCols) =>
        signedE(base, refCols, Nil).flatMap { gate =>
          if (gate.value < 0.5) None // fold: NULL
          else terms.foldLeft(Option(zeroE)) { case (acc, (cf, cs)) =>
            for { a <- acc; t <- signedE(base, refCols, cs) } yield addE(a, scaleE(cf, t))
          }
        }
      case AvgOut(ac) =>
        for {
          den <- signedE(base, Seq(ac), Nil)
          num <- signedE(base, Seq(ac), Seq(ac))
          r <- ratioE(num, den)
        } yield r
      case AvgExprOut(terms, refCols) =>
        for {
          den <- signedE(base, refCols, Nil)
          num <- terms.foldLeft(Option(zeroE)) { case (acc, (cf, cs)) =>
            for { a <- acc; t <- signedE(base, refCols, cs) } yield addE(a, scaleE(cf, t))
          }
          r <- ratioE(num, den)
        } yield r
      case _ => None
    }
    def groupEst(base: Map[String, Seq[Atom]])(c: OutCol)
        : Option[Map[Seq[String], Ensemble.Estimate]] = c match {
      case FilteredOut(extra, inner) => groupEst(mergeAtoms(base, extra))(inner)
      case CountOut() =>
        signedGE(base, Nil, Nil).map(_.map { case (k, e) => k -> clamp0(e) })
      case CountColOut(cc) =>
        signedGE(base, Seq(cc), Nil).map(_.map { case (k, e) => k -> clamp0(e) })
      case SumOut(terms, refCols) =>
        for {
          gate <- signedGE(base, refCols, Nil)
          per <- terms.foldLeft(Option(Map.empty[Seq[String], Ensemble.Estimate])) {
            case (acc, (cf, cs)) =>
              for { a <- acc; m <- signedGE(base, refCols, cs) } yield
                (a.keySet ++ m.keySet).iterator.map(k =>
                  k -> addE(a.getOrElse(k, zeroE), scaleE(cf, m.getOrElse(k, zeroE)))).toMap
          }
        } yield per.filter { case (k, _) => gate.get(k).exists(_.value >= 0.5) }
      case AvgOut(ac) =>
        for {
          den <- signedGE(base, Seq(ac), Nil)
          num <- signedGE(base, Seq(ac), Seq(ac))
        } yield num.flatMap { case (k, n) =>
          den.get(k).flatMap(d => ratioE(n, d)).map(k -> _)
        }
      case AvgExprOut(terms, refCols) =>
        for {
          den <- signedGE(base, refCols, Nil)
          per <- terms.foldLeft(Option(Map.empty[Seq[String], Ensemble.Estimate])) {
            case (acc, (cf, cs)) =>
              for { a <- acc; m <- signedGE(base, refCols, cs) } yield
                (a.keySet ++ m.keySet).iterator.map(k =>
                  k -> addE(a.getOrElse(k, zeroE), scaleE(cf, m.getOrElse(k, zeroE)))).toMap
          }
        } yield per.flatMap { case (k, n) =>
          den.get(k).flatMap(d => ratioE(n, d)).map(k -> _)
        }
      case _ => None
    }
    if (gcols.isEmpty)
      colPairs.flatMap { case (c, nm) =>
        scalarEst(sh.atoms)(c).map(e => (Seq.empty[String], nm, e)) }
    else {
      // the fold's row universe: the signed count combination at >= half
      // a row (multiOrGroupRows' convention)
      val universe: Set[Seq[String]] = signedGE(sh.atoms, Nil, Nil)
        .map(_.collect { case (k, e) if e.value >= 0.5 => k }.toSet).getOrElse(Set.empty)
      colPairs.flatMap { case (c, nm) =>
        groupEst(sh.atoms)(c).map(_.collect {
          case (k, e) if universe(k) => (k, nm, e)
        }.toSeq).getOrElse(Nil)
      }
    }
  }

  /** Grouping-set folds annotate PER SET: each set's rows come from the
    * same shape-parameterized builders under the set's extra atoms (and
    * whatever OR structure the shape carries), keys padded to the full
    * grouping width with SQL NULL for the columns the set grouped out.
    * Sets containing NUM-MODELED grouping columns contribute no
    * annotation rows (their keys are value pins outside the dictionary
    * enumeration — the same deliberate never-annotate posture as the
    * support-enumeration outputs; the cat-only sets of the same query
    * still annotate). The exclusion is ENFORCED by the numPos filter
    * below (r15 ADVICE) — it previously held only because enumGroups over
    * a dict-less numeric column happens to yield Nil, which a future
    * estimator change could silently break.
    */
  private def annotateSets(
      sh: Shape, groupAttrs: Seq[AttributeReference], groupSrc: Seq[(String, String)],
      numPos: Set[Int],
      sets: Seq[(Seq[Int], Expression, Seq[(String, Atom)])],
      colPairs: Seq[(OutCol, String)]): Unit = {
    if (!session.conf.getOption("spark.graft.aqp.annotate").contains("true")) {
      SpnAqpRule.clearAnnotation(session)
      return
    }
    val spns = Ensemble.get(session, sfDir)
    val spec = DatasetSpec.forDir(session, sfDir)
    val rows = sets.filterNot(_._1.exists(numPos)).flatMap { case (set, _, extra) =>
      val shSet = if (extra.isEmpty) sh else sh.copy(atoms = mergeAtoms(sh.atoms, extra))
      annotationRows(spns, spec, shSet, set.map(groupSrc), colPairs).map { case (k, nm, e) =>
        val full = Array.fill[String](groupAttrs.length)(null)
        set.zip(k).foreach { case (pos, v) => full(pos) = v }
        (full.toSeq, nm, e)
      }
    }
    SpnAqpRule.record(session, SpnAqpRule.FoldAnnotation(groupAttrs.map(_.name), rows,
      biasBlind = signedExpansionShape(sh)))
  }

  /** Calendar/histogram folds annotate PER BUCKET TUPLE under whatever OR
    * structure the Shape carries (annotationRows dispatches exactly like
    * the fold itself), the bucket key(s) stringified as the leading group
    * column(s).
    */
  private def annotateCalendar(
      sh: Shape,
      tuples: Seq[(Seq[Any], Seq[(String, Atom)])],
      dims: Seq[(String, String)],
      groupNames: Seq[String],
      colPairs: Seq[(OutCol, String)]): Unit = {
    if (!session.conf.getOption("spark.graft.aqp.annotate").contains("true")) {
      SpnAqpRule.clearAnnotation(session)
      return
    }
    val spns = Ensemble.get(session, sfDir)
    val spec = DatasetSpec.forDir(session, sfDir)
    val rows = tuples.flatMap { case (ks, extra) =>
      val shB = sh.copy(atoms = mergeAtoms(sh.atoms, extra))
      val prefix = ks.map(String.valueOf)
      if (dims.isEmpty) {
        // scalar buckets annotate only when the fold emitted them
        // (count >= half a row — the fold's own shape-dispatched gate)
        val emitted = shapeCount(spns, spec, shB).exists(_ >= 0.5)
        if (!emitted) Nil
        else annotationRows(spns, spec, shB, Nil, colPairs)
          .map { case (_, nm, e) => (prefix, nm, e) }
      } else annotationRows(spns, spec, shB, dims, colPairs)
        .map { case (k, nm, e) => (prefix ++ k, nm, e) }
    }
    SpnAqpRule.record(session, SpnAqpRule.FoldAnnotation(groupNames, rows,
      biasBlind = signedExpansionShape(sh)))
  }


  /** Calendar-bucket folding for the time-series dashboard shapes the
    * dictionary-grouped path cannot serve (a days column has no value
    * dictionary):
    *
    *   GROUP BY <calendar expr> [, dictionary cat columns...]
    *
    * with calendar expr ∈ `year(d)` / `date_trunc('year'|'quarter'|'month'
    * |'week'|'day', d)` (LINEAR buckets: consecutive half-open ranges over
    * the model's realized domain) or `month(d)` / `quarter(d)` (CYCLIC
    * buckets: each key is the UNION of its per-year intervals — one
    * multi-interval [[SpnCardinality.RangeUnion]] atom, the reference's
    * `ranges.py::NumericRange` list-of-intervals put to work). The model's
    * [[Ensemble.colDomain]] bounds the realized date range; every bucket
    * is one range-conjoined estimation over the base atoms (all memoized
    * model folds).
    *
    * The MIXED shape — `GROUP BY year(d), dimcol` — enumerates dictionary
    * groups PER BUCKET under the bucket-conjoined predicate (the
    * reference's `aqp_spn/group_by_combination.py` arbitrary-combination
    * enumeration, with the calendar bucket as one more range conjunct);
    * the row universe per bucket is the enumeration's nonzero-mass groups,
    * exactly the plain grouped path's convention. A scalar bucket (no dim
    * columns) estimating below one row emits no group, matching SQL's row
    * universe.
    *
    * Since r16 the SAME machinery folds ARITHMETIC BINS over num-modeled
    * columns — `GROUP BY floor(x/100)` / `width_bucket(x, lo, hi, n)` /
    * `round(x, -k)` — the binned-histogram shape that serves exactly the
    * near-continuous columns (l_extendedprice, o_totalprice) the
    * realized-value enumeration honestly refuses at its support caps:
    * each bin is one half-open range conjunct, per-bin mass straight off
    * the NumericLeaf range probability, no enumeration at all. Calendar
    * and bin candidates compose in one cross product (`GROUP BY year(d),
    * floor(price/1000)`) through the shared per-column interval meets.
    *
    * Guards: at most THREE bucket grouping expressions (the rest must be
    * dictionary-modeled strings or num-modeled numerics — the latter
    * expand the bucket tuples by realized-value support, r15), UTC session
    * timezone only (truncation boundaries and the model's epoch-day
    * encoding agree exactly there), at most 400 buckets / 400 domain
    * years. Cross-column disjunctions COMPOSE since r15: every bucket
    * estimates through the shape dispatch, so the walk's ≤3-disjunction
    * accuracy cap is the only OR guard. An estimated NULL-date mass of
    * one row or more falls back — SQL's NULL group is unproducible from
    * range buckets.
    */
  /** Bucket-count caps by FOLD CLASS (r17): a pure-interval fold — ONE
    * bucket generator, no dictionary/numeric dimension enumeration — costs
    * exactly one range probe per bucket, so it carries a higher cap (the
    * 720-bucket 30-day hourly dashboard folds whole); any fold that
    * crosses bucket columns or enumerates dimensions keeps the 400-tuple
    * accuracy/latency cap. Generators produce up to [[intervalCap]]
    * buckets; the tuple assembly enforces the class split.
    */
  private[graft] val intervalCap = 2000
  private[graft] val tupleCap = 400

  private def rewriteCalendar(agg: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{DayOfWeek, Divide, Floor, Month, Quarter, Round, TruncTimestamp, WidthBucket, Year}
    import org.apache.spark.sql.types.{DateType, TimestampType}
    import java.time.LocalDate
    // the date attribute, behind the date/timestamp cast the analyzer
    // inserts when the column's SQL type differs from the function's
    object DateAttr {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference                                  => Some(a)
        case Cast(a: AttributeReference, DateType, _, _)            => Some(a)
        case Cast(a: AttributeReference, TimestampType, _, _)       => Some(a)
        case _                                                      => None
      }
    }
    // the numeric attribute behind the double upcast division/width_bucket
    // insert (int → double is value-preserving on the interval math; a
    // NARROWING cast is not an attribute, so it falls through to fallback)
    object NumAttr {
      def unapply(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference if a.dataType.isInstanceOf[NumericType] => Some(a)
        case Cast(a: AttributeReference, DoubleType, _, _)
            if a.dataType.isInstanceOf[NumericType] => Some(a)
        case _ => None
      }
    }
    def litNum(e: Expression): Option[Double] = e match {
      case Literal(v: java.lang.Number, _) => Some(v.doubleValue())
      case Literal(d: org.apache.spark.sql.types.Decimal, _) => Some(d.toDouble)
      case _ => None
    }
    // one bucket = key value + DISJOINT half-open [lo, hi) intervals in
    // the source column's MODEL encoding (epoch days for calendar
    // generators over "days" columns, raw values for arithmetic-bin
    // generators over "num" columns — r16); the generator sees the
    // predicate-narrowed realized domain and returns None on a runaway
    // span (bad domain, tiny unit) to bound driver time. `kind` is the
    // model kind the source column must carry.
    final case class Gen(
        attr: AttributeReference,
        kind: String,
        buckets: (Double, Double) => Option[Seq[(Any, Seq[(Double, Double)])]])
    // calendar generators work in LocalDate space and come in TWO kind
    // variants (r16): over a "days" column the model encoding IS epoch
    // days (unitsPerDay = 1); over a "secs" column (events.ts) the same
    // LocalDate bucket boundaries scale by 86 400 — one bucket builder,
    // both granularity encodings. math.floor, not toLong: toLong
    // truncates toward zero, so a negative (pre-1970) fractional domain
    // start would shift into the NEXT day and could silently skip the
    // first bucket.
    def calGen(a: AttributeReference, kind: String, unitsPerDay: Double)(
        f: (LocalDate, LocalDate) => Option[Seq[(Any, Seq[(Double, Double)])]]): Gen =
      Gen(a, kind, (lo, hi) =>
        f(LocalDate.ofEpochDay(math.floor(lo / unitsPerDay).toLong),
          LocalDate.ofEpochDay(math.floor(hi / unitsPerDay).toLong))
          .map(_.map { case (k, ivs) =>
            (k, ivs.map(iv => (iv._1 * unitsPerDay, iv._2 * unitsPerDay)))
          }))
    // both encodings of one day-granular bucket builder; the candidate
    // resolution picks the variant matching the source column's model kind
    def both(a: AttributeReference)(
        f: (LocalDate, LocalDate) => Option[Seq[(Any, Seq[(Double, Double)])]]): Seq[Gen] =
      Seq(calGen(a, "days", 1.0)(f), calGen(a, "secs", 86400.0)(f))
    def linear(a: AttributeReference, floor: LocalDate => LocalDate,
        advance: LocalDate => LocalDate, keyOf: LocalDate => Any): Seq[Gen] =
      both(a) { (lo, hi) =>
        val start = floor(lo)
        val endEx = advance(floor(hi))
        val starts = Iterator.iterate(start)(advance)
          .takeWhile(_.isBefore(endEx)).take(intervalCap + 1).toSeq
        if (starts.length > intervalCap) None
        else Some(starts.map(b =>
          (keyOf(b), Seq((b.toEpochDay.toDouble, advance(b).toEpochDay.toDouble)))))
      }
    // cross-year cyclic keys (month() = 12, quarter() = 4): bucket k is the
    // union of its interval in EVERY domain year — disjoint by construction
    def cyclic(a: AttributeReference, nKeys: Int,
        monthOfKey: Int => Int, spanMonths: Int): Seq[Gen] =
      both(a) { (lo, hi) =>
        val years = lo.getYear to hi.getYear
        if (years.length > 400) None
        else Some((1 to nKeys).map { k =>
          (k: Any, years.map { y =>
            val s = LocalDate.of(y, monthOfKey(k), 1)
            (s.toEpochDay.toDouble, s.plusMonths(spanMonths.toLong).toEpochDay.toDouble)
          })
        })
      }
    // day-of-week keys: each key is one single-day interval per domain
    // week, disjoint by construction (same-dow days are 7 apart); the day
    // cap bounds the per-key interval lists like the daily-series cap does
    def dowGen(a: AttributeReference, keys: Range,
        targetOf: Int => java.time.DayOfWeek): Seq[Gen] =
      both(a) { (lo, hi) =>
        if (hi.toEpochDay - lo.toEpochDay + 1 > 2800) None
        else Some(keys.map { k =>
          val first = Iterator.iterate(lo)(_.plusDays(1)).take(7)
            .find(_.getDayOfWeek == targetOf(k)).get
          (k: Any, Iterator.iterate(first)(_.plusWeeks(1)).takeWhile(!_.isAfter(hi))
            .map(d => (d.toEpochDay.toDouble, d.toEpochDay + 1.0)).toSeq)
        })
      }
    // SUB-DAY truncation over a secs-modeled column (r16 — the tumbling-
    // dashboard class): date_trunc('hour'|'minute', ts) buckets are
    // step-aligned half-open [b·step, (b+1)·step) epoch-second intervals
    // (UTC hour/minute boundaries ARE epoch-step-aligned), keyed by the
    // truncated timestamp. The 400-bucket cap means a multi-week hourly
    // series folds only under a predicate-narrowed span — exactly the
    // dashboard's own "last N days" window.
    def subDay(a: AttributeReference, stepSec: Double): Seq[Gen] =
      Seq(Gen(a, "secs", (lo, hi) => {
        val bLo = math.floor(lo / stepSec).toLong
        val bHi = math.floor(hi / stepSec).toLong
        if (bHi - bLo + 1 > intervalCap) None
        else Some((bLo to bHi).map { b =>
          (java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond((b * stepSec).toLong)): Any,
            Seq((b * stepSec, (b + 1) * stepSec)))
        })
      }))
    // TIME-OF-DAY cyclic keys over a secs-modeled column (r16 late —
    // `GROUP BY hour(ts)` / `minute(ts)`, the daily-cycle dashboard):
    // key k is the union of its step slice in EVERY period of the domain
    // ([p·period + k·step, p·period + (k+1)·step) — UTC hour/minute
    // boundaries ARE epoch-step-aligned), disjoint by construction; the
    // period cap bounds the per-key interval lists like dowGen's day cap
    def cyclicSec(a: AttributeReference, nKeys: Int, stepSec: Double): Seq[Gen] = {
      val period = nKeys * stepSec
      Seq(Gen(a, "secs", (lo, hi) => {
        val pLo = math.floor(lo / period).toLong
        val pHi = math.floor(hi / period).toLong
        if (pHi - pLo + 1 > 400) None
        else Some((0 until nKeys).map { k =>
          ((k: java.lang.Integer): Any, (pLo to pHi).map(p =>
            (p * period + k * stepSec, p * period + (k + 1) * stepSec)))
        })
      }))
    }
    // day-of-month keys 1..31: one single-day interval per domain month
    // that HAS that day (Feb emits no 30/31 interval; a key with no
    // interval anywhere in the domain emits no bucket — the same
    // empty-bucket convention as empty calendar years)
    def domGen(a: AttributeReference): Seq[Gen] =
      both(a) { (lo, hi) =>
        val months = Iterator.iterate(lo.withDayOfMonth(1))(_.plusMonths(1))
          .takeWhile(!_.isAfter(hi)).take(401).toSeq
        if (months.length > 400) None
        else Some((1 to 31).map { k =>
          ((k: java.lang.Integer): Any, months.collect {
            case m if k <= m.lengthOfMonth =>
              val d = m.withDayOfMonth(k)
              (d.toEpochDay.toDouble, d.toEpochDay + 1.0)
          })
        }.filter(_._2.nonEmpty))
      }
    // ---- arithmetic-bin generators over num-modeled columns (r16): the
    // binned-histogram dashboard shape (`GROUP BY floor(x/100)` /
    // `width_bucket(x, lo, hi, n)` / `round(x, -k)`) that serves exactly
    // the near-continuous columns the realized-value fold honestly refuses
    // at its support caps — each bin is ONE half-open range conjunct, no
    // enumeration, per-bin mass straight off the NumericLeaf range
    // probability (reference aqp_spn/aqp_leaves.py::IdentityNumericLeaf).
    // `GROUP BY floor(x / w)`: bucket b covers [b·w, (b+1)·w) — floor is
    // toward −∞, so the preimage is sign-uniform; keys are the LongType
    // values Spark's Floor emits
    def floorBins(a: AttributeReference, w: Double): Gen =
      Gen(a, "num", (lo, hi) => {
        if (!(w > 0) || !java.lang.Double.isFinite(w)) None
        else {
          val bLo = math.floor(lo / w).toLong
          val bHi = math.floor(hi / w).toLong
          if (bHi - bLo + 1 > intervalCap) None
          else Some((bLo to bHi).map(b =>
            ((b: java.lang.Long): Any, Seq((b * w, (b + 1) * w)))))
        }
      })
    // `GROUP BY width_bucket(x, wlo, whi, n)` (ascending bounds): Spark
    // computes floor(n·(x−lo)/(hi−lo))+1 with underflow key 0 and
    // overflow key n+1 — every key is one half-open interval, tails
    // clipped to the realized domain (an absent tail emits no bucket; a
    // bucket past the domain would only estimate zero anyway)
    def widthBins(a: AttributeReference, wlo: Double, whi: Double, n: Long): Gen =
      Gen(a, "num", (lo, hi) => {
        if (!(wlo < whi) || n < 1 || n > intervalCap - 2) None
        else {
          val s = (whi - wlo) / n
          val under =
            if (lo < wlo) Seq(((0L: java.lang.Long): Any, Seq((lo, wlo)))) else Nil
          val over =
            if (hi >= whi) Seq((((n + 1): java.lang.Long): Any, Seq((whi, hi + 1.0)))) else Nil
          val mids = (1L to n).collect {
            case i if wlo + i * s > lo && wlo + (i - 1) * s <= hi =>
              ((i: java.lang.Long): Any, Seq((wlo + (i - 1) * s, wlo + i * s)))
          }
          Some(under ++ mids ++ over)
        }
      })
    // `GROUP BY round(x, -k)` (k ≥ 0, so w = 10^k ≥ 1): HALF_UP rounds
    // AWAY from zero, so the preimage of key m flips inclusivity at the
    // sign change — restricted to NON-NEGATIVE realized domains, where
    // the preimage is uniformly [m − w/2, m + w/2). Keys are doubles;
    // toRows converts to the output's own type (Round returns its input
    // type: double in, double out)
    def roundBins(a: AttributeReference, w: Double): Gen =
      Gen(a, "num", (lo, hi) => {
        if (lo < 0 || !(w > 0)) None
        else {
          val kLo = math.floor((lo + w / 2) / w).toLong
          val kHi = math.floor((hi + w / 2) / w).toLong
          if (kHi - kLo + 1 > intervalCap) None
          else Some((kLo to kHi).map(k =>
            ((k * w: java.lang.Double): Any,
              Seq((math.max(k * w - w / 2, 0.0), k * w + w / 2)))))
        }
      })
    // `GROUP BY window(ts, '1 hour')` — the analyzer's TimeWindowing rule
    // lowers the TUMBLING window fn to a named_struct(start, end) Project
    // alias whose arithmetic floors ts to the slide boundary in
    // MICROSECONDS. Rather than pattern-matching the lowered tree (deeply
    // version-specific), the recognizer VERIFIES the semantics
    // numerically: both struct legs are deterministic scalar functions of
    // the one timestamp attribute, so they evaluate at probe points —
    // slide boundaries, boundary−1µs, interior and negative offsets — and
    // must equal the canonical floor form exactly at every probe. Sliding
    // windows lower to an Expand (never this Project shape) and fall
    // through untouched; any probe mismatch (a future lowering change, a
    // hand-written lookalike struct) falls back. Buckets are step-aligned
    // half-open intervals over the secs-modeled column, keyed by the
    // (start, end) struct itself.
    def tumblingWindow(
        cns: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct): Option[Gen] = {
      import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}
      val names = cns.nameExprs.map {
        case Literal(s, _) => String.valueOf(s)
        case _             => return None
      }
      if (names != Seq("start", "end")) return None
      val (sE, eE) = cns.valExprs match {
        case Seq(s, e) => (s, e)
        case _         => return None
      }
      val a = cns.references.toSeq match {
        case Seq(one: AttributeReference)
            if one.dataType == TimestampType || one.dataType == TimestampNTZType =>
          one
        case _ => return None
      }
      def evalAt(expr: Expression, micros: Long): Option[Long] =
        Try(expr.transform {
          case ar: AttributeReference if ar.exprId == a.exprId =>
            Literal(micros, ar.dataType)
        }.eval(null)).toOption.collect { case l: java.lang.Long => l.longValue }
      for {
        s0 <- evalAt(sE, 0L)
        e0 <- evalAt(eE, 0L)
        slide = e0 - s0
        // whole-second slides only: the model encodes epoch SECONDS, and a
        // fractional-second step would regroup within FP noise
        if slide > 0 && slide % 1000000L == 0
        st = java.lang.Math.floorMod(s0, slide)
        probes = Seq(0L, 1L, slide - 1, slide, slide + 1,
          7L * slide + slide / 2, -1L, -slide - 1, 864123456789L)
        if probes.forall { v =>
          val expS = java.lang.Math.floorDiv(v - st, slide) * slide + st
          evalAt(sE, v).contains(expS) && evalAt(eE, v).contains(expS + slide)
        }
      } yield {
        val stepSec = slide / 1e6
        val stSec = st / 1e6
        def keyTs(m: Long): Any =
          if (a.dataType == TimestampNTZType)
            java.time.LocalDateTime.ofEpochSecond(
              java.lang.Math.floorDiv(m, 1000000L),
              (java.lang.Math.floorMod(m, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
          else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            java.lang.Math.floorDiv(m, 1000000L),
            java.lang.Math.floorMod(m, 1000000L) * 1000L))
        Gen(a, "secs", (lo, hi) => {
          val bLo = math.floor((lo - stSec) / stepSec).toLong
          val bHi = math.floor((hi - stSec) / stepSec).toLong
          if (bHi - bLo + 1 > intervalCap) None
          else Some((bLo to bHi).map { b =>
            val sM = st + b * slide
            (org.apache.spark.sql.Row(keyTs(sM), keyTs(sM + slide)): Any,
              Seq((stSec + b * stepSec, stSec + (b + 1) * stepSec)))
          })
        })
      }
    }
    // alternatives per expression (r16): day-granular calendar builders
    // carry a "days" AND a "secs" variant (one per encoding the source
    // column might model at); sub-day truncations and tumbling windows are
    // secs-only and arithmetic bins num-only. Candidate resolution picks
    // the variant whose kind matches the column's modeled kind.
    def gens(e: Expression): Seq[Gen] = e match {
      // sliding-window surrogate (r16): buckets are every slide-aligned
      // window start whose [s, s+size) span meets the predicate-narrowed
      // domain. Buckets OVERLAP by design (each row belongs to size/slide
      // windows); each is an independent range query, so the shared fold
      // machinery — which never assumes disjoint buckets — stays exact.
      // An edge bucket whose span only touches the domain boundary
      // estimates ~zero mass and folds out through the per-tuple row gate,
      // matching SQL's no-rows-no-group convention.
      case sw: SlidingWindowMark =>
        Seq(Gen(sw.ts, "secs", (lo, hi) => {
          val kLo = math.floor((lo - sw.sizeSec - sw.stSec) / sw.slideSec).toLong + 1
          val kHi = math.floor((hi - sw.stSec) / sw.slideSec).toLong
          if (kHi - kLo + 1 > intervalCap) None
          else Some((kLo to kHi).map { k =>
            val sSec = sw.stSec + k * sw.slideSec
            (org.apache.spark.sql.Row(sw.keyOf(sSec), sw.keyOf(sSec + sw.sizeSec)): Any,
              Seq((sSec, sSec + sw.sizeSec)))
          })
        }))
      case Year(DateAttr(a)) =>
        linear(a, d => LocalDate.of(d.getYear, 1, 1), _.plusYears(1), _.getYear)
      case Month(DateAttr(a))   => cyclic(a, 12, identity, 1)
      case Quarter(DateAttr(a)) => cyclic(a, 4, k => (k - 1) * 3 + 1, 3)
      // dayofweek(): 1 = Sunday .. 7 = Saturday (Spark's convention) — each
      // key is one single-day interval per week of the domain, disjoint by
      // construction (same-dow days are 7 apart); the day cap bounds the
      // per-key interval lists like the daily-series cap does
      case DayOfWeek(DateAttr(a)) =>
        dowGen(a, 1 to 7,
          k => if (k == 1) java.time.DayOfWeek.SUNDAY else java.time.DayOfWeek.of(k - 1))
      // weekday(): 0 = Monday .. 6 = Sunday
      case org.apache.spark.sql.catalyst.expressions.WeekDay(DateAttr(a)) =>
        dowGen(a, 0 to 6, k => java.time.DayOfWeek.of(k + 1))
      // hour-of-day / minute-of-hour over a secs-modeled column (the UTC
      // session gate above makes the epoch-aligned slices exact); a
      // days-modeled column has no "secs" variant and falls back by kind
      case org.apache.spark.sql.catalyst.expressions.Hour(DateAttr(a), _) =>
        cyclicSec(a, 24, 3600.0)
      case org.apache.spark.sql.catalyst.expressions.Minute(DateAttr(a), _) =>
        cyclicSec(a, 60, 60.0)
      case org.apache.spark.sql.catalyst.expressions.DayOfMonth(DateAttr(a)) =>
        domGen(a)
      case TruncTimestamp(Literal(f: org.apache.spark.unsafe.types.UTF8String, _),
          DateAttr(a), _) =>
        val key = (d: LocalDate) =>
          java.sql.Timestamp.from(d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
        f.toString.toLowerCase match {
          case "year" | "yyyy" | "yy" =>
            linear(a, d => LocalDate.of(d.getYear, 1, 1), _.plusYears(1), key)
          case "quarter" =>
            linear(a, d => LocalDate.of(d.getYear, (d.getMonthValue - 1) / 3 * 3 + 1, 1),
              _.plusMonths(3), key)
          case "month" | "mon" | "mm" =>
            linear(a, _.withDayOfMonth(1), _.plusMonths(1), key)
          // ISO week: Spark's date_trunc('week') floors to MONDAY
          case "week" =>
            linear(a, d => d.minusDays(d.getDayOfWeek.getValue - 1L),
              _.plusWeeks(1), key)
          case "day" | "dd" =>
            linear(a, identity, _.plusDays(1), key)
          // sub-day truncation (r16): folds only over a secs-modeled
          // column — the day-granular "days" encoding cannot express an
          // hour boundary, so those keep falling back by kind mismatch
          case "hour"   => subDay(a, 3600.0)
          case "minute" => subDay(a, 60.0)
          case _ => Nil
        }
      // a bare day floor — `GROUP BY cast(ts AS date)` / `to_date(ts)`
      // (the analyzer lowers to_date over a timestamp to this Cast):
      // date_trunc('day')'s daily linear buckets keyed by the DATE itself,
      // under the same 400-bucket/predicate-narrowed-span economics
      case Cast(a: AttributeReference, DateType, _, _) =>
        linear(a, identity, _.plusDays(1), d => java.sql.Date.valueOf(d))
      // `GROUP BY date_format(d, 'yyyy-MM')` — the string-keyed dashboard
      // spelling (r16 late): any format WITHOUT sub-day or zone pattern
      // letters is constant within a day, so DAILY buckets evaluated
      // through the expression's OWN eval (exact Spark semantics — same
      // formatter, same UTC session) and MERGED on equal keys answer
      // every such format — 'yyyy-MM' merges to months, 'EEEE' to seven
      // weekday keys — under the usual 400-day narrowed-span economics.
      // A sub-day/zone letter (quoted or not — quoted text only costs an
      // unnecessary fallback, never a wrong key) falls through.
      case dfm @ org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          DateAttr(a), Literal(fmt: org.apache.spark.unsafe.types.UTF8String, _), _)
          if !"HkKhmsSaAVzOXxZn".exists(ch => fmt.toString.contains(ch)) =>
        def dayLit(d: LocalDate): Literal = a.dataType match {
          case DateType => Literal(d.toEpochDay.toInt, DateType)
          case dt       => Literal(d.toEpochDay * 86400L * 1000000L, dt)
        }
        both(a) { (lo, hi) =>
          val days = Iterator.iterate(lo)(_.plusDays(1))
            .takeWhile(!_.isAfter(hi)).take(intervalCap + 1).toSeq
          // a timestamp column renders in the query's zone: the daily fold
          // is sound only when that zone is day-aligned over the span
          // (offset 0, no transitions — UTC-equivalent). The grouped
          // dispatch already requires a UTC session; this keeps the arm
          // safe standalone (r17 ADVICE). A DATE column's cast→format
          // round trip cancels the zone, so it needs no gate.
          val zOk = a.dataType == DateType || days.isEmpty ||
            graft.rspn.SqlEstimate.zoneStepAligned(
              dfm.timeZoneId.getOrElse("UTC"),
              days.head.toEpochDay * 86400L, (days.last.toEpochDay + 1) * 86400L, 86400L)
          if (days.length > intervalCap || !zOk) None
          else {
            val keyed = days.map { d =>
              scala.util.Try(dfm.transform {
                case ar: AttributeReference if ar.exprId == a.exprId => dayLit(d)
              }.eval(null)).toOption.collect {
                case s: org.apache.spark.unsafe.types.UTF8String =>
                  (s.toString: Any,
                    Seq((d.toEpochDay.toDouble, d.toEpochDay + 1.0)))
              }
            }
            if (keyed.exists(_.isEmpty)) None
            else Some(keyed.flatten.groupBy(_._1).map { case (k, grp) =>
              (k, grp.flatMap(_._2).sortBy(_._1))
            }.toSeq)
          }
        }
      // SUB-DAY `date_format(ts, 'yyyy-MM-dd HH')` over a SECS-modeled
      // column (r17; seconds r19): a format whose finest sub-day letter
      // is hour (H/k/K/h — 'a' am/pm rides along, constant within the
      // hour), minute (m) or second (s) is constant within its step, so
      // step-aligned epoch-second buckets evaluated through the
      // expression's OWN eval and merged on equal keys answer it exactly
      // like the daily merge above — the hourly string-key dashboard
      // spelling. A 1-second step folds exactly when the
      // predicate-narrowed span fits the interval cap (≲33 minutes at
      // 2000) — the same cap check every granularity passes below.
      // Fraction/zone letters still fall back (sub-second regroups within
      // the model's second encoding; zone renders need a zone the fold
      // does not model).
      case dfm @ org.apache.spark.sql.catalyst.expressions.DateFormatClass(
          DateAttr(a), Literal(fmt: org.apache.spark.unsafe.types.UTF8String, _), _)
          if a.dataType != DateType &&
            "HkKhms".exists(ch => fmt.toString.contains(ch)) &&
            !"SVzOXxZn".exists(ch => fmt.toString.contains(ch)) =>
        val step =
          if (fmt.toString.contains('s')) 1L
          else if (fmt.toString.contains('m')) 60L else 3600L
        Seq(Gen(a, "secs", (lo, hi) => {
          val bLo = math.floor(lo / step).toLong
          val bHi = math.floor(hi / step).toLong
          // the query's zone must hold one fixed, step-aligned offset over
          // the span or an epoch-aligned bucket's key flips mid-bucket
          // (r17 ADVICE: +05:30 vs an hour step); redundant under the
          // grouped dispatch's UTC-session gate, enforced here so the arm
          // stays safe standalone
          val zOk = graft.rspn.SqlEstimate.zoneStepAligned(
            dfm.timeZoneId.getOrElse("UTC"), bLo * step, (bHi + 1) * step, step)
          if (bHi - bLo + 1 > intervalCap || !zOk) None
          else {
            val keyed = (bLo to bHi).map { b =>
              scala.util.Try(dfm.transform {
                case ar: AttributeReference if ar.exprId == a.exprId =>
                  Literal(b * step * 1000000L, a.dataType)
              }.eval(null)).toOption.collect {
                case s: org.apache.spark.unsafe.types.UTF8String =>
                  (s.toString: Any,
                    Seq(((b * step).toDouble, ((b + 1) * step).toDouble)))
              }
            }
            if (keyed.exists(_.isEmpty)) None
            else Some(keyed.flatten.groupBy(_._1).map { case (k, grp) =>
              (k, grp.flatMap(_._2).sortBy(_._1))
            }.toSeq)
          }
        }))
      // tumbling `window(ts, '...')` struct (r16, secs-only) — verified
      // numerically by tumblingWindow above
      case cns: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
        tumblingWindow(cns).toSeq
      // ---- arithmetic bins over num-modeled columns (r16) ----
      case Floor(Divide(NumAttr(a), den, _)) => litNum(den).map(floorBins(a, _)).toSeq
      case Floor(NumAttr(a))                 => Seq(floorBins(a, 1.0))
      case WidthBucket(NumAttr(a), lo, hi, n) =>
        (for { l <- litNum(lo); h <- litNum(hi); k <- litNum(n) }
          yield widthBins(a, l, h, k.toLong)).toSeq
      // Round's scale must be a non-positive literal (w = 10^(−s) ≥ 1);
      // fractional-bin rounding (s > 0) regroups within FP noise of the
      // realized values — fall back rather than misbucket
      case r: Round =>
        (r.child, r.scale) match {
          case (NumAttr(a), Literal(s: Int, IntegerType)) if s <= 0 && s >= -15 =>
            Seq(roundBins(a, math.pow(10.0, -s.toDouble)))
          case _ => Nil
        }
      // a deterministic scalar expression OVER one foldable bucket
      // expression (r16 late): `floor(x/w)*w` (the bin-lo spelling),
      // `floor(x/w)*w + w/2` (bin centers), `cast(year(d) AS string)`,
      // `concat('h', hour(ts))` — locate the MAXIMAL strict
      // subexpressions the recognizer folds; exactly one distinct such
      // subexpression may appear (every occurrence substitutes) and the
      // outer tree may reference no other input. Each bucket key then
      // evaluates through the outer tree driver-side, and EQUAL evaluated
      // keys MERGE their buckets (SQL groups by the computed value — a
      // non-injective outer, `floor(x/w) >= 2` or a saturating cast, must
      // not emit duplicate key rows). An eval failure on any key (ANSI
      // overflow — the exact plane would throw there too) falls back.
      case outer if outer.deterministic && outer.children.nonEmpty =>
        def maximal(x: Expression): Seq[Expression] =
          if (gens(x).nonEmpty) Seq(x) else x.children.flatMap(maximal)
        val subs = outer.children.flatMap(maximal)
        if (subs.isEmpty || subs.map(_.canonicalized).distinct.length != 1) Nil
        else {
          val sub = subs.head
          // overlapping-bucket generators (SlidingWindowMark) are excluded
          // STRUCTURALLY: the equal-key MERGE below concatenates the inner
          // buckets' interval lists and requires them disjoint (r16 ADVICE
          // — previously unreachable only because the marker matched first)
          val overlapping = sub.exists(_.isInstanceOf[SlidingWindowMark])
          if (overlapping || !outer.references.subsetOf(sub.references)) Nil
          else gens(sub).map { g =>
            Gen(g.attr, g.kind, (lo, hi) => g.buckets(lo, hi).flatMap { bs =>
              val conv = CatalystTypeConverters.createToScalaConverter(outer.dataType)
              val keyed = bs.map { case (k, ivs) =>
                val subst = outer.transform {
                  case x if x.canonicalized == sub.canonicalized =>
                    Literal.create(k, sub.dataType)
                }
                Try(conv(subst.eval(null))).toOption.map(v => (v, ivs))
              }
              if (keyed.exists(_.isEmpty)) None
              else Some(keyed.flatten.groupBy(_._1).map { case (k, grp) =>
                (k, grp.flatMap(_._2).sortBy(_._1))
              }.toSeq)
            })
          }
        }
      case _ => Nil
    }
    // intersection of two SORTED DISJOINT half-open interval lists (the
    // RangeUnion convention) — the meet of a linear year bucket and a
    // cyclic month bucket is that year's month slice; empty means the key
    // pair is structurally impossible (no row can satisfy both)
    def intersectIvs(a: Seq[(Double, Double)], b: Seq[(Double, Double)])
        : Seq[(Double, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      val (av, bv) = (a.toIndexedSeq, b.toIndexedSeq)
      var i = 0; var j = 0
      while (i < av.length && j < bv.length) {
        val lo = math.max(av(i)._1, bv(j)._1)
        val hi = math.min(av(i)._2, bv(j)._2)
        if (lo < hi) out += ((lo, hi))
        if (av(i)._2 <= bv(j)._2) i += 1 else j += 1
      }
      out.toSeq
    }
    def D[T](label: String)(o: Option[T]): Option[T] = {
      if (sys.env.contains("GRAFT_AQP_DEBUG") && o.isEmpty)
        System.err.println(s"[aqpdbg] $label -> None")
      o
    }
    val spec = DatasetSpec.forDir(session, sfDir)
    // the analyzer extracts the grouping expression into a child-Project
    // alias (`_groupingexpression`) and groups by the resulting attribute;
    // dimension grouping columns ride along as bare attributes
    (agg.groupingExpressions, agg.child) match {
      case (gs, Project(pl, inner))
          if gs.nonEmpty && gs.forall(_.isInstanceOf[AttributeReference]) &&
            session.sessionState.conf.sessionLocalTimeZone == "UTC" =>
        val gAttrs = gs.map(_.asInstanceOf[AttributeReference])
        // each candidate keeps its ALTERNATIVE generators (kind variants);
        // resolution against the source column's modeled kind happens
        // after the walk, where attrTable is known
        val calCandidates = gAttrs.flatMap { a =>
          pl.collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
            .map(gens).filter(_.nonEmpty).map(a -> _)
        }
        calCandidates match {
          // up to THREE calendar expressions composed as a bucket cross
          // product — the seasonal-matrix shape (`GROUP BY year(d),
          // month(d)[, quarter(d)]`): each key tuple's predicate is the
          // per-column MEET of the candidates' interval sets (same date
          // column) conjoined across distinct columns. The meets prune
          // the raw cube long before the 400-tuple cap (year × quarter ×
          // month survives as ~84 tuples — each month meets exactly its
          // own quarter); genuinely fine triples (× dayofweek) still cap.
          case cals if cals.nonEmpty && cals.length <= 3 =>
            val calIds = cals.map(_._1.exprId)
            val dimAttrs = gAttrs.filterNot(a => calIds.contains(a.exprId))
            // the remaining projection must be walkable (pure attrs/
            // renames); re-add the bare date attributes the aliases
            // consumed, so the scan leaf's attrTable resolves them
            val rest = pl.filter {
              case al: Alias => !calIds.contains(al.exprId)
              case _         => true
            }
            val walkable = cals.map(_._2.head.attr).foldLeft(rest) { (acc, ga) =>
              if (acc.exists(_.exprId == ga.exprId)) acc else acc :+ ga
            }
            for {
              sh <- D("walk")(walk(Project(walkable, inner), spec.modeled, spec.graph.relationships,
                keyColsOf(spec)))
              // cross-column disjunctions RIDE the fold since r15: each
              // bucket's range-conjoined atoms distribute into every OR
              // branch through the shape dispatch (bucketTupleRows), so the
              // walk's own ≤3-disjunction accuracy cap is the only OR guard
              _ <- D("pend")(if (sh.pendingKeyNotNull.isEmpty) Some(()) else None)
              // resolve each candidate's generator VARIANT against the
              // source column's modeled kind — "days"/"secs" for calendar
              // expressions (sub-day truncations are secs-only), "num" for
              // arithmetic bins; no matching variant → the whole rewrite
              // falls back (possibly the SAME column for two candidates)
              resolved <- D("tcs"){
                val r: Seq[Option[(Gen, (String, String))]] = cals.map { case (_, alts) =>
                  for {
                    tc <- sh.attrTable.get(alts.head.attr.exprId)
                    kind <- spec.modeled(tc._1)
                      .collectFirst { case (c2, k) if c2 == tc._2 => k }
                    g <- alts.find(_.kind == kind)
                  } yield (g, tc)
                }
                if (r.forall(_.isDefined)) Some(r.flatten) else None
              }
              tcs = resolved.map(_._2)
              // every OTHER grouping column is either a dictionary-modeled
              // string (per-bucket enumeration) or a num-modeled numeric —
              // the latter EXPANDS the bucket tuples by its realized-value
              // support (r15), the same kind-dispatch the reference's
              // group_by_combination.py applies over model scopes
              dimsSplit <- D("dims"){
                val ds: Seq[Option[Either[(AttributeReference, (String, String)), (String, String)]]] =
                  dimAttrs.map { a =>
                    if (a.dataType == StringType)
                      sh.attrTable.get(a.exprId).filter { case (dt, dc) =>
                        spec.modeled(dt).exists(x => x._1 == dc && x._2 == "cat")
                      }.map(Right(_))
                    else if (a.dataType.isInstanceOf[NumericType])
                      sh.attrTable.get(a.exprId).filter { case (dt, dc) =>
                        spec.modeled(dt).exists(x => x._1 == dc && x._2 == "num")
                      }.map(tc => Left(a -> tc))
                    else None
                  }
                if (ds.forall(_.isDefined)) Some(ds.flatten) else None
              }
              numDims = dimsSplit.collect { case Left(x) => x }
              dims = dimsSplit.collect { case Right(tc) => tc }
              catDimAttrs = dimAttrs.zip(dimsSplit).collect { case (a, Right(_)) => a }
              // a key output is EXACTLY a bare calendar/numeric grouping
              // attribute (possibly re-aliased), or — for struct-keyed
              // tumbling windows (r16) — a FIELD of it (`window.start`,
              // which the optimizer collapses into the Aggregate as a
              // GetStructField over the key); any OTHER expression over a
              // key (`year(d)+1`) is neither a key nor an aggregate the
              // recognizer knows, so it must fail the whole rewrite rather
              // than silently emit the raw key
              keyIds = calIds ++ numDims.map(_._1.exprId)
              keyIdxOf = (ne: NamedExpression) => {
                def idx(id: ExprId): Option[(Int, Any => Any)] =
                  keyIds.indexOf(id) match {
                    case -1 => None
                    case i  => Some((i, identity[Any] _))
                  }
                ne match {
                  case a: AttributeReference           => idx(a.exprId)
                  case Alias(a: AttributeReference, _) => idx(a.exprId)
                  case Alias(org.apache.spark.sql.catalyst.expressions
                      .GetStructField(a: AttributeReference, ord, _), _) =>
                    idx(a.exprId).map { case (i, _) =>
                      (i, (v: Any) => v.asInstanceOf[org.apache.spark.sql.Row].get(ord))
                    }
                  case _ => None
                }
              }
              _ <- D("keyguard")(if (agg.aggregateExpressions.forall(ne =>
                keyIdxOf(ne).isDefined ||
                  ne.references.forall(r => !keyIds.contains(r.exprId)))) Some(()) else None)
              // classify the NON-key outputs through the shared recognizer;
              // dictionary dimension attrs resolve as GroupOut via dimIdx
              others = agg.aggregateExpressions.filter(keyIdxOf(_).isEmpty)
              dimIdx = catDimAttrs.map(_.exprId).zipWithIndex.toMap
              aggCols <- D("aggCols")(outputCols(
                agg.copy(aggregateExpressions = others), sh, spec.modeled, dimIdx))
              spns = Ensemble.get(session, sfDir)
              // SQL groups NULL dates (and NULL numeric dims) into a NULL
              // key row these value-pinned buckets cannot produce — fold
              // only when every calendar AND numeric-dim column's null
              // mass estimates below one row. Evaluated on the column's
              // OWN table (under that table's atoms): an FK join can only
              // replicate base-table rows, so zero base nulls imply zero
              // join nulls, and the single-model difference is free of the
              // cross-model selection noise a joint-estimate difference
              // would carry. (Under a disjunction the base atoms are a
              // WEAKER predicate than base ∧ OR, so the gate can only
              // over-estimate null mass — the conservative direction.)
              _ <- {
                val masses = (tcs ++ numDims.map(_._2)).distinct.map { case (t, c) =>
                  val tAtoms = Map(t -> sh.atoms.getOrElse(t, Seq.empty))
                  // both counts under the table's SINGLE model: RDC-aware
                  // selection would otherwise pick DIFFERENT models for the
                  // two predicate sets (the NotNull widens the key set) and
                  // their cross-model noise would masquerade as null mass
                  val single = spns.get(t).map(m => Map(t -> m)).getOrElse(spns)
                  for {
                    pAll <- SpnCardinality.predsFor(single, Set(t), tAtoms, spec.modeled)
                    pNN <- SpnCardinality.predsFor(
                      single, Set(t), withNotNull(tAtoms, Seq((t, c))), spec.modeled)
                  } yield Ensemble.estCount(single, Set(t), pAll).value -
                    Ensemble.estCount(single, Set(t), pNN).value
                }
                D("nullmass")(if (masses.forall(_.exists(_ < 0.5))) Some(()) else None)
              }
              // per-candidate buckets over the model's realized domain,
              // narrowed by the query's OWN predicate on that date column
              // (its compiled range's hull): a daily series over
              // `WHERE d < DATE'...'` must bucket the asked-for span, not
              // the table's whole history — the difference between folding
              // under the 400-bucket cap and falling back
              perCal <- {
                val bs = resolved.map { case (g, (t, c)) =>
                  Ensemble.colDomain(spns, t, c).flatMap { dom0 =>
                    val hull = SpnCardinality
                      .predsFor(spns, sh.tables, sh.atoms, spec.modeled)
                      .flatMap(_.get((t, c)))
                      .flatMap {
                        case graft.rspn.NumRange(lo, hi, _, _) => Some((lo, hi))
                        case graft.rspn.MultiRange(is) => Some((is.head.lo, is.last.hi))
                        case graft.rspn.NominalSet(cs) if cs.nonEmpty => Some((cs.min, cs.max))
                        case _ => None
                      }
                    val dom = hull.fold(dom0) { case (lo, hi) =>
                      (math.max(dom0._1, lo), math.min(dom0._2, hi))
                    }
                    // generators receive the model-encoded domain directly
                    // (calGen converts to LocalDate space for the calendar
                    // family; arithmetic-bin generators consume raw values)
                    if (dom._1 > dom._2) Some(Seq.empty[(Any, Seq[(Double, Double)])])
                    else g.buckets(dom._1, dom._2)
                  }
                }
                D("perCal")(if (bs.forall(_.isDefined)) Some(bs.flatten) else None)
              }
              // bucket tuples: one key per calendar attr + that tuple's
              // atoms — the PER-COLUMN MEET of every candidate's interval
              // set (same-column pairs/triples meet to their common slice;
              // an empty meet is a structurally impossible tuple, emitted
              // as no row — SQL's behavior exactly), one RangeUnion atom
              // per distinct column. Generic over 1..3 candidates (r15).
              tuples <- {
                val capHere =
                  if (tcs.length == 1 && dims.isEmpty && numDims.isEmpty) intervalCap
                  else tupleCap
                var acc: Seq[(Seq[Any], Map[(String, String), Seq[(Double, Double)]])] =
                  Seq((Seq.empty[Any], Map.empty))
                var live = true
                perCal.zip(tcs).foreach { case (buckets, tc) =>
                  if (live) {
                    acc = for {
                      (ks, m) <- acc
                      (k, ivs) <- buckets
                      met <- m.get(tc) match {
                        case None => Seq(ivs)
                        case Some(prev) =>
                          val x = intersectIvs(prev, ivs)
                          if (x.isEmpty) Nil else Seq(x)
                      }
                    } yield (ks :+ k, m.updated(tc, met))
                    // calendar buckets cover the domain, so a later
                    // candidate only EXTENDS surviving tuples — a past-cap
                    // intermediate never shrinks back under it; stop early
                    // instead of materializing the cube
                    if (acc.length > capHere) live = false
                  }
                }
                // the accuracy/latency cap governs the CROSS PRODUCT too
                // (surviving tuples, not the raw product — year × month
                // over a 30-year domain folds at 360); a PURE-INTERVAL fold
                // (one bucket column, zero dimensions) probes one range per
                // bucket and carries the higher interval cap (r17)
                D("cap")(if (!live || acc.length > capHere) None
                else Some(acc.map { case (ks, m) =>
                  (ks, m.toSeq.map { case ((t, c), ivs) =>
                    t -> (SpnCardinality.RangeUnion(c, ivs): Atom)
                  })
                }))
              }
              // numeric dimension columns expand the bucket tuples by the
              // column's realized-value support under the BASE predicates
              // (a superset of any bucket's own support — phantom
              // (bucket, value) pairs fold out through the per-tuple row
              // gate), one point-pinned conjunct per value, under the same
              // 400-tuple economics as the calendar cross product
              tuplesNum <- D("numdims")(numDims.foldLeft(Option(tuples)) {
                case (acc, (_, (t, c))) =>
                  for {
                    ts <- acc
                    p <- SpnCardinality.predsFor(spns, sh.tables, sh.atoms, spec.modeled)
                    support <- Ensemble.numericSupport(spns, sh.tables, (t, c), p, cap = 400)
                    expanded = for { (ks, as) <- ts; v <- support }
                      yield (ks :+ (v: Any), as :+ (t -> (SpnCardinality.Cmp(c, "eq", v): Atom)))
                    if expanded.length <= 400
                  } yield expanded
              })
              rows <- D("rows")(bucketTupleRows(
                spns, spec, sh, tuplesNum, dims, aggCols,
                agg.aggregateExpressions, keyIdxOf))
            } yield {
              val keyNames = keyIds.indices.map(i =>
                agg.aggregateExpressions.find(ne => keyIdxOf(ne).exists(_._1 == i))
                  .map(_.name).getOrElse(s"_key$i"))
              annotateCalendar(sh, tuplesNum, dims, keyNames ++ catDimAttrs.map(_.name),
                aggCols.zip(others.map(_.name)))
              LocalRelation(agg.output, toRows(rows, agg.output.map(_.dataType)))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Fold `GROUP BY window(ts, size, slide)` — the SLIDING-window
    * dashboard shape (r16). The analyzer's TimeWindowing rule lowers a
    * sliding window to an Expand emitting ceil(size/slide) candidate
    * window structs per row (one per overlap), plus — when size is not a
    * multiple of slide — a containment Filter (`ts >= window.start AND
    * ts < window.end`) dropping phantom candidates. Rather than
    * pattern-matching the lowered arithmetic (deeply version-specific),
    * the recognizer VERIFIES the semantics numerically, exactly like the
    * tumbling recognizer: every projection's struct legs are
    * deterministic scalar functions of the one timestamp attribute, so
    * they evaluate at probe points, and the containment-filtered
    * candidate set must equal the canonical set {(s, s+size) :
    * s ≡ st (mod slide), s ≤ t < s+size} at every probe. On success the
    * plan re-expresses as `Aggregate → Project(Alias(SlidingWindowMark))`
    * over the Expand's child and folds through [[rewriteCalendar]]'s
    * pipeline — dimension columns, ORs, null gates and annotation ride
    * along unchanged. Any mismatch (an extra filter conjunct, a
    * non-whole-second slide, a future lowering change) returns None and
    * the query runs exact.
    */
  private def rewriteSliding(
      agg: Aggregate,
      cond: Option[Expression],
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, GetStructField, GreaterThanOrEqual, IsNotNull}
    import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}
    val n = ex.projections.length
    if (n < 2) return None
    val width = ex.output.length
    if (ex.projections.exists(_.length != width)) return None
    // exactly ONE slot varies across projections — the window struct;
    // every other slot must be the Expand output attribute itself passed
    // through unchanged (the TimeWindowing lowering's shape)
    val varying = (0 until width).filter { j =>
      ex.projections.map(_(j).canonicalized).distinct.length > 1
    }
    val w = varying match {
      case Seq(one) => one
      case _        => return None
    }
    if ((0 until width).exists(j => j != w &&
        !ex.projections.forall(_(j) == ex.output(j)))) return None
    val wAttr = ex.output(w)
    val structType = wAttr.dataType match {
      case st: StructType if st.length == 2 &&
          st.fieldNames.sameElements(Array("start", "end")) => st
      case _ => return None
    }
    // the one timestamp attribute every candidate struct computes from
    val tsAttr = ex.projections.flatMap(_(w).references).distinct match {
      case Seq(one: AttributeReference)
          if (one.dataType == TimestampType || one.dataType == TimestampNTZType) &&
            ex.child.outputSet.contains(one) => one
      case _ => return None
    }
    def legsOf(e: Expression): Option[(Expression, Expression)] = e match {
      case Alias(c, _) => legsOf(c)
      case cns: CreateNamedStruct =>
        val names = cns.nameExprs.map {
          case Literal(s, _) => String.valueOf(s)
          case _             => return None
        }
        if (names == Seq("start", "end")) Some((cns.valExprs(0), cns.valExprs(1)))
        else None
      case _ => None
    }
    val legs = ex.projections.map(p => legsOf(p(w)).getOrElse(return None))
    def evalAt(expr: Expression, micros: Long): Option[Long] =
      Try(expr.transform {
        case ar: AttributeReference if ar.exprId == tsAttr.exprId =>
          Literal(micros, ar.dataType)
      }.eval(null)).toOption.collect { case l: java.lang.Long => l.longValue }
    def pairsAt(micros: Long): Option[Seq[(Long, Long)]] = {
      val ps = legs.map { case (sE, eE) =>
        for { s <- evalAt(sE, micros); e <- evalAt(eE, micros) } yield (s, e)
      }
      if (ps.forall(_.isDefined)) Some(ps.flatten) else None
    }
    // the interposed Filter may carry ONLY the lowering's own conjuncts:
    // isnotnull over the window attr (or its fields) and the two
    // containment comparisons; anything else — a user predicate the
    // optimizer parked here — bails the rewrite rather than being guessed
    def isWField(e: Expression, ord: Int): Boolean = e match {
      case GetStructField(a: AttributeReference, o, _) =>
        a.exprId == wAttr.exprId && o == ord
      case _ => false
    }
    def isTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == tsAttr.exprId
      case _                     => false
    }
    var geStart = false
    var ltEnd = false
    cond.toSeq.flatMap(splitConj).foreach {
      case IsNotNull(a: AttributeReference) if a.exprId == wAttr.exprId =>
      case IsNotNull(f) if isWField(f, 0) || isWField(f, 1)             =>
      case GreaterThanOrEqual(t, f) if isTs(t) && isWField(f, 0) => geStart = true
      case LessThan(t, f) if isTs(t) && isWField(f, 1)           => ltEnd = true
      case _ => return None
    }
    val containment = geStart && ltEnd
    if (geStart != ltEnd) return None // half a containment filter: not the lowering
    // derive (slide, size, st) at one probe, then VERIFY at many
    val t0 = 864123456789L
    val pairs0 = pairsAt(t0).getOrElse(return None)
    val sizes = pairs0.map(p => p._2 - p._1).distinct
    val size = sizes match {
      case Seq(one) if one > 0 && one % 1000000L == 0 => one
      case _ => return None
    }
    val starts0 = pairs0.map(_._1).sorted
    val gaps = starts0.sliding(2).map(p => p(1) - p(0)).toSeq.distinct
    val slide = gaps match {
      case Seq(one) if one > 0 && one % 1000000L == 0 => one
      case _ => return None
    }
    // n candidates must be exactly the overlap count: (n-1)·slide < size
    if ((n - 1) * slide >= size || n.toLong * slide < size) return None
    val st = java.lang.Math.floorMod(starts0.head, slide)
    if (st % 1000000L != 0) return None
    val probes = Seq(0L, 1L, slide - 1, slide, slide + 1, size - 1, size,
      size + 1, size + slide - 1, 7L * slide + slide / 2, -1L, -slide - 1,
      -size - 1, t0, t0 + slide / 3)
    val ok = probes.forall { t =>
      pairsAt(t).exists { raw =>
        val valid = if (containment) raw.filter(p => p._1 <= t && t < p._2) else raw
        val kMax = java.lang.Math.floorDiv(t - st, slide)
        val kMin = java.lang.Math.floorDiv(t - size - st, slide) + 1
        val canonical = (kMin to kMax).map(k => (st + k * slide, st + k * slide + size))
        valid.toSet == canonical.toSet && valid.length == canonical.length
      }
    }
    if (!ok) return None
    val keyOf: Double => Any =
      if (tsAttr.dataType == TimestampNTZType)
        (s: Double) => java.time.LocalDateTime.ofEpochSecond(
          math.round(s), 0, java.time.ZoneOffset.UTC)
      else
        (s: Double) => java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(math.round(s)))
    val mark = SlidingWindowMark(
      tsAttr, slide / 1e6, size / 1e6, st / 1e6, keyOf, structType)
    // the surrogate: pass-through slots keep their child exprIds, so the
    // aggregate's own references resolve; the window key re-binds to the
    // marker alias under ITS exprId
    val pl = Alias(mark, wAttr.name)(exprId = wAttr.exprId) +: ex.child.output
    rewriteCalendar(agg.copy(child = Project(pl, ex.child)))
  }

  /** Assemble fold rows for a sequence of BUCKET TUPLES (keys + extra
    * atoms conjoining the base predicates): scalar buckets gate on >= half
    * a row, mixed buckets take the dictionary enumeration's own nonzero
    * row universe (groups of an empty bucket enumerate empty). Shared by
    * the calendar fold and the numeric-histogram fold; any uncompilable
    * bucket makes the whole rewrite fall back — never guess one. Each
    * bucket estimates through the SHAPE DISPATCH (r15), so whatever OR
    * structure the Shape carries — one disjunction via inclusion-
    * exclusion, two or three via the signed expansion — composes with the
    * bucket's conjoined atoms exactly like FILTER-clause atoms do: the
    * bucket rides the base of every branch/term.
    */
  private def bucketTupleRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      tuples: Seq[(Seq[Any], Seq[(String, Atom)])],
      dims: Seq[(String, String)], aggCols: Seq[OutCol],
      aggExprs: Seq[NamedExpression],
      keyIdxOf: NamedExpression => Option[(Int, Any => Any)]): Option[Seq[Seq[Any]]] = {
    val perBucket: Seq[Option[Seq[Seq[Any]]]] = tuples.map { case (ks, extra) =>
      val shB = sh.copy(atoms = mergeAtoms(sh.atoms, extra))
      val bucketRows: Option[Seq[(Seq[String], Map[Int, Any])]] =
        if (dims.isEmpty)
          for {
            n <- shapeCount(spns, spec, shB)
            m <- scalarVals(spns, spec, shB, aggCols)
          } yield {
            if (n >= 0.5) Seq(Seq.empty[String] -> m)
            else Nil
          }
        else groupRows(spns, spec, shB, dims, aggCols)
      bucketRows.map(_.map { case (dk, m) =>
        var j = -1
        aggExprs.map { ne =>
          keyIdxOf(ne) match {
            case Some((ki, f)) => f(ks(ki))
            case None =>
              j += 1
              aggCols(j) match {
                case GroupOut(gi) => dk(gi): Any
                case _            => m(j)
              }
          }
        }
      })
    }
    if (perBucket.exists(_.isEmpty)) None
    else Some(perBucket.flatMap(_.get))
  }

  /** Numeric-column grouping — the histogram dashboard shape the
    * dictionary path cannot serve (`GROUP BY l_quantity[, numcol...,
    * dimcol...]`): one bucket per REALIZED value of each modeled numeric
    * grouping column with mass under the base predicates (the NumericLeaf
    * support enumeration), each bucket tuple one point-pinned estimation —
    * the numeric mirror of the dictionary enumeration. Several numeric
    * keys cross their supports (r15) under ONE shared 400-tuple cap (a
    * near-continuous column's sampled support is neither cheap nor a
    * faithful group universe → fall back). Dictionary dimension columns
    * ride along per bucket exactly like the calendar fold's. SQL's
    * numeric-NULL group is unproducible from value pins, so an estimated
    * null mass of one row or more falls back. Disjunctive predicates
    * compose through the bucket dispatch (r15): each value pin conjoins
    * the base of every OR branch/signed term, exactly like the flat
    * grouped fold's FILTER-clause atoms. Reference analog:
    * aqp_spn/group_by_combination.py enumerates combinations off the leaf
    * value sets the same way for its grouped AQP.
    */
  private def rewriteNumericGroup(agg: Aggregate): Option[LogicalPlan] = {
    val spec = DatasetSpec.forDir(session, sfDir)
    val gs = agg.groupingExpressions
    if (gs.isEmpty || !gs.forall(_.isInstanceOf[AttributeReference])) return None
    val gAttrs = gs.map(_.asInstanceOf[AttributeReference])
    for {
      sh <- walk(agg.child, spec.modeled, spec.graph.relationships, keyColsOf(spec))
      if sh.pendingKeyNotNull.isEmpty
      // at least one num-modeled numeric grouping attribute; the rest must
      // be num-modeled numerics or dictionary-modeled strings
      split <- {
        val ds: Seq[Option[Either[(AttributeReference, (String, String)), (AttributeReference, (String, String))]]] =
          gAttrs.map { a =>
            if (a.dataType.isInstanceOf[NumericType])
              sh.attrTable.get(a.exprId).filter { case (t, c) =>
                spec.modeled(t).exists(x => x._1 == c && x._2 == "num")
              }.map(tc => Left(a -> tc))
            else if (a.dataType == StringType)
              sh.attrTable.get(a.exprId).filter { case (t, c) =>
                spec.modeled(t).exists(x => x._1 == c && x._2 == "cat")
              }.map(tc => Right(a -> tc))
            else None
          }
        if (ds.forall(_.isDefined)) Some(ds.flatten) else None
      }
      numKeys = split.collect { case Left(x) => x }
      if numKeys.nonEmpty
      catDims = split.collect { case Right(x) => x }
      dims = catDims.map(_._2)
      // a key output is EXACTLY a bare numeric grouping attribute
      // (possibly re-aliased); an aggregate over a grouped column itself
      // (`sum(q) ... GROUP BY q`) falls back rather than guess
      keyIds = numKeys.map(_._1.exprId)
      keyIdxOf = (ne: NamedExpression) => ne match {
        case a: AttributeReference           => keyIds.indexOf(a.exprId) match { case -1 => None; case i => Some((i, identity[Any] _)) }
        case Alias(a: AttributeReference, _) => keyIds.indexOf(a.exprId) match { case -1 => None; case i => Some((i, identity[Any] _)) }
        case _                               => None
      }
      if agg.aggregateExpressions.forall(ne =>
        keyIdxOf(ne).isDefined || ne.references.forall(r => !keyIds.contains(r.exprId)))
      others = agg.aggregateExpressions.filter(keyIdxOf(_).isEmpty)
      dimIdx = catDims.map(_._1.exprId).zipWithIndex.toMap
      aggCols <- outputCols(
        agg.copy(aggregateExpressions = others), sh, spec.modeled, dimIdx)
      spns = Ensemble.get(session, sfDir)
      // SQL's NULL group gate per numeric key column, under the column's
      // own single-table model (see the calendar fold's comment on
      // cross-model selection noise; base atoms alone can only
      // OVER-estimate the null mass under a disjunction — conservative)
      _ <- {
        val ok = numKeys.map(_._2).distinct.forall { case (t, c) =>
          val tAtoms = Map(t -> sh.atoms.getOrElse(t, Seq.empty))
          val single = spns.get(t).map(m => Map(t -> m)).getOrElse(spns)
          (for {
            pAll <- SpnCardinality.predsFor(single, Set(t), tAtoms, spec.modeled)
            pNN <- SpnCardinality.predsFor(
              single, Set(t), withNotNull(tAtoms, Seq((t, c))), spec.modeled)
          } yield Ensemble.estCount(single, Set(t), pAll).value -
            Ensemble.estCount(single, Set(t), pNN).value < 0.5).getOrElse(false)
        }
        if (ok) Some(()) else None
      }
      basePreds <- SpnCardinality.predsFor(spns, sh.tables, sh.atoms, spec.modeled)
      tuples <- numKeys.foldLeft(
        Option(Seq((Seq.empty[Any], Seq.empty[(String, Atom)])))) {
        case (acc, (_, (t, c))) =>
          for {
            ts <- acc
            support <- Ensemble.numericSupport(spns, sh.tables, (t, c), basePreds, cap = 400)
            expanded = for { (ks, as) <- ts; v <- support }
              yield (ks :+ (v: Any), as :+ (t -> (SpnCardinality.Cmp(c, "eq", v): Atom)))
            if expanded.length <= 400
          } yield expanded
      }
      rows <- bucketTupleRows(spns, spec, sh, tuples, dims, aggCols,
        agg.aggregateExpressions, keyIdxOf)
    } yield {
      // per-bucket estimation through the shape dispatch — the calendar
      // fold's annotation channel serves the histogram shape unchanged
      val keyNames = keyIds.indices.map(i =>
        agg.aggregateExpressions.find(ne => keyIdxOf(ne).exists(_._1 == i))
          .map(_.name).getOrElse(numKeys(i)._2._2))
      annotateCalendar(sh, tuples, dims, keyNames ++ catDims.map(_._1.name),
        aggCols.zip(others.map(_.name)))
      LocalRelation(agg.output, toRows(rows, agg.output.map(_.dataType)))
    }
  }

  /** GROUP BY ROLLUP / CUBE / GROUPING SETS: the analyzer lowers these to
    * Aggregate(groupAttrs :+ spark_grouping_id, aggs, Expand(projections))
    * where each Expand projection replays the child with one grouping
    * set's columns kept and the rest nulled, plus the set's grouping-id
    * bitmask. The model plane already answers grouping sets
    * (`estGroupingSets` / the spn_rollup / spn_cube TVFs); this recognizer
    * folds the EXPAND form the optimizer actually produces, one
    * plain-grouped estimation per set, with SQL's null convention for the
    * grouped-out columns. Outputs over the grouping id (raw grouping_id(),
    * a GROUPING(c) bit test, HAVING over either) fold too: the id is a
    * per-SET literal already sitting in each Expand projection's last
    * slot, so the output expression folds by substituting it in ([[GidOut]]).
    * Reference anchor: aqp_spn/group_by_combination.py (the reference
    * enumerates per-set combinations the same way for its grouped AQP).
    */
  private def rewriteSets(
      agg: Aggregate,
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand,
      setFilter: Option[Expression]): Option[LogicalPlan] = {
    val spec = DatasetSpec.forDir(session, sfDir)
    val gidIdx = ex.output.indexWhere(_.name == "spark_grouping_id")
    if (gidIdx < 0) return None
    val gidId = ex.output(gidIdx).exprId
    if (setFilter.exists(!_.deterministic)) return None
    for {
      sh <- walk(ex.child, spec.modeled, spec.graph.relationships, keyColsOf(spec))
      if sh.pendingKeyNotNull.isEmpty
      slots <- classifySlots(ex, gidIdx, sh, spec.modeled)
      (groupAttrs, groupSrc, numPos) = slots
      allSets <- groupingSetsOf(ex, gidIdx, groupAttrs.map(_.exprId))
      // SQL's NULL-key gate for num-modeled grouping columns: their
      // per-set keys are value pins (the histogram fold's), which cannot
      // produce the data-NULL key row — and that row would collide with
      // the grouping-set NULL marker. Evaluated on each column's own
      // single-table model (see the calendar fold's comment).
      _ <- {
        val spnsG = Ensemble.get(session, sfDir)
        val ok = numPos.toSeq.map(groupSrc).distinct.forall { case (t, c) =>
          val tAtoms = Map(t -> sh.atoms.getOrElse(t, Seq.empty))
          val single = spnsG.get(t).map(m => Map(t -> m)).getOrElse(spnsG)
          (for {
            pAll <- SpnCardinality.predsFor(single, Set(t), tAtoms, spec.modeled)
            pNN <- SpnCardinality.predsFor(
              single, Set(t), withNotNull(tAtoms, Seq((t, c))), spec.modeled)
          } yield Ensemble.estCount(single, Set(t), pAll).value -
            Ensemble.estCount(single, Set(t), pNN).value < 0.5).getOrElse(false)
        }
        if (ok) Some(()) else None
      }
      // the interposed Filter's conjuncts classify per SET: gid-only
      // conditions (HAVING GROUPING()/grouping_id()) evaluate by literal
      // substitution and keep or drop whole sets; an understood atom over
      // ONE grouping attribute (HAVING a = 'x') joins the estimation
      // predicates of every set grouping by that attribute, and DROPS any
      // set that nulls it (the conjunct evaluates over the nulled slot —
      // SQL filters every row of that projection out). Anything else bails
      // the whole rewrite — never guess which sets or rows survive.
      sets <- setFilter match {
        case None =>
          Some(allSets.map { case (s, g) => (s, g, Seq.empty[(String, Atom)]) })
        case Some(cond) => filterSets(cond, allSets, gidId, groupAttrs, groupSrc)
      }
      groupIdx = groupAttrs.map(_.exprId).zipWithIndex.toMap
      // the Aggregate must group by EXACTLY the Expand's grouping attrs
      // plus the grouping id — a subset (or a missing gid) would collapse
      // distinct per-set rows into one group and disagree with the real
      // aggregate's row set, so the check is set equality, not forall
      aggGroupIds <- {
        val ids = agg.groupingExpressions.map {
          case a: AttributeReference => Some(a.exprId)
          case _                     => None
        }
        if (ids.forall(_.isDefined)) Some(ids.flatten.toSet) else None
      }
      if aggGroupIds == groupIdx.keySet + gidId
      cols <- outputCols(agg, sh, spec.modeled, groupIdx, Some(gidId))
      rows <- estimateSets(sh, groupSrc, numPos, sets, gidId, cols,
        agg.output.map(_.dataType))
    } yield {
      annotateSets(sh, groupAttrs, groupSrc, numPos, sets,
        cols.zip(agg.aggregateExpressions.map(_.name)))
      LocalRelation(agg.output, rows)
    }
  }

  /** Per-set verdicts for a Filter interposed between the Aggregate and
    * the Expand (see [[rewriteSets]]): None when any conjunct is outside
    * the {gid-only expression, single-grouping-attr atom} class; otherwise
    * the surviving sets, each with the atoms (retargeted onto the source
    * table/column) that apply to its estimation.
    */
  private def filterSets(
      cond: Expression,
      allSets: Seq[(Seq[Int], Expression)],
      gidId: ExprId,
      groupAttrs: Seq[AttributeReference],
      groupSrc: Seq[(String, String)])
      : Option[Seq[(Seq[Int], Expression, Seq[(String, Atom)])]] = {
    val posOf = groupAttrs.map(_.exprId).zipWithIndex.toMap
    val classified: Seq[Option[Either[Expression, (Int, (String, Atom))]]] =
      splitConj(cond).map { cj =>
        val refs = cj.references.toSeq
        if (refs.forall(_.exprId == gidId)) Some(Left(cj))
        else refs match {
          case Seq(one: AttributeReference) if posOf.contains(one.exprId) =>
            atomsOf(Seq(cj)).flatMap(_.headOption).map { a =>
              val pos = posOf(one.exprId)
              Right((pos, (groupSrc(pos)._1, retarget(a, groupSrc(pos)._2))))
            }
          case _ => None
        }
      }
    if (classified.exists(_.isEmpty)) return None
    val (gidConds, attrConds) = classified.flatten.partitionMap(identity)
    val perSet: Seq[Option[Option[(Seq[Int], Expression, Seq[(String, Atom)])]]] =
      allSets.map { case (set, gidLit) =>
        val gidOk = gidConds.map { c =>
          val folded = c.transform {
            case a: AttributeReference if a.exprId == gidId => gidLit
          }
          // a condition that does not fold to a literal boolean bails the
          // whole rewrite; null (UNKNOWN) drops the set like SQL drops rows
          if (folded.foldable) Option(folded.eval(null) == true) else None
        }
        if (gidOk.exists(_.isEmpty)) None
        else if (gidOk.exists(_.contains(false))) Some(None)
        else if (!attrConds.forall { case (pos, _) => set.contains(pos) }) Some(None)
        else Some(Some((set, gidLit, attrConds.map(_._2))))
      }
    if (perSet.exists(_.isEmpty)) None else Some(perSet.flatten.flatten)
  }

  /** Rebind an understood atom onto the grouping attribute's SOURCE column
    * (the Expand output attr may carry a different name than the scan
    * column the estimator knows).
    */
  private def retarget(a: Atom, c: String): Atom = a match {
    case x: SpnCardinality.Cmp        => x.copy(column = c)
    case x: SpnCardinality.InSet      => x.copy(column = c)
    case x: SpnCardinality.NotNull    => x.copy(column = c)
    case x: SpnCardinality.StrMatch   => x.copy(column = c)
    case x: SpnCardinality.Complement => x.copy(inner = retarget(x.inner, c))
    case x: SpnCardinality.AnyOf      =>
      x.copy(column = c, alts = x.alts.map(_.map(retarget(_, c))))
    case x: SpnCardinality.RangeUnion => x.copy(column = c)
  }

  /** Split the Expand's output slots (grouping id excluded) into
    * passthrough child attributes (aggregate inputs — every projection
    * must carry the attr itself) and grouping slots (attr-or-null across
    * projections, all non-null occurrences one child attr that must be a
    * dictionary-modeled string OR a num-modeled numeric column — r15 kind
    * dispatch: numeric grouping columns answer per set through
    * realized-value pins, exactly like the histogram fold). Returns the
    * grouping attributes in output order with their source (table,
    * column) and the positions of the NUMERIC ones.
    */
  private def classifySlots(
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand,
      gidIdx: Int, sh: Shape,
      modeled: Map[String, Seq[(String, String)]])
      : Option[(Seq[AttributeReference], Seq[(String, String)], Set[Int])] = {
    val classified = ex.output.zipWithIndex.collect {
      case (out: AttributeReference, i) if i != gidIdx =>
        val slotVals = ex.projections.map(_(i))
        if (sh.attrTable.contains(out.exprId)) {
          // passthrough: the child attr rides through every projection
          if (slotVals.forall {
            case a: AttributeReference => a.exprId == out.exprId
            case _                     => false
          }) Some(None) else None
        } else {
          val srcs = slotVals.collect { case a: AttributeReference => a }
          val nullsOk = slotVals.forall {
            case _: AttributeReference => true
            case Literal(null, _)      => true
            case _                     => false
          }
          for {
            src <- srcs.headOption
            if nullsOk && srcs.forall(_.exprId == src.exprId)
            tc <- sh.attrTable.get(src.exprId)
            kind <- if (out.dataType == StringType &&
                modeled(tc._1).exists(c => c._1 == tc._2 && c._2 == "cat"))
              Some(false)
            else if (out.dataType.isInstanceOf[NumericType] &&
                modeled(tc._1).exists(c => c._1 == tc._2 && c._2 == "num"))
              Some(true)
            else None
          } yield Some((out, tc, kind))
        }
      case (_, i) if i != gidIdx => None
    }
    if (classified.exists(_.isEmpty)) None
    else {
      val groups = classified.flatten.flatten
      Some((groups.map(_._1), groups.map(_._2),
        groups.zipWithIndex.collect { case ((_, _, true), pos) => pos }.toSet))
    }
  }

  /** One grouping set per Expand projection: the grouping attrs whose slot
    * carries the attribute (rather than the null literal), as positions
    * into the grouping-attr list, paired with the projection's grouping-id
    * LITERAL (the bitmask Spark computed — reused verbatim so the fold can
    * never disagree with the engine's own encoding). Duplicate sets are
    * kept — SQL GROUPING SETS ((a),(a)) emits the rows twice.
    */
  private def groupingSetsOf(
      ex: org.apache.spark.sql.catalyst.plans.logical.Expand,
      gidIdx: Int, groupIds: Seq[ExprId]): Option[Seq[(Seq[Int], Expression)]] = {
    val posOf = groupIds.zipWithIndex.toMap
    val outIdxOf = ex.output.zipWithIndex.collect {
      case (a: AttributeReference, i) if posOf.contains(a.exprId) => a.exprId -> i
    }.toMap
    if (outIdxOf.size != groupIds.length) None
    else {
      val sets = ex.projections.map { pr =>
        val set = groupIds.zipWithIndex.collect {
          case (eid, pos) if pr(outIdxOf(eid)).isInstanceOf[AttributeReference] => pos
        }
        pr(gidIdx) match {
          case lit: Literal => Some((set, lit: Expression))
          case _            => None
        }
      }
      if (sets.forall(_.isDefined)) Some(sets.flatten) else None
    }
  }

  /** Fold every grouping set through the plain estimators: the empty set
    * is the global aggregate (one row, all group slots null — SQL's
    * convention), a non-empty set a grouped estimation over its columns
    * with the absent columns nulled. [[GidOut]] outputs fold by
    * substituting the set's grouping-id literal into the expression and
    * evaluating it driver-side (a per-set constant). A set may carry
    * extra atoms (a pushed-down HAVING over one of its grouping attrs) —
    * merged into that set's estimation only.
    */
  private def estimateSets(
      sh: Shape, groupSrc: Seq[(String, String)], numPos: Set[Int],
      sets: Seq[(Seq[Int], Expression, Seq[(String, Atom)])], gidId: ExprId,
      cols: Seq[OutCol], outTypes: Seq[DataType]): Option[Seq[InternalRow]] = {
    val spns = Ensemble.get(session, sfDir)
    val spec = DatasetSpec.forDir(session, sfDir)
    val rowsPerSet: Seq[Option[Seq[Seq[Any]]]] = sets.map { case (set, gidLit, extra) =>
      val shSet = if (extra.isEmpty) sh else sh.copy(atoms = mergeAtoms(sh.atoms, extra))
      val gidVals: Map[Int, Option[Any]] = cols.zipWithIndex.collect {
        case (GidOut(e), i) =>
          val folded = e.transform {
            case a: AttributeReference if a.exprId == gidId => gidLit
          }
          i -> (if (folded.foldable) Option(folded.eval(null)) else None)
      }.toMap
      if (gidVals.values.exists(_.isEmpty)) None
      else {
        val gv = gidVals.map { case (i, v) => i -> v.get }
        val numInSet = set.filter(numPos)
        if (set.isEmpty)
          scalarVals(spns, spec, shSet, cols)
            .map(m => Seq(cols.indices.map(i => gv.getOrElse(i, m(i))): Seq[Any]))
        else if (numInSet.nonEmpty)
          setNumericRows(spns, spec, shSet, set, numInSet, groupSrc, cols, gv)
        else groupRows(spns, spec, shSet, set.map(groupSrc), cols).map { rows =>
          rows.sortBy(_._1.mkString(" ")).map { case (k, m) =>
            val kv = set.zip(k).toMap // grouping-attr position → key value
            cols.zipWithIndex.map {
              case (GroupOut(gi), _) => kv.getOrElse(gi, null): Any
              case (GidOut(_), i)    => gv(i)
              case (_, i)            => m(i)
            }
          }
        }
      }
    }
    if (rowsPerSet.exists(_.isEmpty)) None
    else Some(toRows(rowsPerSet.flatMap(_.get), outTypes))
  }

  /** Per-set rows when the set contains num-modeled grouping columns
    * (r15): the histogram fold's tuple expansion per SET — each numeric
    * column's realized-value support under the set's conjoined atoms
    * expands to point-pinned tuples (several numeric columns cross, the
    * shared 400-tuple cap governs), the set's dictionary columns
    * enumerate per tuple, and the assembly places numeric keys at their
    * grouping positions with grouped-out columns staying the SQL NULL
    * marker. Every estimation routes through the shape dispatch, so OR
    * structures compose exactly as in the flat folds.
    */
  private def setNumericRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec,
      shSet: Shape, set: Seq[Int], numInSet: Seq[Int],
      groupSrc: Seq[(String, String)], cols: Seq[OutCol],
      gv: Map[Int, Any]): Option[Seq[Seq[Any]]] = {
    val catInSet = set.filterNot(numInSet.contains)
    for {
      basePreds <- SpnCardinality.predsFor(spns, shSet.tables, shSet.atoms, spec.modeled)
      tuples <- numInSet.foldLeft(
        Option(Seq((Seq.empty[(Int, Any)], Seq.empty[(String, Atom)])))) {
        case (acc, pos) =>
          val (t, c) = groupSrc(pos)
          for {
            ts <- acc
            support <- Ensemble.numericSupport(spns, shSet.tables, (t, c), basePreds, cap = 400)
            expanded = for { (ks, as) <- ts; v <- support }
              yield (ks :+ (pos -> (v: Any)),
                as :+ (t -> (SpnCardinality.Cmp(c, "eq", v): Atom)))
            if expanded.length <= 400
          } yield expanded
      }
      perTuple = tuples.map { case (ks, extra) =>
        val shB = shSet.copy(atoms = mergeAtoms(shSet.atoms, extra))
        val kvNum = ks.toMap
        val rowsT: Option[Seq[(Seq[String], Map[Int, Any])]] =
          if (catInSet.isEmpty)
            for {
              n <- shapeCount(spns, spec, shB)
              m <- scalarVals(spns, spec, shB, cols)
            } yield if (n >= 0.5) Seq(Seq.empty[String] -> m) else Nil
          else groupRows(spns, spec, shB, catInSet.map(groupSrc), cols)
        rowsT.map(_.map { case (k, m) =>
          val kvCat = catInSet.zip(k).toMap
          cols.zipWithIndex.map {
            case (GroupOut(gi), _) =>
              kvNum.getOrElse(gi, kvCat.getOrElse(gi, null)): Any
            case (GidOut(_), i) => gv(i)
            case (_, i)         => m(i)
          }
        })
      }
      _ <- if (perTuple.exists(_.isEmpty)) None else Some(())
    } yield perTuple.flatMap(_.get)
  }

  // ---- shape recognition ----

  /** `a = 'x' OR a = 'y' [OR ...]` — a same-column disjunction of point
    * predicates — is exactly `a IN ('x','y',...)` (NULL is unknown under
    * both spellings), so fold it to an In: it then compiles as ONE InSet
    * atom instead of spending an OR slot, and it is admissible inside
    * FILTER clauses, whose atom lists are conjunctive. Mixed-column or
    * non-point disjunctions are left for the OR machinery.
    */
  /** CNF pre-simplification (r17): regroup a flat disjunct list BY COLUMN —
    * OR is commutative/associative under Kleene three-valued logic, so
    * `(a<5 OR b='x' OR a>40)` regroups to `((a<5 OR a>40) OR b='x')`, whose
    * same-column branch then compiles as ONE AnyOf/InSet atom inside the
    * 2-branch OR machinery instead of failing as a nested multi-column Or —
    * keeping more real WHERE clauses under the ≤3-disjunction cap. Applies
    * only when every disjunct references exactly one attribute and exactly
    * TWO distinct attributes appear (the branch pair the slot machinery
    * expresses; one column is absorbed whole by atomsOf already, three-plus
    * columns in one disjunction stay inexpressible); anything else returns
    * the expression unchanged.
    */
  /** Column-group the disjuncts of a multi-column OR (OR is associative
    * and commutative) so each column's sub-disjunction compiles as ONE
    * single-column branch — (a<5 ∨ a>10 ∨ b=1) charges two branches, not
    * three. r19 generalizes the r17 exactly-two-column form to ANY column
    * count with at least one repeat — parity with the text parser's
    * partial same-column absorption; all-distinct-column disjunctions
    * regroup to themselves (no repeat, nothing to merge).
    */
  private def regroupOr(e: Expression): Expression = e match {
    case o: Or =>
      def disjuncts(x: Expression): Seq[Expression] = x match {
        case Or(l, r) => disjuncts(l) ++ disjuncts(r)
        case other    => Seq(other)
      }
      val ds = disjuncts(o)
      val refs = ds.map(_.references.toSeq)
      if (ds.length < 3 || !refs.forall(_.length == 1)) o
      else {
        val keys = refs.map(_.head.exprId)
        val order = keys.distinct
        if (order.length < 2 || order.length == ds.length) o
        else order.map(k =>
          ds.zip(keys).collect { case (d, kk) if kk == k => d }
            .reduceLeft[Expression](Or(_, _)))
          .reduceLeft[Expression](Or(_, _))
      }
    case other => other
  }

  private def eqOrToIn(e: Expression): Expression = {
    def disjuncts(x: Expression): Seq[Expression] = x match {
      case Or(l, r) => disjuncts(l) ++ disjuncts(r)
      case other    => Seq(other)
    }
    e match {
      case o: Or =>
        val eqs = disjuncts(o).map {
          case EqualTo(a: AttributeReference, l: Literal) if l.value != null => Some((a, l))
          case EqualTo(l: Literal, a: AttributeReference) if l.value != null => Some((a, l))
          case _ => None
        }
        eqs.flatten match {
          case all if all.length == eqs.length && all.map(_._1.exprId).distinct.sizeIs == 1 =>
            // distinct: a repeated literal must not enter the In twice
            // (the InSet-to-NominalSet compile dedupes codes too)
            org.apache.spark.sql.catalyst.expressions.In(all.head._1, all.map(_._2).distinct)
          case _ => o
        }
      case other => other
    }
  }

  private def walk(
      p: LogicalPlan,
      modeled: Map[String, Seq[(String, String)]],
      rels: Seq[Relationship],
      keyCols: Map[String, Set[String]]): Option[Shape] = p match {
    // single-table leaf: a Project/Filter chain over a GENUINE parquet
    // relation, or over a cached modeled scan. Deliberately NOT
    // SpnCardinality.ScanShape: its cached-InMemoryRelation branch discards
    // any filter baked into the cached plan — conservative for a broadcast
    // DECISION, silently wrong for an ANSWER (a cached filtered view would
    // fold to the full-table estimate). StrictScan instead RETURNS the
    // cached plan's baked filter conjuncts (r14: a cached FILTERED view —
    // `lineitem.filter(...).cache()` — folds by conjoining the baked atoms
    // into the estimation predicates, exactly like an uncached Filter);
    // any baked conjunct outside the understood-atom class, a computed
    // column or a join still falls back to exact through the same atomsOf
    // gate every uncached filter passes.
    case StrictScan(dir, t, conjuncts0)
        if dirMatches(dir) && modeled.contains(t) =>
      // an Or conjunct atomsOf UNDERSTANDS (single-column — point sets,
      // multi-interval range unions; numeric != arrives as Complement, not
      // here) compiles as a PLAIN atom and never costs a disjunction slot;
      // only genuinely multi-column disjunctions ride orBranches
      val conjuncts = conjuncts0.map(e => eqOrToIn(regroupOr(e)))
      val (ors, plain) = conjuncts.partition(e =>
        e.isInstanceOf[Or] && atomsOf(Seq(e)).isEmpty)
      for {
        atoms0 <- atomsOf(plain)
        // isnotnull on an UNMODELED declared key parks as pending — only a
        // join on that column may discharge it; on a MODELED column it
        // stays an ordinary answerable atom
        (pend, atoms) = atoms0.partition(a =>
          a.isInstanceOf[SpnCardinality.NotNull] &&
            !modeled(t).exists(_._1 == a.column) &&
            keyCols.getOrElse(t, Set.empty).contains(a.column))
        if atoms.forall(a => modeled(t).exists(_._1 == a.column))
        obs <- {
          val sides = ors.map { case o: Or => orSides(o, a => Some((t, a.name)), modeled) }
          // the product-form expansion's accuracy cap: Π(2^k−1) ≤ 27
          // signed terms (four independent 2-branch ORs = 81 compound the
          // per-term error too far), counted after superset-group
          // absorption (r19)
          val absorbed = absorbSupersetGroups(sides.flatten)
          if (sides.forall(_.isDefined) && orTermProduct(absorbed) <= 27)
            Some(absorbed)
          else None
        }
      } yield Shape(Set(t), if (atoms.isEmpty) Map.empty else Map(t -> atoms),
        p.output.map(a => a.exprId -> ((t, a.name))).toMap, obs,
        pendingKeyNotNull = pend.map(a => (t, a.column)).toSet)
    // a Project may RENAME (alias a bare attribute — derived tables and
    // views do constantly); the new exprId inherits the source's (table,
    // scan column) so everything above resolves to the modeled column
    case Project(pl, c) if pl.forall {
      case _: AttributeReference           => true
      case Alias(_: AttributeReference, _) => true
      case _                               => false
    } =>
      walk(c, modeled, rels, keyCols).map { sh =>
        val renames = pl.collect {
          case al @ Alias(a: AttributeReference, _) =>
            sh.attrTable.get(a.exprId).map(al.exprId -> _)
        }.flatten
        sh.copy(attrTable = sh.attrTable ++ renames)
      }
    // residual filter above a join: each conjunct must be an understood
    // atom over exactly one table's column (retargeted onto the SOURCE
    // scan column — the filter may reference a renamed attribute)
    case Filter(cond, c) =>
      walk(c, modeled, rels, keyCols).flatMap { sh =>
        def tableOfAttr(a: AttributeReference): Option[(String, String)] =
          sh.attrTable.get(a.exprId)
        // same policy as the leaf: an understood single-column Or is a
        // plain atom (perConj resolves it through the rename layer — its
        // reference set is exactly one attribute), multi-column Ors ride
        // the slot machinery
        val (ors, plain) = splitConj(cond).map(e => eqOrToIn(regroupOr(e)))
          .partition(e => e.isInstanceOf[Or] && atomsOf(Seq(e)).isEmpty)
        val perConj = plain.map { cj =>
          for {
            as <- atomsOf(Seq(cj))
            a <- as.headOption
            ref <- cj.references.toSeq match {
              case Seq(one: AttributeReference) => Some(one)
              case _                            => None
            }
            tc <- tableOfAttr(ref)
            if modeled(tc._1).exists(_._1 == tc._2)
          } yield (tc._1, retarget(a, tc._2))
        }
        for {
          _ <- if (perConj.forall(_.isDefined)) Some(()) else None
          obs <- {
            val sides = ors.map { case o: Or => orSides(o, a => tableOfAttr(a), modeled) }
            // superset-group absorption across the whole subtree, then the
            // signed-term-product cap (r19)
            val all = absorbSupersetGroups(sh.orBranches ++ sides.flatten)
            if (sides.forall(_.isDefined) && orTermProduct(all) <= 27) Some(all) else None
          }
        } yield sh.copy(atoms = mergeAtoms(sh.atoms, perConj.flatten), orBranches = obs)
      }
    case Join(l, r, Inner, Some(cond), _) =>
      for {
        a <- walk(l, modeled, rels, keyCols)
        b <- walk(r, modeled, rels, keyCols)
        // a self-join would merge both sides' atoms under one table name
        if (a.tables & b.tables).isEmpty
        at = a.attrTable ++ b.attrTable
        // every conjunct must be an equi-pair on a DECLARED FK edge: the
        // estimator's join semantics come from the schema graph, so an
        // undeclared key pair would be silently estimated as the FK join —
        // a wrong ANSWER, not just a bad plan
        if splitConj(cond).forall {
          case EqualTo(x: AttributeReference, y: AttributeReference) =>
            (at.get(x.exprId), at.get(y.exprId)) match {
              case (Some((tx, cx)), Some((ty, cy))) => declaredEdge(rels, tx, cx, ty, cy)
              case _                                => false
            }
          case _ => false
        }
        obs <- {
          val all = absorbSupersetGroups(a.orBranches ++ b.orBranches)
          if (orTermProduct(all) <= 27) Some(all) else None
        }
        // this join's equi columns imply their own non-nullness
        discharged = splitConj(cond).flatMap {
          case EqualTo(x: AttributeReference, y: AttributeReference) =>
            Seq(at.get(x.exprId), at.get(y.exprId)).flatten
          case _ => Nil
        }.toSet
      } yield Shape(a.tables ++ b.tables,
        mergeAtoms(a.atoms, b.atoms.toSeq.flatMap { case (t, as) => as.map(t -> _) }), at, obs,
        pendingKeyNotNull = (a.pendingKeyNotNull ++ b.pendingKeyNotNull) -- discharged)
    case _ => None
  }

  /** Project/Filter chain down to a genuine parquet [[LogicalRelation]], or
    * to an [[org.apache.spark.sql.execution.columnar.InMemoryRelation]]
    * whose cached plan is a (possibly FILTERED) scan of one table (see the
    * leaf case's comment): the cached physical plan must be the scan plus
    * pure execution wrappers (codegen, columnar→row), attribute-only
    * projections, and FilterExecs — whose conjuncts are RETURNED like an
    * uncached Filter's, to be vetted by the same understood-atom gate.
    * Anything else — a ProjectExec with computed columns, a join, an
    * aggregate — means the cache holds a DERIVED dataset the model was
    * not trained on, so the match fails and the query runs exact.
    */
  private object StrictScan {
    import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec, FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation

    def unapply(p: LogicalPlan): Option[(String, String, Seq[Expression])] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => unapply(c)
      case Filter(cond, c) =>
        unapply(c).map { case (d, t, cs) => (d, t, cs ++ splitConj(cond)) }
      case rel: LogicalRelation =>
        SpnCardinality.tableOf(rel).map { case (d, t) => (d, t, Seq.empty) }
      case imr: InMemoryRelation => cachedScan(imr.cacheBuilder.cachedPlan)
      case _ => None
    }

    private def cachedScan(plan: SparkPlan): Option[(String, String, Seq[Expression])] = plan match {
      // under spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
      // the cached physical plan's root is an AdaptiveSparkPlanExec (a
      // LEAF node — a plain collect would never see the scan inside).
      // Its inputPlan is the deterministic pre-adaptive physical plan;
      // recurse on that — AQE only re-plans exchanges at runtime, it
      // cannot add a filter or a computed column, so scan-ness of the
      // input plan is scan-ness of whatever AQE executes.
      case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        cachedScan(aqe.inputPlan)
      case _ => cachedNodes(plan)
    }

    private def cachedNodes(plan: SparkPlan): Option[(String, String, Seq[Expression])] = {
      // walk the wrapper/filter/projection chain down to the scan,
      // collecting baked filter conjuncts; any computed column or
      // non-scan leaf rejects the whole cache
      def walk(p: SparkPlan): Option[(String, String, Seq[Expression])] = p match {
        // the scan's pushed data/partition filters either DUPLICATE a
        // FilterExec condition above (parquet pushdown keeps the exact
        // filter) or — when fully pushed — ARE the baked predicate, so
        // both join the conjunct list; duplicate atoms conjoin
        // idempotently (a range meets itself), and any conjunct outside
        // the understood class fails the leaf's atomsOf gate
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.headOption.map { path =>
            (Option(path.getParent).map(_.toUri.getPath).getOrElse(""),
              path.getName.stripSuffix(".parquet"),
              (f.dataFilters ++ f.partitionFilters): Seq[Expression])
          }
        // a cache built OVER another cached dataset (filter a cached bare
        // table, cache again): recurse into the inner cached plan and add
        // this scan's pushed predicates
        case imts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          cachedScan(imts.relation.cacheBuilder.cachedPlan)
            .map { case (d, t, cs) => (d, t, cs ++ imts.predicates) }
        case w: WholeStageCodegenExec => walk(w.child)
        case i: InputAdapter          => walk(i.child)
        case c: ColumnarToRowExec     => walk(c.child)
        case fe: FilterExec =>
          walk(fe.child).map { case (d, t, cs) => (d, t, cs ++ splitConj(fe.condition)) }
        case pr: ProjectExec if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
          walk(pr.child)
        case _ => None
      }
      walk(plan)
    }
  }

  private def declaredEdge(
      rels: Seq[Relationship],
      ta: String, ca: String, tb: String, cb: String): Boolean =
    rels.exists(r =>
      (r.many == ta && r.fk == ca && r.one == tb && r.pk == cb) ||
        (r.many == tb && r.fk == cb && r.one == ta && r.pk == ca))

  private def mergeAtoms(
      base: Map[String, Seq[Atom]],
      extra: Seq[(String, Atom)]): Map[String, Seq[Atom]] =
    extra.foldLeft(base) { case (m, (t, a)) =>
      m.updated(t, m.getOrElse(t, Seq.empty) :+ a)
    }

  /** An n-branch disjunction where each branch is a conjunction of
    * understood atoms over modeled columns; None on any miss (a nested
    * multi-column OR inside a branch shows up as a failed atomsOf on the
    * branch). The top-level Or tree flattens to its full branch list
    * (r18 — branches beyond two are legal; the collection sites bound the
    * total signed-term product).
    */
  private def orSides(
      o: Or,
      tableOfAttr: AttributeReference => Option[(String, String)],
      modeled: Map[String, Seq[(String, String)]])
      : Option[Seq[Map[String, Seq[Atom]]]] = {
    // flatten only GENUINELY multi-column Or nodes: a single-column Or
    // subtree atomsOf understands whole (regroupOr column-groups the
    // disjunct list first) stays ONE branch compiled as an AnyOf range
    // union — (a<5 ∨ a>10 ∨ b=1) charges two branches, not three (r19;
    // the r18 full flatten silently undid the r17 regrouping and paid
    // 2^k−1 terms for branches a single atom could carry)
    def disjuncts(x: Expression): Seq[Expression] = x match {
      case o2: Or if atomsOf(Seq(o2)).isEmpty => disjuncts(o2.left) ++ disjuncts(o2.right)
      case other                              => Seq(other)
    }
    def side(e: Expression): Option[Map[String, Seq[Atom]]] = {
      val per = splitConj(e).map { cj =>
        for {
          as <- atomsOf(Seq(cj))
          a <- as.headOption
          ref <- cj.references.toSeq match {
            case Seq(one: AttributeReference) => Some(one)
            case _                            => None
          }
          tc <- tableOfAttr(ref)
          if modeled(tc._1).exists(_._1 == tc._2)
        } yield (tc._1, retarget(a, tc._2))
      }
      if (per.forall(_.isDefined)) Some(mergeAtoms(Map.empty, per.flatten))
      else None
    }
    val sides = disjuncts(o).map(side)
    if (!sides.forall(_.isDefined)) None
    else {
      // within-group branch subsumption ((A∧B) ∨ A ≡ A, r19): a branch
      // implying another adds nothing to the union — drop it (equal
      // branches keep the first; signedAtomTerms dedupes again anyway)
      val flat = sides.flatten
      val keys = flat.map(branchKey)
      Some(flat.indices.filterNot(i =>
        keys.indices.exists(j => j != i &&
          branchImplies(keys(i), keys(j)) && (keys(i) != keys(j) || j < i)))
        .map(flat))
    }
  }

  private def dirMatches(dir: String): Boolean =
    new org.apache.hadoop.fs.Path(sfDir).toUri.getPath ==
      new org.apache.hadoop.fs.Path(dir).toUri.getPath

  // ---- aggregate-list recognition ----

  /** Grouping columns, each a dictionary-modeled ("cat") STRING column —
    * the only kind the group enumeration can materialize values for.
    */
  private def groupCols(
      agg: Aggregate, sh: Shape,
      modeled: Map[String, Seq[(String, String)]])
      : Option[Seq[(AttributeReference, (String, String))]] = {
    val gs = agg.groupingExpressions.map {
      case a: AttributeReference if a.dataType == StringType =>
        sh.attrTable.get(a.exprId)
          .filter { case (t, c) => modeled(t).exists(x => x._1 == c && x._2 == "cat") }
          .map(tc => (a, tc))
      case _ => None
    }
    if (gs.forall(_.isDefined)) Some(gs.flatten) else None
  }

  import SpnAqpRule.utf8Extreme

  private sealed trait OutCol
  private case class GroupOut(idx: Int) extends OutCol
  /** A constant literal output (`SELECT 'lo' AS bucket, count(*) ...` —
    * the tagged-UNION-ALL idiom): the value rides along unchanged, scalar
    * and per group, already converted to its Scala form for [[toRows]].
    */
  private case class ConstOut(value: Any) extends OutCol
  private case class CountOut() extends OutCol
  /** COUNT(col): a count gated on the column's non-nullness. */
  private case class CountColOut(col: (String, String)) extends OutCol
  /** COUNT(DISTINCT col) on a DICTIONARY (cat) column: the categorical
    * dictionary is the column's complete domain, so the nonzero-mass group
    * enumeration under the predicates IS the distinct set — the SQL-text
    * plane's convention (SqlEstimate CountDistinct) in the Catalyst rule.
    * Under disjunctions the support sets UNION exactly (enumeration is a
    * set, not an additive measure — the signed expansion must not touch it).
    */
  private case class CountDistinctOut(col: (String, String)) extends OutCol
  /** MIN/MAX on a DICTIONARY (cat) column: the nonzero-mass support
    * enumeration under the predicates is the column's surviving value set
    * (exactly [[CountDistinctOut]]'s machinery), and MIN/MAX is its
    * lexicographic extreme — the same ordering Spark applies to StringType.
    * Under disjunctions the supports UNION exactly (a set, never the
    * signed expansion); an empty support folds to SQL's NULL. Numeric
    * MIN/MAX stays unanswerable — the model's histogram bins bound the
    * range but not the realized extreme.
    */
  private case class MinMaxCatOut(col: (String, String), isMin: Boolean) extends OutCol
  /** MIN/MAX on a modeled NUMERIC ("num") or DATE ("days") column: the
    * NumericLeaf mirror of [[MinMaxCatOut]] — leaves carry the SORTED
    * realized values of the training slice (reference
    * IdentityNumericLeaf.unique_vals), so the extreme under a predicate is
    * the first/last in-range realized value with mass
    * ([[Ensemble.numericExtreme]], early-exit probes). Exact on the
    * realized domain like the dictionary path; an unprobed tail (probe cap)
    * falls back rather than guessing. Under disjunctions the per-branch
    * extremes combine by min/max — exact set semantics, never the signed
    * expansion. Empty support folds to SQL's NULL.
    */
  private case class MinMaxNumOut(col: (String, String), isMin: Boolean) extends OutCol
  /** COUNT(DISTINCT numeric/days): the bounded-support enumeration
    * ([[Ensemble.numericSupport]]) — in-range realized values with mass,
    * capped (a near-continuous column's sampled support is neither cheap
    * nor faithful → fall back). Branch supports UNION exactly under
    * disjunctions, like the dictionary path.
    */
  private case class CountDistinctNumOut(col: (String, String)) extends OutCol
  /** `agg(...) FILTER (WHERE p)`: the inner aggregate evaluated under the
    * base predicates ∧ the clause's own understood atoms — exactly SQL's
    * per-aggregate row narrowing. Every estimation path handles it by
    * atom-parameterized recursion: the extra conjuncts ride the BASE atom
    * set, which on the OR paths distributes into each branch set /
    * signed-expansion term — count((A∨B)∧base∧extra) is the IE (or 3^N
    * product) over the extra-merged branches, so FILTER composes with
    * disjunctive outer predicates too. Grouped shapes keep the BASE row
    * universe: a group the filter empties still emits, with COUNT 0 /
    * SUM NULL.
    */
  private case class FilteredOut(extra: Seq[(String, Atom)], inner: OutCol) extends OutCol
  /** SUM of a LINEAR form: Σ coef · ∏ distinct modeled columns per term —
    * the reference's PLUS/MINUS aggregation class. `sum(price)` is one
    * term; `sum(price * (1 - disc))` distributes to
    * (1, [price]) + (-1, [price, disc]) — the TPC-H/SSB revenue shape —
    * each term answered by estSum/estSumProduct/estCount (empty product).
    * `refCols` is the union of columns appearing ANYWHERE in the
    * expression: SQL's SUM skips a row when the whole expression is NULL
    * (any referenced column NULL), so every term — including constant
    * terms, whose naive estimate would be a count over ALL rows — must be
    * evaluated under the non-nullness of all of them.
    */
  private case class SumOut(terms: Seq[(Double, Seq[(String, String)])],
      refCols: Seq[(String, String)]) extends OutCol
  private case class AvgOut(col: (String, String)) extends OutCol
  /** AVG of a LINEAR form (`avg(price * (1 - disc))`): SQL's AVG divides
    * the expression's sum by the count of rows where the expression is
    * NON-NULL — i.e. all referenced columns non-null — so the fold is
    * Σ coef·estSum(term) / estCount, both under NotNull(refCols). The
    * plain-column case keeps its own [[AvgOut]] (estAvg's direct path).
    */
  private case class AvgExprOut(terms: Seq[(Double, Seq[(String, String)])],
      refCols: Seq[(String, String)]) extends OutCol
  /** ARITHMETIC over whole aggregates — the reference's PLUS/MINUS class
    * at the aggregate level: `SUM(a) - SUM(b)`, `count(*) * 2`,
    * `SUM(x) + AVG(y)` — each leaf estimated independently, the tree
    * folded driver-side. Division is excluded: Spark (non-ANSI) yields
    * NULL on /0 where a folded double would yield Inf/NaN — a semantic
    * divergence, so it falls back.
    */
  private case class ExprOut(tree: ATree) extends OutCol
  /** A grouping-sets output over ONLY the spark_grouping_id attribute —
    * raw grouping_id() or a GROUPING(c) bit test. A per-SET constant:
    * estimateSets substitutes the set's grouping-id literal and evaluates
    * the expression driver-side.
    */
  private case class GidOut(e: Expression) extends OutCol

  private sealed trait ATree
  private case class ALeaf(agg: OutCol) extends ATree
  private case class AConst(v: Double) extends ATree
  private case class ABin(op: Char, l: ATree, r: ATree) extends ATree

  /** One [[OutCol]] per output attribute, or None when any aggregate is
    * outside the COUNT(*)/COUNT(col)/SUM(linear form)/AVG class. `groupIdx`
    * maps a grouping attribute's exprId to its position in the group-key
    * tuple — injected (rather than derived from `agg`) so the grouping-sets
    * path can exclude the spark_grouping_id attribute; `gidId` (set only on
    * that path) instead classifies outputs over ONLY the grouping id —
    * grouping_id(), GROUPING(c) — as per-set-constant [[GidOut]]s.
    */
  private def outputCols(
      agg: Aggregate, sh: Shape,
      modeled: Map[String, Seq[(String, String)]],
      groupIdx: Map[ExprId, Int],
      gidId: Option[ExprId] = None): Option[Seq[OutCol]] = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Multiply, Subtract, UnaryMinus}

    // a division is foldable ONLY by a nonzero numeric literal — a scale
    // factor with no /0 divergence (`sum(x / 100)`, `count(*) / 2`);
    // division by an expression keeps its exact-plane NULL-on-zero
    // semantics and falls back
    def literalDivisor(e: Expression): Option[Double] = e match {
      case Literal(v, _) => Option(v).collect {
        case n: Number if n.doubleValue() != 0.0 => n.doubleValue()
      }
      case Cast(c, dt, _, _) if dt.isInstanceOf[NumericType] => literalDivisor(c)
      case _ => None
    }

    // only a genuinely WIDENING cast leaves values unchanged; a narrowing
    // cast (sum(cast(price AS int)) truncates per row) must fall back
    def widening(from: org.apache.spark.sql.types.DataType,
        to: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      (from, to) match {
        case (f, t) if f == t => true
        case (ByteType | ShortType | IntegerType, LongType) => true
        case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
        case _ => false
      }
    }
    def numCol(e: Expression): Option[(String, String)] = e match {
      case Cast(c, dt, _, _) if widening(c.dataType, dt) => numCol(c)
      case a: AttributeReference =>
        sh.attrTable.get(a.exprId)
          .filter { case (t, c) => modeled(t).exists(x => x._1 == c && x._2 == "num") }
      case _ => None
    }

    /** e as Σ coef · ∏ cols (distributing +, -, ×); each term's product
      * over DISTINCT columns (E[x²] needs a second-moment pass the
      * estimator reserves for its own CI machinery — bail).
      */
    def sumTerms(e: Expression): Option[Seq[(Double, Seq[(String, String)])]] = e match {
      case Cast(c, dt, _, _) if widening(c.dataType, dt) => sumTerms(c)
      case Literal(v, _) => Option(v).collect { case n: Number => Seq((n.doubleValue(), Seq.empty[(String, String)])) }
      case a: AttributeReference => numCol(a).map(c => Seq((1.0, Seq(c))))
      case m: Multiply =>
        for {
          l <- sumTerms(m.left); r <- sumTerms(m.right)
          terms = for { (ca, xs) <- l; (cb, ys) <- r } yield (ca * cb, xs ++ ys)
          if terms.forall(t => t._2.distinct.length == t._2.length)
        } yield terms
      case ad: Add =>
        for { l <- sumTerms(ad.left); r <- sumTerms(ad.right) } yield l ++ r
      case sb: Subtract =>
        for { l <- sumTerms(sb.left); r <- sumTerms(sb.right) }
          yield l ++ r.map { case (c, xs) => (-c, xs) }
      case um: UnaryMinus => sumTerms(um.child).map(_.map { case (c, xs) => (-c, xs) })
      case dv: Divide =>
        for { d <- literalDivisor(dv.right); l <- sumTerms(dv.left) }
          yield l.map { case (c, xs) => (c / d, xs) }
      case _ => None
    }

    // COUNT(col) gates on non-nullness only, so ANY modeled column kind
    // qualifies (num, days, AND dictionary cat — NotNullRange is 1−pNull
    // on categorical leaves); SUM/AVG stay numeric-only
    def anyModeledCol(e: Expression): Option[(String, String)] = e match {
      case a: AttributeReference =>
        sh.attrTable.get(a.exprId)
          .filter { case (t, c) => modeled(t).exists(_._1 == c) }
      case _ => numCol(e)
    }

    // dictionary-modeled (cat) column — the only kind whose value domain
    // the model can enumerate
    def catCol(e: Expression): Option[(String, String)] = e match {
      case a: AttributeReference =>
        sh.attrTable.get(a.exprId)
          .filter { case (t, c) => modeled(t).exists(x => x._1 == c && x._2 == "cat") }
      case _ => None
    }

    // realized-domain ordered column for MIN/MAX / COUNT(DISTINCT): a
    // modeled "num" column of numeric SQL type, or a "days" column AT DAY
    // GRANULARITY — a bare DATE attribute, or an explicit `cast(ts AS
    // date)`, which in the UTC session equals the model's own epoch-day
    // encoding (`to_date` floor). A BARE days-modeled TIMESTAMP falls back:
    // its exact extreme carries intra-day precision the day-granular
    // realized values cannot reproduce.
    def ordCol(e: Expression): Option[(String, String)] = e match {
      case a: AttributeReference =>
        sh.attrTable.get(a.exprId).filter { case (t, c) =>
          modeled(t).exists(x => x._1 == c &&
            ((x._2 == "num" && a.dataType.isInstanceOf[NumericType]) ||
              (x._2 == "days" && a.dataType == DateType)))
        }
      case Cast(a: AttributeReference, DateType, _, _)
          if session.sessionState.conf.sessionLocalTimeZone == "UTC" =>
        sh.attrTable.get(a.exprId).filter { case (t, c) =>
          modeled(t).exists(x => x._1 == c && x._2 == "days")
        }
      case Cast(c, dt, _, _) if widening(c.dataType, dt) => ordCol(c)
      case _ => None
    }

    // a FILTER (WHERE ...) clause compiles to extra atoms over modeled
    // columns (single-attribute understood conjuncts, resolved through the
    // rename layer like any residual filter); anything else bails
    def filterAtoms(cond: Expression): Option[Seq[(String, Atom)]] = {
      val per = splitConj(cond).map(eqOrToIn).map { cj =>
        for {
          as <- atomsOf(Seq(cj))
          a <- as.headOption
          ref <- cj.references.toSeq match {
            case Seq(one: AttributeReference) => Some(one)
            case _                            => None
          }
          tc <- sh.attrTable.get(ref.exprId)
          if modeled(tc._1).exists(_._1 == tc._2)
        } yield (tc._1, retarget(a, tc._2))
      }
      if (per.forall(_.isDefined)) Some(per.flatten) else None
    }

    def leafAgg(ae: AggregateExpression): Option[OutCol] = {
      val inner: Option[OutCol] = bareAgg(ae)
      ae.filter match {
        case None => inner
        case Some(cond) => for {
          extra <- filterAtoms(cond)
          i <- inner
        } yield if (extra.isEmpty) i else FilteredOut(extra, i)
      }
    }

    // `CASE WHEN p THEN x END` (else absent or NULL) inside an aggregate
    // is the FILTER clause in disguise: rows failing p contribute NULL,
    // which SUM/AVG/COUNT skip — exactly the per-aggregate predicate
    // narrowing, so it compiles to the same FilteredOut wrapper. An
    // `ELSE 0` is NOT that (zeros are summed; a p-emptied group yields
    // 0, not NULL) and falls back.
    def condOf(child: Expression): Option[(Seq[(String, Atom)], Expression)] = {
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, If}
      child match {
        case CaseWhen(Seq((p, thenE)), None) => filterAtoms(p).map(_ -> thenE)
        case CaseWhen(Seq((p, thenE)), Some(Literal(null, _))) =>
          filterAtoms(p).map(_ -> thenE)
        case If(p, thenE, Literal(null, _)) => filterAtoms(p).map(_ -> thenE)
        // count_if's lowering: `If(NOT p, NULL, p)` — the value arm is
        // the (then necessarily true) boolean itself, so this is a
        // filtered COUNT of a non-null literal
        case If(Not(p), Literal(null, _), p2) if p.semanticEquals(p2) =>
          filterAtoms(p).map(_ -> Literal(true))
        case _ => None
      }
    }
    def condWrap(extra: Seq[(String, Atom)], oc: OutCol): OutCol =
      if (extra.isEmpty) oc else FilteredOut(extra, oc)

    def bareAgg(ae: AggregateExpression): Option[OutCol] =
      if (ae.isDistinct) ae.aggregateFunction match {
        case c: Count if c.children.sizeIs == 1 =>
          catCol(c.children.head).map(CountDistinctOut.apply)
            .orElse(ordCol(c.children.head).map(CountDistinctNumOut.apply))
        case _ => None
      }
      else ae.aggregateFunction match {
        case c: Count if c.children.nonEmpty &&
            c.children.forall { case Literal(v, _) => v != null; case _ => false } =>
          Some(CountOut())
        case c: Count if c.children.sizeIs == 1 &&
            condOf(c.children.head).isDefined =>
          condOf(c.children.head).flatMap { case (extra, thenE) =>
            (thenE match {
              case Literal(v, _) if v != null => Some(CountOut())
              case e                          => anyModeledCol(e).map(CountColOut.apply)
            }).map(condWrap(extra, _))
          }
        case c: Count if c.children.sizeIs == 1 =>
          anyModeledCol(c.children.head).map(CountColOut.apply)
        case s: Sum if condOf(s.child).isDefined =>
          condOf(s.child).flatMap { case (extra, thenE) =>
            sumTerms(thenE).filter(_.exists(_._2.nonEmpty))
              .map(ts => condWrap(extra, SumOut(ts, ts.flatMap(_._2).distinct)))
          }
        case s: Sum =>
          sumTerms(s.child).filter(_.exists(_._2.nonEmpty))
            .map(ts => SumOut(ts, ts.flatMap(_._2).distinct))
        case av: Average if condOf(av.child).isDefined =>
          condOf(av.child).flatMap { case (extra, thenE) =>
            numCol(thenE).map(cc => condWrap(extra, AvgOut(cc))).orElse(
              sumTerms(thenE).filter(_.exists(_._2.nonEmpty))
                .map(ts => condWrap(extra, AvgExprOut(ts, ts.flatMap(_._2).distinct))))
          }
        case av: Average =>
          numCol(av.child).map(AvgOut.apply).orElse(
            sumTerms(av.child).filter(_.exists(_._2.nonEmpty))
              .map(ts => AvgExprOut(ts, ts.flatMap(_._2).distinct)))
        case m: Min => catCol(m.child).map(MinMaxCatOut(_, isMin = true))
          .orElse(ordCol(m.child).map(MinMaxNumOut(_, isMin = true)))
        case m: Max => catCol(m.child).map(MinMaxCatOut(_, isMin = false))
          .orElse(ordCol(m.child).map(MinMaxNumOut(_, isMin = false)))
        // approx_count_distinct already promises an approximation; the
        // dictionary-support enumeration is the model's (typically exact)
        // answer to the same question, so it rides CountDistinctOut
        case h: org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus =>
          catCol(h.child).map(CountDistinctOut.apply)
            .orElse(ordCol(h.child).map(CountDistinctNumOut.apply))
        case _ => None
      }

    /** Arithmetic (+, -, ×, unary -) over aggregate leaves and numeric
      * literals. A cast HERE wraps the final scalar, where the estimate's
      * own rounding (toRows) subsumes it — unlike the per-row casts inside
      * an aggregate, which must be widening.
      */
    def aggTree(e: Expression): Option[ATree] = e match {
      // a MIN/MAX leaf is a STRING — it cannot participate in arithmetic
      // (ofNamed's direct-alias case folds the bare aggregate)
      case ae: AggregateExpression =>
        // a MIN/MAX leaf (string, or a realized-domain numeric extreme)
        // does not participate in arithmetic — the numeric form's value is
        // a domain POINT, not an additive measure the tree algebra models
        def minMaxLeaf(c: OutCol): Boolean = c match {
          case FilteredOut(_, i) => minMaxLeaf(i)
          case _ => c.isInstanceOf[MinMaxCatOut] || c.isInstanceOf[MinMaxNumOut]
        }
        leafAgg(ae).filterNot(minMaxLeaf).map(ALeaf.apply)
      case Cast(c, dt, _, _) if dt.isInstanceOf[NumericType] => aggTree(c)
      case Literal(v, _) => Option(v).collect { case n: Number => AConst(n.doubleValue()) }
      case ad: Add =>
        for { l <- aggTree(ad.left); r <- aggTree(ad.right) } yield ABin('+', l, r)
      case sb: Subtract =>
        for { l <- aggTree(sb.left); r <- aggTree(sb.right) } yield ABin('-', l, r)
      case m: Multiply =>
        for { l <- aggTree(m.left); r <- aggTree(m.right) } yield ABin('*', l, r)
      case um: UnaryMinus => aggTree(um.child).map(t => ABin('-', AConst(0.0), t))
      case dv: Divide =>
        for { d <- literalDivisor(dv.right); l <- aggTree(dv.left) }
          yield ABin('*', l, AConst(1.0 / d))
      case _ => None
    }

    // an output whose ONLY reference is the grouping id is a per-set
    // constant (and must carry no aggregate function)
    def gidOnly(e: Expression): Boolean =
      gidId.exists(g => e.references.nonEmpty && e.references.forall(_.exprId == g)) &&
        e.deterministic &&
        !e.exists(_.isInstanceOf[AggregateExpression])

    def ofNamed(ne: NamedExpression): Option[OutCol] = ne match {
      case a: AttributeReference if gidId.contains(a.exprId) => Some(GidOut(a))
      case a: AttributeReference => groupIdx.get(a.exprId).map(GroupOut.apply)
      case Alias(e, _) if gidOnly(e) => Some(GidOut(e))
      case Alias(ae: AggregateExpression, _) => leafAgg(ae)
      case Alias(l: Literal, _) =>
        Some(ConstOut(CatalystTypeConverters.convertToScala(l.value, l.dataType)))
      case Alias(e, _) => aggTree(e).map {
        case ALeaf(c) => c // a plain aggregate keeps its direct form
        case t        => ExprOut(t)
      }
      case _ => None
    }

    val cols = agg.aggregateExpressions.map(ofNamed)
    if (cols.forall(_.isDefined)) Some(cols.flatten) else None
  }

  private def treeLeaves(t: ATree): Seq[OutCol] = t match {
    case ALeaf(c)      => Seq(c)
    case AConst(_)     => Nil
    case ABin(_, l, r) => treeLeaves(l) ++ treeLeaves(r)
  }

  private def foldTree(t: ATree, leafVal: OutCol => Double): Double = t match {
    case ALeaf(c)        => leafVal(c)
    case AConst(v)       => v
    case ABin('+', l, r) => foldTree(l, leafVal) + foldTree(r, leafVal)
    case ABin('-', l, r) => foldTree(l, leafVal) - foldTree(r, leafVal)
    case ABin(_, l, r)   => foldTree(l, leafVal) * foldTree(r, leafVal)
  }

  // ---- driver-side estimation → LocalRelation rows ----

  /** Merge NotNull atoms for the given columns into an atom map — the
    * NULL-correct gating every SUM/AVG/COUNT(col) estimation rides on.
    */
  private def withNotNull(
      m: Map[String, Seq[Atom]], cs: Seq[(String, String)]): Map[String, Seq[Atom]] =
    cs.foldLeft(m) { case (acc, c) =>
      acc.updated(c._1, acc.getOrElse(c._1, Seq.empty) :+ SpnCardinality.NotNull(c._2)) }

  private def mergeAtomMaps(
      x: Map[String, Seq[Atom]], y: Map[String, Seq[Atom]]): Map[String, Seq[Atom]] =
    y.foldLeft(x) { case (m, (t, as)) => m.updated(t, m.getOrElse(t, Seq.empty) ++ as) }

  /** Full inclusion–exclusion signed expansion of OR groups over a base
    * conjunction (r18): Π_g Σ_{∅≠S⊆branches_g} (−1)^{|S|+1} 1_{∧S}, each
    * product term's atoms merged onto `base`. A 2-branch group contributes
    * the familiar {+A, +B, −A∧B}; a k-branch group 2^k−1 signed picks.
    * Callers bound the total term count via [[orTermProduct]] ≤ 27.
    *
    * Each group's branches dedupe FIRST (A∨A≡A, r19): equal-after-compile
    * branch spellings (Catalyst canonicalizes BETWEEN to paired bounds, so
    * two spellings arrive as equal atom maps) would otherwise lose terms —
    * `combinations(k)` skips duplicate-element subsets and {+A, −A}
    * cancels where |A| was the answer.
    */
  /** Order-insensitive identity key for one compiled branch — atom order
    * inside a conjunction carries no meaning, so spelling variants that
    * emit the same atoms in different order still dedupe.
    */
  private def branchKey(m: Map[String, Seq[Atom]]): Map[String, Set[Atom]] =
    m.view.mapValues(_.toSet).toMap

  /** One branch's conjunction implies another's when the other's atoms
    * are a per-table SUBSET of its own (conjoining MORE atoms can only
    * narrow the row set) — the branch-implication primitive both
    * absorption laws below ride.
    */
  private def branchImplies(
      bj: Map[String, Set[Atom]], bi: Map[String, Set[Atom]]): Boolean =
    bi.forall { case (t, as) => as.subsetOf(bj.getOrElse(t, Set.empty)) }

  /** Cross-group subsumption (r19): group i drops when another group j
    * IMPLIES it — every branch of j carries some branch of i as a
    * sub-conjunction, so whenever j holds, i holds and i adds no
    * constraint. The branch-set-containment form ((A∨B)∧(A∨B∨C) ≡ (A∨B))
    * is the equal-branch special case; the general law also catches
    * (A∧B ∨ C)∧(A ∨ C) ≡ (A∧B ∨ C). Dropping BEFORE the
    * [[orTermProduct]] cap lets e.g. (A∨B)∧(A∨B∨C)∧(D∨E) fold at 9
    * signed terms instead of failing loudly at 63. Mutually-implying
    * (equivalent) groups keep the first; branch identity is the
    * order-insensitive [[branchKey]]. Mirrors SqlParser.parseWhere on
    * the text plane.
    */
  private def absorbSupersetGroups(groups: Seq[Seq[Map[String, Seq[Atom]]]])
      : Seq[Seq[Map[String, Seq[Atom]]]] = {
    val keyed = groups.map(_.map(branchKey))
    def implies(j: Seq[Map[String, Set[Atom]]], i: Seq[Map[String, Set[Atom]]]): Boolean =
      j.forall(bj => i.exists(bi => branchImplies(bj, bi)))
    groups.indices.filterNot { i =>
      keyed.indices.exists(j => j != i &&
        implies(keyed(j), keyed(i)) && (!implies(keyed(i), keyed(j)) || j < i))
    }.map(groups)
  }

  private def signedAtomTerms(
      base: Map[String, Seq[Atom]],
      groups: Seq[Seq[Map[String, Seq[Atom]]]]): Seq[(Double, Map[String, Seq[Atom]])] =
    groups.foldLeft(Seq((1.0, base))) { (acc, branches0) =>
      val branches = branches0.distinctBy(branchKey)
      val expansion = (1 to branches.length).flatMap { k =>
        val sign = if (k % 2 == 1) 1.0 else -1.0
        branches.combinations(k).map(s => (sign, s.reduceLeft(mergeAtomMaps)))
      }
      for { (s1, m1) <- acc; (s2, m2) <- expansion } yield (s1 * s2, mergeAtomMaps(m1, m2))
    }

  /** One branch picked per group, all merged onto `base` — the positive
    * pure-branch combinations, whose union IS the WHERE's row set: the
    * enumeration surface for set-semantics outputs (distinct counts,
    * MIN/MAX supports), which the signed expansion must never touch.
    */
  private def positiveCombos(
      base: Map[String, Seq[Atom]],
      groups: Seq[Seq[Map[String, Seq[Atom]]]]): Seq[Map[String, Seq[Atom]]] =
    groups.foldLeft(Seq(base)) { (acc, branches) =>
      // duplicate branches are harmless in a union but waste an estimate
      // per combo — dedupe like the signed plane (r19)
      for { m <- acc; s <- branches.distinctBy(branchKey) } yield mergeAtomMaps(m, s)
    }

  /** Total signed-term count Π_g (2^{k_g}−1) of an OR-group list — the
    * shared ≤27 accuracy cap (saturating: a pathological branch count
    * must not wrap Long). Generalizes the r17 three-2-branch-group 3^N
    * bound: three 2-branch groups sit exactly at 27, a single disjunction
    * may hold four branches (15), a genuine fourth group (81) falls back.
    * Counts DEDUPED branches per group (r19) — the expansion in
    * [[signedAtomTerms]] runs over deduped lists, so the cap must charge
    * the same effective branch count or a within-cap WHERE with duplicate
    * spellings would fail loudly for terms it never expands.
    */
  private def orTermProduct(groups: Seq[Seq[Map[String, Seq[Atom]]]]): Long =
    groups.foldLeft(1L) { (acc, g) =>
      math.min(
        acc * ((1L << math.min(g.distinctBy(branchKey).length, 20)) - 1), 1L << 40)
    }

  private def estimate(
      sh: Shape,
      groupCols: Seq[(String, String)],
      cols: Seq[OutCol],
      outTypes: Seq[DataType]): Option[Seq[InternalRow]] = {
    val spns = Ensemble.get(session, sfDir)
    val spec = DatasetSpec.forDir(session, sfDir)
    if (groupCols.isEmpty)
      scalarVals(spns, spec, sh, cols)
        .map(m => toRows(Seq(cols.indices.map(m)), outTypes))
    else groupRows(spns, spec, sh, groupCols, cols).map { rows =>
      toRows(rows.sortBy(_._1.mkString(" ")).map { case (k, m) =>
        cols.zipWithIndex.map {
          case (GroupOut(gi), _) => k(gi): Any
          case (_, i)            => m(i)
        }
      }, outTypes)
    }
  }

  /** Shape dispatch, SCALAR: output-position → value under whatever OR
    * structure the Shape carries — the conjunctive fold, one 2-branch
    * disjunction through inclusion-exclusion, anything else through the
    * signed product expansion under the Π(2^k−1) ≤ 27 term cap. Shared
    * by the plain-aggregate path and (per grouping set) the ROLLUP/CUBE
    * fold.
    */
  private def scalarVals(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec,
      sh: Shape, cols: Seq[OutCol]): Option[Map[Int, Any]] = sh.orBranches match {
    case Seq()          => plainScalarVals(spns, spec, sh, cols)
    case Seq(Seq(a, b)) => singleOrScalarVals(spns, spec, sh, a, b, cols)
    case gs if orTermProduct(gs) <= 27 => multiOrScalarVals(spns, spec, sh, gs, cols)
    case _              => None
  }

  /** The Shape's row-count estimate under whatever OR structure it
    * carries — the bucket-emission gate for scalar bucket tuples (the
    * shape-dispatched mirror of a single CountOut() output; SQL's row
    * universe needs the DISJUNCTION's count, not one branch's).
    */
  private def shapeCount(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec,
      sh: Shape): Option[Double] =
    scalarVals(spns, spec, sh, Seq(CountOut()))
      .map(_(0).asInstanceOf[Double])

  /** Shape dispatch, GROUPED: per-group key tuples plus COMPLETE
    * output-position value maps (absent enumerations filled with
    * [[aggDefault]] — SQL's NULL for SUM/AVG, 0 for counts).
    */
  private def groupRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec,
      sh: Shape, gcols: Seq[(String, String)], cols: Seq[OutCol])
      : Option[Seq[(Seq[String], Map[Int, Any])]] = sh.orBranches match {
    case Seq()          => plainGroupRows(spns, spec, sh, gcols, cols)
    case Seq(Seq(a, b)) => singleOrGroupRows(spns, spec, sh, a, b, gcols, cols)
    case gs if orTermProduct(gs) <= 27 => multiOrGroupRows(spns, spec, sh, gs, gcols, cols)
    case _              => None
  }

  /** Scalar (ungrouped) values for the conjunctive path, keyed by output
    * position. SUM/AVG emit SQL's NULL when the gated non-null-count
    * estimate rounds below one row — the empty aggregate is NULL in SQL,
    * and a folded 0.0 would diverge for any caller distinguishing them.
    * GroupOut slots yield null (only reachable from the grouping-sets ()
    * set, where the SQL convention IS null).
    */
  private def plainScalarVals(
      spns: Map[String, Ensemble.TrainedSpn],
      spec: DatasetSpec, sh: Shape, cols: Seq[OutCol]): Option[Map[Int, Any]] = {
    def term(coef: Double, cs: Seq[(String, String)],
        p: Map[(String, String), graft.rspn.ColRange]): Double = cs match {
      case Seq()  => coef * Ensemble.estCount(spns, sh.tables, p).value
      case Seq(c) => coef * Ensemble.estSum(spns, sh.tables, c, p).value
      case _      => coef * Ensemble.estSumProduct(spns, sh.tables, cs, p).value
    }
    // atom-parameterized so a FILTER (WHERE ...) clause recurses with its
    // extra conjuncts merged in: the inner aggregate then evaluates under
    // base ∧ filter — exactly SQL's FILTER semantics. Any atom set that
    // cannot compile makes the leaf None and the whole rewrite falls back.
    def leafValUnder(atoms: Map[String, Seq[Atom]])(col: OutCol): Option[Any] = {
      def predsNN(cs: Seq[(String, String)]) =
        SpnCardinality.predsFor(spns, sh.tables, withNotNull(atoms, cs), spec.modeled)
      def preds = SpnCardinality.predsFor(spns, sh.tables, atoms, spec.modeled)
      col match {
        case FilteredOut(extra, inner) =>
          leafValUnder(mergeAtoms(atoms, extra))(inner)
        case CountOut() =>
          preds.map(p => Ensemble.estCount(spns, sh.tables, p).value)
        case CountColOut(c) =>
          predsNN(Seq(c)).map(p => Ensemble.estCount(spns, sh.tables, p).value)
        case CountDistinctOut(c) =>
          preds.map(p =>
            Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), p).length.toDouble)
        case MinMaxCatOut(c, isMin) =>
          preds.map { p =>
            val support = Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), p).map(_._1.head)
            utf8Extreme(support, isMin)
          }
        case CountDistinctNumOut(c) =>
          preds.flatMap(p => Ensemble.numericSupport(spns, sh.tables, c, p))
            .map(_.length.toDouble)
        case MinMaxNumOut(c, isMin) =>
          preds.flatMap(p => Ensemble.numericExtreme(spns, sh.tables, c, p, isMin))
            .map { case Some(v) => v: Any; case None => null }
        case SumOut(terms, refCols) =>
          predsNN(refCols).map { p =>
            if (Ensemble.estCount(spns, sh.tables, p).value < 0.5) null
            else terms.map { case (cf, cs) => term(cf, cs, p) }.sum
          }
        case AvgOut(c) =>
          predsNN(Seq(c)).map { p =>
            if (Ensemble.estCount(spns, sh.tables, p).value < 0.5) null
            else Ensemble.estAvg(spns, sh.tables, c, p).value
          }
        case AvgExprOut(terms, refCols) =>
          predsNN(refCols).map { p =>
            val gate = Ensemble.estCount(spns, sh.tables, p).value
            if (gate < 0.5) null
            else terms.map { case (cf, cs) => term(cf, cs, p) }.sum / gate
          }
        case _ => None
      }
    }
    scalarFold(cols, leafValUnder(sh.atoms))
  }

  /** The value an aggregate output takes for a group ABSENT from its own
    * (gated) enumeration: SUM/AVG over a group whose aggregate column has
    * no non-NULL row is SQL's NULL — the same convention the scalar paths
    * apply — while COUNT folds to 0. An arithmetic tree inherits NULL from
    * any SUM/AVG leaf (SQL arithmetic over NULL is NULL), else folds its
    * count leaves at 0.
    */
  private def aggDefault(col: OutCol): Any = col match {
    case SumOut(_, _) | AvgOut(_) | AvgExprOut(_, _) | MinMaxCatOut(_, _) |
         MinMaxNumOut(_, _) => null
    case ConstOut(v) => v
    case FilteredOut(_, inner) => aggDefault(inner)
    case ExprOut(t) =>
      def nullable(l: OutCol): Boolean = l match {
        case FilteredOut(_, i) => nullable(i)
        case _ => l.isInstanceOf[SumOut] || l.isInstanceOf[AvgOut] ||
          l.isInstanceOf[AvgExprOut]
      }
      if (treeLeaves(t).exists(nullable)) null
      else foldTree(t, _ => 0.0)
    case _ => 0.0
  }

  /** Per-group rows for the conjunctive path over ONE group-column list:
    * each enumerated group's key values (aligned to `gcols`) plus every
    * non-group output's value by output position. The COUNT enumeration
    * fixes the group-key universe (groups with estimated mass 0 are pruned
    * inside enumGroups, identically for every aggregate — all calls share
    * the same prefix-pruned walk). SUM/AVG are count-gated PER GROUP: a
    * group present in the count universe whose gated non-null count
    * estimates below one row folds to SQL's NULL, not 0.0.
    */
  private def plainGroupRows(
      spns: Map[String, Ensemble.TrainedSpn],
      spec: DatasetSpec, sh: Shape,
      gcols: Seq[(String, String)], cols: Seq[OutCol])
      : Option[Seq[(Seq[String], Map[Int, Any])]] = {
    // the base predicate's count enumeration — the ROW UNIVERSE at
    // assembly, and the unfiltered CountOut's own values (shared so the
    // common all-plain-aggregates query enumerates it exactly once)
    lazy val baseEnum: Option[Seq[(Seq[String], Ensemble.Estimate)]] =
      SpnCardinality.predsFor(spns, sh.tables, sh.atoms, spec.modeled)
        .map(p => Ensemble.estGroupByMulti(spns, sh.tables, gcols, p))
    // atom-parameterized for FILTER (WHERE ...) recursion, exactly like
    // plainScalarVals.leafValUnder. The ROW UNIVERSE stays the BASE
    // predicate's count enumeration: SQL's FILTER narrows one aggregate's
    // rows, never the group list — a group the filter empties still
    // emits, with COUNT 0 / SUM NULL (aggDefault).
    def perGroupUnder(atoms: Map[String, Seq[Atom]])(col: OutCol): Option[Map[Seq[String], Any]] = {
      def predsNN(cs: Seq[(String, String)]) =
        SpnCardinality.predsFor(spns, sh.tables, withNotNull(atoms, cs), spec.modeled)
      def preds = SpnCardinality.predsFor(spns, sh.tables, atoms, spec.modeled)
      col match {
        case FilteredOut(extra, inner) =>
          perGroupUnder(mergeAtoms(atoms, extra))(inner)
        case CountOut() if atoms eq sh.atoms =>
          baseEnum.map(_.map { case (k, e) => k -> (e.value: Any) }.toMap)
        case CountOut() => preds.map(p =>
          Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> (e.value: Any) }.toMap)
        case CountColOut(c) => predsNN(Seq(c)).map(p =>
          Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> (e.value: Any) }.toMap)
        // per-group distinct set = the (gcols..., c) enumeration grouped by
        // its gcols prefix (the text plane's convention)
        case CountDistinctOut(c) =>
          preds.map(p => Ensemble.estGroupByMulti(spns, sh.tables, gcols :+ c, p)
            .map(_._1).groupBy(_.dropRight(1))
            .map { case (g, rows) => g -> (rows.length.toDouble: Any) })
        case MinMaxCatOut(c, isMin) =>
          preds.map(p => Ensemble.estGroupByMulti(spns, sh.tables, gcols :+ c, p)
            .map(_._1).groupBy(_.dropRight(1))
            .map { case (g, rows) => g -> utf8Extreme(rows.map(_.last), isMin) })
        case CountDistinctNumOut(c) =>
          preds.flatMap(p =>
            Ensemble.estGroupByNumericSupport(spns, sh.tables, gcols, c, p))
            .map(_.map { case (k, sup) => k -> (sup.length.toDouble: Any) }.toMap)
        // a group with empty support stays ABSENT -> assembly fills
        // aggDefault (SQL's NULL), like the SUM gate
        case MinMaxNumOut(c, isMin) =>
          preds.flatMap(p =>
            Ensemble.estGroupByNumericExtreme(spns, sh.tables, gcols, c, p, isMin))
            .map(_.map { case (k, v) => k -> (v: Any) }.toMap)
        case SumOut(terms, refCols) => predsNN(refCols).map { p =>
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> e.value }.toMap
          val perTerm = terms.map {
            case (cf, Seq()) =>
              Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
                .map { case (k, e) => k -> cf * e.value }.toMap
            case (cf, cs) =>
              Ensemble.estGroupByAgg(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, p)
                .map { case (k, e) => k -> cf * e.value }.toMap
          }
          // a group below the gate is left ABSENT → assembly fills aggDefault
          // (NULL), matching the scalar empty-aggregate convention
          perTerm.flatMap(_.keys).distinct.collect {
            case k if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (perTerm.map(_.getOrElse(k, 0.0)).sum: Any)
          }.toMap
        }
        case AvgOut(c) => predsNN(Seq(c)).map { p =>
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> e.value }.toMap
          Ensemble.estGroupByAvg(spns, sh.tables, gcols, c, p)
            .collect { case (k, e) if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (e.value: Any) }.toMap
        }
        case AvgExprOut(terms, refCols) => predsNN(refCols).map { p =>
          val gate = Ensemble.estGroupByMulti(spns, sh.tables, gcols, p)
            .map { case (k, e) => k -> e.value }.toMap
          val perTerm = terms.map {
            case (cf, Seq()) => gate.map { case (k, v) => k -> cf * v }
            case (cf, cs) =>
              Ensemble.estGroupByAgg(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, p)
                .map { case (k, e) => k -> cf * e.value }.toMap
          }
          perTerm.flatMap(_.keys).toSeq.distinct.collect {
            case k if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (perTerm.map(_.getOrElse(k, 0.0)).sum / gate(k): Any)
          }.toMap
        }
        case ExprOut(t) =>
          val ls = treeLeaves(t).distinct
          val maps = ls.map(l => l -> perGroupUnder(atoms)(l)).toMap
          if (maps.values.exists(_.isEmpty)) None
          else {
            val byLeaf = maps.map { case (l, m) => l -> m.get }
            val keys = byLeaf.values.flatMap(_.keys).toSeq.distinct
            Some(keys.map { k =>
              val leafVals: Map[OutCol, Any] =
                byLeaf.map { case (l, m) => l -> m.getOrElse(k, aggDefault(l)) }
              k -> (if (leafVals.values.exists(_ == null)) null
                    else foldTree(t, c => leafVals(c).asInstanceOf[Double]): Any)
            }.toMap)
          }
        case ConstOut(_) => Some(Map.empty) // assembly fills aggDefault = the value
        case GroupOut(_) => Some(Map.empty)
        case GidOut(_)   => Some(Map.empty) // resolved per set by estimateSets
      }
    }
    baseEnum.flatMap { counts =>
      val per = cols.zipWithIndex.collect {
        case (c, i) if !c.isInstanceOf[GroupOut] && !c.isInstanceOf[GidOut] =>
          i -> perGroupUnder(sh.atoms)(c)
      }
      if (per.exists(_._2.isEmpty)) None
      else {
        val aggVals = per.map { case (i, m) => i -> m.get }.toMap
        // the row universe is SQL's: groups whose count estimate reaches
        // ONE row (the OR paths' convention) — fine-grained multi-column
        // groupings otherwise emit phantom fractional-mass groups the
        // exact plane doesn't have
        Some(counts.collect { case (k, e) if e.value >= 0.5 => k }.map(k =>
          (k, aggVals.map { case (i, m) => i -> m.getOrElse(k, aggDefault(cols(i))) })))
      }
    }
  }

  /** Fold per-leaf values (Double, or null for an empty SUM/AVG) into the
    * per-output map: an arithmetic tree with ANY null leaf is null — SQL
    * arithmetic over NULL yields NULL.
    */
  private def scalarFold(
      cols: Seq[OutCol], leafVal: OutCol => Option[Any]): Option[Map[Int, Any]] = {
    val vals: Seq[Option[Any]] = cols.map {
      case GroupOut(_) => Some(null)
      case GidOut(_)   => Some(null) // overridden per set by estimateSets
      case ConstOut(v) => Some(v)
      case ExprOut(t) =>
        val lv = treeLeaves(t).distinct.map(l => l -> leafVal(l)).toMap
        if (lv.values.exists(_.isEmpty)) None
        else if (lv.values.exists(_.get == null)) Some(null)
        else Some(foldTree(t, c => lv(c).get.asInstanceOf[Double]))
      case leaf => leafVal(leaf)
    }
    if (vals.forall(_.isDefined))
      Some(vals.zipWithIndex.map { case (v, i) => i -> v.get }.toMap)
    else None
  }

  /** One disjunction, SCALAR: inclusion-exclusion over the two branch
    * predicate sets (each merged with the base conjuncts) through the
    * estimator's shared-memo OR surfaces. Atom-parameterized like the
    * plain paths: a FILTER (WHERE ...) clause recurses with its extra
    * conjuncts merged into the BASE, which distributes into both branch
    * sets — count((A∨B)∧base∧extra) = IE over (A∧base∧extra, B∧base∧extra).
    */
  private def singleOrScalarVals(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      orA: Map[String, Seq[Atom]], orB: Map[String, Seq[Atom]],
      cols: Seq[OutCol]): Option[Map[Int, Any]] = {
    def leafOrUnder(base: Map[String, Seq[Atom]])(col: OutCol): Option[Any] = {
      val mA = mergeAtomMaps(base, orA)
      val mB = mergeAtomMaps(base, orB)
      def predPair(cs: Seq[(String, String)]) = for {
        nA <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(mA, cs), spec.modeled)
        nB <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(mB, cs), spec.modeled)
      } yield (nA, nB)
      col match {
        case FilteredOut(extra, inner) =>
          leafOrUnder(mergeAtoms(base, extra))(inner)
      case CountOut() =>
        for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
              pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
          yield math.max(Ensemble.estCountOr(spns, sh.tables, pA, pB).value, 0.0)
      // support sets union EXACTLY across the branches (enumeration is a
      // set, not an additive measure)
      case CountDistinctOut(c) =>
        for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
              pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
          yield (Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), pA).map(_._1) ++
            Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), pB).map(_._1))
            .distinct.length.toDouble
      case MinMaxCatOut(c, isMin) =>
        for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
              pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
          yield {
            val support = (Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), pA).map(_._1.head) ++
              Ensemble.estGroupByMulti(spns, sh.tables, Seq(c), pB).map(_._1.head)).distinct
            utf8Extreme(support, isMin)
          }
      // branch supports union EXACTLY (a set, never the IE sum)
      case CountDistinctNumOut(c) =>
        for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
              pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled)
              sA <- Ensemble.numericSupport(spns, sh.tables, c, pA)
              sB <- Ensemble.numericSupport(spns, sh.tables, c, pB) }
          yield (sA ++ sB).distinct.length.toDouble
      case MinMaxNumOut(c, isMin) =>
        for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
              pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled)
              eA <- Ensemble.numericExtreme(spns, sh.tables, c, pA, isMin)
              eB <- Ensemble.numericExtreme(spns, sh.tables, c, pB, isMin) }
          yield {
            val both = Seq(eA, eB).flatten
            (if (both.isEmpty) null
             else if (isMin) both.min else both.max): Any
          }
      case CountColOut(c) =>
        predPair(Seq(c)).map { case (nA, nB) =>
          math.max(Ensemble.estCountOr(spns, sh.tables, nA, nB).value, 0.0) }
      // SQL SUM skips a row when the expression is NULL — i.e. when ANY
      // referenced column is NULL — so every term (constant terms
      // especially, whose naive value is a count over ALL rows) evaluates
      // under the non-nullness of all referenced columns; the empty
      // selection (gated count < 1) folds to SQL's NULL
      case SumOut(terms, refCols) =>
        predPair(refCols).map { case (nA, nB) =>
          if (Ensemble.estCountOr(spns, sh.tables, nA, nB).value < 0.5) null
          else terms.map {
            case (coef, Seq()) => coef * Ensemble.estCountOr(spns, sh.tables, nA, nB).value
            case (coef, cs) =>
              coef * Ensemble.estAggOr(spns, sh.tables, nA, nB, cs.map(_ -> 1).toMap).value
          }.sum
        }
      // SQL AVG divides by the NON-NULL count; estAvg's denominator is
      // a plain count, so the non-nullness rides in through the preds
      case AvgOut(c) =>
        predPair(Seq(c)).map { case (nA, nB) =>
          if (Ensemble.estCountOr(spns, sh.tables, nA, nB).value < 0.5) null
          else Ensemble.estAvgOr(spns, sh.tables, c, nA, nB).value }
      case AvgExprOut(terms, refCols) =>
        predPair(refCols).map { case (nA, nB) =>
          val gate = Ensemble.estCountOr(spns, sh.tables, nA, nB).value
          if (gate < 0.5) null
          else terms.map {
            case (cf, Seq()) => cf * gate
            case (cf, cs) =>
              cf * Ensemble.estAggOr(spns, sh.tables, nA, nB, cs.map(_ -> 1).toMap).value
          }.sum / gate
        }
      case _ => None
      }
    }
    scalarFold(cols, leafOrUnder(sh.atoms))
  }

  /** One disjunction, GROUPED: per enumerated group over both branches'
    * group universes.
    */
  private def singleOrGroupRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      orA: Map[String, Seq[Atom]], orB: Map[String, Seq[Atom]],
      groupCols: Seq[(String, String)], cols: Seq[OutCol])
      : Option[Seq[(Seq[String], Map[Int, Any])]] = {
    val mA = mergeAtomMaps(sh.atoms, orA)
    val mB = mergeAtomMaps(sh.atoms, orB)
    locally {
      // atom-parameterized (FILTER recursion — see singleOrScalarVals);
      // the inner mA/mB/predPair shadow the outer pair, which the ROW
      // UNIVERSE below keeps at the bare base predicates
      def leafOrGUnder(base: Map[String, Seq[Atom]])(col: OutCol): Option[Map[Seq[String], Any]] = {
        val mA = mergeAtomMaps(base, orA)
        val mB = mergeAtomMaps(base, orB)
        def predPair(cs: Seq[(String, String)]) = for {
          nA <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(mA, cs), spec.modeled)
          nB <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(mB, cs), spec.modeled)
        } yield (nA, nB)
        col match {
        case FilteredOut(extra, inner) =>
          leafOrGUnder(mergeAtoms(base, extra))(inner)
        case CountOut() =>
          for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
                pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
            yield Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, pA, pB)
              .map { case (k, e) => k -> (math.max(e.value, 0.0): Any) }.toMap
        case CountColOut(c) => predPair(Seq(c)).map { case (nA, nB) =>
          Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, nA, nB)
            .map { case (k, e) => k -> (math.max(e.value, 0.0): Any) }.toMap }
        case CountDistinctOut(c) =>
          for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
                pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
            yield (Ensemble.estGroupByMulti(spns, sh.tables, groupCols :+ c, pA).map(_._1) ++
              Ensemble.estGroupByMulti(spns, sh.tables, groupCols :+ c, pB).map(_._1))
              .distinct.groupBy(_.dropRight(1))
              .map { case (g, rows) => g -> (rows.length.toDouble: Any) }
        case MinMaxCatOut(c, isMin) =>
          for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
                pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled) }
            yield (Ensemble.estGroupByMulti(spns, sh.tables, groupCols :+ c, pA).map(_._1) ++
              Ensemble.estGroupByMulti(spns, sh.tables, groupCols :+ c, pB).map(_._1))
              .distinct.groupBy(_.dropRight(1))
              .map { case (g, rows) => g -> utf8Extreme(rows.map(_.last), isMin) }
        // per-group branch supports union exactly (sets, never the IE sum)
        case CountDistinctNumOut(c) =>
          for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
                pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled)
                gA <- Ensemble.estGroupByNumericSupport(spns, sh.tables, groupCols, c, pA)
                gB <- Ensemble.estGroupByNumericSupport(spns, sh.tables, groupCols, c, pB) }
            yield {
              val (aM, bM) = (gA.toMap, gB.toMap)
              (aM.keySet ++ bM.keySet).iterator.map { k =>
                k -> ((aM.getOrElse(k, Nil) ++ bM.getOrElse(k, Nil))
                  .distinct.length.toDouble: Any)
              }.toMap
            }
        case MinMaxNumOut(c, isMin) =>
          for { pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
                pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled)
                gA <- Ensemble.estGroupByNumericExtreme(spns, sh.tables, groupCols, c, pA, isMin)
                gB <- Ensemble.estGroupByNumericExtreme(spns, sh.tables, groupCols, c, pB, isMin) }
            yield {
              val (aM, bM) = (gA.toMap, gB.toMap)
              (aM.keySet ++ bM.keySet).iterator.map { k =>
                val vs = Seq(aM.get(k), bM.get(k)).flatten
                k -> ((if (isMin) vs.min else vs.max): Any)
              }.toMap
            }
        // per-group count gate under the non-nullness of the referenced
        // columns: a group whose aggregate column is NULL throughout folds
        // to SQL's NULL (absent here → aggDefault at assembly), matching
        // the scalar OR path's convention
        case SumOut(terms, refCols) => predPair(refCols).map { case (nA, nB) =>
          val gate = Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, nA, nB)
            .map { case (k, e) => k -> e.value }.toMap
          val perTerm = terms.map { case (cf, cs) =>
            Ensemble.estGroupByAggOr(spns, sh.tables, groupCols,
              cs.map(_ -> 1).toMap, nA, nB)
              .map { case (k, e) => k -> cf * e.value }.toMap
          }
          perTerm.flatMap(_.keys).distinct.collect {
            case k if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (perTerm.map(_.getOrElse(k, 0.0)).sum: Any)
          }.toMap }
        case AvgOut(c) => predPair(Seq(c)).map { case (nA, nB) =>
          val gate = Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, nA, nB)
            .map { case (k, e) => k -> e.value }.toMap
          Ensemble.estGroupByAvgOr(spns, sh.tables, groupCols, c, nA, nB)
            .collect { case (k, e) if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (e.value: Any) }.toMap }
        case AvgExprOut(terms, refCols) => predPair(refCols).map { case (nA, nB) =>
          val gate = Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, nA, nB)
            .map { case (k, e) => k -> e.value }.toMap
          val perTerm = terms.map {
            case (cf, Seq()) => gate.map { case (k, v) => k -> cf * v }
            case (cf, cs) =>
              Ensemble.estGroupByAggOr(spns, sh.tables, groupCols,
                cs.map(_ -> 1).toMap, nA, nB)
                .map { case (k, e) => k -> cf * e.value }.toMap
          }
          perTerm.flatMap(_.keys).toSeq.distinct.collect {
            case k if gate.getOrElse(k, 0.0) >= 0.5 =>
              k -> (perTerm.map(_.getOrElse(k, 0.0)).sum / gate(k): Any)
          }.toMap }
        case _ => None
        }
      }
      def leafOrG(col: OutCol): Option[Map[Seq[String], Any]] =
        leafOrGUnder(sh.atoms)(col)
      def perG(col: OutCol): Option[Map[Seq[String], Any]] = col match {
        case ExprOut(t) =>
          val ls = treeLeaves(t).distinct
          val maps = ls.map(l => l -> leafOrG(l)).toMap
          if (maps.values.exists(_.isEmpty)) None
          else {
            val byLeaf = maps.map { case (l, m) => l -> m.get }
            val keys = byLeaf.values.flatMap(_.keys).toSeq.distinct
            Some(keys.map { k =>
              val leafVals: Map[OutCol, Any] =
                byLeaf.map { case (l, m) => l -> m.getOrElse(k, aggDefault(l)) }
              k -> (if (leafVals.values.exists(_ == null)) null
                    else foldTree(t, c => leafVals(c).asInstanceOf[Double]): Any)
            }.toMap)
          }
        case ConstOut(_) => Some(Map.empty) // assembly fills aggDefault = the value
        case GroupOut(_) => Some(Map.empty)
        case GidOut(_)   => Some(Map.empty) // resolved per set by estimateSets
        case leaf        => leafOrG(leaf)
      }
      val per = cols.zipWithIndex.collect {
        case (c, i) if !c.isInstanceOf[GroupOut] && !c.isInstanceOf[GidOut] =>
          i -> perG(c)
      }
      if (per.exists(_._2.isEmpty)) None
      else {
        val aggVals = per.map { case (i, m) => i -> m.get }.toMap
        // the row universe is SQL's: EXACTLY the groups whose ungated
        // inclusion-exclusion count reaches one row — a group whose
        // aggregate column is NULL throughout still emits (with NULL aggs),
        // but unioning unfiltered per-leaf keys would emit spurious
        // near-zero groups the exact plane doesn't have (the multiOrGroupRows
        // convention). If the base enumeration itself cannot compile —
        // impossible when any leaf compiled, since leaves ride supersets of
        // these atoms — fall back rather than emit an empty universe.
        val baseKeys = for {
          pA <- SpnCardinality.predsFor(spns, sh.tables, mA, spec.modeled)
          pB <- SpnCardinality.predsFor(spns, sh.tables, mB, spec.modeled)
        } yield Ensemble.estGroupByAggOr(spns, sh.tables, groupCols, Map.empty, pA, pB)
          .collect { case (k, e) if e.value >= 0.5 => k }
        baseKeys.map { keys =>
          keys.sortBy(_.mkString(" ")).map { k =>
            (k, per.map { case (i, _) =>
              i -> aggVals(i).getOrElse(k, aggDefault(cols(i))) }.toMap)
          }
        }
      }
    }
  }

  /** Multiple (or 3+-branch) disjunctions, scalar shapes: expand
    * C ∧ (A₁∨B₁[∨…]) ∧ … ∧ (Aₙ∨Bₙ[∨…]) into the product of per-group
    * signed inclusion–exclusion picks ([(+,A),(+,B),(−,A∧B)] for two
    * branches, 2^k−1 picks for k) — at most 27 conjunctive estimates per
    * aggregate leaf (the shared term-product cap), every one a plain
    * (memoized-model) fold. A contradictory subset term evaluates to mass 0
    * through range intersection; a term whose atoms cannot intersect
    * (mixed point-set × range on one column) makes the whole rewrite
    * fall back — conservative, never wrong.
    */
  private def multiOrScalarVals(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      groups: Seq[Seq[Map[String, Seq[Atom]]]],
      cols: Seq[OutCol]): Option[Map[Int, Any]] = {
    def estOf(cs: Seq[(String, String)])(p: Map[(String, String), graft.rspn.ColRange]): Double =
      cs match {
        case Seq()  => Ensemble.estCount(spns, sh.tables, p).value
        case Seq(c) => Ensemble.estSum(spns, sh.tables, c, p).value
        case _      => Ensemble.estSumProduct(spns, sh.tables, cs, p).value
      }
    // atom-parameterized (FILTER recursion — the extra conjuncts ride the
    // BASE of every signed term, i.e. distribute into each of the 3^N
    // expansion products; the row semantics are count((∧ᵢ Aᵢ∨Bᵢ)∧base∧extra))
    def leaf2Under(base: Map[String, Seq[Atom]])(col: OutCol): Option[Any] = {
      val terms: Seq[(Double, Map[String, Seq[Atom]])] = signedAtomTerms(base, groups)
      // Σ sign·f(term ∧ notnull(cs)) over all expansion terms, None when any
      // term's atoms cannot compile (the caller then falls back to exact)
      def signed(nnCols: Seq[(String, String)],
          f: Map[(String, String), graft.rspn.ColRange] => Double): Option[Double] =
        terms.foldLeft(Option(0.0)) { case (acc, (sgn, m)) =>
          for {
            a <- acc
            p <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(m, nnCols), spec.modeled)
          } yield a + sgn * f(p)
        }
      // (a∨b)∧(c∨d)∧…'s support set is the UNION over the positive
      // one-branch-per-group combinations — exact set semantics, the
      // signed expansion must not touch a non-additive distinct count
      def distinctUnion(enumCols: Seq[(String, String)]): Option[Set[Seq[String]]] =
        positiveCombos(base, groups).foldLeft(Option(Set.empty[Seq[String]])) { case (acc, m) =>
          for {
            s <- acc
            p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
          } yield s ++ Ensemble.estGroupByMulti(spns, sh.tables, enumCols, p).map(_._1)
        }
      // numeric analogs of distinctUnion: union of the per-positive-combo
      // realized supports / combination of per-combo early-exit extremes
      def numCombos: Seq[Map[String, Seq[Atom]]] = positiveCombos(base, groups)
      def numSupportUnion(c: (String, String)): Option[Set[Double]] =
        numCombos.foldLeft(Option(Set.empty[Double])) { case (acc, m) =>
          for {
            s <- acc
            p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
            sup <- Ensemble.numericSupport(spns, sh.tables, c, p)
          } yield s ++ sup
        }
      def numExtremeUnion(c: (String, String), isMin: Boolean): Option[Seq[Double]] =
        numCombos.foldLeft(Option(Seq.empty[Double])) { case (acc, m) =>
          for {
            s <- acc
            p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
            e <- Ensemble.numericExtreme(spns, sh.tables, c, p, isMin)
          } yield s ++ e.toSeq
        }
      col match {
      case FilteredOut(extra, inner) =>
        leaf2Under(mergeAtoms(base, extra))(inner)
      case CountOut()     => signed(Nil, estOf(Nil)).map(v => math.max(v, 0.0))
      case CountColOut(c) => signed(Seq(c), estOf(Nil)).map(v => math.max(v, 0.0))
      case CountDistinctOut(c) => distinctUnion(Seq(c)).map(_.size.toDouble)
      case MinMaxCatOut(c, isMin) =>
        distinctUnion(Seq(c)).map(s => utf8Extreme(s.map(_.head), isMin))
      case CountDistinctNumOut(c) => numSupportUnion(c).map(_.size.toDouble)
      case MinMaxNumOut(c, isMin) =>
        numExtremeUnion(c, isMin).map(vs =>
          (if (vs.isEmpty) null else if (isMin) vs.min else vs.max): Any)
      case SumOut(ts, refCols) =>
        for {
          gate <- signed(refCols, estOf(Nil))
          v <- ts.foldLeft(Option(0.0)) { case (acc, (cf, cs)) =>
            for { a <- acc; s <- signed(refCols, estOf(cs)) } yield a + cf * s
          }
        } yield if (gate < 0.5) null else v
      case AvgOut(c) =>
        for {
          den <- signed(Seq(c), estOf(Nil))
          num <- signed(Seq(c), estOf(Seq(c)))
        } yield if (den < 0.5) null else num / den
      case AvgExprOut(ts, refCols) =>
        for {
          den <- signed(refCols, estOf(Nil))
          num <- ts.foldLeft(Option(0.0)) { case (acc, (cf, cs)) =>
            for { a <- acc; s <- signed(refCols, estOf(cs)) } yield a + cf * s
          }
        } yield if (den < 0.5) null else num / den
      case _ => None
      }
    }
    scalarFold(cols, leaf2Under(sh.atoms))
  }

  /** Multiple (or 3+-branch) disjunctions UNDER GROUP BY: the same
    * signed product expansion as [[multiOrScalarVals]], but each
    * term runs the per-group enumeration and the signed sum combines per
    * group over the UNION of all terms' group universes (a group absent
    * from a term's enumeration contributes that term 0 mass — the pruned
    * estimate). The row universe is SQL's: groups whose signed count
    * combination reaches one row under the bare (ungated) predicate.
    * SUM/AVG stay count-gated per group to SQL's empty-aggregate NULL.
    */
  private def multiOrGroupRows(
      spns: Map[String, Ensemble.TrainedSpn], spec: DatasetSpec, sh: Shape,
      groups: Seq[Seq[Map[String, Seq[Atom]]]],
      gcols: Seq[(String, String)], cols: Seq[OutCol])
      : Option[Seq[(Seq[String], Map[Int, Any])]] = {
    def termsFor(base: Map[String, Seq[Atom]]): Seq[(Double, Map[String, Seq[Atom]])] =
      signedAtomTerms(base, groups)
    // per-group signed combination of one enumeration across all expansion
    // terms; None when any term's atoms cannot compile (caller falls back)
    def signedGFor(base: Map[String, Seq[Atom]])(nnCols: Seq[(String, String)],
        f: Map[(String, String), graft.rspn.ColRange] => Seq[(Seq[String], Double)])
        : Option[Map[Seq[String], Double]] =
      termsFor(base).foldLeft(Option(Map.empty[Seq[String], Double])) { case (acc, (sgn, m)) =>
        for {
          a <- acc
          p <- SpnCardinality.predsFor(spns, sh.tables, withNotNull(m, nnCols), spec.modeled)
        } yield f(p).foldLeft(a) { case (mm, (k, v)) =>
          mm.updated(k, mm.getOrElse(k, 0.0) + sgn * v)
        }
      }
    def countEnum(p: Map[(String, String), graft.rspn.ColRange]): Seq[(Seq[String], Double)] =
      Ensemble.estGroupByMulti(spns, sh.tables, gcols, p).map { case (k, e) => k -> e.value }
    def aggEnum(cs: Seq[(String, String)])(
        p: Map[(String, String), graft.rspn.ColRange]): Seq[(Seq[String], Double)] =
      Ensemble.estGroupByAgg(spns, sh.tables, gcols, cs.map(_ -> 1).toMap, p)
        .map { case (k, e) => k -> e.value }
    def numCombosG(base: Map[String, Seq[Atom]]): Seq[Map[String, Seq[Atom]]] =
      positiveCombos(base, groups)
    // set-union semantics for distinct (see multiOrScalarVals.distinctUnion)
    def distinctUnionGFor(base: Map[String, Seq[Atom]])(
        enumCols: Seq[(String, String)]): Option[Set[Seq[String]]] =
      positiveCombos(base, groups).foldLeft(Option(Set.empty[Seq[String]])) { case (acc, m) =>
        for {
          s <- acc
          p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
        } yield s ++ Ensemble.estGroupByMulti(spns, sh.tables, enumCols, p).map(_._1)
      }
    // atom-parameterized (FILTER recursion — see multiOrScalarVals)
    def leafGUnder(base: Map[String, Seq[Atom]])(col: OutCol): Option[Map[Seq[String], Any]] = {
      def signedG(nnCols: Seq[(String, String)],
          f: Map[(String, String), graft.rspn.ColRange] => Seq[(Seq[String], Double)]) =
        signedGFor(base)(nnCols, f)
      def distinctUnionG(enumCols: Seq[(String, String)]) =
        distinctUnionGFor(base)(enumCols)
      col match {
      case FilteredOut(extra, inner) =>
        leafGUnder(mergeAtoms(base, extra))(inner)
      case CountOut() =>
        signedG(Nil, countEnum).map(_.map { case (k, v) => k -> (math.max(v, 0.0): Any) })
      case CountColOut(c) =>
        signedG(Seq(c), countEnum).map(_.map { case (k, v) => k -> (math.max(v, 0.0): Any) })
      case CountDistinctOut(c) =>
        distinctUnionG(gcols :+ c).map(_.toSeq.groupBy(_.dropRight(1))
          .map { case (g, rows) => g -> (rows.length.toDouble: Any) })
      case MinMaxCatOut(c, isMin) =>
        distinctUnionG(gcols :+ c).map(_.toSeq.groupBy(_.dropRight(1))
          .map { case (g, rows) => g -> utf8Extreme(rows.map(_.last), isMin) })
      // per-group numeric supports/extremes over the positive combos
      // (sets / domain points — never the signed expansion)
      case CountDistinctNumOut(c) =>
        numCombosG(base).foldLeft(Option(Map.empty[Seq[String], Seq[Double]])) {
          case (acc, m) =>
            for {
              a <- acc
              p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
              g <- Ensemble.estGroupByNumericSupport(spns, sh.tables, gcols, c, p)
            } yield g.foldLeft(a) { case (mm, (k, sup)) =>
              mm.updated(k, mm.getOrElse(k, Nil) ++ sup)
            }
        }.map(_.map { case (k, sup) => k -> (sup.distinct.length.toDouble: Any) })
      case MinMaxNumOut(c, isMin) =>
        numCombosG(base).foldLeft(Option(Map.empty[Seq[String], Seq[Double]])) {
          case (acc, m) =>
            for {
              a <- acc
              p <- SpnCardinality.predsFor(spns, sh.tables, m, spec.modeled)
              g <- Ensemble.estGroupByNumericExtreme(spns, sh.tables, gcols, c, p, isMin)
            } yield g.foldLeft(a) { case (mm, (k, v)) =>
              mm.updated(k, mm.getOrElse(k, Nil) :+ v)
            }
        }.map(_.map { case (k, vs) =>
          k -> ((if (isMin) vs.min else vs.max): Any)
        })
      case SumOut(ts, refCols) =>
        for {
          gate <- signedG(refCols, countEnum)
          per <- ts.foldLeft(Option(Map.empty[Seq[String], Double])) { case (acc, (cf, cs)) =>
            for {
              a <- acc
              m <- if (cs.isEmpty) signedG(refCols, countEnum)
                   else signedG(refCols, aggEnum(cs))
            } yield (a.keySet ++ m.keySet).iterator
              .map(k => k -> (a.getOrElse(k, 0.0) + cf * m.getOrElse(k, 0.0))).toMap
          }
        } yield per.collect {
          case (k, v) if gate.getOrElse(k, 0.0) >= 0.5 => k -> (v: Any)
        }.toMap
      case AvgOut(c) =>
        for {
          den <- signedG(Seq(c), countEnum)
          num <- signedG(Seq(c), aggEnum(Seq(c)))
        } yield num.collect {
          case (k, v) if den.getOrElse(k, 0.0) >= 0.5 => k -> (v / den(k): Any)
        }.toMap
      case AvgExprOut(ts, refCols) =>
        for {
          den <- signedG(refCols, countEnum)
          per <- ts.foldLeft(Option(Map.empty[Seq[String], Double])) { case (acc, (cf, cs)) =>
            for {
              a <- acc
              m <- if (cs.isEmpty) signedG(refCols, countEnum)
                   else signedG(refCols, aggEnum(cs))
            } yield (a.keySet ++ m.keySet).iterator
              .map(k => k -> (a.getOrElse(k, 0.0) + cf * m.getOrElse(k, 0.0))).toMap
          }
        } yield per.collect {
          case (k, v) if den.getOrElse(k, 0.0) >= 0.5 => k -> (v / den(k): Any)
        }.toMap
      case _ => None
      }
    }
    def leafG(col: OutCol): Option[Map[Seq[String], Any]] = leafGUnder(sh.atoms)(col)
    def perG(col: OutCol): Option[Map[Seq[String], Any]] = col match {
      case ExprOut(t) =>
        val ls = treeLeaves(t).distinct
        val maps = ls.map(l => l -> leafG(l)).toMap
        if (maps.values.exists(_.isEmpty)) None
        else {
          val byLeaf = maps.map { case (l, m) => l -> m.get }
          val keys = byLeaf.values.flatMap(_.keys).toSeq.distinct
          Some(keys.map { k =>
            val leafVals: Map[OutCol, Any] =
              byLeaf.map { case (l, m) => l -> m.getOrElse(k, aggDefault(l)) }
            k -> (if (leafVals.values.exists(_ == null)) null
                  else foldTree(t, c => leafVals(c).asInstanceOf[Double]): Any)
          }.toMap)
        }
      case ConstOut(_) => Some(Map.empty) // assembly fills aggDefault = the value
        case GroupOut(_) => Some(Map.empty)
      case GidOut(_)   => Some(Map.empty) // resolved per set by estimateSets
      case leaf        => leafG(leaf)
    }
    val per = cols.zipWithIndex.collect {
      case (c, i) if !c.isInstanceOf[GroupOut] && !c.isInstanceOf[GidOut] =>
        i -> perG(c)
    }
    if (per.exists(_._2.isEmpty)) None
    else {
      val aggVals = per.map { case (i, m) => i -> m.get }.toMap
      signedGFor(sh.atoms)(Nil, countEnum).map { base =>
        // exactly the groups whose signed count combination reaches one
        // row — unioning unfiltered per-leaf keys would emit spurious
        // near-zero groups the exact plane doesn't have
        val keys = base.collect { case (k, v) if v >= 0.5 => k }.toSeq
        keys.sortBy(_.mkString(" ")).map { k =>
          (k, per.map { case (i, _) =>
            i -> aggVals(i).getOrElse(k, aggDefault(cols(i))) }.toMap)
        }
      }
    }
  }

  /** Scala values → InternalRows under the Aggregate's own output types
    * (COUNT folds to BIGINT, SUM over integral columns too — the estimate
    * rounds; everything else stays floating).
    */
  private def toRows(rows: Seq[Seq[Any]], outTypes: Seq[DataType]): Seq[InternalRow] = {
    def cast(v: Any, dt: DataType): Any = (v, dt) match {
      // SQL NULL: an empty SUM/AVG, or a grouping-set's absent group column
      case (null, _)                => null
      case (s: String, StringType)  => s
      case (d: Double, DoubleType)  => d
      case (d: Double, FloatType)   => d.toFloat
      case (d: Double, LongType)    => math.round(d)
      case (d: Double, IntegerType) => math.round(d).toInt
      // grouping-id expressions evaluate to their exact Catalyst type
      case (b: Byte, ByteType)      => b
      case (s: Short, ShortType)    => s
      case (i: Int, IntegerType)    => i
      case (l: Long, LongType)      => l
      // calendar-bucket keys (date_trunc folds) pass through to the
      // Catalyst converter as external java.sql values
      case (ts: java.sql.Timestamp, _: org.apache.spark.sql.types.TimestampType) => ts
      case (d: java.sql.Date, _: org.apache.spark.sql.types.DateType) => d
      // sub-day truncation keys over an NTZ-read timestamp column
      case (dt: java.time.LocalDateTime, _: org.apache.spark.sql.types.TimestampNTZType) => dt
      // tumbling-window (start, end) struct keys — field values convert
      // through the Catalyst struct converter
      case (r: org.apache.spark.sql.Row, _: org.apache.spark.sql.types.StructType) => r
      // composed bucket keys (an expression over the bucket key, r16)
      // evaluate to the outer expression's own external type
      case (bd: java.math.BigDecimal, _: org.apache.spark.sql.types.DecimalType) => bd
      case (b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case (f: Float, FloatType) => f
      // folded MIN/MAX over a days-modeled column: realized epoch days
      case (d: Double, _: org.apache.spark.sql.types.DateType) =>
        java.time.LocalDate.ofEpochDay(math.round(d))
      case _ => sys.error(s"unsupported AQP output type $dt for $v")
    }
    val convs = outTypes.map(CatalystTypeConverters.createToCatalystConverter)
    rows.map { vs =>
      InternalRow.fromSeq(vs.lazyZip(outTypes).lazyZip(convs).map {
        (v, dt, conv) => conv(cast(v, dt))
      }.toSeq)
    }
  }
}
