package graft.plans

import graft.Op
import graft.rspn.{ColRange, Ensemble, NominalSet, NotNullRange, NumRange}
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{DateType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.Try

/** Learned cardinalities feeding the optimizer — the reference's core loop
  * (deepdb-public: maqp.py cardinality mode feeds estimates to a query
  * optimizer's cost model), expressed Spark-first as a Catalyst
  * `Rule[LogicalPlan]` registered through `SparkSessionExtensions`.
  *
  * Spark's static size-in-bytes statistics cannot see FILTER selectivity
  * (no per-column histograms without ANALYZE, and none at all on raw
  * parquet): a scan whose predicate keeps 0.1% of a large table still
  * carries the whole table's size estimate, so the planner sort-merges a
  * join whose build side is actually tiny. The trained RSPN ensemble knows
  * that selectivity. [[SpnBroadcastRule]] pattern-matches join sides of
  * shape Project*(Filter*(parquet scan)), converts the filter conjuncts
  * into the estimator's ColRange predicates, asks the ensemble for the
  * filtered row count, and — when the q-error-padded byte estimate fits
  * the broadcast budget — sets the BROADCAST strategy on that side's
  * `JoinHint`. Everything it cannot fully understand (an unmodeled column
  * in a meaningful predicate, a non-conjunctive shape, a multi-table
  * subtree) is left untouched: the rule only ever ADDS a hint that learned
  * statistics justify, never removes or overrides one.
  *
  * At 100 TB the estimate scales with the model's `scaleRows` (trained on
  * a bounded sample but calibrated to the true table size), so the same
  * rule that broadcasts a 0.1%-selective dimension slice at any SF refuses
  * it once the slice's absolute size outgrows the executor budget — the
  * size-robustness property the hard-coded-hint antipattern lacks.
  */
object SpnCardinality {

  /** One understood filter conjunct over a scan column. `op` ∈ eq/lt/le/
    * gt/ge for [[Cmp]]; values are raw Catalyst literal values (UTF8String
    * for strings, epoch days for dates, micros for timestamps).
    */
  sealed trait Atom { def column: String }
  final case class Cmp(column: String, op: String, value: Any) extends Atom
  final case class InSet(column: String, values: Seq[Any]) extends Atom
  final case class NotNull(column: String) extends Atom
  /** String pattern predicate on a dictionary-modeled column. `op` ∈
    * prefix/suffix/contains/like — the optimizer simplifies most LIKEs to
    * StartsWith/EndsWith/Contains before this rule runs, so all four forms
    * occur. Compiles by DICTIONARY CLOSURE (toPreds): a categorical model
    * column's dictionary is the column's complete value domain, so the
    * pattern is exactly the member set that matches it — the same trick
    * `SqlEstimate` applies on the SQL-text plane (SURVEY §2.2).
    */
  final case class StrMatch(column: String, op: String, pattern: String) extends Atom
  /** Negation of a point/set/pattern atom, compiled per column kind: on a
    * DICTIONARY column by dictionary COMPLEMENT (the text plane's !=/NOT IN
    * convention — every dict value the inner atom does NOT match), on an
    * ORDERED column (num/days) by the MULTI-INTERVAL complement (`x != 5`
    * → (-∞,5)∪(5,∞); `x NOT IN (…)` → the gaps between the points) — the
    * reference's `ranges.py::NumericRange` list-of-intervals made native.
    * Neither form carries NULL mass, exactly SQL's `col != 'x'` (NULL rows
    * are UNKNOWN, dropped).
    */
  final case class Complement(inner: Atom) extends Atom {
    def column: String = inner.column
  }
  /** Single-column DISJUNCTION: each alternative a conjunction of atoms on
    * this same column (`a < 10 OR a > 40`, `(a > 1 AND a < 5) OR a = 9`).
    * Compiles to the UNION of the alternatives' ranges — one predicate, no
    * disjunction slot, admissible inside FILTER clauses and under GROUP BY
    * of any shape. Multi-column disjunctions stay with the OR machinery.
    */
  final case class AnyOf(column: String, alts: Seq[Seq[Atom]]) extends Atom
  /** Union of disjoint half-open [lo, hi) intervals ALREADY IN THE MODEL'S
    * numeric encoding (epoch days for "days" columns) — the calendar
    * generators' cyclic buckets (`GROUP BY month(d)` is 12 of these, one
    * per-year interval list each).
    */
  final case class RangeUnion(column: String, intervals: Seq[(Double, Double)]) extends Atom

  private val microsPerDay = 86400e6

  /** Catalyst literal value → the model's numeric encoding for a column of
    * the given spec kind ("num" raw double, "days" epoch days).
    */
  private def numericValue(kind: String, v: Any): Option[Double] = v match {
    case null => None
    case i: java.lang.Integer if kind == "days" => Some(i.toDouble) // DateType
    case l: java.lang.Long if kind == "days" => Some(l.toDouble / microsPerDay) // TimestampType
    // "secs" (r16): epoch seconds with fractional micros — a timestamp
    // literal arrives as micros (Long), a date literal as epoch days (Int)
    case l: java.lang.Long if kind == "secs" => Some(l.toDouble / 1e6)
    case i: java.lang.Integer if kind == "secs" => Some(i.toDouble * 86400.0)
    case n: java.lang.Number if kind == "num" => Some(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal if kind == "num" => Some(d.toDouble)
    case _ => None
  }

  private def stringValue(v: Any): Option[String] = v match {
    case s: UTF8String => Some(s.toString)
    case s: String     => Some(s)
    case _             => None
  }

  /** Convert understood atoms to the estimator's predicate map. Returns
    * None when any atom cannot be expressed against the model (conservative
    * — the caller must then NOT trust any estimate), except that a NotNull
    * on an unmodeled column is ignorable: the optimizer infers IsNotNull
    * for every join key, keys are never modeled, and dropping the conjunct
    * only overestimates (the safe direction for a broadcast decision).
    *
    * Conjunctions accumulate per column through [[graft.rspn.ColRangeOps
    * .meet]] — a provably-empty meet is RECORDED as an empty nominal set
    * (zero mass folds to the correct answer; bailing would fall back to a
    * scan on a contradiction the model answers trivially).
    */
  private[plans] def toPreds(
      spn: Ensemble.TrainedSpn,
      table: String,
      atoms: Seq[Atom],
      modeled: Map[String, Seq[(String, String)]] = Ensemble.colSpecs): Option[Map[(String, String), ColRange]] = {
    import graft.rspn.ColRangeOps
    val specs = modeled.getOrElse(table, Seq.empty).toMap
    val acc = scala.collection.mutable.Map.empty[(String, String), ColRange]
    def add(colName: String, r: ColRange): Boolean = {
      val k = (table, colName)
      acc.get(k) match {
        case None       => acc(k) = r; true
        case Some(prev) =>
          acc(k) = ColRangeOps.meet(prev, r).getOrElse(NominalSet(Array.empty))
          true
      }
    }

    /** One atom's ColRange on a DICTIONARY column — pattern atoms close
      * over the dict (it is the column's COMPLETE value domain, so the
      * matching member set is exact; NULL rows carry no NominalSet mass —
      * SQL's LIKE-on-NULL is unknown), a value missing from the dictionary
      * matches zero rows (the dict is collected over the whole column, not
      * a sample), and Complement takes the dictionary complement.
      */
    def catRange(a: Atom): Option[ColRange] = {
      val mc = spn.cols(spn.colIdx(table, a.column))
      def codeOf(v: Any): Option[Double] =
        stringValue(v).flatMap(s => Try(mc.code(s)).toOption)
      def members(at: Atom): Option[Array[Double]] = at match {
        case Cmp(_, "eq", v) => Some(codeOf(v).toArray)
        case InSet(_, vs) if vs.forall(stringValue(_).isDefined) =>
          // dedupe: NominalSet SUMS per code, so a repeated member
          // ((a='x' OR a='y' OR a='x') survives BooleanSimplification
          // with the dup) would double its probability mass
          Some(vs.flatMap(codeOf).distinct.toArray)
        case StrMatch(_, op, pat) =>
          val matches: String => Boolean = op match {
            case "prefix"   => _.startsWith(pat)
            case "suffix"   => _.endsWith(pat)
            case "contains" => _.contains(pat)
            case _ =>
              val re = graft.rspn.SqlEstimate.likeRegex(pat)
              s => re.matcher(s).matches()
          }
          Some(mc.dict.indices.collect {
            case i if matches(mc.dict(i)) => i.toDouble
          }.toArray)
        case _ => None
      }
      a match {
        case Complement(inner) =>
          members(inner).map { ms =>
            val excl = ms.toSet
            NominalSet(mc.dict.indices.collect {
              case i if !excl(i.toDouble) => i.toDouble
            }.toArray)
          }
        case at => members(at).map(NominalSet.apply)
      }
    }

    /** One atom's ColRange on an ORDERED column ("num" raw double, "days"
      * epoch days). Complements compile to the reference-style
      * multi-interval form (`ranges.py::NumericRange`): `x != v` is two
      * open rays, `x NOT IN (…)` the gaps between the sorted points.
      */
    def numRange(kind: String, a: Atom): Option[ColRange] = a match {
      case Cmp(c @ _, op, v) =>
        numericValue(kind, v).flatMap { x =>
          op match {
            case "eq" => Some(NumRange(x, x))
            case "lt" => Some(NumRange(Double.NegativeInfinity, x, hiIncl = false))
            case "le" => Some(NumRange(Double.NegativeInfinity, x))
            case "gt" => Some(NumRange(x, Double.PositiveInfinity, loIncl = false))
            case "ge" => Some(NumRange(x, Double.PositiveInfinity))
            case _    => None
          }
        }
      case InSet(_, vs) =>
        // numeric leaves evaluate NominalSet as an exact point set
        // (distinct — repeated members must not sum twice)
        val xs = vs.map(numericValue(kind, _))
        if (xs.forall(_.isDefined)) Some(NominalSet(xs.flatten.distinct.toArray))
        else None
      case RangeUnion(_, ivs) =>
        Some(ColRangeOps.normalize(
          ivs.map { case (lo, hi) => NumRange(lo, hi, loIncl = true, hiIncl = false) })
          .getOrElse(NominalSet(Array.empty)))
      case Complement(inner) =>
        val points: Option[Seq[Double]] = inner match {
          case Cmp(_, "eq", v) => numericValue(kind, v).map(Seq(_))
          case InSet(_, vs) =>
            val xs = vs.map(numericValue(kind, _))
            if (xs.forall(_.isDefined)) Some(xs.flatten.distinct) else None
          case _ => None
        }
        points.map(ColRangeOps.pointComplement)
      case _ => None
    }

    def rangeOf(a: Atom): Option[ColRange] = specs.get(a.column).flatMap {
      case _ if a.isInstanceOf[NotNull] => Some(NotNullRange)
      // single-column disjunction: union of the alternatives' conjoined
      // ranges — an alternative whose conjunction is provably empty
      // contributes zero mass, like SQL's unsatisfiable branch
      case _ if a.isInstanceOf[AnyOf] =>
        val alts = a.asInstanceOf[AnyOf].alts.map { altAtoms =>
          altAtoms.foldLeft(Option(NotNullRange: ColRange)) { (accR, aa) =>
            for { r0 <- accR; r1 <- rangeOf(aa) } yield
              ColRangeOps.meet(r0, r1).getOrElse(NominalSet(Array.empty))
          }
        }
        if (alts.exists(_.isEmpty)) None
        else {
          val live = alts.flatten.filter {
            case NominalSet(cs) => cs.nonEmpty
            case _              => true
          }
          Some(ColRangeOps.union(live).getOrElse(NominalSet(Array.empty)))
        }
      case "cat" => catRange(a)
      case kind  => numRange(kind, a)
    }

    val ok = atoms.forall {
      case NotNull(c) =>
        !specs.contains(c) || add(c, NotNullRange) // unmodeled NotNull: droppable
      case a => rangeOf(a).exists(add(a.column, _))
    }
    if (ok) Some(acc.toMap) else None
  }

  /** Estimated filtered row count for one table under the understood atoms,
    * or None when the model cannot answer (unmodeled table/column, shape
    * the predicate algebra doesn't cover, estimator failure).
    */
  def estimate(
      spns: Map[String, Ensemble.TrainedSpn],
      table: String,
      atoms: Seq[Atom]): Option[Double] =
    estimateJoin(spns, Set(table), Map(table -> atoms))

  /** Row-count estimate for a (possibly joined) table set: single tables go
    * through their own model, FK-joined sets through a covering join SPN or
    * the factored fallback — the reference's JOB-light cardinality path.
    * Per-table dictionaries come from the single-table models (always
    * trained; dictionaries are shared per (session, sfDir, table), so codes
    * agree across model variants).
    */
  def estimateJoin(
      spns: Map[String, Ensemble.TrainedSpn],
      tables: Set[String],
      atomsByTable: Map[String, Seq[Atom]],
      modeled: Map[String, Seq[(String, String)]] = Ensemble.colSpecs): Option[Double] =
    for {
      p <- predsFor(spns, tables, atomsByTable, modeled)
      est <- Try(Ensemble.estCount(spns, tables, p).value).toOption
    } yield math.max(est, 0.0)

  /** Atoms → the estimator's predicate map across a table set; None when
    * any table's atoms cannot be expressed against its model.
    */
  def predsFor(
      spns: Map[String, Ensemble.TrainedSpn],
      tables: Set[String],
      atomsByTable: Map[String, Seq[Atom]],
      modeled: Map[String, Seq[(String, String)]] = Ensemble.colSpecs)
      : Option[Map[(String, String), ColRange]] =
    tables.toSeq.foldLeft(Option(Map.empty[(String, String), ColRange])) {
      case (acc, table) =>
        for {
          m <- acc
          spn <- spns.get(table)
          p <- toPreds(spn, table, atomsByTable.getOrElse(table, Seq.empty), modeled)
        } yield m ++ p
    }

  /** The estimator closure [[SpnBroadcastRule]] consumes. `Ensemble.get` is
    * memoized per (session, sfDir): the first call trains/loads, the rest
    * are map lookups, so calling this from inside the optimizer is cheap
    * after warm-up (compiled-tree inference, no Spark jobs).
    */
  def estimatorFor(spark: SparkSession, sfDir: String): CardEstimator =
    (tables, atomsByTable) => estimateJoin(Ensemble.get(spark, sfDir), tables, atomsByTable,
      graft.schema.DatasetSpec.forDir(spark, sfDir).modeled)

  /** (table set, understood atoms per table) → estimated row count. */
  type CardEstimator = (Set[String], Map[String, Seq[Atom]]) => Option[Double]

  // ---- logical-plan side: scan-shape recognition + atom extraction ----

  private[plans] def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other     => Seq(other)
  }

  /** (containing directory, table name) of a parquet relation — the
    * directory gates estimation: a model is only valid for the DATASET it
    * was trained on, not for any same-named table anywhere.
    */
  private[plans] def tableOf(rel: LogicalRelation): Option[(String, String)] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map { p =>
          (Option(p.getParent).map(_.toUri.getPath).getOrElse(""),
            p.getName.stripSuffix(".parquet"))
        }
      case _ => None
    }

  /** NOTE on plan-walker variants: three recognizers walk
    * Project/Filter/Join shapes over modeled scans with deliberately
    * different policies — this [[ScanShape]] (broadcast hints: resolves
    * cached InMemoryRelations, discards their inner filters — conservative
    * for a size DECISION), `SpnStatsRule.calibrateJoin` (stats: accepts any
    * equi-pair, estimator bails), and `SpnAqpRule.walk` (answers: strict
    * genuine-scan leaves, declared-FK edges only, OR + pending-NotNull
    * handling — every guard is load-bearing for CORRECTNESS). A shared
    * parameterized recognizer is the eventual shape; until then, a guard
    * changed in one must be judged against the other two's policies.
    *
    * Project*(Filter*(parquet scan)) → (table name, all filter conjuncts).
    * Projects must be pure column selections — an alias or computed column
    * between the filter and the join would change the atoms' meaning. A
    * cached table (InMemoryRelation) resolves through its cached physical
    * plan to the parquet scan it materialized: cached dims are the common
    * case in any long session, and a filter INSIDE the cached plan only
    * means the true side is smaller than the estimate — the conservative
    * direction for a broadcast decision.
    */
  private[plans] object ScanShape {
    def unapply(p: LogicalPlan): Option[(String, String, Seq[Expression])] = p match {
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        unapply(child)
      case Filter(cond, child) =>
        unapply(child).map { case (dir, t, cs) => (dir, t, cs ++ splitConj(cond)) }
      case rel: LogicalRelation =>
        tableOf(rel).map { case (dir, t) => (dir, t, Seq.empty) }
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        // an AQE-wrapped cached plan (canChangeCachedPlanOutputPartitioning)
        // is a LEAF from collect's view — resolve through its input plan
        val cached = imr.cacheBuilder.cachedPlan match {
          case aqe: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            aqe.inputPlan
          case p => p
        }
        cached.collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.headOption.map { path =>
              (Option(path.getParent).map(_.toUri.getPath).getOrElse(""),
                path.getName.stripSuffix(".parquet"), Seq.empty[Expression])
            }
        }.flatten
      case _ => None
    }
  }

  /** All conjuncts → atoms; None if ANY conjunct is not understood (a
    * selective predicate the model can't see would make the row estimate an
    * overcount of trust, not just of rows).
    */
  private[plans] def atomsOf(conjuncts: Seq[Expression]): Option[Seq[Atom]] = {
    // NOT over a point/set/pattern predicate → Complement (answered by
    // dictionary complement on cat columns; toPreds rejects other kinds).
    // Negated comparisons (NOT a < b) never reach here — BooleanSimplification
    // flips them to the opposite comparison first.
    def negated(e: Expression): Option[Atom] =
      atomsOf(Seq(e)).flatMap(_.headOption).collect {
        case a: Cmp if a.op == "eq" => Complement(a)
        case a: InSet               => Complement(a)
        case a: StrMatch            => Complement(a)
      }
    // a same-column disjunction of point predicates (`a='x' OR a='y'`) IS
    // `a IN ('x','y')` — one InSet atom, so the broadcast-hint and stats
    // planes estimate it instead of bailing, and the AQP plane's nested OR
    // branches compile it without an OR slot (SpnAqpRule.eqOrToIn performs
    // the same collapse at the Expression level before its OR partition)
    def eqOrAtom(o: Or): Option[Atom] = {
      def disjuncts(x: Expression): Seq[Expression] = x match {
        case Or(l, r) => disjuncts(l) ++ disjuncts(r)
        case other    => Seq(other)
      }
      val eqs = disjuncts(o).map {
        case EqualTo(a: AttributeReference, l: Literal) if l.value != null => Some((a, l.value))
        case EqualTo(l: Literal, a: AttributeReference) if l.value != null => Some((a, l.value))
        case _ => None
      }
      val flat = eqs.flatten
      if (flat.length == eqs.length && flat.map(_._1.exprId).distinct.sizeIs == 1)
        Some(InSet(flat.head._1.name, flat.map(_._2).distinct))
      else None
    }
    // the GENERAL single-column disjunction (`a < 10 OR a > 40`,
    // `(a > 1 AND a < 5) OR a = 9`): every disjunct a conjunction of
    // understood atoms, every reference the SAME attribute — one AnyOf
    // atom compiled by range union (multi-interval parity with the
    // reference's ranges.py::NumericRange), so it never costs the AQP
    // plane a disjunction slot and the hint/stats planes estimate it
    def anyOfAtom(o: Or): Option[Atom] = {
      def disjuncts(x: Expression): Seq[Expression] = x match {
        case Or(l, r) => disjuncts(l) ++ disjuncts(r)
        case other    => Seq(other)
      }
      o.references.toSeq match {
        case Seq(one: AttributeReference) =>
          val alts = disjuncts(o).map(d => atomsOf(splitConj(d)))
          if (alts.forall(_.isDefined)) Some(AnyOf(one.name, alts.map(_.get)))
          else None
        case _ => None
      }
    }
    val converted = conjuncts.map {
      case Not(inner) => negated(inner)
      case o: Or => eqOrAtom(o).orElse(anyOfAtom(o))
      case EqualTo(a: AttributeReference, Literal(v, _)) => Some(Cmp(a.name, "eq", v))
      case EqualTo(Literal(v, _), a: AttributeReference) => Some(Cmp(a.name, "eq", v))
      case LessThan(a: AttributeReference, Literal(v, _)) => Some(Cmp(a.name, "lt", v))
      case LessThan(Literal(v, _), a: AttributeReference) => Some(Cmp(a.name, "gt", v))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => Some(Cmp(a.name, "le", v))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => Some(Cmp(a.name, "ge", v))
      case GreaterThan(a: AttributeReference, Literal(v, _)) => Some(Cmp(a.name, "gt", v))
      case GreaterThan(Literal(v, _), a: AttributeReference) => Some(Cmp(a.name, "lt", v))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => Some(Cmp(a.name, "ge", v))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => Some(Cmp(a.name, "le", v))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(InSet(a.name, vs.map(_.asInstanceOf[Literal].value)))
      case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, hset) =>
        Some(InSet(a.name, hset.toSeq))
      case IsNotNull(a: AttributeReference) => Some(NotNull(a.name))
      // string patterns: LikeSimplification rewrites single-wildcard LIKEs
      // to StartsWith/EndsWith/Contains before this rule runs; raw Like
      // survives for multi-wildcard AND escape-bearing patterns (default
      // escape only — a custom escape char would change the pattern's
      // meaning). validLikePattern mirrors Spark's own escape rule (escape
      // precedes only %, _ or \): likeRegex treats the escaped char as a
      // literal, and a pattern Spark itself would throw on falls back.
      case StartsWith(a: AttributeReference, Literal(v: UTF8String, _)) =>
        Some(StrMatch(a.name, "prefix", v.toString))
      case EndsWith(a: AttributeReference, Literal(v: UTF8String, _)) =>
        Some(StrMatch(a.name, "suffix", v.toString))
      case Contains(a: AttributeReference, Literal(v: UTF8String, _)) =>
        Some(StrMatch(a.name, "contains", v.toString))
      case Like(a: AttributeReference, Literal(v: UTF8String, _), '\\')
          if graft.rspn.SqlEstimate.validLikePattern(v.toString) =>
        Some(StrMatch(a.name, "like", v.toString))
      case _ => None
    }
    if (converted.forall(_.isDefined)) Some(converted.flatten) else None
  }
}

/** The optimizer rule. `estimateRows` is injected so the Catalyst surface
  * is unit-testable without a trained ensemble; production wiring goes
  * through [[GraftExtensions]] / [[SpnBroadcastRule.fromSession]].
  */
final case class SpnBroadcastRule(
    estimateRows: SpnCardinality.CardEstimator,
    thresholdBytes: Long,
    /** When set, only scans under this directory are estimated: the model
      * is calibrated to ONE dataset's row counts, and a same-named table
      * from another directory (e.g. a 100× larger SF) would inherit the
      * small dataset's estimate and broadcast something huge.
      */
    datasetDir: Option[String] = None,
    /** The PK–FK edges the join-cardinality path may recognize — injected
      * like the estimator so the rule serves any schema, defaulting to the
      * fixture graph.
      */
    fkEdges: Seq[graft.schema.Relationship] =
      graft.schema.SchemaGraph.testdata.relationships) extends Rule[LogicalPlan] {

  import SpnCardinality.{atomsOf, Atom, ScanShape}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j: Join =>
      val lh = if (canBuildLeft(j.joinType)) hinted(j.hint.leftHint, j.left) else j.hint.leftHint
      val rh = if (canBuildRight(j.joinType)) hinted(j.hint.rightHint, j.right) else j.hint.rightHint
      if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
      else j.copy(hint = JoinHint(lh, rh))
  }

  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _                         => false
  }
  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
    case _                                                                 => false
  }

  private def hinted(existing: Option[HintInfo], side: LogicalPlan): Option[HintInfo] =
    existing match {
      case Some(h) if h.strategy.isDefined => existing // never override a user hint
      case _ =>
        estimateBytes(side) match {
          case Some(bytes) if SpnBroadcastRule.fitsBudget(bytes, thresholdBytes) =>
            Some(existing.getOrElse(HintInfo()).copy(strategy = Some(BROADCAST)))
          case _ => existing
        }
    }

  private def estimateBytes(side: LogicalPlan): Option[Double] =
    estimateRowsOf(side)
      .map(_ * SpnBroadcastRule.rowBytes(side.output.map(_.dataType)))

  private def estimateRowsOf(p: LogicalPlan): Option[Double] = p match {
    case ScanShape(dir, table, conjuncts) if dirOk(dir) =>
      // unfiltered scans are skipped on purpose: static size-in-bytes stats
      // are already exact there; the model only adds selectivity knowledge
      atomsOf(conjuncts)
        .filter(_.exists(!_.isInstanceOf[SpnCardinality.NotNull]))
        .flatMap(atoms => estimateRows(Set(table), Map(table -> atoms)))
    case j: Join => joinEstimate(j)
    // a pure column selection above a join keeps the row count (ScanShape
    // already strips Projects over single scans)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      estimateRowsOf(child)
    case _ => None
  }

  /** A side that is itself a PK–FK inner join of two understood scans: the
    * reference's defining capability (JOB-light join cardinalities) applied
    * where static stats are at their WORST — join output sizes come from
    * naive containment assumptions, the model measured them. The join
    * condition must be exactly one declared FK equality (plus ignorable
    * NotNull-style conjuncts already handled per side); anything else is
    * left to the planner.
    */
  private def joinEstimate(j: Join): Option[Double] = {
    if (j.joinType != Inner) return None
    for {
      (lt, la) <- scanAtoms(j.left)
      (rt, ra) <- scanAtoms(j.right)
      cond <- j.condition
      if isDeclaredFkEquality(cond, lt, rt)
      est <- estimateRows(Set(lt, rt), Map(lt -> la, rt -> ra))
    } yield est
  }

  private def scanAtoms(p: LogicalPlan): Option[(String, Seq[Atom])] = p match {
    case ScanShape(dir, table, conjuncts) if dirOk(dir) =>
      atomsOf(conjuncts).map((table, _))
    case _ => None
  }

  private def isDeclaredFkEquality(cond: Expression, lt: String, rt: String): Boolean = {
    val eqs = SpnCardinality.splitConj(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) => Some((a.name, b.name))
      case _ => None
    }
    eqs.forall(_.isDefined) && (eqs.flatten match {
      case Seq((a, b)) =>
        fkEdges.exists(r =>
          (r.many == lt && r.fk == a && r.one == rt && r.pk == b) ||
            (r.many == lt && r.fk == b && r.one == rt && r.pk == a) ||
            (r.many == rt && r.fk == a && r.one == lt && r.pk == b) ||
            (r.many == rt && r.fk == b && r.one == lt && r.pk == a))
      case _ => false
    })
  }

  private def dirOk(dir: String): Boolean =
    datasetDir.forall(stripTrailing(_) == stripTrailing(dir))

  private def stripTrailing(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.getPath
}

object SpnBroadcastRule {

  /** Multiplicative safety margin on the learned estimate — the measured
    * factored-join q-error bound (AccuracySpec asserts median ≤ 2.5); a
    * side must look ≥4× under budget before the rule trusts the model with
    * an executor-memory decision.
    */
  val qErrorHeadroom = 4.0

  val defaultThresholdBytes: Long = 10L * 1024 * 1024

  /** THE broadcast decision — shared by the optimizer rule and the
    * DataFrame-layer op so the two surfaces cannot drift.
    */
  def fitsBudget(estBytes: Double, thresholdBytes: Long): Boolean =
    estBytes * qErrorHeadroom <= thresholdBytes

  /** Estimated serialized row width for a projected row shape. */
  def rowBytes(types: Seq[org.apache.spark.sql.types.DataType]): Double =
    types.map(_.defaultSize).sum + 20.0 // per-row overhead

  /** Conf-driven wrapper for extension injection: inert until
    * `spark.graft.spn.sfDir` is set on the session, so adding the extension
    * to a cluster config costs nothing for sessions that never opt in. A
    * malformed byte threshold degrades to the default — the rule's contract
    * is purely additive, so a bad knob must never fail the session's
    * queries.
    */
  def fromSession(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      session.conf.getOption("spark.graft.spn.sfDir") match {
        case None => plan
        case Some(sfDir) =>
          val threshold =
            session.conf.getOption("spark.graft.spn.broadcastBytes")
              .flatMap(v => Try(v.trim.toLong).toOption)
              .getOrElse(defaultThresholdBytes)
          SpnBroadcastRule(
            SpnCardinality.estimatorFor(session, sfDir), threshold,
            datasetDir = Some(sfDir),
            fkEdges = graft.schema.DatasetSpec.forDir(session, sfDir).graph.relationships)(plan)
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the builder-time
  * registration (`SparkSession.builder.withExtensions(new GraftExtensions)`
  * works too). Injects the learned-cardinality hint rule (operator
  * optimization), the learned-statistics rule (pre-CBO, so
  * `CostBasedJoinReorder` and build-side selection read model
  * cardinalities), and the `spn_count` SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(SpnBroadcastRule.fromSession)
    // transparent AQP first (rules run in injection order): a rewritten
    // aggregate has no scans left for the stats rule to annotate — running
    // stats first would spend its driver-side estimation on a subtree the
    // fold discards — and exact-fallback queries pass through untouched
    e.injectPreCBORule(SpnAqpRule.fromSession)
    e.injectPreCBORule(SpnStatsRule.fromSession)
    // r20: collapse ORDER BY over the folds' tiny LocalRelations at plan
    // time — removes a rangepartitioning Exchange (and its range-sampling
    // job) from every fold/diagnostics query; result rows and order are
    // identical (always-on: the rule is a no-op unless a small batch
    // LocalRelation sits directly under a global Sort). Injected preCBO
    // AFTER the AQP fold — as an operator-optimization rule it would run
    // BEFORE the fold creates the LocalRelation and miss the whole
    // transparent-AQP family; pre-existing LocalRelations (driver-built
    // toDF frames) are equally still present at preCBO time.
    e.injectPreCBORule(_ => FoldLocalSort)
    SpnFunctions.register(e)
  }
}

/** Driver-contract surface: the same learned-broadcast decision taken at
  * the DataFrame API layer (scoped to this one query — the session-global
  * rule is exercised in ExtensionSpec on an isolated `newSession`, where it
  * can't perturb other registered queries' plans mid-suite).
  */
object SpnPlanning {

  val ops: Seq[Op] = Seq(
    // Learned-cardinality broadcast: the join strategy for the filtered
    // side comes from the RSPN ensemble, not from file sizes. The filter
    // (totalprice < 2000 ∧ status 'F') keeps ~0.1% of orders; static stats
    // see the full table and would sort-merge at scale, the model sees the
    // selectivity and broadcasts — and because the estimate scales with the
    // modeled row count, the SAME code refuses the broadcast once the slice
    // outgrows the budget at a larger SF. Result is plan-invariant (the
    // oracle is the plain join), which is exactly why the decision is safe
    // to learn.
    Op(
      "join_spn_broadcast",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice < 2000 AND o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.functions.{count, lit, round, sum}
      val atoms = Seq(
        SpnCardinality.Cmp("o_totalprice", "lt", Double.box(2000.0)),
        SpnCardinality.Cmp("o_orderstatus", "eq", "F"))
      val ord = Tables(s, d, "orders")
        .filter(col("o_totalprice") < 2000 && col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderpriority")
      val est = SpnCardinality.estimate(Ensemble.get(s, d), "orders", atoms)
      // same decision function and row-width model as the optimizer rule
      val rowBytes = SpnBroadcastRule.rowBytes(ord.schema.fields.map(_.dataType).toSeq)
      val side = est match {
        case Some(rows) if SpnBroadcastRule.fitsBudget(rows * rowBytes,
          SpnBroadcastRule.defaultThresholdBytes) => broadcast(ord)
        case _ => ord
      }
      Tables(s, d, "lineitem").select("l_orderkey", "l_extendedprice")
        .join(side, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).cast("bigint").as("n"),
          round(sum(col("l_extendedprice").cast("decimal(18,6)")), 2)
            .cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // M13b in the correctness gate: the SAME learned numbers, injected as
    // `LogicalPlan` STATISTICS (SpnStatsRule via preCBO) with CBO join
    // reordering enabled, on an isolated child session (confs and stats
    // never leak to sibling queries). The written join order — (lineitem ⨝
    // filtered orders) ⨝ customer — is the worst one; the injected row
    // counts are what lets CostBasedJoinReorder move the tiny filtered
    // slice first. Result is plan-invariant, so the DuckDB oracle checks
    // the whole path end-to-end.
    Op(
      "join_spn_stats",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice < 2000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.functions.{count, lit, round, sum}
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.spn.statsInjection", "true")
      s2.conf.set("spark.sql.cbo.enabled", "true")
      s2.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val li = s2.read.parquet(s"$d/lineitem.parquet").select("l_orderkey", "l_quantity")
      val ord = s2.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") < 2000)
        .select("o_orderkey", "o_custkey")
      val cust = s2.read.parquet(s"$d/customer.parquet").select("c_custkey", "c_mktsegment")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).cast("bigint").as("n"),
          round(sum(col("l_quantity").cast("decimal(18,6)")), 2)
            .cast("double").as("sum_qty"))
        .orderBy("c_mktsegment")
    },

    // Transparent AQP (plans/SpnAqp.scala): the SAME SQL text a user would
    // run exactly, answered from the model with zero scans once the session
    // opts in. No oracle — the result is an estimate by design; SpnAqpSpec
    // gates q-error against the exact answers and pins the zero-scan plan
    // shape. (Under Verify the shared session may have cached these tables:
    // a cached BARE table folds through the cache — StrictScan proves the
    // cached plan is the unfiltered scan — while a cached FILTERED view
    // makes the rewrite fall back to exact execution; either way the
    // surface contract is rows>0 here, accuracy is the spec's job.)
    Op.noOracle("aqp_transparent") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      Seq("lineitem", "orders").foreach(t =>
        s2.read.parquet(s"$d/$t.parquet").createOrReplaceTempView(t))
      s2.sql(
        """SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS avg_price
          |FROM lineitem WHERE l_quantity < 24
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // Round 10: the transparent fold over the analyzer's Expand shape —
    // plain GROUP BY ROLLUP SQL answered per grouping set from the model
    // (SpnAqpSpec pins zero-scan + q-error + the SQL null convention and
    // cross-checks CUBE row counts; here the surface contract is rows>0
    // through the Verify gate). The WHERE carries a LIKE so the
    // dictionary-closure atom path rides the same gate.
    Op.noOracle("aqp_transparent_rollup") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS q
          |FROM lineitem WHERE l_quantity < 30 AND l_returnflag LIKE '%A%'
          |GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    // Round 11: the pushed-down HAVING shapes over a ROLLUP — the gid-only
    // conjunct (drop the total row) AND an atom over a grouping attribute
    // — folded per grouping set (SpnAqpSpec pins zero-scan + exact-plane
    // key agreement; the Verify gate's contract here is rows>0).
    Op.noOracle("aqp_transparent_having") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem WHERE l_quantity < 30
          |GROUP BY ROLLUP(l_returnflag, l_linestatus)
          |HAVING GROUPING(l_returnflag) = 0 AND l_returnflag = 'A'
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    },

    // Round 11 late widenings, conjunctive composition: per-aggregate
    // FILTER clauses (the conditional-count idiom) plus dictionary MIN/MAX
    // — all folding zero-scan on the plain path (SpnAqpSpec pins each
    // against the exact plane; the Verify contract here is rows>0).
    Op.noOracle("aqp_transparent_filter") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_linestatus, count(*) AS n,
          |       count(*) FILTER (WHERE l_returnflag = 'A') AS n_a,
          |       sum(l_extendedprice) FILTER (WHERE l_discount < 0.05) AS rev_lo_disc,
          |       min(l_returnflag) AS first_flag,
          |       max(l_returnflag) AS last_flag
          |FROM lineitem WHERE l_quantity < 30
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    },

    // Round 18: an n-branch disjunction of CONJUNCTIONS — the TPC-H Q19
    // predicate shape, (A1∧A2) OR (B1∧B2) OR (C1∧C2) — answered through
    // one group's full inclusion–exclusion (7 signed terms for three
    // branches) under the Π(2^k−1) ≤ 27 cap, grouped, zero scans
    // (SpnAqpSpec pins scalar/grouped/cap-fallback against the exact
    // plane; rows>0 is the Verify contract here).
    Op.noOracle("aqp_transparent_or_branches") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_linestatus, count(*) AS n, sum(l_extendedprice) AS rev
          |FROM lineitem
          |WHERE (l_quantity < 10 AND l_returnflag = 'A'
          |    OR l_quantity > 40 AND l_returnflag = 'N'
          |    OR l_discount > 0.08 AND l_tax < 0.03)
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    },

    // Round 11 late widenings, disjunctive composition: a numeric !=
    // (disjoint-range rewrite — one OR slot) stacked with two explicit
    // disjunctions = the full three-slot 27-term signed expansion,
    // grouped, with a FILTER clause distributing into every signed term.
    Op.noOracle("aqp_transparent_or3") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_linestatus, count(*) AS n, sum(l_extendedprice) AS rev,
          |       count(*) FILTER (WHERE l_returnflag = 'A') AS n_a
          |FROM lineitem
          |WHERE l_quantity != 24
          |  AND (l_quantity < 10 OR l_quantity > 40)
          |  AND (l_discount < 0.03 OR l_discount > 0.07)
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    },

    // Round 11 late, widened round 13 to the MIXED calendar × dimension
    // shape: GROUP BY year(date), dimcol answered as calendar-year range
    // buckets × per-bucket dictionary enumeration off the model's realized
    // domain (zero scans; SpnAqpSpec pins year/month/quarter/week/day and
    // the mixed shape against the exact plane; rows>0 is the Verify
    // contract here).
    Op.noOracle("aqp_transparent_timeseries") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders")
      s2.sql(
        """SELECT year(o_orderdate) AS y, o_orderpriority, count(*) AS n,
          |       sum(o_totalprice) AS rev
          |FROM orders WHERE o_totalprice < 150000
          |GROUP BY year(o_orderdate), o_orderpriority
          |ORDER BY y, o_orderpriority""".stripMargin)
    },

    // Round 13: the corpus-quality dashboard answered from the model — the
    // documents table is modeled (n_chars num, lang/source cat) like any
    // TPC-H slice, so the LLM-pipeline monitoring queries ("docs per
    // language/source", "avg length") fold zero-scan (SpnAqpSpec pins them
    // against the exact plane; rows>0 is the Verify contract here).
    Op.noOracle("aqp_transparent_corpus") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/documents.parquet").createOrReplaceTempView("documents")
      s2.sql(
        """SELECT lang, source, count(*) AS n, avg(n_chars) AS avg_chars
          |FROM documents WHERE n_chars > 100
          |GROUP BY lang, source ORDER BY lang, source""".stripMargin)
    },

    // Round 14: the seasonal matrix — TWO calendar grouping expressions
    // composed as a bucket cross product (each (year, month) key pair's
    // predicate is the meet of the year range and the cyclic month
    // multi-interval), still zero-scan (SpnAqpSpec pins same-column,
    // cross-column and cap-fallback shapes against the exact plane;
    // rows>0 is the Verify contract here).
    // Round 14: the histogram dashboard — GROUP BY a modeled NUMERIC
    // column answered as one point-pinned estimation per realized value
    // (the NumericLeaf support enumeration; SpnAqpSpec pins scalar, mixed
    // numeric × dimension, join, and cap/OR fallback shapes against the
    // exact plane; rows>0 is the Verify contract here).
    Op.noOracle("aqp_transparent_histogram") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT l_quantity, count(*) AS n, avg(l_extendedprice) AS avg_price
          |FROM lineitem WHERE l_returnflag = 'A'
          |GROUP BY l_quantity ORDER BY l_quantity""".stripMargin)
    },

    Op.noOracle("aqp_transparent_seasonal") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders")
      s2.sql(
        """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
          |       count(*) AS n, sum(o_totalprice) AS rev
          |FROM orders WHERE o_totalprice < 150000
          |GROUP BY year(o_orderdate), month(o_orderdate)
          |ORDER BY y, m""".stripMargin)
    },

    // Round 15: the dashboard SLICER shape — a cross-column disjunction
    // under a calendar × dimension grouping, folded zero-scan: each
    // bucket's range conjunct distributes into both OR branches through
    // the shape dispatch and answers via per-bucket inclusion-exclusion
    // (SpnAqpSpec pins single-/two-OR × {year, year×quarter, histogram}
    // against the exact plane; rows>0 is the Verify contract here).
    Op.noOracle("aqp_transparent_or_dashboard") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders")
      s2.sql(
        """SELECT year(o_orderdate) AS y, o_orderpriority, count(*) AS n
          |FROM orders WHERE o_orderstatus = 'F' OR o_totalprice < 50000
          |GROUP BY year(o_orderdate), o_orderpriority
          |ORDER BY y, o_orderpriority""".stripMargin)
    },

    // Round 15: numeric dimension columns ride the calendar fold — the
    // num-modeled column expands the bucket tuples by its realized-value
    // support (kind dispatch instead of the dictionary-only gate;
    // SpnAqpSpec pins calendar × numeric, calendar × numeric × dict and
    // the two-numeric-key cross against the exact plane).
    Op.noOracle("aqp_transparent_numdim") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT year(l_shipdate) AS y, l_quantity, count(*) AS n,
          |       sum(l_extendedprice) AS rev
          |FROM lineitem WHERE l_quantity < 10
          |GROUP BY year(l_shipdate), l_quantity
          |ORDER BY y, l_quantity""".stripMargin)
    },

    // Round 16: BINNED numeric GROUP BY folds — `floor(x/w)` (and
    // width_bucket / round(x,-k)) over a NEAR-CONTINUOUS num-modeled
    // column, the histogram-with-bins dashboard shape the realized-value
    // enumeration honestly refuses at its support caps (l_extendedprice
    // has ~60k realized values at sf0.01; floor(x/1000) is ~105 half-open
    // range buckets, each one NumericLeaf range estimation — zero scans,
    // no enumeration). SpnAqpSpec pins floor/width_bucket/round, the
    // calendar × bin cross product, dict/num dimension and OR composition,
    // and the cap/positive-scale/unmodeled fallbacks against the exact
    // plane; rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_binned") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT floor(l_extendedprice/1000) AS bin, count(*) AS n,
          |       avg(l_extendedprice) AS ax
          |FROM lineitem WHERE l_quantity < 24
          |GROUP BY floor(l_extendedprice/1000)
          |ORDER BY bin""".stripMargin)
    },

    // Round 16: SUB-DAY calendar folding — events.ts models at SECOND
    // granularity ("secs" kind), so `date_trunc('hour', ts)` folds as
    // step-aligned half-open epoch-second intervals, opening the
    // tumbling-dashboard AQP class over the stream table (the reference's
    // prep-time date ordinal encoding is granularity-agnostic —
    // data_preparation/prepare_single_tables.py; this is the finer-than-
    // day instantiation). SpnAqpSpec pins hourly/minute/daily folds, the
    // hour × dimension composition, and the cap/kind-mismatch fallbacks
    // against the exact plane; rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_hourly") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/events.parquet").createOrReplaceTempView("events")
      s2.sql(
        """SELECT date_trunc('hour', ts) AS h, count(*) AS n, avg(value) AS av
          |FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
          |GROUP BY date_trunc('hour', ts)
          |ORDER BY h""".stripMargin)
    },

    // Round 16 late: the DAILY-CYCLE dashboard — `GROUP BY hour(ts)` over
    // the secs-modeled stream table folds as cyclic hour-of-day buckets
    // (key k = the union of its hour slice in every domain day, one
    // multi-interval range atom per key; minute(ts) and dayofmonth(d)
    // fold through the same builders). SpnAqpSpec pins hour/minute/
    // dayofmonth and the kind-mismatch fallback against the exact plane;
    // rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_hourofday") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/events.parquet").createOrReplaceTempView("events")
      s2.sql(
        """SELECT hour(ts) AS h, event_type, count(*) AS n
          |FROM events GROUP BY hour(ts), event_type
          |ORDER BY h, event_type""".stripMargin)
    },

    // Round 16 late: COMPOSED bucket keys — a deterministic scalar
    // expression OVER one foldable bucket expression evaluates per bucket
    // key driver-side (`floor(x/w)*w`, the bin-lo spelling every BI tool
    // emits; equal evaluated keys MERGE their buckets, so non-injective
    // outers stay correct). SpnAqpSpec pins bin-lo/cast-to-string/boolean-
    // merge/year+1 and the two-column/two-subexpression fallbacks against
    // the exact plane; rows>0 is the Verify contract here.
    // Round 16 late: SLIDING windows — `GROUP BY window(ts, size, slide)`
    // lowers to an Expand (one candidate struct per overlap, plus a
    // containment Filter when size % slide != 0); rewriteSliding verifies
    // the lowering numerically and folds overlapping [start, start+size)
    // range buckets through the calendar pipeline. SpnAqpSpec pins
    // divisible/non-divisible/dim-composed folds and the >400-bucket
    // fallback against the exact plane; rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_sliding") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/events.parquet").createOrReplaceTempView("events")
      s2.sql(
        """SELECT w.start AS ws, w.end AS we, n, av FROM (
          |  SELECT window(ts, '2 hours', '1 hour') AS w, count(*) AS n,
          |         avg(value) AS av
          |  FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
          |  GROUP BY window(ts, '2 hours', '1 hour')
          |) ORDER BY ws""".stripMargin)
    },

    // Round 16 late: `GROUP BY date_format(d, 'yyyy-MM')` — the
    // string-keyed dashboard spelling folds as daily buckets evaluated
    // through the expression's own eval and MERGED on equal keys (exact
    // Spark formatter semantics; sub-day/zone pattern letters fall back).
    // SpnAqpSpec pins daily/month/weekday merges and both fallbacks
    // against the exact plane; rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_dateformat") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/orders.parquet").createOrReplaceTempView("orders")
      s2.sql(
        """SELECT date_format(o_orderdate, 'yyyy-MM') AS m, count(*) AS n,
          |       avg(o_totalprice) AS ap
          |FROM orders
          |WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
          |GROUP BY date_format(o_orderdate, 'yyyy-MM')
          |ORDER BY m""".stripMargin)
    },

    Op.noOracle("aqp_transparent_binexpr") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/lineitem.parquet").createOrReplaceTempView("lineitem")
      s2.sql(
        """SELECT floor(l_extendedprice/1000)*1000 AS bin_lo, count(*) AS n,
          |       avg(l_extendedprice) AS ax
          |FROM lineitem WHERE l_quantity < 24
          |GROUP BY floor(l_extendedprice/1000)*1000
          |ORDER BY bin_lo""".stripMargin)
    },

    // Round 17: the FULL 30-day hourly dashboard — 720 buckets, one range
    // probe each, folded whole under the pure-interval cap (the r16 cap
    // forced a predicate-narrowed span). SpnAqpSpec pins fold + exactness;
    // rows>0 is the Verify contract here.
    Op.noOracle("aqp_transparent_hourly_month") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/events.parquet").createOrReplaceTempView("events")
      s2.sql(
        """SELECT date_trunc('hour', ts) AS h, count(*) AS n, avg(value) AS av
          |FROM events GROUP BY date_trunc('hour', ts)
          |ORDER BY h""".stripMargin)
    },

    // Round 17: SUB-DAY date_format — the hourly STRING-KEY dashboard
    // spelling ('yyyy-MM-dd HH') folds as hour-step buckets evaluated
    // through Spark's own formatter, merged on equal keys, over the
    // secs-modeled stream column. SpnAqpSpec pins fold/exactness and the
    // second-granular + days-column fallbacks.
    Op.noOracle("aqp_transparent_subday_fmt") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/events.parquet").createOrReplaceTempView("events")
      s2.sql(
        """SELECT date_format(ts, 'yyyy-MM-dd HH') AS h, count(*) AS n
          |FROM events WHERE ts < TIMESTAMP'2024-01-15 00:00:00'
          |GROUP BY date_format(ts, 'yyyy-MM-dd HH')
          |ORDER BY h""".stripMargin)
    }
  )
}
