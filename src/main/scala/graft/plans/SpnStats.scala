package graft.plans

import graft.rspn.Ensemble
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StructField, StructType}

import scala.util.Try

/** Learned cardinalities injected into `LogicalPlan` STATISTICS — the step
  * beyond [[SpnBroadcastRule]]'s additive hints. The reference exists to
  * replace a DBMS's cardinality estimator wholesale (deepdb-public:
  * maqp.py --evaluate_cardinalities feeds RSPN estimates to the optimizer's
  * cost model); in Spark the cost model reads `plan.stats`, so the faithful
  * re-expression is a rule that rewrites what the scans REPORT, letting
  * every stats consumer — CBO join reordering, build-side selection, AQE's
  * initial plan — act on learned numbers with zero further integration.
  *
  * Mechanism: registered via `injectPreCBORule`, the extension point that
  * runs after operator optimization (filters are already pushed onto the
  * scans) and immediately before `CostBasedJoinReorder`. Each parquet
  * [[LogicalRelation]] of a modeled table gets a synthetic [[CatalogTable]]
  * carrying [[CatalogStatistics]]:
  *
  *   - row count: the model's calibrated table cardinality (`scaleRows`) —
  *     raw parquet scans otherwise have NO row count at all, which alone
  *     disqualifies them from `CostBasedJoinReorder` (it requires
  *     `rowCount` on every join item);
  *   - for a scan directly under a fully-understood `Filter`, the RSPN
  *     ensemble's FILTERED row estimate (Catalyst's own
  *     `FilterEstimation` has no column histograms on raw parquet, so it
  *     would multiply by selectivity 1.0 — annotating the scan with the
  *     post-filter count makes the whole Filter∘Scan item report the
  *     learned cardinality);
  *   - distinct counts for declared PK/FK key columns (PK ndv = table
  *     rows; FK ndv = referenced table's rows, capped by own rows), which
  *     upgrades `JoinEstimation` from cartesian fallbacks to the standard
  *     `|L||R| / max(ndv)` form over the learned inputs.
  *
  * Scope guards: only relations under the trained dataset's directory
  * (same gate as the hint rule — a model is calibrated to ONE dataset),
  * only relations with no pre-existing `catalogTable` (a real catalog
  * table already has user-owned stats this rule must not overwrite), and
  * only when `spark.graft.spn.statsInjection=true` — stats shift plans for
  * every query in the session, so the switch is explicit opt-in on top of
  * the sfDir knob, exactly like the reference's explicit cardinality mode.
  *
  * At 100 TB this is the difference between a join order chosen from file
  * sizes (which know nothing of a 0.01%-selective predicate) and one
  * chosen from modeled selectivities; the estimates scale with the model's
  * calibrated `scaleRows`, not with the sample it was trained on.
  */
final case class SpnStatsRule(
    estimateRows: SpnCardinality.CardEstimator,
    /** full-table modeled row count, None for unmodeled tables */
    tableRows: String => Option[Double],
    /** (table, column) → distinct count for declared key columns */
    keyNdv: (String, String) => Option[Double],
    /** same dataset gate as [[SpnBroadcastRule]] */
    datasetDir: Option[String] = None,
    /** join-subtree calibration switch — production keeps it on; tests
      * build a scan-stats-only control rule to isolate its effect */
    joinStats: Boolean = true,
    /** is (table, column) a modeled column — such columns get NO default
      * key colStat (see annotate: its synthetic min/max would let
      * FilterEstimation re-apply a selectivity the learned post-filter
      * row count already contains) */
    modeledCol: (String, String) => Boolean = (_, _) => false) extends Rule[LogicalPlan] {

  import SpnCardinality.{atomsOf, splitConj}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // bare modeled scan → calibrated full-table stats. transformUp reaches
    // these before their parents, so the Filter case below re-annotates the
    // child it wraps with the sharper filtered estimate.
    case rel: LogicalRelation if eligible(rel) =>
      tableNameOf(rel).flatMap(t => tableRows(t).map(annotate(rel, t, _)))
        .getOrElse(rel)
    case f @ Filter(cond, rel: LogicalRelation) if eligibleOrAnnotated(rel) =>
      refine(cond, rel).map(Filter(cond, _)).getOrElse(f)
    // column pruning sometimes leaves a pure projection between the filter
    // and the scan — transparent for row counts
    case f @ Filter(cond, p @ Project(projList, rel: LogicalRelation))
        if projList.forall(_.isInstanceOf[AttributeReference]) && eligibleOrAnnotated(rel) =>
      refine(cond, rel).map(r => Filter(cond, p.copy(child = r))).getOrElse(f)
    // inner-equi-join subtree over modeled scans → the ensemble's OWN join
    // estimate (join SPN / factored), not |L||R|/max(key ndv) over the
    // injected inputs: the scan-side key ndvs are CALIBRATED per join edge
    // so Catalyst's own JoinEstimation formula reproduces the model number
    // exactly — every stats consumer (build-side choice, CostBasedJoinReorder
    // costing intermediate joins) then runs on join-aware cardinalities.
    case j: Join if joinStats => calibrateJoin(j).getOrElse(j)
  }

  import SpnStatsRule.Sub

  /** Walk an Inner-equi-join subtree whose leaves are (Project/Filter
    * wrapped) modeled scans; compute the model estimate of EVERY nested
    * join bottom-up and set each join edge's key-column ndv on BOTH leaf
    * scans to round(|L|·|R| / J_model) — the unique divisor that makes
    * `ceil(|L|·|R| / max(ndv))` equal the model's join cardinality. Any
    * unrecognized shape, self-join, non-equi conjunct, or estimator miss
    * bails to None (stats are advice, never an error). transformUp visits
    * inner joins first; the outermost visit recomputes the full subtree —
    * same inputs, same divisors — so re-annotation is idempotent.
    */
  private def calibrateJoin(j: Join): Option[LogicalPlan] = {
    val leaves = scala.collection.mutable.ArrayBuffer
      .empty[(LogicalRelation, String, Double)]
    val overrides = scala.collection.mutable.Map.empty[(Int, String), Double]

    def leafOf(p: LogicalPlan): Option[Sub] = {
      def scan(q: LogicalPlan, conj: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
        q match {
          case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => scan(c, conj)
          case Filter(cond, c) => scan(c, conj ++ splitConj(cond))
          case rel: LogicalRelation if eligibleOrAnnotated(rel) => Some((rel, conj))
          case _ => None
        }
      for {
        (rel, conj) <- scan(p, Nil)
        t <- tableNameOf(rel)
        atoms <- atomsOf(conj)
        rows <- if (atoms.exists(!_.isInstanceOf[SpnCardinality.NotNull]))
          estimateRows(Set(t), Map(t -> atoms))
        else tableRows(t)
      } yield {
        val idx = leaves.length
        leaves += ((rel, t, rows))
        Sub(Set(t), if (atoms.nonEmpty) Map(t -> atoms) else Map.empty, rows,
          rel.output.map(_.exprId -> idx).toMap)
      }
    }

    def keyPairs(cond: Expression, a: Sub, b: Sub): Option[Seq[((Int, String), (Int, String))]] = {
      val pairs = splitConj(cond).map {
        case EqualTo(x: AttributeReference, y: AttributeReference) =>
          (a.attrLeaf.get(x.exprId), b.attrLeaf.get(y.exprId)) match {
            case (Some(li), Some(ri)) => Some(((li, x.name), (ri, y.name)))
            case _ =>
              (a.attrLeaf.get(y.exprId), b.attrLeaf.get(x.exprId)) match {
                case (Some(li), Some(ri)) => Some(((li, y.name), (ri, x.name)))
                case _ => None
              }
          }
        case _ => None
      }
      if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.flatten) else None
    }

    def walk(p: LogicalPlan): Option[Sub] = p match {
      // column pruning interposes pure projections between nested joins
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) => walk(c)
      case Join(l, r, Inner, Some(cond), _) =>
        for {
          a <- walk(l)
          b <- walk(r)
          // a self-join would merge both sides' atoms under one table name
          if (a.tables & b.tables).isEmpty
          pairs <- keyPairs(cond, a, b)
          tables = a.tables ++ b.tables
          atoms = a.atoms ++ b.atoms
          rows <- estimateRows(tables, atoms)
        } yield {
          // min over key pairs in JoinEstimation: give every pair the same
          // divisor, so each reproduces J and the min is J
          val d = math.max(1L, math.round(a.rows * b.rows / math.max(rows, 0.5))).toDouble
          pairs.foreach { case ((li, lc), (ri, rc)) =>
            overrides((li, lc)) = d
            overrides((ri, rc)) = d
          }
          Sub(tables, atoms, math.max(rows, 0.0), a.attrLeaf ++ b.attrLeaf)
        }
      case other => leafOf(other)
    }

    walk(j).map { _ =>
      j.transformUp {
        case rel: LogicalRelation =>
          leaves.indexWhere(_._1 eq rel) match {
            case -1 => rel
            case i =>
              val (_, t, rows) = leaves(i)
              val extra = overrides.collect { case ((li, c), d) if li == i => c -> d }.toMap
              annotate(rel, t, rows, extra)
          }
      }
    }
  }

  /** The scan under `cond`, re-annotated with the learned POST-FILTER
    * estimate when every conjunct is understood; None otherwise (the bare
    * full-count annotation then stands).
    */
  private def refine(cond: Expression, rel: LogicalRelation): Option[LogicalRelation] =
    for {
      t <- tableNameOf(rel)
      atoms <- atomsOf(splitConj(cond))
      if atoms.exists(!_.isInstanceOf[SpnCardinality.NotNull])
      est <- estimateRows(Set(t), Map(t -> atoms))
    } yield annotate(rel, t, est)

  /** Marker identifier so the Filter case can tell "annotated by this rule"
    * from "a genuine catalog table" (which must never be overwritten).
    */
  private def synthetic(table: String) = TableIdentifier(table, Some("graft_spn_stats"))

  private def eligible(rel: LogicalRelation): Boolean =
    rel.catalogTable.isEmpty && dirOk(rel)

  private def eligibleOrAnnotated(rel: LogicalRelation): Boolean =
    dirOk(rel) && (rel.catalogTable match {
      case None     => true
      case Some(ct) => ct.identifier.database.contains("graft_spn_stats")
    })

  private def dirOk(rel: LogicalRelation): Boolean =
    SpnCardinality.tableOf(rel).exists { case (dir, _) =>
      datasetDir.forall(d => normalize(d) == normalize(dir))
    }

  private def tableNameOf(rel: LogicalRelation): Option[String] =
    SpnCardinality.tableOf(rel).map(_._2)

  private def normalize(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.getPath

  private def annotate(rel: LogicalRelation, table: String, rows: Double,
      ndvOverride: Map[String, Double] = Map.empty): LogicalRelation = {
    val r = math.max(rows, 0.0)
    val rowCount = BigInt(math.max(0L, math.round(r)))
    // byte estimate from the PROJECTED width — stats consumers compare this
    // against broadcast budgets for the columns the plan actually moves
    val bytes = BigInt(math.max(1L,
      math.round(r * SpnBroadcastRule.rowBytes(rel.output.map(_.dataType)))))
    val colStats = rel.output.flatMap { a =>
      // calibrated join-edge divisors are EXACT by construction and must
      // not be capped at the row count — |L||R|/d is the point.
      // A column that is BOTH a declared key and a modeled column gets no
      // default key stat: the synthetic min/max below would feed
      // FilterEstimation and re-apply a selectivity the learned
      // post-filter row count already contains (double counting toward
      // ~0 cardinalities); join-edge overrides stay — their joins are
      // freshly estimated under the formula they calibrate.
      ndvOverride.get(a.name).orElse(
        keyNdv(table, a.name).filterNot(_ => modeledCol(table, a.name)).map { ndv =>
          // a filter can only shrink ndv; keys are near-unique per declared
          // edge so capping at the (possibly filtered) row count keeps the
          // join formula |L||R|/max(ndv) from underestimating the divisor
          math.min(ndv, math.max(r, 1.0))
        }).map { ndv =>
        val d = BigInt(math.max(1L, math.round(ndv)))
        // JoinEstimation ZEROES any equi-join whose key intervals don't
        // intersect, and a missing min/max reads as disjoint — declared
        // PK/FK domains overlap by construction, so integral keys carry one
        // shared synthetic interval whose only job is to mark that overlap
        // (identical on every annotated key, so any range-proportional
        // logic sees factor 1)
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val (mn, mx) = a.dataType match {
          case LongType    => (Some("0"), Some(Long.MaxValue.toString))
          case IntegerType => (Some("0"), Some(Int.MaxValue.toString))
          case ShortType   => (Some("0"), Some(Short.MaxValue.toString))
          case ByteType    => (Some("0"), Some(Byte.MaxValue.toString))
          case _           => (None, None)
        }
        a.name -> CatalogColumnStat(distinctCount = Some(d), nullCount = Some(BigInt(0)),
          min = mn, max = mx)
      }
    }.toMap
    val ct = CatalogTable(
      identifier = synthetic(table),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = StructType(rel.output.map(a => StructField(a.name, a.dataType, a.nullable))),
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(bytes, Some(rowCount), colStats)))
    rel.copy(catalogTable = Some(ct))
  }
}

object SpnStatsRule {

  /** Model estimate + calibration bookkeeping for one join subtree node. */
  private[plans] final case class Sub(
      tables: Set[String],
      atoms: Map[String, Seq[SpnCardinality.Atom]],
      rows: Double,
      attrLeaf: Map[ExprId, Int])

  /** Conf-driven wrapper mirroring [[SpnBroadcastRule.fromSession]]: inert
    * unless BOTH `spark.graft.spn.sfDir` and
    * `spark.graft.spn.statsInjection=true` are set. Estimation failures
    * degrade to no annotation — stats are advice, never a query error.
    */
  def fromSession(session: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val on = session.conf.getOption("spark.graft.spn.statsInjection").contains("true")
      session.conf.getOption("spark.graft.spn.sfDir") match {
        case Some(sfDir) if on =>
          SpnStatsRule(
            SpnCardinality.estimatorFor(session, sfDir),
            tableRowsFor(session, sfDir),
            keyNdvFor(session, sfDir),
            datasetDir = Some(sfDir),
            // join-subtree calibration rides the same opt-in; the extra
            // knob exists to isolate scan-level stats (tests, debugging)
            joinStats =
              !session.conf.getOption("spark.graft.spn.joinStats").contains("false"),
            modeledCol = { (t, c) =>
              graft.schema.DatasetSpec.forDir(session, sfDir)
                .modeled.getOrElse(t, Seq.empty).exists(_._1 == c)
            })(plan)
        case _ => plan
      }
    }
  }

  /** Calibrated full-table row count from the table's own single-table SPN. */
  def tableRowsFor(spark: SparkSession, sfDir: String): String => Option[Double] =
    table => Try(Ensemble.get(spark, sfDir)).toOption
      .flatMap(_.get(table).map(_.scaleRows))

  /** Declared-key distinct counts from the schema graph + modeled counts:
    * single-column PKs are unique (ndv = rows); FKs take the referenced
    * table's cardinality (each parent key appears, capped by own rows).
    */
  def keyNdvFor(spark: SparkSession, sfDir: String): (String, String) => Option[Double] = {
    val graph = graft.schema.DatasetSpec.forDir(spark, sfDir).graph
    (table, column) => {
      def rows(t: String): Option[Double] = tableRowsFor(spark, sfDir)(t)
      val pk = graph.tables.find(_.name == table)
        .filter(t => t.primaryKey == Seq(column)).flatMap(_ => rows(table))
      pk.orElse {
        graph.relationships.find(r => r.many == table && r.fk == column)
          .flatMap(r => rows(r.one).flatMap(p => rows(table).map(math.min(p, _))))
      }
    }
  }
}
