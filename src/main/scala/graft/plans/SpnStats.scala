package graft.plans

import graft.rspn.Ensemble
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
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
    datasetDir: Option[String] = None) extends Rule[LogicalPlan] {

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

  private def annotate(rel: LogicalRelation, table: String, rows: Double): LogicalRelation = {
    val r = math.max(rows, 0.0)
    val rowCount = BigInt(math.max(0L, math.round(r)))
    // byte estimate from the PROJECTED width — stats consumers compare this
    // against broadcast budgets for the columns the plan actually moves
    val bytes = BigInt(math.max(1L,
      math.round(r * SpnBroadcastRule.rowBytes(rel.output.map(_.dataType)))))
    val colStats = rel.output.flatMap { a =>
      keyNdv(table, a.name).map { ndv =>
        // a filter can only shrink ndv; keys are near-unique per declared
        // edge so capping at the (possibly filtered) row count keeps the
        // join formula |L||R|/max(ndv) from underestimating the divisor
        val d = BigInt(math.max(1L, math.round(math.min(ndv, math.max(r, 1.0)))))
        a.name -> CatalogColumnStat(distinctCount = Some(d), nullCount = Some(BigInt(0)))
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
            datasetDir = Some(sfDir))(plan)
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
