package graft.rspn

import SqlParser._

/** Compile a ParsedQuery to model-plane estimates — the reference's
  * maqp.py --evaluate_aqp_queries path: SQL text → Query → SPN inference,
  * no data touched. GROUP BY enumerates the group columns' model support and
  * estimates each combination (aqp_spn/group_by_combination.py), pruning
  * zero-probability groups. A parenthesized OR compiles to
  * inclusion–exclusion (estCountOr); SUM(a*b) to the product-feature
  * expectation (estSumProduct).
  */
object SqlEstimate {

  sealed trait SqlResult
  final case class Scalar(est: Ensemble.Estimate) extends SqlResult
  /** One row per group combination; single-column GROUP BY yields
    * one-element keys.
    */
  final case class Groups(rows: Seq[(Seq[String], Ensemble.Estimate)]) extends SqlResult
  /** ROLLUP/CUBE result: one row per grouping-set combination; None marks a
    * column absent from the row's set (the SQL NULL convention).
    */
  final case class GroupSets(rows: Seq[(Seq[Option[String]], Ensemble.Estimate)]) extends SqlResult

  /** SESSION CONTRACT (r19, ADVICE r18): the calendar/date_format bucket
    * generators render keys and validate zone alignment against
    * `SQLConf.get` — the CALLING THREAD's active session (or the JVM
    * default zone when none is active). The estimator takes an Ensemble,
    * not a SparkSession, so callers MUST invoke it on a thread whose
    * active session is the one whose exact plane they will compare
    * against (every repo surface — QErrorEval, SqlExact parity, the
    * Catalyst rule — already runs this way; all pin a UTC session). A
    * zone-sensitive caller juggling multiple sessions on one thread must
    * `SparkSession.setActiveSession` first.
    */
  def estimate(
      spns: Map[String, Ensemble.TrainedSpn], sql: String,
      spec: graft.schema.DatasetSpec = graft.schema.DatasetSpec.testdata): SqlResult = {
    val q = SqlParser.parseQuery(sql, spec)
    post(q, estimateCore(spns, q, spec))
  }

  /** HAVING / ORDER BY / LIMIT on the estimate plane: applied to the
    * estimated group rows (the reference's parse ignores ordering outright;
    * honoring it costs nothing since group results are driver-sized).
    * HAVING filters on the SELECT aggregate's estimate — a different HAVING
    * aggregate has no estimated value to compare, so it fails loudly.
    * Calendar-grouped rows carry `q.calGroup.length` LEADING calendar
    * keys, so a dimension column's key index offsets by that length and
    * the total-order padding spans the calendar positions too (r15 —
    * previously `ORDER BY dim` under a calendar grouping sorted by the
    * calendar bucket instead).
    */
  private[graft] def post(q: ParsedQuery, res: SqlResult): SqlResult = res match {
    case Groups(rows0) =>
      var rows = rows0
      val calLen = q.calGroup.length
      q.having.foreach { h =>
        if (h.agg != q.agg) throw new IllegalArgumentException(
          "unsupported SQL: estimate-plane HAVING must use the SELECT aggregate")
        rows = rows.filter(r => cmpD(r._2.value, h.op, h.value))
      }
      // per-key ordering matching the exact plane's NATIVE column order:
      // when every enumerated group value parses as a number the column is
      // a numeric categorical and must sort numerically ("10" after "2"),
      // else lexicographically — otherwise the same SQL LIMIT-cuts
      // different groups on the two planes
      def keyOrd(i: Int): Ordering[String] =
        if (rows.forall(r => r._1(i).toDoubleOption.isDefined))
          Ordering.by[String, Double](_.toDouble)
        else Ordering.String
      if (q.orderBy.nonEmpty) {
        // the exact plane appends the remaining group columns ascending so
        // a LIMIT cut is a total order (SURVEY §7.4); applied FIRST = least
        // significant under the stable user-key sorts below. Every key
        // position — calendar keys included — participates.
        val userKeyIdx = q.orderBy.collect {
          case k if !k.byAgg => calLen + q.groupBy.indexOf((k.table, k.col))
        }.toSet
        (0 until calLen + q.groupBy.length).reverse.filterNot(userKeyIdx).foreach { i =>
          rows = rows.sortBy(_._1(i))(keyOrd(i))
        }
      }
      // stable sorts applied least-significant key first = multi-key order
      q.orderBy.reverse.foreach { k =>
        rows =
          if (k.byAgg)
            rows.sortBy(_._2.value)(
              if (k.asc) Ordering.Double.TotalOrdering else Ordering.Double.TotalOrdering.reverse)
          else {
            val i = calLen + q.groupBy.indexOf((k.table, k.col))
            rows.sortBy(_._1(i))(if (k.asc) keyOrd(i) else keyOrd(i).reverse)
          }
      }
      q.limit.foreach(n => rows = rows.take(n))
      Groups(rows)
    case GroupSets(rows0) =>
      // ROLLUP/CUBE post-processing (r15): the same three clauses the
      // exact plane's grouping-set branch applies. A grouped-out key
      // column is SQL NULL — it sorts FIRST ascending and LAST descending
      // (Spark's default null ordering, which the exact plane emits).
      var rows = rows0
      q.having.foreach { h =>
        if (h.agg != q.agg) throw new IllegalArgumentException(
          "unsupported SQL: estimate-plane HAVING must use the SELECT aggregate")
        rows = rows.filter(r => cmpD(r._2.value, h.op, h.value))
      }
      def setKeyOrd(i: Int): Ordering[Option[String]] = {
        val defined = rows.flatMap(_._1(i))
        val base: Ordering[String] =
          if (defined.forall(_.toDoubleOption.isDefined))
            Ordering.by[String, Double](_.toDouble)
          else Ordering.String
        Ordering.Option(base) // None (= SQL NULL) first ascending
      }
      if (q.orderBy.nonEmpty) {
        val width = rows.headOption.map(_._1.length).getOrElse(0)
        val userKeyIdx = q.orderBy.collect {
          case k if !k.byAgg => q.groupBy.indexOf((k.table, k.col))
        }.toSet
        (0 until width).reverse.filterNot(userKeyIdx).foreach { i =>
          rows = rows.sortBy(_._1(i))(setKeyOrd(i))
        }
      }
      q.orderBy.reverse.foreach { k =>
        rows =
          if (k.byAgg)
            rows.sortBy(_._2.value)(
              if (k.asc) Ordering.Double.TotalOrdering else Ordering.Double.TotalOrdering.reverse)
          else {
            val i = q.groupBy.indexOf((k.table, k.col))
            rows.sortBy(_._1(i))(if (k.asc) setKeyOrd(i) else setKeyOrd(i).reverse)
          }
      }
      q.limit.foreach(n => rows = rows.take(n))
      GroupSets(rows)
    case scalar: Scalar =>
      // one row: ORDER BY and LIMIT (parse guarantees >= 1) are no-ops,
      // honoring them exactly; HAVING is impossible without GROUP BY
      scalar
  }

  private def cmpD(x: Double, op: String, v: Double): Boolean = op match {
    case "<"  => x < v
    case "<=" => x <= v
    case ">"  => x > v
    case ">=" => x >= v
    case _    => x == v
  }

  private def estimateCore(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      spec: graft.schema.DatasetSpec): SqlResult = {
    val preds = mergePreds(spns, q.preds, spec)

    // two or three independent OR groups (r17): the signed-expansion path
    if (q.orGroupsN.nonEmpty) return estimateMultiOr(spns, q, spec)

    if (q.calGroup.nonEmpty) {
      // kind dispatch on the trailing dimension columns (r15 parity with
      // the Catalyst fold): dictionary strings enumerate per bucket,
      // num-modeled numerics expand the bucket tuples by realized-value
      // pins; anything else fails loudly
      val numDims = q.groupBy.filter { case (gt, gcol) =>
        spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
      }.toSet
      q.groupBy.filterNot(numDims).foreach { case (gt, gcol) =>
        require(modelColOf(spns, gt, gcol).dict.nonEmpty,
          s"GROUP BY $gcol: not a categorical model column")
      }
      // a parenthesized OR composes per bucket (r15): each bucket's range
      // conjoins BOTH branches and answers through inclusion-exclusion —
      // exactly the Catalyst fold's shape-dispatch composition
      val orBase =
        if (q.orPreds.isEmpty) None else Some(mergePreds(spns, q.orPreds, spec))
      return Groups(calendarGroups(spns, q, preds, orBase, numDims, spec))
    }

    if (q.groupMode != GroupFlat) {
      // ROLLUP/CUBE sugar over the grouping-set estimators — COUNT, SUM,
      // SUM(a*b) and AVG per set (r15: the feature/ratio pass threads
      // through every subset under one shared memo, closing the plane
      // asymmetry with the Catalyst grouping-set fold). A parenthesized OR
      // composes per set (r15 late): each nonempty set answers through the
      // per-group inclusion-exclusion estimators over the union of both
      // branches' enumerations, the () set through the scalar OR
      // estimators — the Catalyst plane's (o) composition on the text
      // plane (per-set memos instead of one shared memo; driver-side
      // milliseconds either way).
      val sets: Seq[Seq[(String, String)]] = q.groupMode match {
        case GroupRollup => q.groupBy.indices.inclusive.reverse.map(q.groupBy.take)
        case _ => (0 until (1 << q.groupBy.length)).map(mask =>
          q.groupBy.zipWithIndex.collect { case (gc, i) if (mask & (1 << i)) != 0 => gc })
      }
      // num-modeled grouping columns ride the grouping sets (r15, parity
      // with the Catalyst kind dispatch): a numeric-bearing set answers
      // through per-set realized-value pins — since r16 under a
      // parenthesized OR too (value pins conjoin both branches through
      // orTupleRows, supports union across branches, the () set through
      // the scalar inclusion-exclusion estimators).
      val numCols = q.groupBy.filter { case (gt, gcol) =>
        spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
      }.toSet
      if (numCols.nonEmpty) {
        q.groupBy.filterNot(numCols).foreach { case (gt, gcol) =>
          require(modelColOf(spns, gt, gcol).dict.nonEmpty,
            s"GROUP BY $gcol: not a categorical model column")
        }
        val orBase =
          if (q.orPreds.isEmpty) None else Some(mergePreds(spns, q.orPreds, spec))
        return GroupSets(numericGroupingSets(spns, q, preds, orBase, sets, numCols))
      }
      q.groupBy.foreach { case (gt, gcol) =>
        require(modelColOf(spns, gt, gcol).dict.nonEmpty,
          s"GROUP BY $gcol: not a categorical model column")
      }
      if (q.orPreds.nonEmpty) {
        val predsB = mergePreds(spns, q.orPreds, spec)
        val allCols = sets.flatten.distinct
        return GroupSets(sets.flatMap { set =>
          if (set.isEmpty)
            Seq(allCols.map(_ => Option.empty[String]) ->
              scalarOrOf(spns, q, preds, predsB))
          else {
            val rows = q.agg match {
              case Count =>
                Ensemble.estGroupByAggOr(spns, q.tables, set, Map.empty, preds, predsB)
              case Sum(t, c) =>
                Ensemble.estGroupByAggOr(spns, q.tables, set, Map((t, c) -> 1), preds, predsB)
              case SumProduct(ta, ca, tb, cb) =>
                Ensemble.estGroupByAggOr(spns, q.tables, set,
                  Map((ta, ca) -> 1, (tb, cb) -> 1), preds, predsB)
              case Avg(t, c) =>
                Ensemble.estGroupByAvgOr(spns, q.tables, set, (t, c), preds, predsB)
              // ± per set under the OR (r18): each term through the
              // per-group IE builders, distinct leaves via branch-union
              case Combo(plus, l, r) =>
                comboRows(plus,
                  orGroupTerm(spns, q, set, preds, predsB, l),
                  orGroupTerm(spns, q, set, preds, predsB, r))
              case other => throw new IllegalArgumentException(
                s"unsupported SQL: ROLLUP/CUBE with $other")
            }
            rows.map { case (k, e) =>
              val byCol = set.zip(k).toMap
              allCols.map(byCol.get) -> e
            }
          }
        })
      }
      q.agg match {
        case Combo(plus, l, r) =>
          // ± per grouping set (r18): each term per nonempty set through
          // the plain per-group builders (distinct leaves included), the
          // () set through the scalar term builders — closing the plane
          // asymmetry with the Catalyst grouping-sets ExprOut fold
          val allCols = sets.flatten.distinct
          return GroupSets(sets.flatMap { set =>
            if (set.isEmpty)
              Seq(allCols.map(_ => Option.empty[String]) ->
                comboEst(plus,
                  scalarTerm(spns, q, preds, l), scalarTerm(spns, q, preds, r)))
            else comboRows(plus,
              plainGroupTerm(spns, q, set, preds, l),
              plainGroupTerm(spns, q, set, preds, r)).map { case (k, e) =>
                val byCol = set.zip(k).toMap
                allCols.map(byCol.get) -> e
              }
          })
        case _ => ()
      }
      return GroupSets(q.agg match {
        case Count     => Ensemble.estGroupingSetsAgg(spns, q.tables, sets, Map.empty, preds)
        case Sum(t, c) =>
          Ensemble.estGroupingSetsAgg(spns, q.tables, sets, Map((t, c) -> 1), preds)
        case SumProduct(ta, ca, tb, cb) =>
          Ensemble.estGroupingSetsAgg(spns, q.tables, sets,
            Map((ta, ca) -> 1, (tb, cb) -> 1), preds)
        case Avg(t, c) =>
          Ensemble.estGroupingSetsAvg(spns, q.tables, sets, (t, c), preds)
        case other => throw new IllegalArgumentException(
          s"unsupported SQL: ROLLUP/CUBE with $other")
      })
    }

    if (q.orPreds.nonEmpty) {
      // OR reaches the model plane through inclusion–exclusion: exact for
      // every linear aggregate (COUNT/SUM/SUM(a*b)), AVG as their ratio,
      // and GROUP BY per enumerated group over the union of both branches'
      // group universes (round 9: estGroupByAggOr/estGroupByAvgOr).
      val predsB = mergePreds(spns, q.orPreds, spec)
      if (q.groupBy.nonEmpty) {
        // a num-modeled group column routes to the histogram enumeration,
        // value pins composing with both branches (r15)
        val numIdx = q.groupBy.indexWhere { case (gt, gcol) =>
          spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
        }
        if (numIdx >= 0)
          return Groups(numericGroups(spns, q, preds, Some(predsB), q.groupBy, numIdx))
        q.groupBy.foreach { case (gt, gcol) =>
          require(modelColOf(spns, gt, gcol).dict.nonEmpty,
            s"GROUP BY $gcol: not a categorical model column")
        }
        return Groups(q.agg match {
          case Count =>
            Ensemble.estGroupByAggOr(spns, q.tables, q.groupBy, Map.empty, preds, predsB)
          case Sum(t, c) =>
            Ensemble.estGroupByAggOr(spns, q.tables, q.groupBy, Map((t, c) -> 1), preds, predsB)
          case Avg(t, c) =>
            Ensemble.estGroupByAvgOr(spns, q.tables, q.groupBy, (t, c), preds, predsB)
          case SumProduct(ta, ca, tb, cb) =>
            Ensemble.estGroupByAggOr(spns, q.tables, q.groupBy,
              Map((ta, ca) -> 1, (tb, cb) -> 1), preds, predsB)
          // per-group distinct set under a disjunction = the UNION of both
          // branches' (gcs..., c) enumerations grouped by prefix — exact
          // set semantics, never the inclusion-exclusion sum (the Catalyst
          // plane's CountDistinctOut convention under single-OR)
          case CountDistinct(t, c) =>
            groupedDistinct(spns, q.tables, q.groupBy, (t, c), Seq(preds, predsB))
          // grouped ± combination under the single OR (r18, closing the
          // last flat-grouped combo asymmetry vs the Catalyst ExprOut
          // fold): each term per group through the IE estimators (or the
          // branch-union set for a distinct leaf), combined per key
          case Combo(plus, l, r) =>
            comboRows(plus,
              orGroupTerm(spns, q, q.groupBy, preds, predsB, l),
              orGroupTerm(spns, q, q.groupBy, preds, predsB, r))
          case other => throw new IllegalArgumentException(
            s"unsupported SQL: $other with OR and GROUP BY")
        })
      }
      Scalar(scalarOrOf(spns, q, preds, predsB))
    } else q.groupBy match {
      case Nil => Scalar(scalarOf(spns, q, preds))
      case gcs =>
        // at most ONE modeled-"num" group column routes to the realized-
        // value histogram enumeration (the Catalyst fold's semantics on
        // the text plane); "days" columns keep failing loudly — their raw
        // values are timestamps the day-granular support cannot reproduce
        val numIdx = gcs.indexWhere { case (gt, gcol) =>
          spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
        }
        if (numIdx >= 0)
          return Groups(numericGroups(spns, q, preds, None, gcs, numIdx))
        // one memoized enumeration per query: prune probes, group counts and
        // per-group aggregate expectations share factor denominators
        gcs.foreach { case (gt, gcol) =>
          require(modelColOf(spns, gt, gcol).dict.nonEmpty,
            s"GROUP BY $gcol: not a categorical model column")
        }
        Groups(q.agg match {
          case Count     => Ensemble.estGroupByMulti(spns, q.tables, gcs, preds)
          case Sum(t, c) => Ensemble.estGroupByAgg(spns, q.tables, gcs, Map((t, c) -> 1), preds)
          case Avg(t, c) => Ensemble.estGroupByAvg(spns, q.tables, gcs, (t, c), preds)
          case SumProduct(ta, ca, tb, cb) =>
            Ensemble.estGroupByAgg(spns, q.tables, gcs, Map((ta, ca) -> 1, (tb, cb) -> 1), preds)
          case CountDistinct(t, c) =>
            // per-group distinct: dictionary enumeration or num-modeled
            // realized support, grouped by the gcs prefix (r18 widening)
            groupedDistinct(spns, q.tables, gcs, (t, c), Seq(preds))
          case Combo(plus, l, r) =>
            // grouped ± combination over the SHARED group universe (r16,
            // closing the plane asymmetry with the Catalyst fold's
            // expression-tree outputs): each linear term evaluates per
            // enumerated group, the combination per group key with
            // interval-arithmetic CIs — conservative, since the terms
            // share predicates and correlation can only shrink the true
            // interval of a difference
            def termRows(a: Agg): Map[Seq[String], Ensemble.Estimate] = (a match {
              case Count     => Ensemble.estGroupByMulti(spns, q.tables, gcs, preds)
              case Sum(t, c) =>
                Ensemble.estGroupByAgg(spns, q.tables, gcs, Map((t, c) -> 1), preds)
              case SumProduct(ta, ca, tb, cb) =>
                Ensemble.estGroupByAgg(spns, q.tables, gcs,
                  Map((ta, ca) -> 1, (tb, cb) -> 1), preds)
              // AVG rides a ± term since r17: a per-group ratio of two
              // linear estimates with its own delta-method CI
              case Avg(t, c) =>
                Ensemble.estGroupByAvg(spns, q.tables, gcs, (t, c), preds)
              // a distinct leaf is a per-group SET SIZE (degenerate
              // interval) — the Catalyst ExprOut fold's convention (r18)
              case CountDistinct(t, c) =>
                groupedDistinct(spns, q.tables, gcs, (t, c), Seq(preds))
              case other => throw new IllegalArgumentException(
                s"unsupported SQL: non-linear ± term $other with GROUP BY")
            }).toMap
            val lm = termRows(l)
            val rm = termRows(r)
            // both enumerations walk the same dictionary universe under the
            // same predicates, so keys agree; a group one term's row gate
            // dropped contributes zero mass (its linear estimate under the
            // group pin), keeping the union's row universe
            lm.keySet.union(rm.keySet).toSeq.sortBy(_.mkString("\u0000")).map { k =>
              val el = lm.getOrElse(k, Ensemble.Estimate(0, 0, 0))
              val er = rm.getOrElse(k, Ensemble.Estimate(0, 0, 0))
              k -> (if (plus)
                Ensemble.Estimate(el.value + er.value,
                  el.ci95Lo + er.ci95Lo, el.ci95Hi + er.ci95Hi)
              else
                Ensemble.Estimate(el.value - er.value,
                  el.ci95Lo - er.ci95Hi, el.ci95Hi - er.ci95Lo))
            }
        })
    }
  }

  /** One bucket expression's (key, ColRange) list — the shared generator
    * behind the calendar/bin/window folds on the text plane. `envBranches`
    * are ALL the predicate branch maps whose range conjuncts may narrow
    * the realized domain (one map for a conjunctive query, two for a
    * single OR, every group's branches under multi-OR — the envelope is
    * their union).
    */
  private def bucketColRanges(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      spec: graft.schema.DatasetSpec,
      envBranches: Seq[Map[(String, String), ColRange]],
      foldCap: Int, fn: String, t: String, c: String): Seq[(String, ColRange)] = {
    import java.time.LocalDate
    {
      val rawDom = Ensemble.colDomain(spns, t, c).getOrElse(
        throw new IllegalArgumentException(s"bucket GROUP BY: no realized domain for $t.$c"))
      // the generator sees the PREDICATE-NARROWED realized domain (r16
      // late, parity with the Catalyst fold): the query's own range
      // conjunct on the bucket column bounds the span BEFORE the 400-cap
      // checks, so `minute(ts) ... WHERE ts < <tomorrow>` folds even when
      // the full domain would cap out. Under a disjunction the envelope
      // is the UNION of both branches' (a branch without a range on the
      // column allows the whole domain).
      def envOf(p: Map[(String, String), ColRange]): (Double, Double) =
        p.get((t, c)).flatMap {
          case NumRange(lo, hi, _, _)          => Some((lo, hi))
          case MultiRange(ivs) if ivs.nonEmpty => Some((ivs.head.lo, ivs.last.hi))
          case NominalSet(cs) if cs.nonEmpty   => Some((cs.min, cs.max))
          case _                               => None
        }.getOrElse(rawDom)
      val env = envBranches.map(envOf)
        .reduce((x, y) => (math.min(x._1, y._1), math.max(x._2, y._2)))
      val dom = (math.max(env._1, rawDom._1), math.min(env._2, rawDom._2))
      // calendar fns resolve the column's MODELED ENCODING (r16 late):
      // epoch days ×1 or epoch seconds ×86 400 — the Catalyst fold's kind
      // dispatch on the text plane. A calendar fn over a plain "num"
      // column fails loudly (the exact plane's analyzer rejects it too).
      lazy val units: Double =
        spec.modeled.getOrElse(t, Nil).collectFirst {
          case (c2, "days") if c2 == c => 1.0
          case (c2, "secs") if c2 == c => 86400.0
        }.getOrElse(throw new IllegalArgumentException(
          s"GROUP BY $fn($c): not a date-encoded model column"))
      def halfOpen(lo: Double, hi: Double): ColRange =
        NumRange(lo, hi, loIncl = true, hiIncl = false)
      // arithmetic bins over a num-modeled column (r16, parity with the
      // Catalyst binned fold): each bin one half-open range, keys printed
      // through numKeyStr to match the exact plane's group-truth
      // normalization (floor/width_bucket emit integral keys, round the
      // rounded value itself)
      if (fn.contains(':')) {
        val parts = fn.split(':')
        // `date_format(col, '<fmt>')` buckets (r16 late, parity with the
        // Catalyst fold): daily buckets keyed by the format's own value —
        // evaluated through SPARK'S formatter (a Catalyst DateFormatClass
        // over each day's midnight, UTC), so keys match the exact plane
        // bit-for-bit — and MERGED on equal keys ('yyyy-MM' → months,
        // 'EEEE' → weekdays). The format may contain colons: substring
        // past the prefix, never split.
        if (parts(0) == "datefmt") {
          val fmt = fn.substring("datefmt:".length)
          val dLo = java.time.LocalDate.ofEpochDay(math.floor(dom._1 / units).toLong)
          val dHi = java.time.LocalDate.ofEpochDay(math.floor(dom._2 / units).toLong)
          val days = Iterator.iterate(dLo)(_.plusDays(1))
            .takeWhile(!_.isAfter(dHi)).take(foldCap + 1).toSeq
          require(days.length <= foldCap,
            s"GROUP BY date_format($c): ${days.length} domain days exceed the $foldCap-bucket cap")
          // key-rendering zone (r17 ADVICE — the exact plane renders in the
          // SESSION zone): a secs column is a real timestamp, so render in
          // the session zone and require it day-aligned over the domain
          // (offset 0, no transitions — i.e. UTC-equivalent); a days column
          // is a DATE whose cast→format round trip cancels the zone, so its
          // UTC-midnight keying is zone-free and needs no gate.
          val zone = if (units == 86400.0) {
            val z = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
            require(zoneStepAligned(z,
              days.head.toEpochDay * 86400L, (days.last.toEpochDay + 1) * 86400L, 86400L),
              s"GROUP BY date_format($c): session timezone '$z' is not day-aligned over the domain (timestamp keys require a UTC-equivalent session)")
            z
          } else "UTC"
          val fmtLit = org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(fmt),
            org.apache.spark.sql.types.StringType)
          return days.map { d =>
            val key = org.apache.spark.sql.catalyst.expressions.DateFormatClass(
              org.apache.spark.sql.catalyst.expressions.Literal(
                d.toEpochDay * 86400L * 1000000L,
                org.apache.spark.sql.types.TimestampType),
              fmtLit, Some(zone)).eval(null).toString
            key -> NumRange(d.toEpochDay * units, (d.toEpochDay + 1) * units,
              loIncl = true, hiIncl = false)
          }.groupBy(_._1).toSeq.map { case (k, grp) =>
            k -> ColRangeOps.normalize(grp.map(_._2))
              .getOrElse(NominalSet(Array.empty[Double]))
          }
        }
        // SUB-DAY date_format over a secs-modeled column (r17; seconds
        // r19): hour-, minute- or second-step buckets evaluated through
        // Spark's own formatter and merged on equal keys — the hourly
        // string-key dashboard spelling ('yyyy-MM-dd HH'); parity with
        // the Catalyst sub-day arm. A 1-second step folds exactly when
        // the predicate-narrowed span fits the bucket cap (≲33 minutes
        // at 2000) — the same cap check every granularity passes below.
        if (parts(0) == "datefmtsub") {
          require(units == 86400.0,
            s"GROUP BY date_format($c, <sub-day fmt>): requires a second-granularity (secs) model column")
          val fmt = fn.substring("datefmtsub:".length)
          val step = if (fmt.contains('s')) 1L else if (fmt.contains('m')) 60L else 3600L
          val bLo = math.floor(dom._1 / step).toLong
          val bHi = math.floor(dom._2 / step).toLong
          require(bHi - bLo + 1 <= foldCap,
            s"GROUP BY date_format($c, '$fmt'): ${bHi - bLo + 1} domain steps exceed the $foldCap-bucket cap")
          // render in the SESSION zone (parity with the exact plane's
          // per-row rendering) and require its offset fixed and
          // step-aligned over the domain, so every epoch-aligned bucket
          // renders one constant key (r17 ADVICE: +05:30 flips an
          // hour-only key mid-bucket — fall back loudly instead)
          val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
          require(zoneStepAligned(zone, bLo * step, (bHi + 1) * step, step),
            s"GROUP BY date_format($c, '$fmt'): session timezone '$zone' is not aligned to the ${step}s bucket step over the domain")
          val fmtLit = org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(fmt),
            org.apache.spark.sql.types.StringType)
          return (bLo to bHi).map { b =>
            val key = org.apache.spark.sql.catalyst.expressions.DateFormatClass(
              org.apache.spark.sql.catalyst.expressions.Literal(
                b * step * 1000000L,
                org.apache.spark.sql.types.TimestampType),
              fmtLit, Some(zone)).eval(null).toString
            key -> NumRange((b * step).toDouble, ((b + 1) * step).toDouble,
              loIncl = true, hiIncl = false)
          }.groupBy(_._1).toSeq.map { case (k, grp) =>
            k -> ColRangeOps.normalize(grp.map(_._2))
              .getOrElse(NominalSet(Array.empty[Double]))
          }
        }
        return parts(0) match {
          // tumbling/sliding window buckets (r16 late): every slide-aligned
          // start whose [s, s+size) span meets the predicate-narrowed
          // domain — buckets OVERLAP for size > slide (each an independent
          // range query, exactly the Catalyst sliding fold). Keys render as
          // the exact plane's struct Row.toString — "[<start ts>,<end ts>]"
          // with java.sql.Timestamp field rendering — so per-group grading
          // pairs the planes' cells verbatim.
          case "window" =>
            require(units == 86400.0,
              s"GROUP BY window($c, ...): requires a second-granularity (secs) model column")
            val (size, slide) = (parts(1).toLong, parts(2).toLong)
            require(size > 0 && slide > 0,
              s"GROUP BY window($c, ...): nonpositive duration")
            val kLo = math.floor((dom._1 - size) / slide).toLong + 1
            val kHi = math.floor(dom._2 / slide).toLong
            require(kHi - kLo + 1 <= foldCap,
              s"GROUP BY window($c, ...): ${kHi - kLo + 1} windows exceed the $foldCap-bucket cap")
            def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L).toString
            (kLo to kHi).map { k =>
              val s = k * slide
              s"[${ts(s)},${ts(s + size)}]" ->
                halfOpen(s.toDouble, (s + size).toDouble)
            }
          case "floor" =>
            val w = parts(1).toDouble
            require(w > 0, s"GROUP BY floor($c/$w): nonpositive bin width")
            val bLo = math.floor(dom._1 / w).toLong
            val bHi = math.floor(dom._2 / w).toLong
            require(bHi - bLo + 1 <= foldCap,
              s"GROUP BY floor($c/$w): ${bHi - bLo + 1} bins exceed the $foldCap-bucket cap")
            (bLo to bHi).map(b => numKeyStr(b.toDouble) -> halfOpen(b * w, (b + 1) * w))
          case "width_bucket" =>
            val (wlo, whi, n) = (parts(1).toDouble, parts(2).toDouble, parts(3).toLong)
            require(wlo < whi && n >= 1 && n <= foldCap - 2,
              s"GROUP BY width_bucket($c, $wlo, $whi, $n): unsupported bounds")
            val s = (whi - wlo) / n
            val under = if (dom._1 < wlo) Seq("0" -> halfOpen(dom._1, wlo)) else Nil
            val over =
              if (dom._2 >= whi) Seq((n + 1).toString -> halfOpen(whi, dom._2 + 1)) else Nil
            val mids = (1L to n).collect {
              case i if wlo + i * s > dom._1 && wlo + (i - 1) * s <= dom._2 =>
                i.toString -> halfOpen(wlo + (i - 1) * s, wlo + i * s)
            }
            under ++ mids ++ over
          case "round" =>
            val sc = parts(1).toInt
            // HALF_UP rounds away from zero: the preimage's inclusivity
            // flips at the sign change, so only nonnegative realized
            // domains bucket uniformly as [m − w/2, m + w/2)
            require(dom._1 >= 0,
              s"GROUP BY round($c, $sc): negative realized domain (HALF_UP flips at zero)")
            val w = math.pow(10.0, -sc.toDouble)
            val kLo = math.floor((dom._1 + w / 2) / w).toLong
            val kHi = math.floor((dom._2 + w / 2) / w).toLong
            require(kHi - kLo + 1 <= foldCap,
              s"GROUP BY round($c, $sc): ${kHi - kLo + 1} bins exceed the $foldCap-bucket cap")
            (kLo to kHi).map(k =>
              numKeyStr(k * w) -> halfOpen(math.max(k * w - w / 2, 0.0), k * w + w / 2))
          case other => throw new IllegalArgumentException(
            s"unsupported SQL: bucket grouping $other")
        }
      }
      val lo = LocalDate.ofEpochDay(math.floor(dom._1 / units).toLong)
      val hi = LocalDate.ofEpochDay(math.floor(dom._2 / units).toLong)
      require(hi.getYear - lo.getYear <= 400,
        s"calendar GROUP BY: ${hi.getYear - lo.getYear} domain years exceed the 400-bucket cap")
      def dayRange(s: LocalDate, e: LocalDate): NumRange =
        NumRange(s.toEpochDay * units, e.toEpochDay * units,
          loIncl = true, hiIncl = false)
      fn match {
        case "year" =>
          (lo.getYear to hi.getYear).map { y =>
            y.toString -> (dayRange(
              LocalDate.of(y, 1, 1), LocalDate.of(y + 1, 1, 1)): ColRange)
          }
        case "month" | "quarter" =>
          val (n, span) = if (fn == "month") (12, 1) else (4, 3)
          (1 to n).map { k =>
            val rs = (lo.getYear to hi.getYear).map { y =>
              val start = LocalDate.of(y, (k - 1) * span + 1, 1)
              dayRange(start, start.plusMonths(span.toLong))
            }
            k.toString -> ColRangeOps.normalize(rs)
              .getOrElse(NominalSet(Array.empty[Double]))
          }
        // day-of-month 1..31 (r16 late): one single-day interval per
        // domain month that HAS that day; a key with no interval emits no
        // bucket — the Catalyst domGen on the text plane
        case "dayofmonth" =>
          val months = Iterator.iterate(lo.withDayOfMonth(1))(_.plusMonths(1))
            .takeWhile(!_.isAfter(hi)).take(401).toSeq
          require(months.length <= 400,
            s"GROUP BY dayofmonth($c): ${months.length} domain months exceed the 400-bucket cap")
          (1 to 31).flatMap { k =>
            val rs = months.collect {
              case m if k <= m.lengthOfMonth =>
                val d = m.withDayOfMonth(k)
                dayRange(d, d.plusDays(1))
            }
            if (rs.isEmpty) None
            else Some(k.toString -> ColRangeOps.normalize(rs)
              .getOrElse(NominalSet(Array.empty[Double])))
          }
        // hour-of-day / minute-of-hour (r16 late): cyclic step slices over
        // a SECOND-granularity column only — UTC hour/minute boundaries
        // are epoch-step-aligned, so key k is the union of its slice in
        // every domain period (the Catalyst cyclicSec on the text plane)
        case "hour" | "minute" =>
          require(units == 86400.0,
            s"GROUP BY $fn($c): requires a second-granularity (secs) model column")
          val (nKeys, step) = if (fn == "hour") (24, 3600.0) else (60, 60.0)
          val period = nKeys * step
          val pLo = math.floor(dom._1 / period).toLong
          val pHi = math.floor(dom._2 / period).toLong
          require(pHi - pLo + 1 <= 400,
            s"GROUP BY $fn($c): ${pHi - pLo + 1} domain periods exceed the 400-bucket cap")
          (0 until nKeys).map { k =>
            val rs = (pLo to pHi).map(p =>
              NumRange(p * period + k * step, p * period + (k + 1) * step,
                loIncl = true, hiIncl = false))
            k.toString -> ColRangeOps.normalize(rs)
              .getOrElse(NominalSet(Array.empty[Double]))
          }
        case other => throw new IllegalArgumentException(
          s"unsupported SQL: calendar grouping $other")
      }
    }
  }

  /** `GROUP BY year(d)/month(d)/quarter(d)` on the estimate plane: bucket
    * the model's realized date domain exactly like the Catalyst calendar
    * fold (plans/SpnAqp.scala rewriteCalendar) — linear year ranges, or
    * cross-year cyclic multi-intervals for month/quarter — and answer each
    * bucket as one range-conjoined estimation over the query's own
    * predicates. The row universe is the fold's: buckets at >= half a row.
    * Zero scans; keys stringified to match the exact plane's group-truth
    * normalization.
    */
  private def calendarGroups(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      preds: Map[(String, String), ColRange],
      orBase: Option[Map[(String, String), ColRange]],
      numDims: Set[(String, String)],
      spec: graft.schema.DatasetSpec): Seq[(Seq[String], Ensemble.Estimate)] = {
    import java.time.LocalDate
    // fold-class cap split (r17, parity with the Catalyst plane): a single
    // bucket expression with no dimension columns probes one range per
    // bucket — interval cap 2000 (the 720-bucket 30-day hourly dashboard);
    // anything that crosses buckets or enumerates dimensions keeps 400
    val foldCap = if (q.calGroup.length == 1 && q.groupBy.isEmpty) 2000 else 400
    def bucketsOf(fn: String, t: String, c: String): Seq[(String, ColRange)] =
      bucketColRanges(spns, q, spec, preds +: orBase.toSeq, foldCap, fn, t, c)
    // one bucket tuple per calendar key combination: TWO calendar
    // expressions compose as a cross product — nested intersect meets
    // same-column ranges (year ∧ cyclic month = that year's month slice;
    // provably-empty pairs drop) and simply conjoins distinct columns.
    // Under a parenthesized OR the bucket range conjoins BOTH branches;
    // a branch the bucket contradicts is None (zero mass), and a tuple
    // with both branches contradicted drops — SQL's empty bucket.
    val perCal: Seq[Seq[(String, (String, String), ColRange)]] =
      q.calGroup.map { case (fn, t, c) =>
        bucketsOf(fn, t, c).map { case (k, r) => (k, (t, c), r) }
      }
    type P = Map[(String, String), ColRange]
    val tuples: Seq[(Seq[String], Option[P], Option[P])] =
      perCal.foldLeft(Seq((Seq.empty[String], Option(preds), orBase))) {
        case (acc, buckets) =>
          for {
            (keys, pA, pB) <- acc
            (k, tc, r) <- buckets
            nA = pA.flatMap(p => Ensemble.intersect(p, Map(tc -> r)))
            nB = pB.flatMap(p => Ensemble.intersect(p, Map(tc -> r)))
            if nA.isDefined || nB.isDefined
          } yield (keys :+ k, nA, nB)
      }
    require(tuples.length <= foldCap,
      s"calendar GROUP BY: ${tuples.length} bucket combinations exceed the $foldCap-bucket cap")
    // num-modeled dimension columns expand the bucket tuples by their
    // realized-value supports (probed ONCE under the base predicates —
    // and the OR branch's, unioned — a superset of any bucket's own
    // support; phantom pairs drop through the per-tuple row gate), the
    // Catalyst fold's kind dispatch on the text plane
    val numDimCols = q.groupBy.filter(numDims)
    def supportOf(tc: (String, String)): Seq[Double] = {
      def one(p: P): Seq[Double] =
        Ensemble.numericSupport(spns, q.tables, tc, p, cap = 400)
          .getOrElse(throw new IllegalArgumentException(
            s"GROUP BY ${tc._2}: realized support exceeds the 400-bucket cap"))
      orBase match {
        case None    => one(preds)
        case Some(b) => (one(preds) ++ one(b)).distinct.sorted
      }
    }
    val tuplesNum: Seq[(Seq[String], Map[(String, String), Double], Option[P], Option[P])] =
      numDimCols.foldLeft(tuples.map(t =>
        (t._1, Map.empty[(String, String), Double], t._2, t._3))) { case (acc, tc) =>
        val support = supportOf(tc)
        for {
          (ks, kv, pA, pB) <- acc
          v <- support
          pin = Map(tc -> (NominalSet(Array(v)): ColRange))
          nA = pA.flatMap(Ensemble.intersect(_, pin))
          nB = pB.flatMap(Ensemble.intersect(_, pin))
          if nA.isDefined || nB.isDefined
        } yield (ks, kv + (tc -> v), nA, nB)
      }
    require(tuplesNum.length <= foldCap,
      s"calendar GROUP BY: ${tuplesNum.length} bucket × value tuples exceed the $foldCap-bucket cap")
    val catDims = q.groupBy.filterNot(numDims)
    tuplesNum.flatMap { case (keys, kv, pA, pB) =>
      orTupleRows(spns, q, catDims, pA, pB).map { case (dk, e) =>
        // reassemble the trailing dimension keys in the query's own order
        val catIter = dk.iterator
        val dimKeys = q.groupBy.map(tc =>
          if (numDims(tc)) numKeyStr(kv(tc)) else catIter.next())
        (keys ++ dimKeys, e)
      }
    }
  }

  /** Per-bucket rows under an optional second OR branch (the shared body
    * of the calendar and numeric-histogram folds): both branches present →
    * the inclusion-exclusion estimators (estCountOr / estAggOr /
    * estGroupByAggOr family); one present — the plain predicate, or an OR
    * whose other branch the bucket pin contradicted — → the plain
    * estimators (inclusion-exclusion collapses to the surviving branch).
    * `dims` enumerate per bucket; scalar buckets gate at half a row on the
    * DISJUNCTION's count, SQL's row universe.
    */
  private def orTupleRows(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      dims: Seq[(String, String)],
      pA: Option[Map[(String, String), ColRange]],
      pB: Option[Map[(String, String), ColRange]])
      : Seq[(Seq[String], Ensemble.Estimate)] = (pA, pB) match {
    case (Some(a), Some(b)) =>
      if (Ensemble.estCountOr(spns, q.tables, a, b).value < 0.5) Nil
      else if (dims.nonEmpty) q.agg match {
        case Count =>
          Ensemble.estGroupByAggOr(spns, q.tables, dims, Map.empty, a, b)
        case Sum(st, sc) =>
          Ensemble.estGroupByAggOr(spns, q.tables, dims, Map((st, sc) -> 1), a, b)
        case Avg(at, ac) =>
          Ensemble.estGroupByAvgOr(spns, q.tables, dims, (at, ac), a, b)
        case SumProduct(ta, ca, tb, cb) =>
          Ensemble.estGroupByAggOr(spns, q.tables, dims,
            Map((ta, ca) -> 1, (tb, cb) -> 1), a, b)
        // ± combination per bucket×group (r16 late): each linear term
        // through the OR estimators, combined per key over the union of
        // both terms' group universes with interval-arithmetic CIs
        case Combo(plus, l, r) =>
          comboRows(plus,
            orGroupTerm(spns, q, dims, a, b, l),
            orGroupTerm(spns, q, dims, a, b, r))
        // distinct set under a disjunction = the UNION of both branches'
        // enumerations (set semantics, never the inclusion-exclusion sum)
        case CountDistinct(t, c) =>
          groupedDistinct(spns, q.tables, dims, (t, c), Seq(a, b))
        case other => throw new IllegalArgumentException(
          s"unsupported SQL: $other with OR and bucketed GROUP BY")
      } else Seq(Seq.empty[String] -> (q.agg match {
        case Count       => Ensemble.estCountOr(spns, q.tables, a, b)
        case Sum(st, sc) => Ensemble.estAggOr(spns, q.tables, a, b, Map((st, sc) -> 1))
        case Avg(at, ac) => Ensemble.estAvgOr(spns, q.tables, (at, ac), a, b)
        case SumProduct(ta, ca, tb, cb) =>
          Ensemble.estAggOr(spns, q.tables, a, b, Map((ta, ca) -> 1, (tb, cb) -> 1))
        case Combo(plus, l, r) =>
          comboEst(plus, scalarOrTerm(spns, q, a, b, l), scalarOrTerm(spns, q, a, b, r))
        case CountDistinct(t, c) => distinctCount(spns, q.tables, (t, c), Seq(a, b))
      }))
    case (one, two) => one.orElse(two) match {
      case None => Nil
      case Some(p) =>
        if (Ensemble.estCount(spns, q.tables, p).value < 0.5) Nil
        // dictionary dimension columns enumerate PER BUCKET TUPLE under
        // the bucket-conjoined predicates (`GROUP BY year(d)[, month(d)]
        // , dim, ...`) — the Catalyst mixed fold's shape on the text
        // plane; the bucket keys lead every tuple (SELECT order is
        // validated to match by the parser)
        else if (dims.nonEmpty) q.agg match {
          case Count => Ensemble.estGroupByMulti(spns, q.tables, dims, p)
          case Sum(st, sc) =>
            Ensemble.estGroupByAgg(spns, q.tables, dims, Map((st, sc) -> 1), p)
          case Avg(at, ac) =>
            Ensemble.estGroupByAvg(spns, q.tables, dims, (at, ac), p)
          case SumProduct(ta, ca, tb, cb) =>
            Ensemble.estGroupByAgg(spns, q.tables, dims,
              Map((ta, ca) -> 1, (tb, cb) -> 1), p)
          case Combo(plus, l, r) =>
            comboRows(plus,
              plainGroupTerm(spns, q, dims, p, l),
              plainGroupTerm(spns, q, dims, p, r))
          case CountDistinct(t, c) =>
            groupedDistinct(spns, q.tables, dims, (t, c), Seq(p))
          case other => throw new IllegalArgumentException(
            s"unsupported SQL: $other with bucketed GROUP BY")
        } else Seq(Seq.empty[String] -> (q.agg match {
          case Count       => Ensemble.estCount(spns, q.tables, p)
          case Sum(st, sc) => Ensemble.estSum(spns, q.tables, (st, sc), p)
          case Avg(at, ac) => Ensemble.estAvg(spns, q.tables, (at, ac), p)
          case SumProduct(ta, ca, tb, cb) =>
            Ensemble.estSumProduct(spns, q.tables, Seq((ta, ca), (tb, cb)), p)
          case Combo(plus, l, r) =>
            comboEst(plus, scalarTerm(spns, q, p, l), scalarTerm(spns, q, p, r))
          case CountDistinct(t, c) => distinctCount(spns, q.tables, (t, c), Seq(p))
        }))
    }
  }

  /** One LINEAR ± term per bucket tuple — scalar, single predicate map. */
  private def scalarTerm(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      p: Map[(String, String), ColRange], a: Agg): Ensemble.Estimate = a match {
    case Count       => Ensemble.estCount(spns, q.tables, p)
    case Sum(st, sc) => Ensemble.estSum(spns, q.tables, (st, sc), p)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estSumProduct(spns, q.tables, Seq((ta, ca), (tb, cb)), p)
    // AVG rides a ± term since r17: a ratio of two linear estimates with
    // its own delta-method CI, combined by the same interval arithmetic
    case Avg(at, ac) => Ensemble.estAvg(spns, q.tables, (at, ac), p)
    // distinct leaf: a set size, degenerate interval (r18)
    case CountDistinct(dt, dc) => distinctCount(spns, q.tables, (dt, dc), Seq(p))
    case other => throw new IllegalArgumentException(
      s"unsupported SQL: non-linear ± term $other with bucketed GROUP BY")
  }

  /** One LINEAR ± term per bucket tuple — scalar, under a disjunction. */
  private def scalarOrTerm(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      a: Map[(String, String), ColRange], b: Map[(String, String), ColRange],
      t: Agg): Ensemble.Estimate = t match {
    case Count       => Ensemble.estCountOr(spns, q.tables, a, b)
    case Sum(st, sc) => Ensemble.estAggOr(spns, q.tables, a, b, Map((st, sc) -> 1))
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estAggOr(spns, q.tables, a, b, Map((ta, ca) -> 1, (tb, cb) -> 1))
    case Avg(at, ac) => Ensemble.estAvgOr(spns, q.tables, (at, ac), a, b)
    // distinct leaf: the branch-union set size, degenerate interval (r18)
    case CountDistinct(dt, dc) => distinctCount(spns, q.tables, (dt, dc), Seq(a, b))
    case other => throw new IllegalArgumentException(
      s"unsupported SQL: non-linear ± term $other with OR and bucketed GROUP BY")
  }

  private def plainGroupTerm(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      dims: Seq[(String, String)], p: Map[(String, String), ColRange],
      t: Agg): Seq[(Seq[String], Ensemble.Estimate)] = t match {
    case Count => Ensemble.estGroupByMulti(spns, q.tables, dims, p)
    case Sum(st, sc) =>
      Ensemble.estGroupByAgg(spns, q.tables, dims, Map((st, sc) -> 1), p)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estGroupByAgg(spns, q.tables, dims,
        Map((ta, ca) -> 1, (tb, cb) -> 1), p)
    case Avg(at, ac) =>
      Ensemble.estGroupByAvg(spns, q.tables, dims, (at, ac), p)
    // distinct leaf: per-group set size, degenerate interval (r18)
    case CountDistinct(dt, dc) =>
      groupedDistinct(spns, q.tables, dims, (dt, dc), Seq(p))
    case other => throw new IllegalArgumentException(
      s"unsupported SQL: non-linear ± term $other with bucketed GROUP BY")
  }

  private def orGroupTerm(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      dims: Seq[(String, String)],
      a: Map[(String, String), ColRange], b: Map[(String, String), ColRange],
      t: Agg): Seq[(Seq[String], Ensemble.Estimate)] = t match {
    case Count => Ensemble.estGroupByAggOr(spns, q.tables, dims, Map.empty, a, b)
    case Sum(st, sc) =>
      Ensemble.estGroupByAggOr(spns, q.tables, dims, Map((st, sc) -> 1), a, b)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estGroupByAggOr(spns, q.tables, dims,
        Map((ta, ca) -> 1, (tb, cb) -> 1), a, b)
    case Avg(at, ac) =>
      Ensemble.estGroupByAvgOr(spns, q.tables, dims, (at, ac), a, b)
    // distinct leaf: per-group branch-union set size (r18)
    case CountDistinct(dt, dc) =>
      groupedDistinct(spns, q.tables, dims, (dt, dc), Seq(a, b))
    case other => throw new IllegalArgumentException(
      s"unsupported SQL: non-linear ± term $other with OR and bucketed GROUP BY")
  }

  /** COUNT(DISTINCT col) support size over one-or-two predicate branches:
    * dictionary enumeration for cat-modeled columns, realized-value
    * support for num-modeled ones (the Catalyst plane's
    * CountDistinctNumOut, r16 late); branches UNION — set semantics,
    * never the inclusion-exclusion sum. Loud when a numeric support runs
    * past its 4096 enumeration cap (a near-continuous column's sampled
    * support is not a faithful distinct count — the text-plane contract
    * fails rather than guesses).
    */
  private def distinctCount(
      spns: Map[String, Ensemble.TrainedSpn], tables: Set[String],
      tc: (String, String),
      branches: Seq[Map[(String, String), ColRange]]): Ensemble.Estimate = {
    val mc = modelColOf(spns, tc._1, tc._2)
    val k =
      if (mc.dict.nonEmpty)
        branches.flatMap(p =>
          Ensemble.estGroupByMulti(spns, tables, Seq(tc), p).map(_._1))
          .distinct.length.toDouble
      else
        branches.flatMap { p =>
          Ensemble.numericSupport(spns, tables, tc, p).getOrElse(
            throw new IllegalArgumentException(
              s"COUNT(DISTINCT ${tc._2}): realized support exceeds the enumeration cap"))
        }.distinct.length.toDouble
    Ensemble.Estimate(k, k, k)
  }

  /** Per-group COUNT(DISTINCT col) over one-or-more predicate branches —
    * the grouped mirror of [[distinctCount]] (r18, Catalyst parity):
    * dictionary columns group the (gcols..., col) enumeration by its
    * group prefix; num-modeled columns use the bounded per-group
    * realized-value support (the Catalyst plane's CountDistinctNumOut).
    * Branches UNION per group — set semantics, never an IE/signed sum.
    * Loud when a numeric support runs past its enumeration cap.
    */
  private def groupedDistinct(
      spns: Map[String, Ensemble.TrainedSpn], tables: Set[String],
      gcols: Seq[(String, String)], tc: (String, String),
      branches: Seq[Map[(String, String), ColRange]])
      : Seq[(Seq[String], Ensemble.Estimate)] = {
    val mc = modelColOf(spns, tc._1, tc._2)
    val sizes: Seq[(Seq[String], Int)] =
      if (mc.dict.nonEmpty)
        branches.flatMap(p =>
          Ensemble.estGroupByMulti(spns, tables, gcols :+ tc, p).map(_._1))
          .distinct.groupBy(_.dropRight(1)).toSeq
          .map { case (g, rows) => g -> rows.length }
      else
        branches.foldLeft(Map.empty[Seq[String], Set[Double]]) { (acc, p) =>
          val per = Ensemble.estGroupByNumericSupport(spns, tables, gcols, tc, p)
            .getOrElse(throw new IllegalArgumentException(
              s"COUNT(DISTINCT ${tc._2}): realized support exceeds the enumeration cap"))
          per.foldLeft(acc) { case (m, (k, sup)) =>
            m.updated(k, m.getOrElse(k, Set.empty[Double]) ++ sup)
          }
        }.toSeq.map { case (k, sup) => k -> sup.size }
    sizes.map { case (g, n) =>
      val k = n.toDouble
      g -> Ensemble.Estimate(k, k, k)
    }.sortBy(_._1.mkString("\u0000"))
  }

  /** Interval-arithmetic ± of two estimates — conservative, since the
    * terms share predicates and correlation can only shrink the true
    * interval of a difference (the grouped-±-combination convention).
    */
  private def comboEst(
      plus: Boolean, el: Ensemble.Estimate, er: Ensemble.Estimate): Ensemble.Estimate =
    if (plus)
      Ensemble.Estimate(el.value + er.value, el.ci95Lo + er.ci95Lo, el.ci95Hi + er.ci95Hi)
    else
      Ensemble.Estimate(el.value - er.value, el.ci95Lo - er.ci95Hi, el.ci95Hi - er.ci95Lo)

  /** ± per group key over the UNION of both terms' group universes; a key
    * one term's row gate dropped contributes zero mass.
    */
  private def comboRows(
      plus: Boolean,
      lRows: Seq[(Seq[String], Ensemble.Estimate)],
      rRows: Seq[(Seq[String], Ensemble.Estimate)]): Seq[(Seq[String], Ensemble.Estimate)] = {
    val lm = lRows.toMap
    val rm = rRows.toMap
    lm.keySet.union(rm.keySet).toSeq.sortBy(_.mkString("\u0000")).map { k =>
      val el = lm.getOrElse(k, Ensemble.Estimate(0, 0, 0))
      val er = rm.getOrElse(k, Ensemble.Estimate(0, 0, 0))
      k -> comboEst(plus, el, er)
    }
  }

  /** GROUP BY over a modeled NUMERIC column on the text plane — the
    * Catalyst histogram fold's semantics (one bucket per realized value
    * with mass, remaining group columns dictionary-enumerated per bucket),
    * with the text plane's fail-loud contract: a support past the
    * 400-bucket cap throws instead of silently running exact. Keys print
    * integrally when whole, matching the exact plane's group-truth
    * normalization. Under a parenthesized OR (r15) the support is the
    * UNION of both branches' realized supports and each value pin
    * conjoins both branches through [[orTupleRows]]'s
    * inclusion-exclusion.
    */
  private def numericGroups(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      preds: Map[(String, String), ColRange],
      orBase: Option[Map[(String, String), ColRange]],
      gcs: Seq[(String, String)], numIdx: Int): Seq[(Seq[String], Ensemble.Estimate)] = {
    val (t, c) = gcs(numIdx)
    val dictPos = gcs.indices.filterNot(_ == numIdx)
    val dictCols = dictPos.map(gcs)
    dictCols.foreach { case (gt, gcol) =>
      require(modelColOf(spns, gt, gcol).dict.nonEmpty,
        s"GROUP BY $gcol: not a categorical model column")
    }
    def supportOf(p: Map[(String, String), ColRange]): Seq[Double] =
      Ensemble.numericSupport(spns, q.tables, (t, c), p, cap = 400)
        .getOrElse(throw new IllegalArgumentException(
          s"GROUP BY $c: realized support exceeds the 400-bucket cap"))
    val support = orBase match {
      case None    => supportOf(preds)
      case Some(b) => (supportOf(preds) ++ supportOf(b)).distinct.sorted
    }
    support.flatMap { v =>
      val pin = Map((t, c) -> (NominalSet(Array(v)): ColRange))
      val pA = Ensemble.intersect(preds, pin)
      val pB = orBase.flatMap(Ensemble.intersect(_, pin))
      // reassemble each key tuple in the query's own group order
      orTupleRows(spns, q, dictCols, pA, pB).map { case (dk, e) =>
        val full = new Array[String](gcs.length)
        full(numIdx) = numKeyStr(v)
        dictPos.zip(dk).foreach { case (pos, kv) => full(pos) = kv }
        (full.toSeq, e)
      }
    }
  }

  /** ROLLUP/CUBE with num-modeled grouping columns (r15): each
    * numeric-bearing set expands its numeric columns' realized-value
    * supports into point-pinned tuples (several columns cross; the
    * 400-tuple cap throws loudly per the text-plane contract), the set's
    * dictionary columns enumerate per tuple through the shared
    * [[orTupleRows]] body, and keys pad to the full grouping width with
    * None for grouped-out columns — the Catalyst plane's per-set kind
    * dispatch on the text plane. The () set stays the unconditional
    * global aggregate.
    */
  private def numericGroupingSets(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      preds: Map[(String, String), ColRange],
      orBase: Option[Map[(String, String), ColRange]],
      sets: Seq[Seq[(String, String)]],
      numCols: Set[(String, String)]): Seq[(Seq[Option[String]], Ensemble.Estimate)] = {
    type P = Map[(String, String), ColRange]
    val allCols = sets.flatten.distinct
    sets.flatMap { set =>
      val numInSet = set.filter(numCols)
      val catInSet = set.filterNot(numCols)
      val rows: Seq[(Map[(String, String), String], Ensemble.Estimate)] =
        if (numInSet.isEmpty) {
          if (set.isEmpty)
            // SQL: the () grouping set always yields exactly one row; under
            // a parenthesized OR (r16) it answers through the scalar
            // inclusion-exclusion estimators
            Seq(Map.empty[(String, String), String] -> (orBase match {
              case Some(b) => scalarOrOf(spns, q, preds, b)
              case None    => scalarOf(spns, q, preds)
            }))
          else orTupleRows(spns, q, set, Some(preds), orBase)
            .map { case (k, e) => set.zip(k).toMap -> e }
        } else {
          // OR composition (r16): the support is the UNION of both
          // branches' realized supports and each value pin conjoins both
          // branches through orTupleRows — the calendar/histogram folds'
          // composition, per grouping set
          def supportOf(tc: (String, String)): Seq[Double] = {
            def one(p: P): Seq[Double] =
              Ensemble.numericSupport(spns, q.tables, tc, p, cap = 400)
                .getOrElse(throw new IllegalArgumentException(
                  s"GROUP BY ${tc._2}: realized support exceeds the 400-bucket cap"))
            orBase match {
              case None    => one(preds)
              case Some(b) => (one(preds) ++ one(b)).distinct.sorted
            }
          }
          val tuples = numInSet.foldLeft(
            Seq((Map.empty[(String, String), Double], Option(preds), orBase))) {
            case (acc, tc) =>
              val support = supportOf(tc)
              for {
                (kv, pA, pB) <- acc
                v <- support
                pin = Map(tc -> (NominalSet(Array(v)): ColRange))
                nA = pA.flatMap(Ensemble.intersect(_, pin))
                nB = pB.flatMap(Ensemble.intersect(_, pin))
                if nA.isDefined || nB.isDefined
              } yield (kv + (tc -> v), nA, nB)
          }
          require(tuples.length <= 400,
            s"grouping set ${set.map(_._2).mkString(",")}: " +
              s"${tuples.length} value-pin tuples exceed the 400-bucket cap")
          tuples.flatMap { case (kv, pA, pB) =>
            orTupleRows(spns, q, catInSet, pA, pB).map { case (k, e) =>
              (catInSet.zip(k).toMap ++ kv.map { case (tc, v) => tc -> numKeyStr(v) }) -> e
            }
          }
        }
      rows.map { case (m, e) => allCols.map(m.get) -> e }
    }
  }

  /** Bucket (calendar/bin/window) grouping under N OR groups (r17) — the
    * [[calendarGroups]] analog through the signed expansion: bucket ranges
    * conjoin EVERY group's branches (a tuple where some group loses both
    * branches is structurally impossible and drops), numeric dimension
    * pins expand by the all-branch support union, and each surviving tuple
    * answers through [[multiTupleRows]]. The bucket envelope is the union
    * of every branch's range conjunct on the bucket column.
    */
  private def calendarGroupsMulti(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      groups: Seq[Seq[P]],
      numDims: Set[(String, String)],
      spec: graft.schema.DatasetSpec): Seq[(Seq[String], Ensemble.Estimate)] = {
    val foldCap = if (q.calGroup.length == 1 && q.groupBy.isEmpty) 2000 else 400
    val branchMaps = groups.flatten
    val perCal: Seq[Seq[(String, (String, String), ColRange)]] =
      q.calGroup.map { case (fn, t, c) =>
        bucketColRanges(spns, q, spec, branchMaps, foldCap, fn, t, c)
          .map { case (k, r) => (k, (t, c), r) }
      }
    val optG: OptGroups = groups.map(_.map(Some(_)))
    val tuples: Seq[(Seq[String], OptGroups)] =
      perCal.foldLeft(Seq((Seq.empty[String], optG))) { case (acc, buckets) =>
        for {
          (keys, pg) <- acc
          (k, tc, r) <- buckets
          np = pg.map(_.map(_.flatMap(Ensemble.intersect(_, Map(tc -> r)))))
          if np.forall(_.exists(_.isDefined))
        } yield (keys :+ k, np)
      }
    require(tuples.length <= foldCap,
      s"calendar GROUP BY: ${tuples.length} bucket combinations exceed the $foldCap-bucket cap")
    val numDimCols = q.groupBy.filter(numDims)
    val tuplesNum: Seq[(Seq[String], Map[(String, String), Double], OptGroups)] =
      numDimCols.foldLeft(tuples.map(t =>
        (t._1, Map.empty[(String, String), Double], t._2))) { case (acc, tc) =>
        val support = multiBranchSupport(spns, q, groups, tc)
        for {
          (ks, kv, pg) <- acc
          v <- support
          pin = Map(tc -> (NominalSet(Array(v)): ColRange))
          np = pg.map(_.map(_.flatMap(Ensemble.intersect(_, pin))))
          if np.forall(_.exists(_.isDefined))
        } yield (ks, kv + (tc -> v), np)
      }
    require(tuplesNum.length <= foldCap,
      s"calendar GROUP BY: ${tuplesNum.length} bucket × value tuples exceed the $foldCap-bucket cap")
    val catDims = q.groupBy.filterNot(numDims)
    tuplesNum.flatMap { case (keys, kv, pg) =>
      multiTupleRows(spns, q, catDims, pg).map { case (dk, e) =>
        val catIter = dk.iterator
        val dimKeys = q.groupBy.map(tc =>
          if (numDims(tc)) numKeyStr(kv(tc)) else catIter.next())
        (keys ++ dimKeys, e)
      }
    }
  }

  /** Canonical numeric key string: integral realized values print as
    * longs ("10", never "10.0"), matching the exact plane's group-truth
    * normalization — shared by every numeric-key fold on this plane.
    */
  private def numKeyStr(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** Conjuncts on the SAME column must intersect, not overwrite (a >= lo
    * AND a < hi is two parsed predicates); a provably empty intersection
    * becomes an empty nominal set — zero mass at every leaf.
    */
  /** The model-encoding unit of DATE-shaped literals for this predicate's
    * column: epoch days ×1 on a "days"-modeled column, ×86 400 on a
    * "secs"-modeled one (events.ts — a date literal compares against
    * midnight, which in epoch seconds is the day boundary exactly).
    * Without this, `ts >= DATE'2024-01-05'` would probe a ~19 700
    * epoch-day bound against a ~1.7e9 epoch-second domain — a silently
    * near-zero estimate, not a loud failure.
    */
  private def dateUnit(spec: graft.schema.DatasetSpec, t: String, c: String): Double =
    if (spec.modeled.getOrElse(t, Nil).exists(x => x._1 == c && x._2 == "secs")) 86400.0
    else 1.0

  /** True when `zoneId`'s UTC offset is one fixed, `step`-aligned value
    * across [startSec, endSec) — the condition under which step-aligned
    * epoch-second buckets each render exactly ONE `date_format` key (r17
    * ADVICE: a fractional-hour zone like +05:30 flips an hour-only key
    * mid-bucket, and ANY non-zero offset mis-keys a daily bucket). Latent
    * while every harness entry point pins a UTC session; enforced at the
    * fold sites on BOTH planes so the rules are safe standalone. A zone
    * with a DST transition inside the span conservatively fails via the
    * no-transition requirement (UTC has none).
    */
  private[graft] def zoneStepAligned(
      zoneId: String, startSec: Long, endSec: Long, step: Long): Boolean = {
    val rules =
      org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(zoneId).getRules
    val s = java.time.Instant.ofEpochSecond(startSec)
    rules.getOffset(s).getTotalSeconds % step == 0 && {
      val next = rules.nextTransition(s)
      next == null || !next.getInstant.isBefore(java.time.Instant.ofEpochSecond(endSec))
    }
  }

  private def mergePreds(
      spns: Map[String, Ensemble.TrainedSpn],
      ps: Seq[Pred],
      spec: graft.schema.DatasetSpec): Map[(String, String), ColRange] =
    ps.foldLeft(Map.empty[(String, String), ColRange]) { (acc, p) =>
      val one = Map((p.table, p.col) ->
        toRange(spns, p, dateUnit(spec, p.table, p.col)))
      Ensemble.intersect(acc, one)
        .getOrElse(acc + ((p.table, p.col) -> NominalSet(Array.empty[Double])))
    }

  // ─────────────────── signed multi-OR (r17; n-branch r18) ─────────────────
  // Independent parenthesized OR groups — (A∨B[∨C…]) AND (D∨E)[ AND …] —
  // answer through Ensemble's signed inclusion–exclusion expansion, closing
  // the plane divergence where Catalyst composed multiple disjunctions but
  // the text plane refused them. Supported shapes: scalar (all aggregates),
  // flat GROUP BY over dict/num-modeled columns, ROLLUP/CUBE including
  // numeric-bearing sets, and bucket (calendar/bin/window) grouping via
  // [[calendarGroupsMulti]] — every group's branches conjoin into each
  // bucket's signed product terms. The parser caps the total signed-term
  // product Π_g (2^{k_g}−1) at 27 (the r17 3^N accuracy posture
  // generalized); anything past it stays loud on both planes.

  private type P = Map[(String, String), ColRange]
  private type OptGroups = Seq[Seq[Option[P]]]

  private def estimateMultiOr(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      spec: graft.schema.DatasetSpec): SqlResult = {
    // parser convention (r18): groups arrive RAW in orGroupsN with the
    // common conjuncts in q.preds (orPreds empty) — conjoin common into
    // every branch here, so each signed product term carries it exactly
    // once (ColRange intersection is idempotent)
    val groups: Seq[Seq[P]] =
      q.orGroupsN.map(_.map(b => mergePreds(spns, q.preds ++ b, spec)))
    val optGroups: OptGroups = groups.map(_.map(Some(_)))
    if (q.calGroup.nonEmpty) {
      val numDims = q.groupBy.filter { case (gt, gcol) =>
        spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
      }.toSet
      q.groupBy.filterNot(numDims).foreach { case (gt, gcol) =>
        require(modelColOf(spns, gt, gcol).dict.nonEmpty,
          s"GROUP BY $gcol: not a categorical model column")
      }
      return Groups(calendarGroupsMulti(spns, q, groups, numDims, spec))
    }

    if (q.groupMode != GroupFlat) {
      val sets: Seq[Seq[(String, String)]] = q.groupMode match {
        case GroupRollup => q.groupBy.indices.inclusive.reverse.map(q.groupBy.take)
        case _ => (0 until (1 << q.groupBy.length)).map(mask =>
          q.groupBy.zipWithIndex.collect { case (gc, i) if (mask & (1 << i)) != 0 => gc })
      }
      val numCols = q.groupBy.filter { case (gt, gcol) =>
        spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
      }.toSet
      q.groupBy.filterNot(numCols).foreach { case (gt, gcol) =>
        require(modelColOf(spns, gt, gcol).dict.nonEmpty,
          s"GROUP BY $gcol: not a categorical model column")
      }
      return GroupSets(multiOrGroupingSets(spns, q, groups, sets, numCols))
    }

    if (q.groupBy.nonEmpty) {
      val numIdx = q.groupBy.indexWhere { case (gt, gcol) =>
        spec.modeled.getOrElse(gt, Nil).exists(x => x._1 == gcol && x._2 == "num")
      }
      if (numIdx >= 0) return Groups(multiOrNumericGroups(spns, q, groups, numIdx))
      q.groupBy.foreach { case (gt, gcol) =>
        require(modelColOf(spns, gt, gcol).dict.nonEmpty,
          s"GROUP BY $gcol: not a categorical model column")
      }
      return Groups(multiTupleRows(spns, q, q.groupBy, optGroups))
    }
    Scalar(scalarMultiOrOf(spns, q, optGroups))
  }

  /** The positive pure-branch quadrants: one live branch picked per group,
    * all intersected — their union IS the WHERE's row set, the enumeration
    * surface for distinct-set semantics (never the signed sum).
    */
  private def quadrantMaps(groups: OptGroups): Seq[P] =
    groups.foldLeft(Seq(Map.empty: P)) { (acc, branches) =>
      for {
        p  <- acc
        // duplicate compiled branches (alias spellings) are harmless in a
        // union but waste an enumeration per combo — dedupe (r19)
        br <- branches.flatten.distinct
        m  <- Ensemble.intersect(p, br).toSeq
      } yield m
    }

  private def scalarMultiOrOf(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      groups: OptGroups): Ensemble.Estimate = {
    def dead = Ensemble.Estimate(0.0, 0.0, 0.0)
    q.agg match {
      case Count =>
        Ensemble.estAggOrMulti(spns, q.tables, groups, Map.empty).getOrElse(dead)
      case Sum(t, c) =>
        Ensemble.estAggOrMulti(spns, q.tables, groups, Map((t, c) -> 1)).getOrElse(dead)
      case SumProduct(ta, ca, tb, cb) =>
        Ensemble.estAggOrMulti(spns, q.tables, groups,
          Map((ta, ca) -> 1, (tb, cb) -> 1)).getOrElse(dead)
      case Avg(t, c) =>
        Ensemble.estAvgOrMulti(spns, q.tables, (t, c), groups).getOrElse(dead)
      case CountDistinct(t, c) =>
        distinctCount(spns, q.tables, (t, c), quadrantMaps(groups))
      case Combo(plus, l, r) =>
        comboEst(plus,
          scalarMultiOrOf(spns, q.copy(agg = l), groups),
          scalarMultiOrOf(spns, q.copy(agg = r), groups))
    }
  }

  /** Per-tuple rows under N OR groups — [[orTupleRows]] generalized to the
    * signed expansion; `pinned` carries each group's branches with the
    * caller's bucket/value pins already conjoined (None = contradicted).
    */
  private def multiTupleRows(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      dims: Seq[(String, String)],
      pinned: OptGroups): Seq[(Seq[String], Ensemble.Estimate)] = {
    if (pinned.exists(_.forall(_.isEmpty))) return Nil
    val gate = Ensemble.estAggOrMulti(spns, q.tables, pinned, Map.empty)
    if (gate.forall(_.value < 0.5)) return Nil
    if (dims.nonEmpty) q.agg match {
      case Count =>
        Ensemble.estGroupByAggOrMulti(spns, q.tables, dims, Map.empty, pinned)
      case Sum(t, c) =>
        Ensemble.estGroupByAggOrMulti(spns, q.tables, dims, Map((t, c) -> 1), pinned)
      case SumProduct(ta, ca, tb, cb) =>
        Ensemble.estGroupByAggOrMulti(spns, q.tables, dims,
          Map((ta, ca) -> 1, (tb, cb) -> 1), pinned)
      case Avg(t, c) =>
        Ensemble.estGroupByAvgOrMulti(spns, q.tables, dims, (t, c), pinned)
      case Combo(plus, l, r) =>
        comboRows(plus,
          multiGroupTerm(spns, q, dims, pinned, l),
          multiGroupTerm(spns, q, dims, pinned, r))
      case CountDistinct(t, c) =>
        // the positive pure-branch quadrants' union IS the WHERE's row
        // set; dictionary or num-modeled support per group (r18)
        groupedDistinct(spns, q.tables, dims, (t, c), quadrantMaps(pinned))
      case other => throw new IllegalArgumentException(
        s"unsupported SQL: $other with multiple OR groups and GROUP BY")
    } else Seq(Seq.empty[String] -> scalarMultiOrOf(spns, q, pinned))
  }

  /** One ± leaf term per group key under N OR groups (the [[orGroupTerm]]
    * analog): linear leaves only — the parser rejects AVG/DISTINCT leaves.
    */
  private def multiGroupTerm(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      dims: Seq[(String, String)], pinned: OptGroups,
      agg: Agg): Seq[(Seq[String], Ensemble.Estimate)] = agg match {
    case Count =>
      Ensemble.estGroupByAggOrMulti(spns, q.tables, dims, Map.empty, pinned)
    case Sum(t, c) =>
      Ensemble.estGroupByAggOrMulti(spns, q.tables, dims, Map((t, c) -> 1), pinned)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estGroupByAggOrMulti(spns, q.tables, dims,
        Map((ta, ca) -> 1, (tb, cb) -> 1), pinned)
    case Avg(at, ac) =>
      Ensemble.estGroupByAvgOrMulti(spns, q.tables, dims, (at, ac), pinned)
    // distinct leaf: per-group set size over the positive pure-branch
    // quadrants' union — set semantics, never the signed sum (r18)
    case CountDistinct(dt, dc) =>
      groupedDistinct(spns, q.tables, dims, (dt, dc), quadrantMaps(pinned))
    case other => throw new IllegalArgumentException(
      s"unsupported ± term under multiple OR groups: $other")
  }

  /** Flat GROUP BY with one num-modeled column under N OR groups — the
    * [[numericGroups]] analog: the support unions over EVERY branch (a
    * superset of the disjunction's realized support; phantom pins drop
    * through the per-tuple row gate), each value pin conjoining every
    * group's branches.
    */
  private def multiOrNumericGroups(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      groups: Seq[Seq[P]], numIdx: Int): Seq[(Seq[String], Ensemble.Estimate)] = {
    val gcs = q.groupBy
    val tc = gcs(numIdx)
    val dictPos = gcs.indices.filterNot(_ == numIdx)
    val dictCols = dictPos.map(gcs)
    dictCols.foreach { case (gt, gcol) =>
      require(modelColOf(spns, gt, gcol).dict.nonEmpty,
        s"GROUP BY $gcol: not a categorical model column")
    }
    val support = multiBranchSupport(spns, q, groups, tc)
    support.flatMap { v =>
      val pin = Map(tc -> (NominalSet(Array(v)): ColRange))
      val pinned: OptGroups = groups.map(_.map(Ensemble.intersect(_, pin)))
      multiTupleRows(spns, q, dictCols, pinned).map { case (dk, e) =>
        val full = new Array[String](gcs.length)
        full(numIdx) = numKeyStr(v)
        dictPos.zip(dk).foreach { case (pos, kv) => full(pos) = kv }
        (full.toSeq, e)
      }
    }
  }

  /** Realized-value support of a num-modeled column unioned over every OR
    * branch — each branch capped at 400 like the single-OR path.
    */
  private def multiBranchSupport(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      groups: Seq[Seq[P]], tc: (String, String)): Seq[Double] =
    groups.flatten.flatMap { p =>
      Ensemble.numericSupport(spns, q.tables, tc, p, cap = 400)
        .getOrElse(throw new IllegalArgumentException(
          s"GROUP BY ${tc._2}: realized support exceeds the 400-bucket cap"))
    }.distinct.sorted

  /** ROLLUP/CUBE under N OR groups — [[numericGroupingSets]] generalized:
    * numeric columns in a set expand by the all-branch support union, value
    * pins conjoin every group's branches, dictionary columns enumerate per
    * tuple through [[multiTupleRows]], and the () set answers through the
    * scalar signed estimators.
    */
  private def multiOrGroupingSets(
      spns: Map[String, Ensemble.TrainedSpn], q: ParsedQuery,
      groups: Seq[Seq[P]],
      sets: Seq[Seq[(String, String)]],
      numCols: Set[(String, String)]): Seq[(Seq[Option[String]], Ensemble.Estimate)] = {
    val allCols = sets.flatten.distinct
    val optGroups: OptGroups = groups.map(_.map(Some(_)))
    sets.flatMap { set =>
      val numInSet = set.filter(numCols)
      val catInSet = set.filterNot(numCols)
      val rows: Seq[(Map[(String, String), String], Ensemble.Estimate)] =
        if (numInSet.isEmpty) {
          if (set.isEmpty)
            Seq(Map.empty[(String, String), String] -> scalarMultiOrOf(spns, q, optGroups))
          else multiTupleRows(spns, q, set, optGroups)
            .map { case (k, e) => set.zip(k).toMap -> e }
        } else {
          val tuples = numInSet.foldLeft(Seq((Map.empty[(String, String), Double], optGroups))) {
            case (acc, tc) =>
              val support = multiBranchSupport(spns, q, groups, tc)
              for {
                (kv, pg) <- acc
                v <- support
                pin = Map(tc -> (NominalSet(Array(v)): ColRange))
                np = pg.map(_.map(_.flatMap(Ensemble.intersect(_, pin))))
                if np.forall(_.exists(_.isDefined))
              } yield (kv + (tc -> v), np)
          }
          require(tuples.length <= 400,
            s"grouping set ${set.map(_._2).mkString(",")}: " +
              s"${tuples.length} value-pin tuples exceed the 400-bucket cap")
          tuples.flatMap { case (kv, pg) =>
            multiTupleRows(spns, q, catInSet, pg).map { case (k, e) =>
              (catInSet.zip(k).toMap ++ kv.map { case (tc, v) => tc -> numKeyStr(v) }) -> e
            }
          }
        }
      rows.map { case (m, e) => allCols.map(m.get) -> e }
    }
  }

  /** Scalar estimate under `(preds) OR (predsB)` — the disjunctive mirror
    * of [[scalarOf]] (r15): linear aggregates through inclusion-exclusion,
    * AVG as their ratio, COUNT(DISTINCT) as the exact UNION of both
    * branches' enumerations (a set, never the IE sum — the Catalyst
    * plane's convention), and ± combinations recursively per term with
    * the same conservative interval arithmetic as the conjunctive path.
    */
  private def scalarOrOf(
      spns: Map[String, Ensemble.TrainedSpn],
      q: ParsedQuery,
      preds: Map[(String, String), ColRange],
      predsB: Map[(String, String), ColRange]): Ensemble.Estimate = q.agg match {
    case Count     => Ensemble.estCountOr(spns, q.tables, preds, predsB)
    case Sum(t, c) => Ensemble.estAggOr(spns, q.tables, preds, predsB, Map((t, c) -> 1))
    case Avg(t, c) => Ensemble.estAvgOr(spns, q.tables, (t, c), preds, predsB)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estAggOr(spns, q.tables, preds, predsB, Map((ta, ca) -> 1, (tb, cb) -> 1))
    case CountDistinct(t, c) =>
      distinctCount(spns, q.tables, (t, c), Seq(preds, predsB))
    case Combo(plus, l, r) =>
      val el = scalarOrOf(spns, q.copy(agg = l), preds, predsB)
      val er = scalarOrOf(spns, q.copy(agg = r), preds, predsB)
      if (plus) Ensemble.Estimate(el.value + er.value, el.ci95Lo + er.ci95Lo, el.ci95Hi + er.ci95Hi)
      else Ensemble.Estimate(el.value - er.value, el.ci95Lo - er.ci95Hi, el.ci95Hi - er.ci95Lo)
  }

  private def scalarOf(
      spns: Map[String, Ensemble.TrainedSpn],
      q: ParsedQuery,
      preds: Map[(String, String), ColRange]): Ensemble.Estimate = q.agg match {
    case Count     => Ensemble.estCount(spns, q.tables, preds)
    case CountDistinct(t, c) =>
      // a categorical dictionary is the column's complete domain, so the
      // nonzero-probability enumeration IS the distinct set; num-modeled
      // columns enumerate their realized-value support (r16 late —
      // degenerate CI either way: a set size, not a scaled expectation)
      distinctCount(spns, q.tables, (t, c), Seq(preds))
    case Sum(t, c) => Ensemble.estSum(spns, q.tables, (t, c), preds)
    case Avg(t, c) => Ensemble.estAvg(spns, q.tables, (t, c), preds)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estSumProduct(spns, q.tables, Seq((ta, ca), (tb, cb)), preds)
    case Combo(plus, l, r) =>
      // reference AggregationOperationType.PLUS/MINUS: combine the term
      // estimates; the CI combines by interval arithmetic — conservative,
      // since the terms share predicates (their errors are correlated) and
      // correlation can only shrink the true interval of a difference
      val el = scalarOf(spns, q.copy(agg = l), preds)
      val er = scalarOf(spns, q.copy(agg = r), preds)
      if (plus) Ensemble.Estimate(el.value + er.value, el.ci95Lo + er.ci95Lo, el.ci95Hi + er.ci95Hi)
      else Ensemble.Estimate(el.value - er.value, el.ci95Lo - er.ci95Hi, el.ci95Hi - er.ci95Lo)
  }

  private def modelColOf(spns: Map[String, Ensemble.TrainedSpn], table: String, col: String): Ensemble.ModelCol =
    Ensemble.findModelCol(spns, table, col)
      .getOrElse(throw new NoSuchElementException(s"$table.$col is not a modeled column"))

  private def toRange(
      spns: Map[String, Ensemble.TrainedSpn], p: Pred,
      dateU: Double): ColRange = p.range match {
    case NumR(lo, hi, li, hi2)  => NumRange(lo, hi, li, hi2)
    // CNF-absorbed same-column disjunction (r18): interval union in the
    // modeled encoding, normalized through the shared ColRangeOps algebra
    // (merges overlap, returns MultiRange when genuinely disjoint)
    case NumUnion(ivs, isDate) =>
      val u = if (isDate) dateU else 1.0
      ColRangeOps.normalize(ivs.map { case (lo, hi, li, hi2) =>
        NumRange(lo * u, hi * u, li, hi2)
      }).getOrElse(NominalSet(Array.empty[Double]))
    // date-shaped bounds arrive in epoch DAYS from the parser (which
    // cannot see column kinds) and resolve HERE against the modeled
    // encoding — ×86 400 on a secs column, ×1 on a days column. The
    // half-open [lo·u, hi·u] bounds with the parser's inclusivity match
    // the exact plane's midnight-timestamp comparisons exactly.
    case DateR(lo, hi, li, hi2) => NumRange(lo * dateU, hi * dateU, li, hi2)
    case StrIn(values) =>
      val mc = modelColOf(spns, p.table, p.col)
      // values absent from the dictionary contribute zero mass, as in the
      // reference's NominalRange over known codes
      val codes = values.flatMap { v =>
        val i = java.util.Arrays.binarySearch(mc.dict.asInstanceOf[Array[AnyRef]], v)
        if (i >= 0) Some(i.toDouble) else None
      }
      NominalSet(codes.toArray)
    case NotNull => NotNullRange
    case StrNotIn(values) =>
      // complement over the dictionary (the column's complete domain);
      // NULL rows are excluded by NominalSet mass, matching SQL != / NOT IN
      val mc = modelColOf(spns, p.table, p.col)
      require(mc.dict.nonEmpty,
        s"!=/NOT IN on non-categorical column ${p.table}.${p.col}")
      val excluded = values.toSet
      NominalSet(mc.dict.indices.collect {
        case i if !excluded(mc.dict(i)) => i.toDouble
      }.toArray)
    case NumNotIn(values, isDate) =>
      // multi-interval point complement (shared with the Catalyst atom
      // compiler via ColRangeOps — the two planes cannot disagree); no
      // NULL mass, matching SQL != / NOT IN. A date-SHAPED literal list
      // over a CATEGORICAL column (a dictionary of ISO-date-like strings)
      // resolves by the MODELED kind to the string complement instead —
      // the parser cannot see kinds (r13 ADVICE; SqlExact resolves the
      // same case against the schema)
      if (isDate && Ensemble.findModelCol(spns, p.table, p.col).exists(_.dict.nonEmpty)) {
        val mc = modelColOf(spns, p.table, p.col)
        val excluded =
          values.map(d => java.time.LocalDate.ofEpochDay(d.toLong).toString).toSet
        NominalSet(mc.dict.indices.collect {
          case i if !excluded(mc.dict(i)) => i.toDouble
        }.toArray)
      } else ColRangeOps.pointComplement(
        if (isDate) values.map(_ * dateU) else values)
    case StrLike(pattern) =>
      // a categorical dictionary is the column's complete value domain, so
      // LIKE is exactly the member set matching the pattern
      val mc = modelColOf(spns, p.table, p.col)
      require(mc.dict.nonEmpty,
        s"LIKE on non-categorical column ${p.table}.${p.col} (the exact plane would cast-and-match; the model plane cannot)")
      require(validLikePattern(pattern),
        s"invalid LIKE pattern '$pattern' (escape must precede %, _ or \\ — the exact plane throws on it too)")
      val re = likeRegex(pattern)
      NominalSet(mc.dict.indices.collect {
        case i if re.matcher(mc.dict(i)).matches() => i.toDouble
      }.toArray)
  }

  /** SQL LIKE → anchored regex: % ⇒ .*, _ ⇒ ., `\%`/`\_`/`\\` ⇒ the
    * escaped char as a LITERAL (SQL's default-escape semantics — without
    * this, LIKE '100\%' would expand the escaped wildcard and the
    * dictionary closure would pick the WRONG member set, a silently wrong
    * fold rather than a fallback). Shared with the Catalyst predicate
    * compiler (`SpnCardinality`), which applies the same dictionary
    * closure to `Like` atoms the optimizer hasn't already simplified to
    * StartsWith/EndsWith/Contains. Callers must reject patterns
    * [[validLikePattern]] refuses — this function assumes a valid one.
    */
  private[graft] def likeRegex(pattern: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' if i + 1 < pattern.length =>
          sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
          i += 1
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case c   => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    java.util.regex.Pattern.compile(sb.toString, java.util.regex.Pattern.DOTALL)
  }

  /** Spark's own default-escape validity rule (`StringUtils
    * .escapeLikeRegex` semantics): the escape char may precede only `%`,
    * `_`, or itself; a trailing or misplaced escape makes the whole LIKE
    * throw at eval on the exact plane, so the model plane must refuse to
    * fold it rather than invent an answer for a query that errors.
    */
  private[graft] def validLikePattern(pattern: String): Boolean = {
    var i = 0
    while (i < pattern.length) {
      if (pattern.charAt(i) == '\\') {
        if (i + 1 >= pattern.length) return false
        val n = pattern.charAt(i + 1)
        if (n != '%' && n != '_' && n != '\\') return false
        i += 1
      }
      i += 1
    }
    true
  }
}
