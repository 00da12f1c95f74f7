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

  def estimate(spns: Map[String, Ensemble.TrainedSpn], sql: String): SqlResult = {
    val q = SqlParser.parseQuery(sql)
    val preds = mergePreds(spns, q.preds)

    if (q.orPreds.nonEmpty) {
      // OR reaches the model plane through inclusion–exclusion, which is a
      // COUNT identity; SUM is linear too but AVG/GROUP BY would need the
      // per-branch decomposition the reference also doesn't attempt.
      if (q.groupBy.nonEmpty) throw new IllegalArgumentException(
        "unsupported SQL: OR combined with GROUP BY")
      q.agg match {
        case Count => Scalar(Ensemble.estCountOr(spns, q.tables, preds, mergePreds(spns, q.orPreds)))
        case other => throw new IllegalArgumentException(
          s"unsupported SQL: OR with aggregate $other (COUNT(*) only)")
      }
    } else q.groupBy match {
      case Nil => Scalar(scalarOf(spns, q, preds))
      case gc :: Nil if q.agg == Count =>
        require(modelColOf(spns, gc._1, gc._2).dict.nonEmpty,
          s"GROUP BY ${gc._2}: not a categorical model column")
        // the memoized enumeration shares factor denominators across groups
        Groups(Ensemble.estGroupByMulti(spns, q.tables, Seq(gc), preds))
      case gc :: Nil =>
        val (gt, gcol) = gc
        val mc = modelColOf(spns, gt, gcol)
        require(mc.dict.nonEmpty, s"GROUP BY $gcol: not a categorical model column")
        val rows = mc.dict.toIndexedSeq.flatMap { v =>
          // intersect with any WHERE predicate on the group column so
          // filtered-out groups are not resurrected
          Ensemble.intersect(preds, Map((gt, gcol) -> NominalSet(Array(mc.code(v)))))
            .flatMap { gp =>
              val n = Ensemble.estCount(spns, q.tables, gp)
              if (n.value <= 0) None // prune zero-prob combos
              else Some(Seq(v) -> scalarOf(spns, q, gp))
            }
        }
        Groups(rows)
      case gcs =>
        // multi-column enumeration with prefix pruning; COUNT only (the
        // reference's group_by_combination enumerates counts the same way)
        if (q.agg != Count) throw new IllegalArgumentException(
          s"unsupported SQL: multi-column GROUP BY with aggregate ${q.agg} (COUNT(*) only)")
        Groups(Ensemble.estGroupByMulti(spns, q.tables, gcs, preds))
    }
  }

  /** Conjuncts on the SAME column must intersect, not overwrite (a >= lo
    * AND a < hi is two parsed predicates); a provably empty intersection
    * becomes an empty nominal set — zero mass at every leaf.
    */
  private def mergePreds(
      spns: Map[String, Ensemble.TrainedSpn],
      ps: Seq[Pred]): Map[(String, String), ColRange] =
    ps.foldLeft(Map.empty[(String, String), ColRange]) { (acc, p) =>
      val one = Map((p.table, p.col) -> toRange(spns, p))
      Ensemble.intersect(acc, one)
        .getOrElse(acc + ((p.table, p.col) -> NominalSet(Array.empty[Double])))
    }

  private def scalarOf(
      spns: Map[String, Ensemble.TrainedSpn],
      q: ParsedQuery,
      preds: Map[(String, String), ColRange]): Ensemble.Estimate = q.agg match {
    case Count     => Ensemble.estCount(spns, q.tables, preds)
    case Sum(t, c) => Ensemble.estSum(spns, q.tables, (t, c), preds)
    case Avg(t, c) => Ensemble.estAvg(spns, q.tables, (t, c), preds)
    case SumProduct(ta, ca, tb, cb) =>
      Ensemble.estSumProduct(spns, q.tables, Seq((ta, ca), (tb, cb)), preds)
  }

  private def modelColOf(spns: Map[String, Ensemble.TrainedSpn], table: String, col: String): Ensemble.ModelCol =
    Ensemble.findModelCol(spns, table, col)
      .getOrElse(throw new NoSuchElementException(s"$table.$col is not a modeled column"))

  private def toRange(spns: Map[String, Ensemble.TrainedSpn], p: Pred): ColRange = p.range match {
    case NumR(lo, hi, li, hi2)  => NumRange(lo, hi, li, hi2)
    case DateR(lo, hi, li, hi2) => NumRange(lo, hi, li, hi2)
    case StrIn(values) =>
      val mc = modelColOf(spns, p.table, p.col)
      // values absent from the dictionary contribute zero mass, as in the
      // reference's NominalRange over known codes
      val codes = values.flatMap { v =>
        val i = java.util.Arrays.binarySearch(mc.dict.asInstanceOf[Array[AnyRef]], v)
        if (i >= 0) Some(i.toDouble) else None
      }
      NominalSet(codes.toArray)
  }
}
