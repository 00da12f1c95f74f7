package graft.rspn

import SqlParser._

/** Compile a ParsedQuery to model-plane estimates — the reference's
  * maqp.py --evaluate_aqp_queries path: SQL text → Query → SPN inference,
  * no data touched. GROUP BY enumerates the group column's model support and
  * estimates each group (aqp_spn/group_by_combination.py), pruning
  * zero-probability groups.
  */
object SqlEstimate {

  sealed trait SqlResult
  final case class Scalar(est: Ensemble.Estimate) extends SqlResult
  final case class Groups(rows: Seq[(String, Ensemble.Estimate)]) extends SqlResult

  def estimate(spns: Map[String, Ensemble.TrainedSpn], sql: String): SqlResult = {
    val q = SqlParser.parseQuery(sql)
    // conjuncts on the SAME column must intersect, not overwrite (a >= lo
    // AND a < hi is two parsed predicates); a provably empty intersection
    // becomes an empty nominal set — zero mass at every leaf
    val preds = q.preds.foldLeft(Map.empty[(String, String), ColRange]) { (acc, p) =>
      val one = Map((p.table, p.col) -> toRange(spns, p))
      Ensemble.intersect(acc, one)
        .getOrElse(acc + ((p.table, p.col) -> NominalSet(Array.empty[Double])))
    }
    q.groupBy match {
      case None => Scalar(scalarOf(spns, q, preds))
      case Some((gt, gc)) =>
        val mc = modelColOf(spns, gt, gc)
        require(mc.dict.nonEmpty, s"GROUP BY $gc: not a categorical model column")
        val rows = mc.dict.toIndexedSeq.flatMap { v =>
          // intersect with any WHERE predicate on the group column so
          // filtered-out groups are not resurrected
          Ensemble.intersect(preds, Map((gt, gc) -> NominalSet(Array(mc.code(v)))))
            .flatMap { gp =>
              val n = Ensemble.estCount(spns, q.tables, gp)
              if (n.value <= 0) None // prune zero-prob combos
              else q.agg match {
                case Count => Some(v -> n) // the pruning pass IS the answer
                case _     => Some(v -> scalarOf(spns, q, gp))
              }
            }
        }
        Groups(rows)
    }
  }

  private def scalarOf(
      spns: Map[String, Ensemble.TrainedSpn],
      q: ParsedQuery,
      preds: Map[(String, String), ColRange]): Ensemble.Estimate = q.agg match {
    case Count       => Ensemble.estCount(spns, q.tables, preds)
    case Sum(t, c)   => Ensemble.estSum(spns, q.tables, (t, c), preds)
    case Avg(t, c)   => Ensemble.estAvg(spns, q.tables, (t, c), preds)
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
