package graft

import graft.rspn._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Multi-interval range algebra (rspn/Nodes.scala::ColRangeOps +
  * MultiRange) — parity with the reference's list-of-intervals predicate
  * (`aqp_spn/ranges.py::NumericRange` carries `[[lo,hi]…]` + inclusive
  * flags). Everything here is checked against brute-force set membership
  * on a value grid, so the algebra can't drift from its point semantics;
  * the leaf properties check MultiRange mass against per-value filtering
  * on hand-built leaves and the compiled evaluator.
  */
object ColRangeProps extends Properties("colrange") {

  private def contains(r: ColRange, v: Double): Boolean = r match {
    case NumRange(lo, hi, li, hi2) =>
      (if (li) v >= lo else v > lo) && (if (hi2) v <= hi else v < hi)
    case MultiRange(is)  => is.exists(contains(_, v))
    case NominalSet(cs)  => cs.contains(v)
    case NotNullRange    => true
  }

  private val grid: Seq[Double] =
    (-20 to 20).map(_.toDouble) ++ (-20 to 19).map(_ + 0.5)

  private val genInterval: Gen[NumRange] = for {
    a <- Gen.choose(-15, 15)
    w <- Gen.choose(0, 8)
    li <- Gen.oneOf(true, false)
    hi <- Gen.oneOf(true, false)
  } yield NumRange(a.toDouble, (a + w).toDouble, li, hi)

  private val genRange: Gen[ColRange] = Gen.frequency(
    4 -> genInterval,
    2 -> Gen.nonEmptyListOf(Gen.choose(-15, 15)).map(vs =>
      NominalSet(vs.map(_.toDouble).distinct.toArray)),
    2 -> Gen.nonEmptyListOf(genInterval).map(is =>
      ColRangeOps.normalize(is).getOrElse(NominalSet(Array.empty))),
    1 -> Gen.const(NotNullRange))

  property("normalize preserves membership and yields sorted disjoint intervals") =
    forAll(Gen.listOf(genInterval)) { is =>
      val norm = ColRangeOps.normalize(is)
      val memberOk = grid.forall { v =>
        is.exists(contains(_, v)) == norm.exists(contains(_, v))
      }
      val shapeOk = norm match {
        case None                 => true
        case Some(n: NumRange)    => !(n.lo > n.hi)
        case Some(MultiRange(xs)) =>
          xs.length >= 2 && xs.sliding(2).forall {
            case Seq(a, b) =>
              // strictly separated: a genuine gap (a touching pair with a
              // covered endpoint must have merged)
              a.hi < b.lo || (a.hi == b.lo && !a.hiIncl && !b.loIncl)
            case _ => true
          }
        case Some(_) => false
      }
      memberOk && shapeOk
    }

  property("meet is set intersection on every shape pair") =
    forAll(genRange, genRange) { (a, b) =>
      val m = ColRangeOps.meet(a, b)
      grid.forall { v =>
        m.exists(contains(_, v)) == (contains(a, v) && contains(b, v))
      }
    }

  property("union is set union over any mix of shapes") =
    forAll(Gen.nonEmptyListOf(genRange)) { rs =>
      val u = ColRangeOps.union(rs)
      grid.forall { v =>
        u.exists(contains(_, v)) == rs.exists(contains(_, v))
      }
    }

  property("NotNull absorbs a union; all-nominal unions stay nominal") = Prop {
    ColRangeOps.union(Seq(NumRange(1, 2), NotNullRange)).contains(NotNullRange) &&
      (ColRangeOps.union(Seq(NominalSet(Array(1.0)), NominalSet(Array(2.0, 1.0)))) match {
        case Some(NominalSet(cs)) => cs.sorted.toSeq == Seq(1.0, 2.0)
        case _                    => false
      })
  }

  property("the != gap never merges; a covered touching endpoint does") = Prop {
    val neq = ColRangeOps.normalize(Seq(
      NumRange(Double.NegativeInfinity, 5.0, loIncl = false, hiIncl = false),
      NumRange(5.0, Double.PositiveInfinity, loIncl = false, hiIncl = false)))
    val gapOk = neq match {
      case Some(m @ MultiRange(is)) =>
        is.length == 2 && !contains(m, 5.0) && contains(m, 4.5) && contains(m, 5.5)
      case _ => false
    }
    gapOk && ColRangeOps.normalize(Seq(
      NumRange(0, 5, hiIncl = false), NumRange(5, 9))).contains(NumRange(0, 9))
  }

  property("NumericLeaf MultiRange mass = sum of disjoint interval masses") = {
    val vals = (0 until 50).map(_.toDouble).toArray
    val probs = Array.fill(50)(0.018) // 0.9 mass, 0.1 null
    val leaf = NumericLeaf(0, vals, probs, pNull = 0.1, n = 1000)
    forAll(Gen.listOfN(3, genInterval)) { is =>
      ColRangeOps.normalize(is) match {
        case None => true
        case Some(r) =>
          val exact = vals.zip(probs).collect { case (v, p) if contains(r, v) => p }.sum
          math.abs(leaf.rangeSum(r, leaf.cumProb) - exact) < 1e-12
      }
    }
  }

  property("CategoricalLeaf and compiled evaluator agree on MultiRange over codes") = Prop {
    val probs = Array(0.2, 0.3, 0.1, 0.25, 0.05) // 0.9 mass, 0.1 null
    val leaf = CategoricalLeaf(0, probs, pNull = 0.1, n = 100)
    val r = MultiRange(Vector(NumRange(0, 1), NumRange(3, 4, loIncl = false)))
    val exact = probs(0) + probs(1) + probs(4)
    math.abs(Spn.expect(leaf, Array(r), Array(0)) - exact) < 1e-12 &&
      math.abs(CompiledSpn(leaf).expect(Array(r), Array(0)) - exact) < 1e-12
  }
}
