package graft

import graft.rspn.SqlParser
import graft.rspn.SqlParser._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** CNF pre-simplification properties (r18): randomized same-column
  * disjunctions must (a) absorb to ZERO disjunction slots at parse and
  * (b) keep point semantics — the absorbed RangeSpec admits exactly the
  * values some written branch admits — checked against brute-force
  * membership on a value grid, so the union algebra can never drift from
  * the disjunction it replaces. Everything goes through the PUBLIC
  * parseQuery path (the shape a user's SQL actually takes).
  */
object SqlCnfProps extends Properties("sqlcnf") {

  /** One comparison branch on l_quantity, as SQL text + point semantics. */
  private case class Branch(sql: String, holds: Double => Boolean)

  private val genCmp: Gen[Branch] = for {
    op <- Gen.oneOf("<", "<=", ">", ">=", "=")
    v  <- Gen.choose(-5, 55)
  } yield Branch(s"l_quantity $op $v", x => op match {
    case "<"  => x < v
    case "<=" => x <= v
    case ">"  => x > v
    case ">=" => x >= v
    case _    => x == v
  })

  private val genBetween: Gen[Branch] = for {
    a <- Gen.choose(-5, 50)
    w <- Gen.choose(0, 10)
  } yield Branch(s"l_quantity BETWEEN $a AND ${a + w}", x => x >= a && x <= a + w)

  private val genNotNull: Gen[Branch] =
    Gen.const(Branch("l_quantity IS NOT NULL", _ => true))

  private val genBranch: Gen[Branch] =
    Gen.frequency(5 -> genCmp, 3 -> genBetween, 1 -> genNotNull)

  private val grid: Seq[Double] =
    (-6 to 57).map(_.toDouble) ++ (-6 to 56).map(_ + 0.5)

  /** Point semantics of the parser's RangeSpec output (non-NULL values). */
  private def admits(r: RangeSpec, v: Double): Boolean = r match {
    case NumR(lo, hi, li, hi2) =>
      (if (li) v >= lo else v > lo) && (if (hi2) v <= hi else v < hi)
    case NumUnion(ivs, _) =>
      ivs.exists { case (lo, hi, li, hi2) =>
        (if (li) v >= lo else v > lo) && (if (hi2) v <= hi else v < hi)
      }
    case NumNotIn(vs, _) => !vs.contains(v)
    case NotNull         => true
    case other           => sys.error(s"unexpected spec for a numeric column: $other")
  }

  property("2-3 same-column branches absorb to zero OR slots with exact point semantics") =
    forAll(Gen.choose(2, 3).flatMap(n => Gen.listOfN(n, genBranch))) { branches =>
      val where = branches.map(_.sql).mkString("(", " OR ", ")")
      val q = SqlParser.parseQuery(s"SELECT COUNT(*) FROM lineitem WHERE $where")
      val noSlots = q.orPreds.isEmpty && q.orGroupsN.isEmpty
      val spec = q.preds match {
        case Seq(Pred("lineitem", "l_quantity", r)) => Some(r)
        case Seq()                                  => None // all-TRUE union dropped? never produced
        case _                                      => None
      }
      noSlots && spec.exists(r =>
        grid.forall(v => admits(r, v) == branches.exists(_.holds(v))))
    }

  property("a same-column group beside three cross-column groups still parses (4 written, 3 effective)") =
    forAll(Gen.listOfN(2, genCmp)) { bs =>
      val sql = s"""SELECT COUNT(*) FROM lineitem WHERE
        (${bs(0).sql} OR ${bs(1).sql})
        AND (l_discount < 0.02 OR l_tax > 0.06)
        AND (l_returnflag = 'A' OR l_linestatus = 'O')
        AND (l_tax < 0.01 OR l_discount > 0.09)"""
      val q = SqlParser.parseQuery(sql)
      // all three surviving groups ride orGroupsN undistributed (r18
      // convention) — the absorbed same-column group costs no slot
      q.orGroupsN.length == 3 && q.orPreds.isEmpty &&
        q.orGroupsN.forall(_.length == 2)
    }

  // one distinct-column atom per pool slot, with group-specific literals,
  // so branches inside a group can never absorb (no same-column union)
  // and no group's branch set subsumes another's (r19: disjoint literals
  // defeat the cross-group superset law) — the surviving layout is
  // exactly the written one
  private def atomPool(g: Int) = Seq(
    s"l_quantity < ${8 + g}", s"l_discount > 0.0${5 + g}",
    s"l_tax < 0.0${1 + g}", s"l_extendedprice > ${50000 + 1000 * g}")

  property("the signed-term-product cap admits exactly the Π(2^k−1) ≤ 27 layouts") =
    forAll(Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.choose(2, 4)))) { ks0 =>
      val ks = ks0.map(k => 2 max k min 4) // shrinker may step outside the Gen range
      val where = ks.zipWithIndex
        .map { case (k, g) => atomPool(g).take(k).mkString("(", " OR ", ")") }
        .mkString(" AND ")
      val sql = s"SELECT COUNT(*) FROM lineitem WHERE $where"
      val product = ks.map(k => (1L << k) - 1).product
      if (product <= 27) {
        val q = SqlParser.parseQuery(sql)
        if (ks == Seq(2)) // the lone 2-branch group keeps the legacy form
          q.orPreds.nonEmpty && q.orGroupsN.isEmpty
        else q.orPreds.isEmpty && q.orGroupsN.map(_.length) == ks
      } else
        scala.util.Try(SqlParser.parseQuery(sql)).failed.toOption
          .exists(_.getMessage.contains("signed expansion terms"))
    }

  property("a superset group absorbs cross-group: (A∨B)∧(A∨B∨C)∧(D∨E) = 2 effective") =
    forAll(Gen.choose(2, 3)) { k =>
      // the smaller group's branch set is a strict subset of the larger's,
      // so the larger adds no constraint — without the r19 law a k=3 base
      // (7·15·3 = 315 terms) would fail the ≤27 cap loudly
      val base  = atomPool(0).take(k)
      val supr  = base :+ "l_returnflag = 'A'"
      val other = Seq("l_linestatus = 'F'", "l_shipmode = 'AIR'")
      val sql = s"SELECT COUNT(*) FROM lineitem WHERE " +
        s"${base.mkString("(", " OR ", ")")} AND ${supr.mkString("(", " OR ", ")")}" +
        s" AND ${other.mkString("(", " OR ", ")")}"
      val q = SqlParser.parseQuery(sql)
      q.orPreds.isEmpty && q.orGroupsN.map(_.length) == Seq(k, 2)
    }

  property("same-column singles PARTIALLY absorb beside a residual branch (r19)") =
    forAll(Gen.choose(2, 3).flatMap(n => Gen.listOfN(n, genBranch))) { branches =>
      // (q1 ∨ q2 [∨ q3] ∨ disc) — the quantity singles union into ONE slot
      // with exact point semantics; the cross-column residual keeps its own
      val uniq = branches.distinctBy(_.sql)
      val where = (uniq.map(_.sql) :+ "l_discount > 0.07").mkString("(", " OR ", ")")
      val q = SqlParser.parseQuery(s"SELECT COUNT(*) FROM lineitem WHERE $where")
      // the merged result is a lone 2-branch group, so it rides the legacy
      // distributed (preds, orPreds) form with no common conjuncts
      val group: Seq[Seq[Pred]] = Seq(q.preds, q.orPreds)
      q.orGroupsN.isEmpty && group.forall(_.length == 1) && {
        val merged = group.collectFirst {
          case Seq(Pred("lineitem", "l_quantity", r)) => r
        }
        merged.exists(r =>
          grid.forall(v => admits(r, v) == uniq.exists(_.holds(v))))
      }
    }

  property("partial absorption charges the cap at the effective count: 63 written → 27") = {
    // first group: 3 written branches, 2 effective after the same-column
    // union — Π(2^k−1) = 7·3·3 = 63 written would fail loudly; 3·3·3 = 27
    // effective folds
    val sql = """SELECT COUNT(*) FROM lineitem WHERE
      (l_quantity < 5 OR l_quantity > 40 OR l_returnflag = 'A')
      AND (l_discount < 0.02 OR l_tax > 0.06)
      AND (l_extendedprice > 60000 OR l_linestatus = 'F')"""
    val q = SqlParser.parseQuery(sql)
    org.scalacheck.Prop(q.orPreds.isEmpty && q.orGroupsN.map(_.length) == Seq(2, 2, 2))
  }

  property("within-group branch subsumption: (A∧B ∨ A ∨ C) drops the stricter branch") = {
    // (A∧B) implies A, so it adds nothing to the union — the group
    // reduces to (A ∨ C), a lone 2-branch group in the legacy form
    val q = SqlParser.parseQuery(
      """SELECT COUNT(*) FROM lineitem WHERE
        (l_quantity < 8 AND l_returnflag = 'A' OR l_quantity < 8 OR l_tax < 0.02)""")
    org.scalacheck.Prop(
      q.orGroupsN.isEmpty && q.preds.length == 1 && q.orPreds.length == 1 &&
        Set(q.preds.head.col, q.orPreds.head.col) == Set("l_quantity", "l_tax"))
  }

  property("implication-based cross-group drop: (A∧B ∨ C)∧(A ∨ C) ≡ (A∧B ∨ C)") = {
    // every branch of group 1 implies a branch of group 2 (A∧B ⟹ A,
    // C ⟹ C), so group 2 adds no constraint — the r19 generalization past
    // whole-branch-set containment
    val q = SqlParser.parseQuery(
      """SELECT COUNT(*) FROM lineitem WHERE
        (l_quantity < 8 AND l_returnflag = 'A' OR l_tax < 0.02)
        AND (l_quantity < 8 OR l_tax < 0.02)""")
    org.scalacheck.Prop(
      q.orGroupsN.isEmpty && q.preds.length == 2 && q.orPreds.length == 1 &&
        q.preds.map(_.col).toSet == Set("l_quantity", "l_returnflag") &&
        q.orPreds.head.col == "l_tax")
  }

  property("a group implied by a plain conjunct drops: A∧(A∨C) ≡ A") =
    forAll(Gen.choose(2, 4)) { k =>
      val branches = atomPool(1).take(k)
      val sql = s"SELECT COUNT(*) FROM lineitem WHERE ${branches.head} AND " +
        branches.mkString("(", " OR ", ")")
      val q = SqlParser.parseQuery(sql)
      // the group is always true under the conjunct — zero slots survive
      q.orPreds.isEmpty && q.orGroupsN.isEmpty &&
        q.preds == Seq(SqlParser.parseQuery(
          s"SELECT COUNT(*) FROM lineitem WHERE ${branches.head}").preds.head)
    }
}
