package graft.rspn

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

/** Brute-force correctness of the signed inclusion–exclusion core (r18):
  * for ANY conjunction of disjunction groups over discrete columns, the
  * signed sum of per-term point counts from `Ensemble.signedConjTerms`
  * must equal the direct count of points satisfying the CNF — i.e. the
  * expansion Π_g Σ_{∅≠S⊆branches_g} (−1)^{|S|+1} 1_{∧S} is an IDENTITY,
  * not an approximation, independent of branch count, overlap structure,
  * or provably-disjoint subset drops. Runs on a 3-column integer grid
  * with no Spark and no models, so a violation isolates the expansion
  * algebra itself (the estimators consume its terms verbatim).
  */
object SignedExpansionProps extends Properties("signedexpansion") {

  // r18 shipped a silent term-loss bug (duplicate-after-compile branches
  // cancel under combinations()); THIS seed falsified the identity
  // property and is pinned so the historical counterexample replays on
  // every run — the regression gate for the r19 `.distinct` fix.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withInitialSeed(Seed.fromBase64("sPzG7dbWSQT-OpVyoW7nzXAaCkBH8zTtG4om0Tol3_K=").get)

  private val cols = Seq(("t", "a"), ("t", "b"), ("t", "c"))
  private val domain = 0 to 9
  private val grid: Seq[Map[(String, String), Int]] =
    for (a <- domain; b <- domain; c <- domain)
      yield Map(cols(0) -> a, cols(1) -> b, cols(2) -> c)

  private def admits(r: ColRange, v: Int): Boolean = r match {
    case NumRange(lo, hi, li, hi2) =>
      (if (li) v >= lo else v > lo) && (if (hi2) v <= hi else v < hi)
    case MultiRange(ivs)  => ivs.exists(admits(_, v))
    case NominalSet(code) => code.contains(v.toDouble)
    case NotNullRange     => true
  }

  private def satisfies(p: Map[(String, String), ColRange],
      point: Map[(String, String), Int]): Boolean =
    p.forall { case (tc, r) => admits(r, point(tc)) }

  private val genRange: Gen[ColRange] = Gen.oneOf(
    for { lo <- Gen.choose(-1, 9); w <- Gen.choose(0, 6) }
      yield NumRange(lo.toDouble, (lo + w).toDouble),
    Gen.nonEmptyListOf(Gen.choose(0, 9))
      .map(vs => NominalSet(vs.distinct.map(_.toDouble).toArray)),
    for { lo1 <- Gen.choose(-1, 3); lo2 <- Gen.choose(5, 8) }
      yield MultiRange(Vector(
        NumRange(lo1.toDouble, (lo1 + 1).toDouble),
        NumRange(lo2.toDouble, (lo2 + 2).toDouble))))

  private val genBranch: Gen[Map[(String, String), ColRange]] =
    for {
      n  <- Gen.choose(1, 2)
      cs <- Gen.pick(n, cols)
      rs <- Gen.listOfN(n, genRange)
    } yield cs.zip(rs).toMap

  private val genGroup: Gen[Seq[Option[Map[(String, String), ColRange]]]] =
    for {
      k        <- Gen.choose(2, 4)
      branches <- Gen.listOfN(k, genBranch)
    } yield branches.map(Some(_))

  property("signed term counts sum to the exact CNF-of-disjunctions count") =
    forAll(Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genGroup))) { groups =>
      val direct = grid.count(pt =>
        groups.forall(_.exists(_.exists(satisfies(_, pt)))))
      Ensemble.signedConjTerms(groups) match {
        case None => false // no group here has all branches dead
        case Some(terms) =>
          val signed = terms.map { case (sgn, p) =>
            sgn * grid.count(satisfies(p, _))
          }.sum
          math.abs(signed - direct) < 1e-9
      }
    }

  property("a 2-branch group reproduces the classic {+A, +B, -A∧B} picks") =
    forAll(Gen.listOfN(2, genBranch)) { bs =>
      val terms = Ensemble.signedConjTerms(Seq(bs.map(Some(_)))).get
      val pos = terms.count(_._1 > 0)
      val neg = terms.count(_._1 < 0)
      if (bs(0) == bs(1)) pos == 1 && neg == 0 // A∨A≡A dedupes to {+A} (r19)
      else
        // the minus pick is DROPPED when A∧B is provably disjoint
        pos == 2 && (neg == 1 || neg == 0) &&
          (neg == 1 || Ensemble.intersect(bs(0), bs(1)).isEmpty)
    }

  property("duplicated branches never change the expansion (A∨A≡A)") =
    forAll(Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genGroup)),
           Gen.choose(0, 7)) { (groups, dupPick) =>
      // duplicate one branch inside one group — the r18 bug class: two
      // spellings of a predicate compile to EQUAL maps and combinations()
      // silently drops subsets, collapsing the estimate
      val gi = dupPick % groups.length
      val doubled = groups.updated(gi, groups(gi) :+ groups(gi)(dupPick % groups(gi).length))
      def signedCount(gs: Seq[Seq[Option[Map[(String, String), ColRange]]]]) =
        Ensemble.signedConjTerms(gs).map(_.map { case (sgn, p) =>
          sgn * grid.count(satisfies(p, _))
        }.sum)
      (signedCount(groups), signedCount(doubled)) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case (x, y)             => x == y
      }
    }

  property("judge r18 counterexample: two identical MultiRange branches = |A|") = {
    // the shrunk r18 counterexample: one group, two identical
    // MultiRange([2,3]∪[8,10]) branches — the buggy expansion emitted
    // {+A, −A} = 0 instead of |A|
    val a: Map[(String, String), ColRange] = Map(
      cols(0) -> MultiRange(Vector(NumRange(2.0, 3.0), NumRange(8.0, 10.0))))
    val terms = Ensemble.signedConjTerms(Seq(Seq(Some(a), Some(a)))).get
    val signed = terms.map { case (sgn, p) => sgn * grid.count(satisfies(p, _)) }.sum
    val direct = grid.count(satisfies(a, _)).toDouble
    direct > 0 && math.abs(signed - direct) < 1e-9
  }

  property("a group whose branches are all contradicted annihilates to None") =
    forAll(genGroup) { g =>
      val dead = g.map(_ => Option.empty[Map[(String, String), ColRange]])
      Ensemble.signedConjTerms(Seq(dead, g)).isEmpty
    }
}
