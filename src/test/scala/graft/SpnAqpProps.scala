package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property lock on the transparent AQP rewrite (plans/SpnAqp.scala): for
  * RANDOM predicates inside the answerable class, the folded answer must
  * stay within q-error bounds of the exact one AND the plan must be a
  * zero-scan LocalRelation; for random predicates OUTSIDE the class, the
  * rule must leave the plan scanning and the answer must equal the exact
  * session's EXACTLY — approximate-when-possible, exact-otherwise, over
  * the whole generated space (the example specs pin chosen points; this
  * pins the contract's shape).
  */
object SpnAqpProps extends Properties("spn_aqp") {
  import TestSpark._

  // each case runs two Spark queries (exact + approx); keep the count sane
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val planTables = Seq("lineitem", "orders", "customer", "part", "supplier", "documents")

  private lazy val tmpSf: String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-aqpprops-")
    planTables.foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"), dir.resolve(s"$t.parquet"))
    }
    val d = dir.toString
    rspn.Ensemble.get(spark, d)
    planTables.foreach(t => schema.Tables(spark, d, t).unpersist(blocking = true))
    d
  }

  private def session(aqp: Boolean): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", tmpSf)
    if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
    planTables.foreach(t =>
      s2.read.parquet(s"$tmpSf/$t.parquet").createOrReplaceTempView(t))
    s2
  }

  private def isRewritten(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case _: LogicalRelation => () }.isEmpty &&
      plan.collectFirst { case _: LocalRelation => () }.nonEmpty
  }

  private def qerr(e: Double, x: Double): Double = {
    val a = math.max(e, 1.0); val b = math.max(x, 1.0); math.max(a / b, b / a)
  }

  private val rangeGen: Gen[(Int, Int, Int, Boolean)] = for {
    lo <- Gen.choose(1, 38)
    width <- Gen.choose(3, 12)
    dHi <- Gen.choose(1, 10) // l_discount < dHi/100
    renamed <- Gen.oneOf(true, false)
  } yield (lo, lo + width, dHi, renamed)

  property("answerable conjunctions fold to zero-scan plans within q-error 2") =
    forAll(rangeGen) { case (lo, hi, dHi, renamed) =>
      // half the space routes through a RENAMED derived table — the alias
      // layer must be transparent to the fold across the whole generator
      val sql =
        if (renamed)
          s"""SELECT count(*) AS n, sum(price) AS s FROM
                (SELECT l_quantity AS q, l_discount AS disc,
                        l_extendedprice AS price FROM lineitem) t
              WHERE q BETWEEN $lo AND $hi AND disc < 0.0$dHi"""
        else
          s"""SELECT count(*) AS n, sum(l_extendedprice) AS s FROM lineitem
                    WHERE l_quantity BETWEEN $lo AND $hi AND l_discount < 0.0$dHi"""
      val exact = session(aqp = false).sql(sql).head
      val df = session(aqp = true).sql(sql)
      val est = df.head
      val okPlan = isRewritten(df)
      // an empty exact slice legitimately estimates near 0 — qerr's +1
      // clamp keeps the bound meaningful there
      val okN = qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 2.0
      // round 10: the fold emits SQL's NULL for SUM over an (estimated)
      // empty selection — accept est NULL whenever the exact slice is at
      // most a couple of rows (the count gate already bounds the miss)
      val okS = exact.isNullAt(1) ||
        (est.isNullAt(1) && exact.getLong(0) <= 2) ||
        (!est.isNullAt(1) && qerr(est.getDouble(1), exact.getDouble(1)) <= 2.5)
      if (!(okPlan && okN && okS))
        println(s"FAIL [$sql] plan=$okPlan n=${est.getLong(0)}/${exact.getLong(0)} " +
          s"s=${if (exact.isNullAt(1)) "null" else est.getDouble(1) + "/" + exact.getDouble(1)}")
      okPlan && okN && okS
    }

  // round 11 late: a numeric != landing inside, at the edge of, or
  // outside the BETWEEN range (the disjoint-range rewrite must compose
  // with the range atoms — an empty branch intersection is mass 0, not a
  // miss), a FILTER clause narrowing one aggregate over the conjunctive
  // base, or BOTH (the clause's atoms distribute into the !='s branch
  // sets through the OR paths' atom-parameterized recursion).
  private val r11Gen: Gen[(Int, Int, Int, Int, Int)] = for {
    shape <- Gen.choose(0, 2) // 0 = neq, 1 = filter, 2 = both
    ne <- Gen.choose(1, 50)
    lo <- Gen.choose(1, 38)
    width <- Gen.choose(3, 12)
    dHi <- Gen.choose(1, 10)
  } yield (shape, ne, lo, lo + width, dHi)

  property("numeric != and FILTER clauses fold zero-scan within q-error 2") =
    forAll(r11Gen) { case (shape, ne, lo, hi, dHi) =>
      val sql = shape match {
        case 0 =>
          s"""SELECT count(*) AS n, count(l_discount) AS n2 FROM lineitem
              WHERE l_quantity BETWEEN $lo AND $hi AND l_quantity != $ne"""
        case 1 =>
          s"""SELECT count(*) AS n,
                    count(*) FILTER (WHERE l_discount < 0.0$dHi) AS n2
              FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi"""
        case _ =>
          s"""SELECT count(*) AS n,
                    count(*) FILTER (WHERE l_discount < 0.0$dHi) AS n2
              FROM lineitem
              WHERE l_quantity BETWEEN $lo AND $hi AND l_quantity != $ne"""
      }
      val exact = session(aqp = false).sql(sql).head
      val df = session(aqp = true).sql(sql)
      val est = df.head
      val okPlan = isRewritten(df)
      val okN = qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 2.0
      val okF = qerr(est.getLong(1).toDouble, exact.getLong(1).toDouble) <= 2.0
      if (!(okPlan && okN && okF))
        println(s"FAIL [$sql] plan=$okPlan n=${est.getLong(0)}/${exact.getLong(0)} " +
          s"n2=${est.getLong(1)}/${exact.getLong(1)}")
      okPlan && okN && okF
    }

  // r15: the OR-composed calendar class — a RANDOM cross-column
  // disjunction under year buckets must fold zero-scan and match exact
  // per bucket (phantom/dropped cells trivial, shared cells within loose
  // q-error — the example specs' sparse-bucket convention)
  private val orCalGen: Gen[(Int, Int, Int)] = for {
    lo <- Gen.choose(1, 30)
    width <- Gen.choose(5, 15)
    dHi <- Gen.choose(2, 9)
  } yield (lo, lo + width, dHi)

  property("cross-column ORs × calendar buckets fold zero-scan, per-bucket accurate") =
    forAll(orCalGen) { case (lo, hi, dHi) =>
      val sql =
        s"""SELECT year(l_shipdate) AS y, count(*) AS n FROM lineitem
            WHERE l_quantity BETWEEN $lo AND $hi OR l_discount > 0.0$dHi
            GROUP BY year(l_shipdate)"""
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
      val df = session(aqp = true).sql(sql)
      val est = df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
      val okPlan = isRewritten(df)
      val okPhantom = (est.keySet diff exact.keySet).forall(k => est(k) <= 5.0)
      val okDropped = (exact.keySet diff est.keySet).forall(k => exact(k) <= 5.0)
      val okCells = (est.keySet intersect exact.keySet).forall(k =>
        qerr(est(k), exact(k)) <= 2.0 || math.abs(est(k) - exact(k)) <= 10.0)
      val ok = okPlan && okPhantom && okDropped && okCells
      if (!ok) println(s"FAIL [$sql] plan=$okPlan phantom=$okPhantom " +
        s"dropped=$okDropped cells=$okCells est=$est exact=$exact")
      ok
    }

  private val unanswerableGen: Gen[String] = Gen.oneOf(
    // LIKE on an UNMODELED string column (modeled cat columns fold by
    // dictionary closure since round 10)
    "SELECT count(*) AS n FROM customer WHERE c_name LIKE '%5%'",
    // MAX over an UNMODELED numeric column: no realized-value support
    // (modeled numerics fold via NumericLeaf support since round 14)
    "SELECT max(l_linenumber) AS m FROM lineitem WHERE l_quantity < 30",
    // unmodeled filter column
    "SELECT count(*) AS n FROM lineitem WHERE l_partkey < 500",
    // arithmetic between two columns in the predicate
    "SELECT count(*) AS n FROM lineitem WHERE l_quantity < l_discount * 1000",
    // DISTINCT over a NEAR-CONTINUOUS numeric column: the realized support
    // exceeds the enumeration cap (the bounded form folds since round 14)
    "SELECT count(DISTINCT l_extendedprice) AS n FROM lineitem")

  property("unanswerable queries run exactly, bit-identical to the flag-off session") =
    forAll(unanswerableGen) { sql =>
      val df = session(aqp = true).sql(sql)
      val same = df.collect().toSeq == session(aqp = false).sql(sql).collect().toSeq
      !isRewritten(df) && same
    }

  /** Boundary fixture: `amount` holds the DISTINCT values 0..199 (one row
    * each) plus 60 NULL rows, so a random width-0..2 range selects 0, 1 or
    * 2 rows — exactly the regime where the < 0.5 count gate decides
    * between SQL's NULL and a real aggregate.
    */
  private lazy val boundarySf: String = {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-aqpprops-nullgate-").toString
    spark.range(260).toDF("row_id")
      .withColumn("amount",
        when(col("row_id") >= 200, lit(null).cast("double"))
          .otherwise(col("row_id").cast("double")))
      .write.parquet(s"$d/points.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "points", "primaryKey": ["row_id"]}],
        | "modeled": {"points": [{"col": "amount", "kind": "num"}]}}""".stripMargin)
    rspn.Ensemble.get(spark, d)
    schema.Tables(spark, d, "points").unpersist(blocking = true)
    d
  }

  private def boundarySession(aqp: Boolean): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", boundarySf)
    if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
    s2.read.parquet(s"$boundarySf/points.parquet").createOrReplaceTempView("points")
    s2
  }

  // lo may land outside the domain (negative / past 199) so empty slices
  // are generated, and width 0..2 keeps every slice at 0–2 rows
  private val boundaryGen: Gen[(Int, Int)] = for {
    lo <- Gen.choose(-5, 205)
    width <- Gen.choose(0, 2)
  } yield (lo, width)

  property("SUM/AVG fold to NULL exactly at the count gate's boundary (0-2 row slices)") =
    forAll(boundaryGen) { case (lo, width) =>
      val sql = s"""SELECT count(amount) AS nc, sum(amount) AS s, avg(amount) AS a
                    FROM points WHERE amount >= $lo AND amount < ${lo + width}"""
      val exact = boundarySession(aqp = false).sql(sql).head
      val df = boundarySession(aqp = true).sql(sql)
      val est = df.head
      val okPlan = isRewritten(df)
      // SQL's own invariant, which the gate must reproduce EXACTLY on the
      // fold's emitted row: SUM and AVG are NULL iff the non-null count
      // is zero — a fold emitting (nc=0, s=0.0) or (nc=2, s=null) has a
      // broken gate regardless of estimation error
      val okInvariant = (est.isNullAt(1) == (est.getLong(0) == 0L)) &&
        (est.isNullAt(2) == (est.getLong(0) == 0L))
      // agreement with exact: whenever the count ESTIMATE lands on the
      // same side of the boundary as the exact count, NULL-ness must
      // match the exact plane's; a disagreement is excused only when the
      // count itself crossed the boundary (the documented tolerance)
      val sameSide = (est.getLong(0) == 0L) == (exact.getLong(0) == 0L)
      val okAgreement = !sameSide ||
        (est.isNullAt(1) == exact.isNullAt(1) && est.isNullAt(2) == exact.isNullAt(2))
      // and on 1–2 row slices the model on this 260-row fixture should
      // rarely miss by more than a row — q-error bound on the count keeps
      // the excuse path honest (never systematically wrong)
      val okCount = qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 3.0
      if (!(okPlan && okInvariant && okAgreement && okCount))
        println(s"FAIL [$sql] plan=$okPlan inv=$okInvariant agree=$okAgreement " +
          s"nc=${est.getLong(0)}/${exact.getLong(0)} " +
          s"s=${if (est.isNullAt(1)) "null" else est.getDouble(1)}/" +
          s"${if (exact.isNullAt(1)) "null" else exact.getDouble(1)}")
      okPlan && okInvariant && okAgreement && okCount
    }

  // ---- the sliding-window semantics contract (r16) ----
  // rewriteSliding VERIFIES at rule time that the analyzer's Expand
  // lowering enumerates exactly the canonical windows; this property pins
  // the contract itself against the ENGINE: for random (size, slide) and
  // random timestamps (boundary-heavy), Spark's exact `GROUP BY
  // window(ts, size, slide)` counts must equal the canonical
  // {(s, s+size) : s ≡ 0 (mod slide), s ≤ t < s+size} enumeration
  // computed independently here. If a Spark upgrade ever changes the
  // lowering semantics, this fails loudly — and the recognizer's probe
  // verification falls back on the same change, so answers stay right.
  private val winGen: Gen[(Int, Int, Seq[Long])] = for {
    slideMin <- Gen.choose(1, 6)
    over <- Gen.choose(1, 4) // size = over × slide ± remainder (non-divisible too)
    rem <- Gen.choose(0, slideMin - 1)
    sizeMin = slideMin * over + (if (over > 1) rem else 0)
    n <- Gen.choose(15, 40)
    // boundary-heavy offsets: exact slide multiples, ±1 s, interior
    offs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0L, 6L * 3600).map(t => t - t % (slideMin * 60L)),
      Gen.choose(0L, 6L * 3600).map(t => t - t % (slideMin * 60L) + 1),
      Gen.choose(1L, 6L * 3600).map(t => t - t % (slideMin * 60L) - 1),
      Gen.choose(0L, 6L * 3600)))
  } yield (sizeMin, slideMin, offs)

  property("sliding window lowering matches the canonical enumeration") =
    forAll(winGen) { case (sizeMin, slideMin, offs) =>
      val size = sizeMin * 60L
      val slide = slideMin * 60L
      val base = 1704067200L // 2024-01-01 00:00:00 UTC
      import spark.implicits._
      val rows = offs.map(o => new java.sql.Timestamp((base + o) * 1000L))
      rows.toDF("ts").createOrReplaceTempView("winprop")
      val got = spark.sql(
        s"""SELECT window(ts, '$sizeMin minutes', '$slideMin minutes') AS w, count(*) AS n
           |FROM winprop GROUP BY window(ts, '$sizeMin minutes', '$slideMin minutes')"""
          .stripMargin)
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000L, r.getLong(1))).toMap
      val want = rows.map(_.getTime / 1000L).flatMap { t =>
        val kMax = java.lang.Math.floorDiv(t, slide)
        val kMin = java.lang.Math.floorDiv(t - size, slide) + 1
        (kMin to kMax).map(_ * slide)
      }.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
      if (got != want)
        println(s"FAIL window($sizeMin m, $slideMin m): " +
          s"engine ${got.toSeq.sorted.take(5)}... vs canonical ${want.toSeq.sorted.take(5)}...")
      got == want
    }
}
