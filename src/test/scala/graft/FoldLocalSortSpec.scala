package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r20 `FoldLocalSort` (plans/FoldLocalSort.scala): a global Sort over a
  * small batch LocalRelation folds into a pre-sorted LocalRelation. The
  * differential tests compare the folded result against the distributed
  * sort from the same binary (rule disabled on an isolated child session)
  * — rows AND order must match bit-for-bit, across null placement,
  * direction, expression keys and ties.
  */
class FoldLocalSortSpec extends AnyFunSuite {
  import TestSpark._

  private def off: SparkSession = {
    val s = spark.newSession()
    s.conf.set(plans.FoldLocalSort.enabledKey, "false")
    s
  }

  private val rows: Seq[(Option[Int], String, Option[Double])] = Seq(
    (Some(5), "b", Some(1.5)), (None, "a", Some(Double.NaN)),
    (Some(3), null, Some(-0.0)), (Some(3), "zz", Some(0.0)),
    (Some(1), "a", None), (Some(5), "b", Some(2.5)),
    (None, null, Some(7.0)), (Some(2), "B", Some(-3.0)),
    (Some(3), null, Some(42.0)), (Some(0), "", Some(0.0)))

  private def frame(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.toDF("i", "s", "d")
  }

  private val orderings: Seq[Seq[Column]] = Seq(
    Seq(col("i")),
    Seq(col("i").desc, col("s")),
    Seq(col("s").asc_nulls_last, col("d").desc_nulls_first),
    Seq(col("d")), // NaN / signed-zero ordering must match SQL semantics
    Seq((col("i") * 2 + 1).desc, col("s").asc_nulls_first))

  test("folded sort returns the distributed sort's rows in the same order") {
    orderings.foreach { ord =>
      val folded = frame(spark).orderBy(ord: _*)
      assert(!folded.queryExecution.executedPlan.toString.contains("Exchange"),
        s"sort over a local relation not folded for $ord")
      val reference = frame(off).orderBy(ord: _*)
      assert(reference.queryExecution.executedPlan.toString.contains("Exchange"),
        "kill switch did not restore the distributed sort")
      // toString renders NaN/null/-0.0 distinguishably; Row equality on
      // doubles would treat -0.0 == 0.0
      assert(folded.collect().map(_.toString).toSeq ==
        reference.collect().map(_.toString).toSeq, s"order mismatch for $ord")
    }
  }

  test("ties keep a deterministic order (stable refinement of insertion order)") {
    import spark.implicits._
    val df = Seq((1, "x"), (1, "w"), (0, "z"), (1, "y")).toDF("k", "v").orderBy("k")
    assert(df.collect().map(_.getString(1)).toSeq == Seq("z", "x", "w", "y"))
  }

  test("declared fold queries keep identical rows and order under the rule") {
    // dedup_lsh_stats: driver-built 2-row frame, ORDER BY threshold;
    // est_rollup: model-plane fold with string + numeric columns
    Seq("dedup_lsh_stats", "est_rollup").foreach { q =>
      val now = SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      val ref = SparkEntry.queries(q)(off, sf).collect().map(_.toString).toSeq
      assert(now == ref, s"$q changed under FoldLocalSort")
    }
  }

  test("large local relations keep the distributed sort (row cap)") {
    import spark.implicits._
    val big = (0 until plans.FoldLocalSort.maxRows + 1).map(i => (i % 97, i)).toDF("k", "v")
    assert(big.orderBy("k").queryExecution.executedPlan.toString.contains("Sort"),
      "row cap ignored: a large LocalRelation was folded on the driver")
  }
}
