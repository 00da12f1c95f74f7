package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

/** "Do no harm" contract for transparent AQP (plans/SpnAqp.scala) over the
  * WHOLE oracle-gated exact surface: with `spark.graft.aqp.enabled=true`
  * set in a session, every oracle-gated query must EITHER fold to a
  * zero-scan LocalRelation (then: identical schema and a nonempty result —
  * accuracy is SpnAqpSpec's q-error job) OR run untouched and return
  * exactly what the flag-off session returns. A query whose answer
  * silently drifted WITHOUT folding would be the worst possible bug in
  * the deployment posture — approximate-when-possible, exact-otherwise —
  * and per-query specs can't see it: this sweep pins the contract across
  * all 148 oracle-checked shapes at once (streaming, joins, windows,
  * dedup, text — everything the reference user would run exactly).
  */
class AqpSweepSpec extends AnyFunSuite {
  import TestSpark._

  test("aqp.enabled never silently changes an exact oracle-gated answer") {
    rspn.Ensemble.get(spark, sf) // train/load once, outside the sweep
    val s2: SparkSession = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    s2.conf.set("spark.graft.aqp.enabled", "true")
    var folded = List.empty[String]
    SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      val exact = fn(spark, sf)
      val under = fn(s2, sf)
      assert(under.schema == exact.schema, s"$name: schema drift under aqp.enabled")
      // a fold shows as a LocalRelation the flag-off plan does not have:
      // either the WHOLE query folded (no data source left — parquet,
      // cached, or stream), or SOME branches of a mixed union did (a
      // tagged multi-query op like sql_exact, where the answerable
      // members fold to estimates and the rest keep their scans). A
      // query over cached tables or a MemoryStream lacks a
      // LogicalRelation but gains no LocalRelation, so it stays in the
      // strict-equality branch below.
      def locals(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
        p.collect { case _: LocalRelation => () }.size
      val isFold =
        locals(under.queryExecution.optimizedPlan) >
          locals(exact.queryExecution.optimizedPlan)
      if (isFold) {
        folded ::= name
        assert(under.count() > 0, s"$name folded to an empty result")
      } else {
        // same plan, two sessions — compare as multisets so a shuffle's
        // nondeterministic output order can't flake the sweep
        val a = exact.collect().map(_.toString).sorted.toSeq
        val b = under.collect().map(_.toString).sorted.toSeq
        assert(a == b, s"$name: result changed under aqp.enabled without folding")
      }
    }
    info(s"${folded.size} of ${SparkEntry.oracleSql.size} oracle queries folded: " +
      folded.sorted.mkString(", "))
  }
}
