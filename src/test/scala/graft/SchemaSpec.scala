package graft

import graft.schema.DatasetSpec
import graft.rspn.{Ensemble, NominalSet, NumRange}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven SchemaGraph (schema/DatasetSpec.scala): a dataset declares
  * its OWN schema — tables, PK–FK edges, modeled columns — in a
  * `graft_schema.json` sidecar, and the whole model plane (training,
  * estimation, the spn_count SQL function) runs over it with zero Scala
  * changes. The end-to-end fixture uses a schema that appears NOWHERE in
  * main source (patients/encounters), proving the engine is no longer
  * bound to the testdata binding.
  */
class SchemaSpec extends AnyFunSuite {
  import TestSpark._

  private val sidecarJson =
    """{
      |  "tables": [
      |    {"name": "patients", "primaryKey": ["patient_id"], "irrelevant": ["patient_name"]},
      |    {"name": "encounters", "primaryKey": ["encounter_id"]}
      |  ],
      |  "relationships": [
      |    {"many": "encounters", "fk": "pat_ref", "one": "patients", "pk": "patient_id"}
      |  ],
      |  "modeled": {
      |    "patients": [{"col": "age", "kind": "num"}, {"col": "tier", "kind": "cat"}],
      |    "encounters": [{"col": "cost", "kind": "num"}, {"col": "kind", "kind": "cat"},
      |                   {"col": "admit_day", "kind": "days"}]
      |  },
      |  "required": [["encounters", "patients"]]
      |}""".stripMargin

  /** Deterministic two-table dataset + sidecar, never registered in code —
    * discovery must go through the JSON file next to the parquet.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-schema-").toString
    spark.range(300).toDF("patient_id")
      .withColumn("patient_name", concat(lit("p"), col("patient_id")))
      .withColumn("age", (lit(18) + pmod(col("patient_id") * 7, lit(50))).cast("int"))
      .withColumn("tier",
        element_at(array(lit("free"), lit("pro"), lit("max")),
          (pmod(col("patient_id"), lit(3)) + 1).cast("int")))
      .write.parquet(s"$d/patients.parquet")
    spark.range(3000).toDF("encounter_id")
      .withColumn("pat_ref", pmod(col("encounter_id") * 13, lit(300)))
      .withColumn("cost", (pmod(col("encounter_id") * 31, lit(1200))).cast("double"))
      .withColumn("kind",
        element_at(array(lit("checkup"), lit("er"), lit("surgery"), lit("lab")),
          (pmod(col("encounter_id"), lit(4)) + 1).cast("int")))
      .withColumn("admit_day",
        date_add(lit("2020-01-01").cast("date"), pmod(col("encounter_id"), lit(365)).cast("int")))
      .write.parquet(s"$d/encounters.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"), sidecarJson)
    d
  }

  test("fromJson parses tables, edges, modeled columns, and required edges") {
    val spec = DatasetSpec.fromJson(sidecarJson)
    assert(spec.graph.tables.map(_.name) == Seq("patients", "encounters"))
    assert(spec.graph.table("patients").irrelevant == Seq("patient_name"))
    assert(spec.graph.rel("encounters", "patients").fk == "pat_ref")
    assert(spec.modeled("encounters").map(_._1) == Seq("cost", "kind", "admit_day"))
    assert(spec.modeled("encounters").toMap.apply("admit_day") == "days")
    assert(spec.required.map(_.id) == Seq("encounters.pat_ref=patients.patient_id"))
    assert(spec.chains.isEmpty)
  }

  test("fromJson fails loudly on malformed sidecars") {
    def msg(json: String): String =
      intercept[IllegalArgumentException](DatasetSpec.fromJson(json)).getMessage
    assert(msg("{").contains("unparseable"))
    assert(msg("""{"tables": [], "modeled": {}}""").contains("no tables"))
    assert(msg(
      """{"tables": [{"name": "t", "primaryKey": ["id"]}],
        |"modeled": {"t": [{"col": "a", "kind": "weird"}]}}""".stripMargin)
      .contains("kind 'weird'"))
    assert(msg(
      """{"tables": [{"name": "t", "primaryKey": ["id"]}],
        |"modeled": {"t": []}, "required": [["t", "missing"]]}""".stripMargin)
      .contains("not a declared relationship"))
    // modeled table absent from the graph → the DatasetSpec invariant fires
    assert(intercept[IllegalArgumentException](DatasetSpec.fromJson(
      """{"tables": [{"name": "t", "primaryKey": ["id"]}], "modeled": {"ghost": []}}"""))
      .getMessage.contains("ghost"))
  }

  test("the model plane trains and estimates over a sidecar-declared schema") {
    val spns = Ensemble.get(spark, dir)
    // singles for both modeled tables + the required join edge
    assert(spns.keySet == Set("patients", "encounters", "patients_encounters"),
      s"trained: ${spns.keySet}")
    assert(spns("patients").scaleRows == 300.0)
    assert(spns("encounters").scaleRows == 3000.0)

    def checkCount(name: String, tables: Set[String],
        preds: Map[(String, String), rspn.ColRange], exact: Double, bound: Double): Unit = {
      val est = Ensemble.estCount(spns, tables, preds).value
      val q = math.max((est + 1) / (exact + 1), (exact + 1) / (est + 1))
      assert(q <= bound, f"$name: est $est%.1f vs exact $exact (q-error $q%.2f)")
    }
    val patients = spark.read.parquet(s"$dir/patients.parquet")
    val encounters = spark.read.parquet(s"$dir/encounters.parquet")

    checkCount("age_range", Set("patients"),
      Map(("patients", "age") -> NumRange(Double.NegativeInfinity, 40.0, hiIncl = false)),
      patients.filter(col("age") < 40).count().toDouble, 1.5)

    val tierCode = spns("patients").cols(
      spns("patients").colIdx("patients", "tier")).code("pro")
    checkCount("tier_eq", Set("patients"),
      Map(("patients", "tier") -> NominalSet(Array(tierCode))),
      patients.filter(col("tier") === "pro").count().toDouble, 1.5)

    // date-kind column round-trips through the epoch-day encoding
    val lo = java.time.LocalDate.parse("2020-03-01").toEpochDay.toDouble
    val hi = java.time.LocalDate.parse("2020-06-01").toEpochDay.toDouble
    checkCount("admit_range", Set("encounters"),
      Map(("encounters", "admit_day") -> NumRange(lo, hi, hiIncl = false)),
      encounters.filter(col("admit_day") >= "2020-03-01" && col("admit_day") < "2020-06-01")
        .count().toDouble, 1.5)

    // join estimate walks the sidecar's schema graph, not testdata's
    val kindCode = spns("patients_encounters").cols(
      spns("patients_encounters").colIdx("encounters", "kind")).code("er")
    checkCount("join_er_lowcost", Set("patients", "encounters"),
      Map(
        ("encounters", "kind") -> NominalSet(Array(kindCode)),
        ("patients", "age") -> NumRange(Double.NegativeInfinity, 40.0, hiIncl = false)),
      patients.join(encounters, col("patient_id") === col("pat_ref"))
        .filter(col("kind") === "er" && col("age") < 40).count().toDouble, 2.0)
  }

  test("the SQL-text planes resolve columns through the sidecar schema") {
    val spns = Ensemble.get(spark, dir)
    val spec = DatasetSpec.forDir(spark, dir)
    val sql = "SELECT COUNT(*) FROM encounters e,patients p " +
      "WHERE p.patient_id=e.pat_ref AND p.age < 40 AND e.kind = 'er'"
    // model plane: JOB-light comma-join text over a never-registered schema
    val est = rspn.SqlEstimate.estimate(spns, sql, spec) match {
      case rspn.SqlEstimate.Scalar(e) => e.value
      case other                      => fail(s"expected scalar, got $other")
    }
    val exact = spark.read.parquet(s"$dir/patients.parquet")
      .join(spark.read.parquet(s"$dir/encounters.parquet"),
        col("patient_id") === col("pat_ref"))
      .filter(col("age") < 40 && col("kind") === "er").count().toDouble
    val q = math.max((est + 1) / (exact + 1), (exact + 1) / (est + 1))
    assert(q <= 2.0, f"sql_estimate over sidecar schema: est $est%.1f vs exact $exact (q $q%.2f)")
    // exact plane compiles the same text to a DataFrame over the same dir
    val viaExact = rspn.SqlExact.compile(spark, dir, sql).head().get(0) match {
      case n: Number => n.doubleValue()
    }
    assert(viaExact == exact, s"sql_exact $viaExact vs direct $exact")
  }

  test("spn_count SQL answers over the sidecar-declared schema") {
    Ensemble.get(spark, dir) // ensure trained
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", dir)
    val est = s2.sql("SELECT spn_count('patients', 'age < 40') AS est").head().getDouble(0)
    val exact = spark.read.parquet(s"$dir/patients.parquet")
      .filter(col("age") < 40).count().toDouble
    val q = math.max((est + 1) / (exact + 1), (exact + 1) / (est + 1))
    assert(q <= 1.5, f"spn_count over sidecar schema: est $est%.1f vs exact $exact (q $q%.2f)")
  }
}
