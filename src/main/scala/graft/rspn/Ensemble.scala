package graft.rspn

import graft.schema.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Trained RSPN ensemble over the testdata schema + the estimator API.
  *
  * Re-expression of the reference's ensemble plane (public
  * DataManagementLab/deepdb-public: ensemble_compilation/spn_ensemble.py::
  * SPNEnsemble / cardinality / evaluate_query;
  * data_preparation/join_data_preparation.py::JoinDataPreparator). Training
  * is distributed (outer join + window fanout + sample execute on the
  * cluster); only a capped sample is collected, so driver memory is bounded
  * by `sampleCap` regardless of table size. Inference is a driver-side tree
  * fold — zero Spark jobs per estimate (the reference's ms-latency property).
  */
object Ensemble {

  import Learn.{CategoricalCol, ColKind, NumericCol}

  final case class ModelCol(table: String, name: String, kind: ColKind, dict: Array[String] = Array.empty) {
    def code(v: String): Double = {
      val i = java.util.Arrays.binarySearch(dict.asInstanceOf[Array[AnyRef]], v)
      require(i >= 0, s"value '$v' not in dictionary of $table.$name")
      i.toDouble
    }
  }

  /** A trained RSPN + the metadata needed to answer queries over it.
    * `scaleRows` is the size of the modeled row space (table row count for a
    * single-table SPN; full-outer-join row count for a join SPN).
    * `corrections`: per table, either an nn-gate column (inner-join
    * indicator) or an inverse-fanout column (reference inverted_features).
    */
  final case class TrainedSpn(
      name: String,
      tables: Set[String],
      cols: Array[ModelCol],
      root: SpnNode,
      scaleRows: Double,
      sampleRows: Long,
      nnCol: Map[String, Int] = Map.empty,   // many-side table -> nn col idx
      multCol: Map[String, Int] = Map.empty  // many-side table -> fanout col idx
  ) {
    def colIdx(table: String, name: String): Int =
      cols.indexWhere(c => c.table == table && c.name == name) match {
        case -1 => throw new NoSuchElementException(s"$table.$name")
        case i  => i
      }
  }

  final case class Estimate(value: Double, ci95Lo: Double, ci95Hi: Double)

  /** sampleCap is the analog of the reference's --samples_per_spn (default
    * 10M there; smaller here because local[32] training must stay sub-second
    * per SPN — the knob, not the data, bounds cost at any SF).
    */
  val sampleCap = 20000

  // ------------------------------------------------------------ model prep

  private val lineitemCols = Seq(
    ("l_quantity", "num"), ("l_extendedprice", "num"), ("l_discount", "num"),
    ("l_tax", "num"), ("l_returnflag", "cat"), ("l_linestatus", "cat"),
    ("l_shipdate", "days"))

  private val ordersCols = Seq(
    ("o_totalprice", "num"), ("o_orderstatus", "cat"),
    ("o_orderpriority", "cat"), ("o_orderdate", "days"))

  private def encodeExpr(df: DataFrame, name: String, how: String, dict: Array[String]): Column =
    how match {
      case "num" => col(name).cast("double")
      case "days" =>
        // epoch days (ANSI mode forbids timestamp→numeric casts)
        datediff(to_date(col(name)), to_date(lit("1970-01-01"))).cast("double")
      case "cat" =>
        val m = map(dict.zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i.toDouble)) }: _*)
        element_at(m, col(name))
    }

  private def dictOf(df: DataFrame, name: String): Array[String] =
    df.select(name).distinct().collect().map(_.getString(0)).sorted

  private def collectSample(df: DataFrame, exprs: Seq[Column], total: Long): (Array[Array[Double]], Long) = {
    val frac = math.min(1.0, sampleCap * 1.2 / math.max(total, 1L))
    val rows = df.select(exprs: _*).sample(withReplacement = false, frac, seed = 42L)
      .limit(sampleCap).collect()
    val data = rows.map { r =>
      Array.tabulate(exprs.length)(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
    }
    (data, rows.length.toLong)
  }

  private def trainSingle(spark: SparkSession, sfDir: String, table: String,
      colSpec: Seq[(String, String)]): TrainedSpn = {
    val df = Tables(spark, sfDir, table)
    val total = df.count()
    val mcols = colSpec.map { case (n, how) =>
      val dict = if (how == "cat") dictOf(df, n) else Array.empty[String]
      ModelCol(table, n, if (how == "cat") CategoricalCol(dict.length) else NumericCol, dict)
    }.toArray
    val exprs = colSpec.map { case (n, how) =>
      encodeExpr(df, n, how, mcols.find(_.name == n).get.dict)
    }
    val (data, nSamp) = collectSample(df, exprs, total)
    val root = Learn.learn(data, mcols.map(_.kind))
    TrainedSpn(table, Set(table), mcols, root, total.toDouble, nSamp)
  }

  /** J2: sampled full-outer join of orders ⟗ lineitem with fanout (mult) and
    * not-null (nn) columns — the reference's JoinDataPreparator, distributed.
    */
  private def trainJoin(spark: SparkSession, sfDir: String): TrainedSpn = {
    val o = Tables(spark, sfDir, "orders")
    val li = Tables(spark, sfDir, "lineitem")
    val joined = o.join(li, o("o_orderkey") === li("l_orderkey"), "full_outer")
    val key = coalesce(col("o_orderkey"), col("l_orderkey"))
    val w = Window.partitionBy(key)
    val withFan = joined
      .withColumn("mult_li", greatest(count(col("l_orderkey")).over(w), lit(1L)).cast("double"))
      .withColumn("nn_li", when(col("l_orderkey").isNotNull, 1.0).otherwise(0.0))
    val total = withFan.count()

    val oDicts = ordersCols.map { case (n, how) =>
      ModelCol("orders", n, if (how == "cat") CategoricalCol(dictOf(o, n).length) else NumericCol,
        if (how == "cat") dictOf(o, n) else Array.empty)
    }
    val liDicts = lineitemCols.map { case (n, how) =>
      ModelCol("lineitem", n, if (how == "cat") CategoricalCol(dictOf(li, n).length) else NumericCol,
        if (how == "cat") dictOf(li, n) else Array.empty)
    }
    val mcols = (oDicts ++ liDicts ++ Seq(
      ModelCol("", "mult_li", NumericCol), ModelCol("", "nn_li", NumericCol))).toArray
    val exprs =
      ordersCols.map { case (n, how) => encodeExpr(withFan, n, how, oDicts.find(_.name == n).get.dict) } ++
        lineitemCols.map { case (n, how) => encodeExpr(withFan, n, how, liDicts.find(_.name == n).get.dict) } ++
        Seq(col("mult_li"), col("nn_li"))
    val (data, nSamp) = collectSample(withFan, exprs, total)
    val root = Learn.learn(data, mcols.map(_.kind))
    TrainedSpn("orders_lineitem", Set("orders", "lineitem"), mcols, root, total.toDouble, nSamp,
      nnCol = Map("lineitem" -> (mcols.length - 1)),
      multCol = Map("lineitem" -> (mcols.length - 2)))
  }

  // ------------------------------------------------------------ registry

  private val cache = TrieMap.empty[(SparkSession, String), Map[String, TrainedSpn]]

  def get(spark: SparkSession, sfDir: String): Map[String, TrainedSpn] =
    cache.getOrElseUpdate((spark, sfDir), {
      val spns = Seq(
        trainSingle(spark, sfDir, "lineitem", lineitemCols),
        trainSingle(spark, sfDir, "orders", ordersCols),
        trainJoin(spark, sfDir))
      spns.map(s => s.name -> s).toMap
    })

  /** Greedy per-query model choice (reference
    * _greedily_select_first_cardinality_spn, radically simplified for one
    * join edge): exact table-set match wins; otherwise the smallest SPN whose
    * tables cover the query, with fanout/nn corrections for the extras.
    */
  def select(spns: Map[String, TrainedSpn], tables: Set[String]): TrainedSpn =
    spns.values.filter(s => tables.subsetOf(s.tables)).minByOrElse(
      throw new NoSuchElementException(s"no SPN covers $tables"))(_.tables.size)

  private implicit class MinByOrElse[A](it: Iterable[A]) {
    def minByOrElse[B: Ordering](orElse: => A)(f: A => B): A =
      if (it.isEmpty) orElse else it.minBy(f)
  }

  // ------------------------------------------------------------ estimator

  /** Build the (ranges, exps) arrays for a query against `spn`:
    * user predicates + join corrections for the target table set.
    * Returns (ranges, baseExps, correction note).
    */
  private def compile(
      spn: TrainedSpn,
      tables: Set[String],
      preds: Map[(String, String), ColRange],
      features: Map[(String, String), Int]): (Array[ColRange], Array[Int]) = {
    val ranges = new Array[ColRange](spn.cols.length)
    val exps = new Array[Int](spn.cols.length)
    preds.foreach { case ((t, c), r) => ranges(spn.colIdx(t, c)) = r }
    features.foreach { case ((t, c), e) => exps(spn.colIdx(t, c)) = e }
    // corrections for tables modeled by the SPN but outside the query:
    spn.tables.diff(tables).foreach { extra =>
      spn.multCol.get(extra).foreach(mi => exps(mi) = -1) // E[1/fanout]
    }
    // inner-join gate for many-side tables IN the query:
    tables.foreach { t =>
      spn.nnCol.get(t).foreach(ni => ranges(ni) = NumRange(1.0, 1.0))
    }
    (ranges, exps)
  }

  private def ciOf(spn: TrainedSpn, g1: Double, g2: Double): (Double, Double) = {
    // CLT on the training-sample mean: Var(p̂) = (E[g²] − E[g]²)/n. This is
    // the sample-size-based simplification of the reference's factor-variance
    // propagation (spn_ensemble.py CI path).
    val varP = math.max(0.0, g2 - g1 * g1) / spn.sampleRows
    val half = 1.96 * spn.scaleRows * math.sqrt(varP)
    (spn.scaleRows * g1 - half, spn.scaleRows * g1 + half)
  }

  def estCount(
      spns: Map[String, TrainedSpn],
      tables: Set[String],
      preds: Map[(String, String), ColRange]): Estimate = {
    val spn = select(spns, tables)
    val (ranges, exps) = compile(spn, tables, preds, Map.empty)
    val g1 = Spn.expect(spn.root, ranges, exps)
    val g2 = Spn.expect(spn.root, ranges, exps.map(_ * 2))
    val (lo, hi) = ciOf(spn, g1, g2)
    Estimate(spn.scaleRows * g1, lo, hi)
  }

  def estSum(
      spns: Map[String, TrainedSpn],
      tables: Set[String],
      sumCol: (String, String),
      preds: Map[(String, String), ColRange]): Estimate = {
    val spn = select(spns, tables)
    val (ranges, exps) = compile(spn, tables, preds, Map(sumCol -> 1))
    val g1 = Spn.expect(spn.root, ranges, exps)
    val g2 = Spn.expect(spn.root, ranges, exps.map(_ * 2))
    val (lo, hi) = ciOf(spn, g1, g2)
    Estimate(spn.scaleRows * g1, lo, hi)
  }

  def estAvg(
      spns: Map[String, TrainedSpn],
      tables: Set[String],
      avgCol: (String, String),
      preds: Map[(String, String), ColRange]): Estimate = {
    val s = estSum(spns, tables, avgCol, preds)
    val c = estCount(spns, tables, preds)
    val v = if (c.value > 0) s.value / c.value else 0.0
    Estimate(v, v, v) // ratio CI omitted (reference propagates; see Ci notes)
  }

  /** A6/M7: enumerate group-by combinations from the model support and
    * estimate each group (reference aqp_spn/group_by_combination.py).
    */
  def estGroupByCount(
      spns: Map[String, TrainedSpn],
      tables: Set[String],
      groupCol: (String, String),
      preds: Map[(String, String), ColRange]): Seq[(String, Double)] = {
    val spn = select(spns, tables)
    val mc = spn.cols(spn.colIdx(groupCol._1, groupCol._2))
    mc.dict.toIndexedSeq.flatMap { v =>
      val e = estCount(spns, tables, preds + (groupCol -> NominalSet(Array(mc.code(v)))))
      if (e.value > 0) Some(v -> e.value) else None // prune zero-prob combos
    }
  }
}
