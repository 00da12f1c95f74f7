package graft

import graft.rspn._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.util.Random

/** Accuracy evaluation main — the reference's
  * evaluation/cardinality_evaluation.py / aqp_evaluation.py analog: run a
  * workload through the model plane and the exact plane, print q-error
  * stats as one JSON line.
  *
  * Two modes:
  *   - no args: the in-code generated workload (random conjunctions, joins,
  *     SQL-surface shapes) — the original accuracy harness;
  *   - `--workload <file.sql>`: replay an external benchmark FILE in the
  *     reference's JOB-light layout (one COUNT(*) per line, comma joins,
  *     `benchmarks/job-light/sql/`), scored against either
  *     `--truth <csv>` (reference true_cardinalities.csv layout:
  *     `query_no,query,cardinality_true`) or live exact counts computed by
  *     Spark when no CSV is given. `--out <file.json>` writes the
  *     per-query q-error artifact; `--dump-truth <csv>` writes the truth
  *     CSV for the current SF in the reference layout.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.QErrorEval"
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QErrorEval --workload workloads/testdata_30.sql --truth workloads/testdata_30_true_sf0.01.csv --out /tmp/qerr.json"
  */
object QErrorEval {

  /** `relErr` is the AQP metric (reference evaluation/aqp_evaluation.py
    * reports relative error for SUM/AVG); `qerr` the cardinality metric.
    * Both are always populated — COUNT rows are graded on qerr, SUM/AVG
    * rows on relErr.
    */
  final case class WorkloadRow(
      no: Int, sql: String, truth: Double, est: Double, qerr: Double, relErr: Double,
      /** model-plane answer latency (parse + estimate, no Spark job) — the
        * reference's evaluation records per-query latencies the same way */
      latencyMs: Double = 0.0,
      /** GROUP BY replay (reference aqp_evaluation.py's grouped surface):
        * one score per EXACT group, the model's mass for that group (0.0
        * when pruned) graded against the true aggregate. Scalar queries
        * leave this empty; for grouped rows `truth`/`est` carry the group
        * sums and `qerr`/`relErr` the per-group medians. */
      groups: Seq[GroupScore] = Nil,
      /** the estimator's 95% interval (reference
        * evaluation/confidence_interval_evaluation.py scores every
        * benchmark estimate's bounds the same way); grouped rows carry the
        * per-group intervals inside `groups` and leave these at the group
        * sums' bounds-of-sums */
      ciLo: Double = 0.0, ciHi: Double = 0.0)

  /** One exact group's score; `key` is the stringified group tuple. */
  final case class GroupScore(
      key: Seq[String], truth: Double, est: Double, qerr: Double, relErr: Double,
      ciLo: Double = 0.0, ciHi: Double = 0.0)

  private def qerr(e: Double, x: Double): Double = {
    val a = math.max(e, 1.0); val b = math.max(x, 1.0); math.max(a / b, b / a)
  }

  private def qstats(xs: Seq[Double]): (Double, Double, Double) = {
    val s = xs.sorted
    (s(s.length / 2), s(math.min(s.length - 1, (s.length * 0.95).toInt)), s.last)
  }

  /** One query per non-empty, non-`--` line, numbered from 1 (the
    * reference keys truth rows by query_no = line position).
    */
  def readWorkload(path: String): Seq[(Int, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--"))
      .zipWithIndex.map { case (sql, i) => (i + 1, sql) }.toList
    finally src.close()
  }

  /** `query_no,query,cardinality_true` with a header row — query_no is the
    * FIRST field and cardinality_true the LAST, so a comma-bearing query
    * string in the middle never corrupts the parse.
    */
  def readTruthCsv(path: String): Map[Int, Double] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().drop(1).filter(_.nonEmpty).map { line =>
      val fields = line.split(",")
      fields.head.trim.toInt -> fields.last.trim.toDouble
    }.toMap
    finally src.close()
  }

  /** Grouped-truth CSV (`query_no,key,value`, header row): the committed
    * drift pin for GROUP BY workloads — the 3-field scalar layout cannot
    * carry per-group values, so groups get their own file. `key` is the
    * group tuple joined with "|" and CSV-quoted (dictionary values may in
    * principle contain commas); query_no is the FIRST field and value the
    * LAST, so the parse never depends on the key's content. The tuple
    * separator itself is backslash-escaped INSIDE components ("\\|", and
    * "\\\\" for a literal backslash), so a dictionary value containing '|'
    * round-trips to the right key tuple instead of silently mis-keying the
    * drift comparison. The committed fixture keys contain neither char, so
    * the pinned file's bytes are unchanged.
    */
  def readGroupTruthCsv(path: String): Map[Int, Seq[(Seq[String], Double)]] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().drop(1).filter(_.nonEmpty).map { line =>
      val firstComma = line.indexOf(',')
      val lastComma = line.lastIndexOf(',')
      val no = line.substring(0, firstComma).trim.toInt
      val rawKey = line.substring(firstComma + 1, lastComma).trim
        .stripPrefix("\"").stripSuffix("\"").replace("\"\"", "\"")
      val v = line.substring(lastComma + 1).trim.toDouble
      (no, if (rawKey.isEmpty) Seq.empty[String] else splitEscapedKey(rawKey), v)
    }.toList.groupBy(_._1).map { case (no, rows) => no -> rows.map(r => (r._2, r._3)) }
    finally src.close()
  }

  private def escapeKeyComponent(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\|")

  /** Split on UNESCAPED '|' and unescape components — inverse of
    * [[escapeKeyComponent]] + mkString("|").
    */
  private[graft] def splitEscapedKey(raw: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      raw.charAt(i) match {
        case '\\' if i + 1 < raw.length => sb.append(raw.charAt(i + 1)); i += 1
        case '|'                        => out += sb.toString; sb.clear()
        case c                          => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.toSeq
  }

  /** The matching writer (`--dump-group-truth`): one row per exact group,
    * keys escaped, "|"-joined and quoted, values at full double precision
    * (integral aggregates print exactly).
    */
  def groupTruthCsvLines(truth: Map[Int, Seq[(Seq[String], Double)]]): Seq[String] =
    "query_no,key,value" +: truth.toSeq.sortBy(_._1).flatMap { case (no, rows) =>
      rows.sortBy(_._1.map(escapeKeyComponent).mkString("|")).map { case (k, v) =>
        val key = "\"" + k.map(escapeKeyComponent).mkString("|").replace("\"", "\"\"") + "\""
        val vS = if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
        s"$no,$key,$vS"
      }
    }

  /** Registers the workload tables as temp views. `events` rides along for
    * the time-of-day workloads (r16 late) — but only when the fixture ships
    * it (r16 ADVICE: an events-less sfDir must keep TPC-H-only workloads
    * working); schema.Tables normalizes its ts NANOS/MICROS parquet
    * variants. When a fixture LACKS an optional table, any stale view from
    * a previously-loaded fixture is dropped (r17 ADVICE): temp views
    * outlive this call, and in a multi-fixture session a prior dir's view
    * would otherwise silently answer for this dir's missing table — the
    * query must fail loudly, not compute truth from the wrong data.
    */
  private def preloadViews(spark: SparkSession, sfDir: String, cache: Boolean): Unit = {
    val optional = Set("events")
    Seq("lineitem", "orders", "customer", "part", "supplier", "events")
      .foreach { t =>
        if (!optional(t) ||
          java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir, s"$t.parquet")))
          (if (cache) schema.Tables(spark, sfDir, t) else schema.Tables.raw(spark, sfDir, t))
            .createOrReplaceTempView(t)
        else
          spark.catalog.dropTempView(t)
      }
  }

  /** Exact counts through Spark itself — the workload's comma-join SQL is
    * plain ANSI, so the exact plane IS `spark.sql`. `cache = false` reads
    * the tables raw (one scan per query) for callers that must not perturb
    * the session's shared cache (the in-suite truth check).
    */
  def computeTruth(spark: SparkSession, sfDir: String, qs: Seq[(Int, String)],
      cache: Boolean = true): Map[Int, Double] = {
    preloadViews(spark, sfDir, cache)
    qs.map { case (no, sql) =>
      no -> (spark.sql(sql).head().get(0) match {
        case n: Number => n.doubleValue() // covers BigDecimal too
        case other => sys.error(s"workload query $no truth is not numeric: $other")
      })
    }.toMap
  }

  /** Canonical key-part form shared by BOTH planes: integral numerics print
    * as longs ("10", never "10.0"), NULL marks SQL null — otherwise the
    * exact plane's typed group values and the model dictionary's strings
    * never hash to the same group.
    */
  private def normKeyPart(s: String): String = s.toDoubleOption match {
    case Some(d) if d == math.rint(d) && math.abs(d) < 1e15 => d.toLong.toString
    case _ => s
  }

  /** Out-of-band NULL marker (r16 ADVICE, closed r17): SQL NULL and a
    * grouped-out grouping-set column both print "NULL"; a GENUINE value
    * that would collide ("NULL", "=NULL", "==NULL", ...) is prefix-escaped
    * with '='. Invertible, and applied on BOTH planes (exact keyStr +
    * model-plane key normalization) so per-group grading stays paired.
    */
  private[graft] def encodeGenuineKey(s: String): String =
    if (s != null && s.matches("=*NULL")) "=" + s else s

  private def keyStr(v: Any): String = v match {
    case null                    => "NULL"
    case d: java.math.BigDecimal => normKeyPart(d.toPlainString)
    case n: Number               => normKeyPart(n.toString)
    case other                   => encodeGenuineKey(normKeyPart(other.toString))
  }

  /** Exact-plane truth for ARBITRARY workload rows, grouped or scalar: every
    * result row keyed by its leading (group) columns stringified, the last
    * column the aggregate. Scalar queries yield one empty-keyed row, so one
    * truth shape serves both surfaces. Group results are driver-sized (the
    * model enumerates categorical dictionaries), so collect() is bounded.
    */
  def computeGroupTruth(
      spark: SparkSession, sfDir: String, qs: Seq[(Int, String)],
      cache: Boolean = true): Map[Int, Seq[(Seq[String], Double)]] = {
    preloadViews(spark, sfDir, cache)
    qs.map { case (no, sql) =>
      val df = spark.sql(sql)
      val w = df.schema.length
      no -> df.collect().toSeq.map { row =>
        val v = row.get(w - 1) match {
          case n: java.math.BigDecimal => n.doubleValue()
          case n: Number               => n.doubleValue()
          case other => sys.error(s"workload query $no truth is not numeric: $other")
        }
        ((0 until w - 1).map(i => keyStr(row.get(i))), v)
      }
    }.toMap
  }

  /** Model-plane replay: every query flows through the SQL-text parser and
    * the RSPN estimator — the path an external benchmark exercises.
    */
  def runWorkload(
      spark: SparkSession, sfDir: String,
      qs: Seq[(Int, String)], truth: Map[Int, Double]): Seq[WorkloadRow] =
    runWorkloadGrouped(spark, sfDir, qs,
      no => Seq((Seq.empty[String], truth.getOrElse(no,
        sys.error(s"no true cardinality for query $no")))))

  /** The grouped form (reference `evaluation/aqp_evaluation.py` scores
    * per-group relative error for GROUP BY benchmark files): Scalar rows
    * behave exactly as [[runWorkload]]; Groups rows are graded PER EXACT
    * GROUP — the model's estimate for a group it pruned scores as 0.0, a
    * grouped estimate against scalar-only truth fails loudly.
    */
  def runWorkloadGrouped(
      spark: SparkSession, sfDir: String,
      qs: Seq[(Int, String)],
      truthOf: Int => Seq[(Seq[String], Double)]): Seq[WorkloadRow] = {
    val ens = Ensemble.get(spark, sfDir)
    val spec = schema.DatasetSpec.forDir(spark, sfDir)
    qs.map { case (no, sql) =>
      val t0 = System.nanoTime()
      val res0 = SqlEstimate.estimate(ens, sql, spec)
      val ms = (System.nanoTime() - t0) / 1e6
      // ROLLUP/CUBE rows replay as grouped rows (r15): a grouped-out key
      // column is SQL NULL on the exact plane, which computeGroupTruth's
      // keyStr prints as "NULL" — the same marker substitutes for None
      // here (genuine values encode through encodeGenuineKey FIRST, so a
      // dictionary value "NULL" can never alias the marker), and the keys
      // are fully normalized here — the Groups arm must not re-encode
      def normEncode(s: String): String = encodeGenuineKey(normKeyPart(s))
      val preNormalized = res0.isInstanceOf[SqlEstimate.GroupSets]
      val res = res0 match {
        case SqlEstimate.GroupSets(rows) =>
          SqlEstimate.Groups(rows.map { case (k, e) =>
            k.map(_.map(normEncode).getOrElse("NULL")) -> e })
        case other => other
      }
      res match {
        case SqlEstimate.Scalar(e) =>
          val est = e.value
          val t = truthOf(no) match {
            case Seq((k, v)) if k.isEmpty => v
            case other => sys.error(
              s"workload query $no is scalar but its truth is grouped (${other.length} rows)")
          }
          WorkloadRow(no, sql, t, est, qerr(est, t),
            math.abs(est - t) / math.max(math.abs(t), 1.0), ms,
            ciLo = e.ci95Lo, ciHi = e.ci95Hi)
        case SqlEstimate.Groups(estRows) =>
          val tRows = truthOf(no)
          // an EMPTY truth is a legitimate grouped result (the predicate
          // matched nothing) — only a non-empty scalar-shaped truth means
          // the caller fed a scalar CSV to a grouped query
          if (tRows.nonEmpty && tRows.forall(_._1.isEmpty)) sys.error(
            s"workload query $no is grouped but its truth is scalar — " +
              "omit --truth (grouped truth is computed live from the exact plane)")
          val estMap = estRows.map { case (k, e) =>
            (if (preNormalized) k else k.map(normEncode)) -> e }.toMap
          // zero exact groups: every model-emitted group is spurious and
          // grades against truth 0 (a model that also returns nothing
          // scores a clean qerr-1 row)
          val spurious = if (tRows.nonEmpty) Nil else estRows.map { case (k, e) =>
            GroupScore(if (preNormalized) k else k.map(normEncode), 0.0, e.value, qerr(e.value, 0.0),
              math.abs(e.value), e.ci95Lo, e.ci95Hi)
          }
          val gs = spurious ++ tRows.map { case (k, t) =>
            // pruned group: graded at 0 with a degenerate [0,0] interval
            val e = estMap.get(k)
            val est = e.map(_.value).getOrElse(0.0)
            GroupScore(k, t, est, qerr(est, t),
              math.abs(est - t) / math.max(math.abs(t), 1.0),
              ciLo = e.map(_.ci95Lo).getOrElse(0.0), ciHi = e.map(_.ci95Hi).getOrElse(0.0))
          }
          val (qm, _, _) = if (gs.isEmpty) (1.0, 1.0, 1.0) else qstats(gs.map(_.qerr))
          val (rm, _, _) = if (gs.isEmpty) (0.0, 0.0, 0.0) else qstats(gs.map(_.relErr))
          WorkloadRow(no, sql, gs.map(_.truth).sum, gs.map(_.est).sum, qm, rm, ms, gs,
            ciLo = gs.map(_.ciLo).sum, ciHi = gs.map(_.ciHi).sum)
        case other => sys.error(
          s"workload query $no shape is not replayable from a benchmark file: $other")
      }
    }
  }

  private def isCount(sql: String): Boolean =
    sql.toUpperCase.replaceAll("\\s+", " ").startsWith("SELECT COUNT")

  private def jsonEscape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  def workloadJson(file: String, sfDir: String, rows: Seq[WorkloadRow]): String = {
    val (med, p95, max) = qstats(rows.map(_.qerr))
    val per = rows.map { r =>
      // grouped rows carry every exact group's score — the artifact the
      // grouped-AQP gate and any external grader read per group
      val gBlock = if (r.groups.isEmpty) "" else {
        val gs = r.groups.map(g =>
          f"""{"key":"${jsonEscape(g.key.mkString("|"))}","true":${g.truth}%.4f,"est":${g.est}%.4f,"qerr":${g.qerr}%.4f,"rel_err":${g.relErr}%.4f,"ci_lo":${g.ciLo}%.4f,"ci_hi":${g.ciHi}%.4f}""")
          .mkString("[", ",", "]")
        s""","groups":$gs"""
      }
      f"""{"no":${r.no},"sql":"${jsonEscape(r.sql)}","true":${r.truth}%.1f,"est":${r.est}%.2f,"qerr":${r.qerr}%.4f,"rel_err":${r.relErr}%.4f,"ci_lo":${r.ciLo}%.4f,"ci_hi":${r.ciHi}%.4f,"latency_ms":${r.latencyMs}%.2f$gBlock}"""
    }.mkString("[", ",", "]")
    val (lm, lp, lx) = qstats(rows.map(_.latencyMs))
    val latBlock = f""","latency_ms":{"median":$lm%.2f,"p95":$lp%.2f,"max":$lx%.2f}"""
    // SUM/AVG rows get the reference's AQP metric as a separate aggregate
    val aggs = rows.filter(r => !isCount(r.sql))
    val aggBlock = if (aggs.isEmpty) "" else {
      val (am, ap, ax) = qstats(aggs.map(_.relErr))
      f""","agg_rel_err":{"n":${aggs.length},"median":$am%.4f,"p95":$ap%.4f,"max":$ax%.4f}"""
    }
    // per-group aggregate over every grouped row's groups, flattened
    val flat = rows.flatMap(_.groups)
    val grpBlock = if (flat.isEmpty) "" else {
      val (gm, gp, gx) = qstats(flat.map(_.relErr))
      f""","group_rel_err":{"n":${flat.length},"median":$gm%.4f,"p95":$gp%.4f,"max":$gx%.4f}"""
    }
    // CI scoring (reference confidence_interval_evaluation.py): empirical
    // coverage of the nominal 95% interval over every scored estimate
    // (scalar rows + every exact group of grouped rows), plus the median
    // relative interval width — a CI that covers by being vacuously wide
    // shows up here
    val ciBlock = {
      val scored = rows.filter(_.groups.isEmpty).map(r => (r.truth, r.est, r.ciLo, r.ciHi)) ++
        flat.map(g => (g.truth, g.est, g.ciLo, g.ciHi))
      // a workload whose rows are all grouped with zero graded groups has
      // nothing to score — emit an explicit empty block rather than NaN
      // coverage / a qstats crash breaking artifact generation
      // bias_blind (r19 honesty contract): true when any replayed query
      // routed through the multi-OR signed expansion, whose conservative
      // interval combination is MODEL-BIAS-BLIND — BENCH_SCALING r18
      // measured nominal-95% coverage at 4/8 on sf10, where per-term model
      // bias exceeds the narrowing sampling width. Consumers must treat
      // such coverage numbers at extreme scale as optimistic.
      val biasBlind = rows.exists(r =>
        scala.util.Try(SqlParser.parseQuery(r.sql).orGroupsN.nonEmpty).getOrElse(false))
      if (scored.isEmpty) f""","ci":{"n":0,"bias_blind":$biasBlind}"""
      else {
        val inBounds = scored.count { case (t, _, lo, hi) => lo <= t && t <= hi }
        val (wm, _, _) = qstats(scored.map { case (_, e, lo, hi) =>
          (hi - lo) / math.max(math.abs(e), 1.0)
        })
        f""","ci":{"n":${scored.length},"coverage":${inBounds.toDouble / scored.length}%.4f,"median_rel_width":$wm%.4f,"bias_blind":$biasBlind}"""
      }
    }
    f"""{"workload":"${jsonEscape(file)}","sf":"${jsonEscape(sfDir)}","n":${rows.length},"median":$med%.4f,"p95":$p95%.4f,"max":$max%.4f$aggBlock$grpBlock$ciBlock$latBlock,"per_query":$per}"""
  }

  private def workloadMain(spark: SparkSession, sfDir: String, opts: Map[String, String]): Unit = {
    val file = opts("--workload")
    val qs = readWorkload(file)
    // the scalar truth CSV (reference true_cardinalities.csv layout) covers
    // scalar rows; grouped rows always take live exact-plane truth — the
    // 3-field CSV cannot carry per-group values
    val csvTruth = opts.get("--truth").map(readTruthCsv).getOrElse(Map.empty[Int, Double])
    // grouped rows take the committed grouped pin when given, else live
    // exact-plane truth (the 3-field scalar CSV cannot carry groups)
    val groupCsvTruth = opts.get("--group-truth").map(readGroupTruthCsv)
      .getOrElse(Map.empty[Int, Seq[(Seq[String], Double)]])
    lazy val liveTruth =
      computeGroupTruth(spark, sfDir,
        qs.filterNot(q => csvTruth.contains(q._1) || groupCsvTruth.contains(q._1)))
    def truthOf(no: Int): Seq[(Seq[String], Double)] =
      csvTruth.get(no).map(v => Seq((Seq.empty[String], v)))
        .orElse(groupCsvTruth.get(no)).getOrElse(liveTruth(no))
    opts.get("--dump-truth").foreach { out =>
      val lines = "query_no,query,cardinality_true" +:
        qs.map { case (no, sql) =>
          // integral truths (cardinalities) print exactly; AQP aggregates
          // keep full double precision
          val t = truthOf(no) match {
            case Seq((k, v)) if k.isEmpty => v
            case _ => sys.error(s"--dump-truth: query $no is grouped; use " +
              "--dump-group-truth (the scalar layout cannot carry per-group values)")
          }
          val tS = if (t == math.rint(t) && math.abs(t) < 1e15) t.toLong.toString else t.toString
          s"""$no,"${sql.replace("\"", "\"\"")}",$tS"""
        }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), lines.mkString("\n") + "\n")
    }
    opts.get("--dump-group-truth").foreach { out =>
      val lines = groupTruthCsvLines(qs.map { case (no, _) => no -> truthOf(no) }.toMap)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), lines.mkString("\n") + "\n")
    }
    val rows = runWorkloadGrouped(spark, sfDir, qs, truthOf)
    val json = workloadJson(file, sfDir, rows)
    opts.get("--out").foreach(out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n"))
    println(json)
  }

  def main(args: Array[String]): Unit = {
    // host-independent Timestamp.toString rendering (see Bench.main)
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val opts = args.grouped(2).collect { case Array(k, v) => k -> v }.toMap
    if (opts.contains("--workload")) {
      workloadMain(spark, sfDir, opts)
      spark.stop()
      return
    }

    val ens = Ensemble.get(spark, sfDir)
    val li = schema.Tables(spark, sfDir, "lineitem")
    val o = schema.Tables(spark, sfDir, "orders")
    val c = schema.Tables(spark, sfDir, "customer")

    val rng = new Random(20260812L)
    // single-table conjunctive COUNTs
    val single = (1 to 30).map { _ =>
      val qLo = 1 + rng.nextInt(40); val qHi = qLo + 3 + rng.nextInt(12)
      val dLo = rng.nextDouble() * 0.06; val dHi = dLo + 0.01 + rng.nextDouble() * 0.04
      val est = Ensemble.estCount(ens, Set("lineitem"), Map(
        ("lineitem", "l_quantity") -> NumRange(qLo, qHi),
        ("lineitem", "l_discount") -> NumRange(dLo, dHi))).value
      val exact = li.filter(col("l_quantity").between(qLo, qHi) &&
        col("l_discount").between(dLo, dHi)).count().toDouble
      qerr(est, exact)
    }
    // multi-table COUNTs (2-way covered, 3-way chain/factored)
    val segs = Seq("BUILDING", "MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD")
    val joins = segs.flatMap { seg =>
      Seq(12.0, 20.0, 30.0, 42.0).map { q =>
        val mc = ens("customer").cols(ens("customer").colIdx("customer", "c_mktsegment"))
        val est = Ensemble.estCount(ens, Set("customer", "orders", "lineitem"), Map(
          ("customer", "c_mktsegment") -> NominalSet(Array(mc.code(seg))),
          ("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, q, hiIncl = false))).value
        val exact = c.join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .filter(col("c_mktsegment") === seg && col("l_quantity") < q).count().toDouble
        qerr(est, exact)
      }
    }
    // round-4 SQL-surface shapes: disjunctions, LIKE, grouped aggregates —
    // evaluated through the SQL-text entry so the parser path is what is
    // being graded, exactly as the reference feeds benchmark SQL strings
    Seq("lineitem", "orders", "customer", "part").foreach { t =>
      schema.Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
    def sqlScalar(sql: String): Double = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => e.value
      case _                     => sys.error("expected scalar")
    }
    // the or/like/group/rollup pool must stay large enough that the reported
    // p95 is a distinct statistic from the max (a prior review found
    // p95==max at n=18; current n = 13 + 5 + 3 + rollup rows ≈ 29)
    val orQs = (1 to 13).map { _ =>
      val a = 1 + rng.nextInt(20); val b = 30 + rng.nextInt(20)
      val sql = s"SELECT COUNT(*) FROM lineitem WHERE (l_quantity < $a) OR (l_quantity > $b)"
      val exact = spark.sql(sql).head().getLong(0).toDouble
      qerr(sqlScalar(sql), exact)
    }
    val likeQs = Seq("%BRASS", "STANDARD%", "%PLATED%", "SMALL%", "%TIN").map { pat =>
      val sql = s"SELECT COUNT(*) FROM part WHERE p_type LIKE '$pat'"
      qerr(sqlScalar(sql), spark.sql(sql).head().getLong(0).toDouble)
    }
    val groupQs = {
      val est = SqlEstimate.estimate(ens,
        "SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag") match {
        case SqlEstimate.Groups(rows) => rows.map { case (g, e) => g.head -> e.value }.toMap
        case _                        => sys.error("expected groups")
      }
      spark.sql("SELECT l_returnflag, SUM(l_extendedprice) FROM lineitem GROUP BY 1")
        .collect().toSeq.map(r =>
          // a group the model pruned (zero estimated mass) scores its true
          // q-error instead of crashing the whole eval
          qerr(est.getOrElse(r.getString(0), 0.0), r.getDouble(1)))
    }
    // round-5 surface: ROLLUP sugar — every grouping set (fine, subtotal,
    // grand total) scored against exact
    val rollupQs = {
      val est = SqlEstimate.estimate(ens,
        "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 35 GROUP BY ROLLUP(l_returnflag, l_linestatus)") match {
        case SqlEstimate.GroupSets(rows) =>
          rows.map { case (g, e) => g.map(_.getOrElse("ALL")).mkString("|") -> e.value }.toMap
        case _ => sys.error("expected grouping sets")
      }
      spark.sql(
        "SELECT coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL'), COUNT(*) " +
          "FROM lineitem WHERE l_quantity < 35 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
        .collect().toSeq.map(r =>
          qerr(est.getOrElse(s"${r.getString(0)}|${r.getString(1)}", 0.0), r.getLong(2).toDouble))
    }
    val (m1, p1, x1) = qstats(single)
    val (m2, p2, x2) = qstats(joins)
    val (m3, p3, x3) = qstats(orQs ++ likeQs ++ groupQs ++ rollupQs)
    println(
      f"""{"workload":"generated","sf":"$sfDir","single_table":{"n":${single.length},"median":$m1%.4f,"p95":$p1%.4f,"max":$x1%.4f},"joins_3way":{"n":${joins.length},"median":$m2%.4f,"p95":$p2%.4f,"max":$x2%.4f},"sql_or_like_group":{"n":${orQs.length + likeQs.length + groupQs.length + rollupQs.length},"median":$m3%.4f,"p95":$p3%.4f,"max":$x3%.4f}}""")
    spark.stop()
  }
}
