package graft.schema

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Everything the model plane needs to know about ONE dataset: its schema
  * graph, which columns are modeled (and how they encode), which multi-hop
  * chain SPNs to train, and which edges the workload requires kept under
  * the RDC budget.
  *
  * This is the Spark-native form of the reference's per-dataset schema
  * modules (deepdb-public schemas/{imdb,ssb,flights}/schema.py::
  * gen_*_schema — each dataset ships a function building its SchemaGraph
  * with tables, irrelevant attributes, and relationships). Here a dataset
  * binds either in code ([[DatasetSpec.testdata]], [[DatasetSpec.register]])
  * or **data-driven** from a JSON sidecar (`graft_schema.json` next to the
  * parquet tables, resolved through the Hadoop filesystem so hdfs:// and
  * s3a:// datasets self-describe the same way) — adding a dataset requires
  * no Scala changes, exactly as adding a schema module requires no engine
  * changes in the reference.
  *
  * Sidecar layout (kinds: "num" raw numeric, "days" date/timestamp →
  * epoch-day, "cat" dictionary-coded string):
  * {{{
  * { "tables": [{"name": "users", "primaryKey": ["user_id"],
  *               "irrelevant": ["user_name"]}, ...],
  *   "relationships": [{"many": "visits", "fk": "user_id",
  *                      "one": "users", "pk": "user_id"}],
  *   "modeled": {"users": [{"col": "age", "kind": "num"},
  *               {"col": "plan", "kind": "cat"}], ...},
  *   "chains": [{"path": [["visits", "users"]], "dims": []}],   // optional
  *   "required": [["visits", "users"]] }                        // optional
  * }}}
  * `chains`/`required` name (many, one) pairs of declared relationships.
  */
final case class DatasetSpec(
    graph: SchemaGraph,
    /** table → ordered (column, kind ∈ num|days|cat) of modeled columns */
    modeled: Map[String, Seq[(String, String)]],
    /** multi-hop chain SPN specs: (root-first path edges, dim attachments) */
    chains: Seq[(Seq[Relationship], Seq[Relationship])] = Nil,
    /** workload-required edges always trained regardless of RDC budget */
    required: Seq[Relationship] = Nil) {
  require(modeled.keySet.subsetOf(graph.tables.map(_.name).toSet),
    s"modeled tables ${modeled.keySet -- graph.tables.map(_.name)} missing from the schema graph")
  // the join trainers resolve columns UNQUALIFIED after multi-table joins
  // (as the reference's prepared tables carry table-prefixed attribute
  // names) — so a dataset must use globally-unique column names. Validate
  // loudly here instead of failing with AMBIGUOUS_REFERENCE mid-training.
  graph.relationships.foreach(r => require(r.fk != r.pk,
    s"relationship ${r.id}: fk and pk must have distinct column names " +
      "(join training resolves columns unqualified — prefix per table, e.g. o_custkey/c_custkey)"))
  locally {
    val cols = modeled.toSeq.flatMap { case (t, cs) => cs.map { case (c, _) => (c, t) } }
    val dup = cols.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1)
    require(dup.isEmpty,
      s"modeled column names must be globally unique across tables, duplicated: " +
        dup.map { case (c, ts) => s"$c in ${ts.map(_._2).mkString("/")}" }.mkString(", "))
  }
}

object DatasetSpec {

  /** The driver-generated TPC-H-ish testdata binding (TESTDATA.md) — the
    * default for any directory with no sidecar and no registration.
    */
  val testdata: DatasetSpec = {
    val g = SchemaGraph.testdata
    DatasetSpec(
      graph = g,
      modeled = Map(
        "lineitem" -> Seq(
          ("l_quantity", "num"), ("l_extendedprice", "num"), ("l_discount", "num"),
          ("l_tax", "num"), ("l_returnflag", "cat"), ("l_linestatus", "cat"),
          ("l_shipdate", "days")),
        "orders" -> Seq(
          ("o_totalprice", "num"), ("o_orderstatus", "cat"),
          ("o_orderpriority", "cat"), ("o_orderdate", "days")),
        "customer" -> Seq(("c_acctbal", "num"), ("c_mktsegment", "cat")),
        "part" -> Seq(
          ("p_brand", "cat"), ("p_type", "cat"), ("p_size", "num"),
          ("p_retailprice", "num")),
        "supplier" -> Seq(("s_acctbal", "num")),
        // the corpus table: the LLM-pipeline dashboard queries ("docs per
        // language/source", "avg length where ...") answer from the model
        // plane like any TPC-H slice — text itself stays irrelevant
        "documents" -> Seq(
          ("n_chars", "num"), ("lang", "cat"), ("source", "cat")),
        // the stream table (r16): ts at SECOND granularity ("secs" kind —
        // epoch seconds with fractional micros), opening the sub-day
        // tumbling-dashboard AQP class (`GROUP BY date_trunc('hour', ts)`)
        // the day-granular encoding cannot express; user_id/props stay
        // unmodeled (keys and payloads never model)
        "events" -> Seq(
          ("value", "num"), ("event_type", "cat"), ("ts", "secs"))),
      chains = Seq(
        (Seq(g.rel("orders", "customer"), g.rel("lineitem", "orders")), Nil),
        (Seq(g.rel("orders", "customer"), g.rel("lineitem", "orders")),
          Seq(g.rel("lineitem", "part"))),
        // SSB-style star: the fact with all its modeled dimensions
        (Seq(g.rel("lineitem", "orders")),
          Seq(g.rel("lineitem", "part"), g.rel("lineitem", "supplier")))),
      required = Seq(g.rel("lineitem", "orders"), g.rel("orders", "customer")))
  }

  private val registry = TrieMap.empty[String, DatasetSpec]
  // sidecar lookups memoize the MISS too — forDir runs inside optimizer
  // rules, which must not re-stat the filesystem on every plan
  private val sidecarCache = TrieMap.empty[String, Option[DatasetSpec]]

  private def normalize(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).toUri.getPath

  /** Programmatic binding (tests, notebooks, cluster jobs without write
    * access next to the data). Wins over the sidecar.
    */
  def register(sfDir: String, spec: DatasetSpec): Unit =
    registry(normalize(sfDir)) = spec

  /** Resolution order: explicit registration → `graft_schema.json` sidecar
    * in the dataset directory → the testdata default.
    */
  def forDir(spark: SparkSession, sfDir: String): DatasetSpec = {
    val key = normalize(sfDir)
    registry.get(key)
      .orElse(sidecarCache.getOrElseUpdate(key, loadSidecar(spark, sfDir)))
      .getOrElse(testdata)
  }

  private def loadSidecar(spark: SparkSession, sfDir: String): Option[DatasetSpec] =
    try {
      val p = new org.apache.hadoop.fs.Path(sfDir, "graft_schema.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        Some(fromJson(text))
      }
    } catch {
      case e: IllegalArgumentException => throw e // malformed sidecar: fail loudly
      case scala.util.control.NonFatal(_) => None // unreadable FS: fall back
    }

  /** Parse the sidecar layout. Malformed input throws
    * IllegalArgumentException with the offending fragment — a dataset that
    * DECLARES a schema must never silently train under the default one.
    */
  def fromJson(text: String): DatasetSpec = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val root =
      try new ObjectMapper().readTree(text)
      catch { case e: Exception =>
        throw new IllegalArgumentException(s"graft_schema.json: unparseable JSON: ${e.getMessage}")
      }
    def fail(msg: String) = throw new IllegalArgumentException(s"graft_schema.json: $msg")
    def arr(n: JsonNode, field: String): Seq[JsonNode] = {
      val v = n.path(field)
      if (v.isMissingNode) Seq.empty
      else if (!v.isArray) fail(s"'$field' must be an array")
      else v.elements().asScala.toSeq
    }
    def str(n: JsonNode, field: String): String = {
      val v = n.path(field)
      if (!v.isTextual) fail(s"missing/non-string '$field' in ${n.toString.take(80)}")
      v.asText()
    }
    val tables = arr(root, "tables").map { t =>
      TableMeta(
        name = str(t, "name"),
        primaryKey = arr(t, "primaryKey").map(_.asText()),
        irrelevant = arr(t, "irrelevant").map(_.asText()))
    }
    if (tables.isEmpty) fail("no tables declared")
    val rels = arr(root, "relationships").map { r =>
      Relationship(str(r, "many"), str(r, "fk"), str(r, "one"), str(r, "pk"))
    }
    val graph = SchemaGraph(tables, rels)
    val modeledNode = root.path("modeled")
    if (!modeledNode.isObject) fail("'modeled' must be an object of table -> column specs")
    val modeled = modeledNode.properties().asScala.map { e =>
      val cols = e.getValue.elements().asScala.map { c =>
        val kind = str(c, "kind")
        if (!Set("num", "days", "secs", "cat")(kind))
          fail(s"column kind '$kind' (num|days|secs|cat)")
        (str(c, "col"), kind)
      }.toSeq
      e.getKey -> cols
    }.toMap
    def relOf(pair: JsonNode): Relationship = pair.elements().asScala.toSeq match {
      case Seq(m, o) =>
        rels.find(r => r.many == m.asText() && r.one == o.asText())
          .getOrElse(fail(s"[${m.asText()}, ${o.asText()}] is not a declared relationship"))
      case other => fail(s"edge reference must be a [many, one] pair, got $other")
    }
    val chains = arr(root, "chains").map { c =>
      (arr(c, "path").map(relOf), arr(c, "dims").map(relOf))
    }
    val required = arr(root, "required").map(relOf)
    DatasetSpec(graph, modeled, chains, required)
  }
}
