package graft.rspn

/** Runtime training knobs — the analog of the reference CLI's
  * `--samples_per_spn`, `--ensemble_budget_factor`, `--rdc_threshold`
  * (public DataManagementLab/deepdb-public: maqp.py argparse surface).
  * Each knob reads a JVM system property first (settable per SparkSession
  * via `spark.driver.extraJavaOptions`), then an environment variable, then
  * falls back to the compiled default, so a cluster job can retune training
  * without a rebuild. Values are read at use time (training), not class
  * load, so a test or notebook can set a property before training an
  * ensemble.
  */
object Knobs {

  private def lookup(prop: String, env: String): Option[String] =
    sys.props.get(prop).orElse(sys.env.get(env))

  def int(prop: String, env: String, default: Int): Int =
    lookup(prop, env).map(_.trim.toInt).getOrElse(default)

  def double(prop: String, env: String, default: Double): Double =
    lookup(prop, env).map(_.trim.toDouble).getOrElse(default)

  /** Rows collected to the driver per SPN (reference --samples_per_spn;
    * default 10M there, smaller here so local[32] training stays fast — at
    * any SF the knob, not the data, bounds driver memory and train cost).
    * 60k (up from the round-3 20k) costs ~3s more ensemble training at
    * sf0.1 and cuts the 3-way-join median q-error 1.10 → 1.006.
    */
  def sampleCap: Int = int("graft.sampleCap", "SPARK_GRAFT_SAMPLE_CAP", 60000)

  /** Max join SPNs trained by the RDC-budgeted selection (reference
    * --ensemble_budget_factor, expressed directly as a model count).
    */
  def joinBudget: Int = int("graft.joinBudget", "SPARK_GRAFT_JOIN_BUDGET", 3)

  /** RDC dependence threshold for column splits (reference/spflow
    * rdc_threshold).
    */
  def rdcThreshold: Double =
    double("graft.rdcThreshold", "SPARK_GRAFT_RDC_THRESHOLD", 0.3)

  /** Leaf cutoff as a fraction of the training sample (spflow
    * min_instances_slice, relative form).
    */
  def minInstancesFrac: Double =
    double("graft.minInstancesFrac", "SPARK_GRAFT_MIN_INSTANCES_FRAC", 0.01)

  /** Cap on covering model variants the query-time selection SCORES
    * (reference maqp.py --max_variants): variants beyond the cap — in
    * minimal-cover order, the reference's greedy base order — keep the
    * naive pick's cost profile when an ensemble holds many overlapping
    * models. Selection itself always succeeds; the cap only bounds the
    * RDC scoring work.
    */
  def maxVariants: Int = int("graft.maxVariants", "SPARK_GRAFT_MAX_VARIANTS", 10)

  /** Query-time RDC-aware model variant selection (reference maqp.py
    * --rdc_spn_selection). Off = the pure minimal-cover choice.
    */
  def rdcSelection: Boolean =
    lookup("graft.rdcSelection", "SPARK_GRAFT_RDC_SELECTION").forall {
      _.trim.toLowerCase match {
        case "true" | "1"  => true
        case "false" | "0" => false
        case other =>
          // fail loudly like the int/double knobs: a typo must not silently
          // flip query-time selection behavior
          throw new IllegalArgumentException(
            s"graft.rdcSelection must be true/false/1/0, got '$other'")
      }
    }
}
