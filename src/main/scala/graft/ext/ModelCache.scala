package graft.ext

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization of fitted ML models and featurized frames.
  *
  * The LSH / KMeans / IDF fits used by the dedup and similarity operators are
  * deterministic (fixed seeds, fixed input), so re-fitting on every
  * invocation is pure waste — at sf0.1 a MinHashLSH fit plus its featurize
  * pass costs seconds per call, and every call also stacked a fresh
  * `.cache()`d copy of its featurized frame. One shared map keyed by
  * (session, sfDir, opKey) makes each fit/featurize happen exactly once per
  * session and lets repeated invocations (Bench warm runs, specs, Verify)
  * pay inference cost only.
  *
  * At 100 TB the same contract holds: models are fit once (offline or on a
  * sample) and reused across queries — per-query re-fit was never the
  * production shape.
  */
object ModelCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Any]

  private val fits = new java.util.concurrent.atomic.AtomicLong

  /** Number of `fit` blocks actually evaluated (cache misses) since JVM
    * start. Test observability: warm-path specs assert this does NOT move
    * on a second invocation — a load-independent re-fit detector, unlike
    * wall-clock bounds.
    */
  def fitCount: Long = fits.get

  /** Memoize any fitted model / featurized frame under (session, dir, key).
    * `fit` must be deterministic for the same key (fixed seeds).
    *
    * Guarded by a lock, not bare TrieMap.getOrElseUpdate: the by-name `fit`
    * has side effects (`.cache()` registrations), so a concurrent first call
    * racing through getOrElseUpdate would pin a second featurized copy that
    * loses the putIfAbsent and leaks in the block manager. Fits are rare
    * (once per op per session) so coarse locking costs nothing steady-state.
    */
  def memo[T](s: SparkSession, dir: String, key: String)(fit: => T): T = {
    // staleness guard: the directory's content fingerprint rides the key,
    // so a dataset mutated mid-session REFITS instead of silently serving
    // models of data that no longer exists (same contract as
    // Ensemble.state's fingerprinted memo)
    val fullKey = s"$key@${graft.rspn.Ensemble.dirFingerprint(s, dir)}"
    cache.get((s, dir, fullKey)) match {
      case Some(v) => v.asInstanceOf[T] // fast path, no lock once populated
      case None => cache.synchronized {
        // opportunistic eviction on the (rare) miss path: entries keyed by a
        // stopped session can never be served again — their cached frames are
        // already unusable — but the strong key would otherwise pin session,
        // frames and fitted models for the life of the JVM (spec suites and
        // long-lived drivers create many sessions)
        cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
        // evict SUPERSEDED fingerprints of this same (session, dir, op):
        // their pinned featurized frames describe the pre-mutation data
        cache.keys.filter(k => k._1 == s && k._2 == dir &&
            k._3.startsWith(key + "@") && k._3 != fullKey)
          .foreach { k =>
            cache.remove(k).foreach {
              case df: org.apache.spark.sql.DataFrame =>
                try df.unpersist(blocking = false)
                catch { case scala.util.control.NonFatal(_) => () }
              case _ => ()
            }
          }
        cache.getOrElseUpdate((s, dir, fullKey), { fits.incrementAndGet(); fit })
          .asInstanceOf[T]
      }
    }
  }

  /** Test hook: drop everything (e.g. between suites that reuse a session). */
  def clear(): Unit = cache.clear()

  /** Drop (and unpersist) every memoized entry of one (session, directory):
    * multi-SF bench runs call this between suites — the signature/band
    * frames the dedup family pins via `.cache()` inside `memo` would
    * otherwise occupy executor memory while the next SF runs, exactly the
    * cross-SF bias `Tables.dropDir` already removes for the base tables.
    */
  def dropDir(s: SparkSession, dir: String): Unit = cache.synchronized {
    cache.keys.filter(k => k._1 == s && k._2 == dir).foreach { k =>
      cache.remove(k).foreach {
        case df: org.apache.spark.sql.DataFrame =>
          try df.unpersist(blocking = true)
          catch { case scala.util.control.NonFatal(_) => () }
        case _ => () // fitted models hold no block-manager state
      }
    }
  }
}
