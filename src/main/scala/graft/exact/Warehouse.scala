package graft.exact

import org.apache.spark.sql.SparkSession

/** Shared naming + write-once guard for session-warehouse derived datasets
  * (bucketed tables, partitioned copies, format round-trips). One place for
  * the collision-safe directory key and the `_SUCCESS` idempotence check so
  * the three layout layers cannot drift apart.
  */
private[graft] object Warehouse {

  /** Directory-unique identifier component: the sanitized text AND the full
    * 32-bit hash — two dataset dirs collide only if both the readable form
    * and the hash collide, and a collision here would silently serve one
    * dataset's derived rows as another's.
    */
  def suffix(d: String): String =
    s"${d.replaceAll("[^A-Za-z0-9]", "_")}_${Integer.toHexString(d.hashCode)}"

  /** Path for a derived dataset under the configured session warehouse
    * (respects spark.sql.warehouse.dir — a relocated warehouse relocates
    * every derived layout with it).
    */
  def derivedPath(s: SparkSession, name: String): String =
    s"${s.conf.get("spark.sql.warehouse.dir")}/$name"

  /** Per-destination JVM lock: two threads of the same process ensuring the
    * same layout serialize here (the common "concurrent sessions" case is
    * two SparkSessions over one SparkContext, which share this JVM).
    */
  private val guards =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Run `write` unless the dataset already completed (_SUCCESS marker).
    *
    * `write` receives a TEMPORARY directory next to `path` and must write
    * there; `ensure` publishes it with a single filesystem rename. The
    * rename makes the layout visible all-or-nothing, so a concurrent
    * session (or a crash mid-write) can never leave a half-written layout
    * AT the destination — the old check-then-write-in-place had exactly
    * that window. Cross-process losers detect the winner's `_SUCCESS` after
    * their own write and discard their temp dir. (On object stores where
    * rename is copy-based this degrades to slow-but-still-atomic-enough
    * publication; real deployments there would use a committer protocol.)
    */
  def ensure(s: SparkSession, path: String)(write: String => Unit): Unit = {
    val guard = guards.getOrElseUpdate(path, new Object)
    guard.synchronized {
      val dest = new org.apache.hadoop.fs.Path(path)
      val marker = new org.apache.hadoop.fs.Path(dest, "_SUCCESS")
      val fs = dest.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
          s".${dest.getName}.inprogress-${java.util.UUID.randomUUID().toString.take(8)}")
        write(tmp.toString)
        if (fs.exists(marker)) {
          fs.delete(tmp, true) // another process published while we wrote
        } else {
          // a destination without _SUCCESS is a dead writer's partial
          // layout — safe to clear, nothing ever read it (reads gate on
          // ensure, ensure gates on the marker)
          if (fs.exists(dest)) fs.delete(dest, true)
          if (!fs.rename(tmp, dest)) {
            val published = fs.exists(marker)
            fs.delete(tmp, true)
            if (!published)
              throw new IllegalStateException(s"Warehouse.ensure: could not publish $path")
          }
        }
      }
    }
  }
}
