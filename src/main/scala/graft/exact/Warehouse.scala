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

  /** Run `write` unless the dataset already completed (_SUCCESS marker). */
  def ensure(s: SparkSession, path: String)(write: => Unit): Unit = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) write
  }
}
