package graft.exact

import graft.ext.ModelCache
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-format source layer. The reference ingests CSV (public
  * DataManagementLab/deepdb-public: data_preparation/prepare_single_tables.py
  * reads the benchmark CSVs into HDF); Spark's DataSource API gives CSV,
  * JSON-lines and ORC readers with the same DataFrame surface. Each format
  * here is exercised as a round-trip: a dimension table is written once to
  * the session warehouse in the format, read back with the ORIGINAL parquet
  * schema applied explicitly (never schema inference — at 100 TB an
  * inference pass is a full extra scan, and inferred types drift), and
  * oracle-checked row-for-row against the parquet original.
  */
object Formats {

  def roundTrip(s: SparkSession, d: String, table: String, format: String): DataFrame =
    ModelCache.memo(s, d, s"fmt_${format}_$table") {
      val src = Tables(s, d, table)
      val path = Warehouse.derivedPath(s, s"graft_fmt_${format}_${table}_${Warehouse.suffix(d)}")
      // CSV must round-trip text-bearing columns exactly: pin quote/escape
      // and multiLine EXPLICITLY rather than relying on reader defaults —
      // Spark's default multiLine=false would mis-read a quoted embedded
      // newline that the writer emitted legally. (multiLine makes a CSV file
      // non-splittable; these round-trips are dimension tables, and a 100 TB
      // text-bearing feed should be parquet/ORC, not CSV.)
      val opts =
        if (format == "csv")
          Map("header" -> "true", "quote" -> "\"", "escape" -> "\"", "multiLine" -> "true")
        else Map.empty[String, String]
      Warehouse.ensure(s, path) { tmp =>
        src.write.mode("overwrite").format(format).options(opts).save(tmp)
      }
      s.read.schema(src.schema).format(format).options(opts).load(path)
    }
}
