package graft

import org.apache.spark.sql.SparkSession

/** Shared filesystem/catalog hygiene for the bench mains (one recursive
  * delete instead of a private copy per main — review finding). */
object BenchUtil {

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Drop a session-catalog namespace AND its physical warehouse
    * directory. `DROP NAMESPACE` alone is not enough across JVMs: the
    * in-memory catalog of a fresh session does not know the previous
    * run's tables, yet their managed-table files survive under
    * `spark-warehouse/<ns>.db/` and a later `create()`/`saveAsTable`
    * refuses the non-empty location. */
  def dropNamespacePhysical(spark: SparkSession, ns: String): Unit = {
    spark.sql(s"DROP NAMESPACE IF EXISTS $ns CASCADE")
    deleteRecursively(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), s"$ns.db"))
  }
}
