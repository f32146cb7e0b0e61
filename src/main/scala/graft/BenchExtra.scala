package graft
import org.apache.spark.sql.SparkSession

/** Dev-only query isolation bench (guide §1.4): times a SUBSET of the
  * declared queries through the same noop sink as [[Bench]], with
  * configurable repeats, so a single query's optimization can be iterated
  * without paying the full 75-query suite. Never used by the driver —
  * `Bench` stays the measurement of record.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   GRAFT_BENCH_QUERIES=q08_dedup_clusters,q03_shingle_stats \
  *   GRAFT_BENCH_REPEATS=3 sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("GRAFT_BENCH_REPEATS", "3").toInt
    val wanted = sys.env.get("GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val queries = SparkEntry.queries.filter { case (n, _) =>
      wanted.forall(_.contains(n)) }
    // warmup pass (JIT/codegen/parquet footers), then `repeats` timed passes
    queries.foreach { case (n, fn) =>
      spark.sparkContext.setJobDescription(s"warmup $n")
      try run(fn) catch { case e: Throwable => println(s"WARMUP FAIL $n: $e") }
    }
    val results = queries.map { case (name, fn) =>
      val ts = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"timed $name #$i")
        val t0 = System.nanoTime()
        try run(fn) catch { case e: Throwable => println(s"FAIL $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> ts
    }
    val qs = results.map { case (k, ts) =>
      s""""$k":{"min":${ts.min},"samples":[${ts.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"extra","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
