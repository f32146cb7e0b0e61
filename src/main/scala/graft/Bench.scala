package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize EVERY output column through the noop sink: a bare
    // count() lets column pruning elide projection-only work entirely
    // (a map-only query like the DCT pHash measured as a row-count scan
    // — 0.2 s reported vs seconds of real compute), while noop runs the
    // full plan and discards rows. Round 5 switched count() → noop; the
    // one-time level shift vs earlier rounds is documented in
    // BENCH_DIFF_r05.md.
    // GRAFT_BENCH_BASIS=count restores the pre-round-5 basis (dev-only,
    // for level-shift diagnosis; unset in driver runs).
    val countBasis = sys.env.get("GRAFT_BENCH_BASIS").contains("count")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      if (countBasis) { fn(spark, sfDir).count(); () }
      else fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    // One untimed warmup pass: absorbs JVM/JIT + codegen + first parquet
    // footer reads, so per-query numbers below are regression-comparable
    // (without it the first query in map order eats several seconds of
    // one-time cost).
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // machine-readable copy for round-over-round diffing
    // (tools/bench_diff.py old.json new.json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_results.json"), json + "\n")
    spark.stop()
  }
}
