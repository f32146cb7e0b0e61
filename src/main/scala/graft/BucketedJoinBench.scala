package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SkewSalting
import graft.pipeline.{CatalogStageCheckpoint, IncrementalImageDedup}

/** Isolates the bucketed-corpus-staging effect on the incremental cross
  * join (SURVEY B7/B18 scale lever; round-4 verdict "missing #3"): the
  * end-to-end import at bench scale buries the corpus-side Exchange under
  * per-row compute, so this measures ONLY
  * [[SkewSalting.crossJoinPairs]] — a synthetic corpus band table of
  * `GRAFT_BENCH_CORPUS_ROWS` (bucket, id) rows against a delta of
  * `GRAFT_BENCH_DELTA_ROWS`, staged plain vs bucketed, identical pair
  * output both ways. The at-10^12 claim this evidences: the corpus-side
  * shuffle a warm import pays daily (delta bucket footprint + the bloom's
  * ~1% false-positive slice of the WHOLE corpus — a corpus-scaled term)
  * disappears when the staging is bucketed on the join key.
  *
  * Usage: GRAFT_BENCH_CORPUS_ROWS=50000000 SPARK_DRIVER_MEM=24g \
  *        tools/run_main.sh graft.BucketedJoinBench
  * Prints one JSON line.
  */
object BucketedJoinBench {

  def main(args: Array[String]): Unit = {
    val corpusRows = sys.env.get("GRAFT_BENCH_CORPUS_ROWS").map(_.toLong).getOrElse(20000000L)
    val deltaRows = sys.env.get("GRAFT_BENCH_DELTA_ROWS").map(_.toLong).getOrElse(200000L)
    val cores = sys.env.getOrElse("GRAFT_BENCH_CORES", "8").toInt
    val buckets = cores * 4
    // bucket space sized for multi-member buckets on both sides (like LSH
    // band buckets: mostly small, some shared corpus/delta keys)
    val keySpace = math.max(corpusRows / 4L, 1L)

    def corpusOf(s: SparkSession) = s.range(0L, corpusRows)
      .select(pmod(xxhash64(col("id")), lit(keySpace)).as("bucket"), col("id"))
    def deltaOf(s: SparkSession) = s.range(corpusRows, corpusRows + deltaRows)
      .select(pmod(xxhash64(col("id")), lit(keySpace)).as("bucket"), col("id"))

    // GRAFT_BENCH_MAX_BLOOM caps the bloom key budget — setting it below
    // the delta's distinct bucket count forces crossJoinPairs into its
    // shuffle-semi-join fallback, the path the 10^12 regime actually runs
    // (a production delta's bucket footprint exceeds BloomMaxKeys, so the
    // broadcast bloom cannot engage and the WHOLE corpus shuffles for the
    // semi-join unless the staging is bucketed).
    val maxBloom = sys.env.get("GRAFT_BENCH_MAX_BLOOM").map(_.toLong)
      .getOrElse(SkewSalting.BloomMaxKeys)

    /** One timed variant in a fresh session: stage the corpus table
      * (untimed), then time the cross join drained by a count. */
    def variant(tag: String, bucketed: Boolean): (Double, Long) = {
      val s = session(cores)
      try {
        val ns = s"graft_bjb_$tag"
        BenchUtil.dropNamespacePhysical(s, ns)
        val spec: String => Option[(String, Int)] =
          if (bucketed) IncrementalImageDedup.bucketSpec(buckets) else (_ => None)
        val store = new CatalogStageCheckpoint(s, ns, bucketSpec = spec)
        val staged = store.stage("inc_corpus_bands")(corpusOf(s))
        val t0 = System.nanoTime()
        val pairs = SkewSalting.crossJoinPairs(staged, deltaOf(s), Seq("bucket"),
          "id", cap = 4096, fanout = 16, maxBloomKeys = maxBloom,
          leftBucketed = bucketed)
        val n = pairs.count()
        val wall = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bjb] $tag%-9s $wall%.1f s ($n pairs)")
        (wall, n)
      } finally s.stop()
    }

    variant("warmup", bucketed = false) // JIT + page cache, discarded
    val (plainSec, nPlain) = variant("plain", bucketed = false)
    val (bkSec, nBk) = variant("bucketed", bucketed = true)
    require(nPlain == nBk, s"pair counts diverged: $nPlain vs $nBk")
    println(s"""{"bench":"bucketed_join","corpus_rows":$corpusRows,"delta_rows":$deltaRows,"cores":$cores,"buckets":$buckets,"max_bloom_keys":$maxBloom,"pairs":$nPlain,"plain_sec":$plainSec,"bucketed_sec":$bkSec,"speedup":${plainSec / bkSec}}""")
  }

  private def session(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bucketed-join-bench")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
