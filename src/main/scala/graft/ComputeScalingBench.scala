package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.images.SyntheticImages

/** Compute-kernel scaling companion to [[ScalingBench]]: times the
  * CPU-bound signature stage alone (fused shingle+MinHash over cached
  * caption tokens — no shuffle, no disk) at N vs 4N cores.
  *
  * Purpose: separates the engine's scalability from the single-box memory
  * system. The end-to-end job moves GBs through one machine's DRAM for
  * both "cluster sizes", which under-reports scaling that a real cluster
  * (per-node bandwidth) would see; the kernel run shows the engine's
  * compute path itself scales.
  */
object ComputeScalingBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.get("GRAFT_BENCH_N").map(_.toLong).getOrElse(1000000L)
    val cores = sys.env.getOrElse("GRAFT_BENCH_CORES", "6,24").split(",").map(_.trim.toInt)
    val reps = sys.env.get("GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)

    val results = cores.map { c =>
      val spark = SparkSession.builder().master(s"local[$c]")
        .appName(s"graft-kernel-$c")
        .config("spark.sql.shuffle.partitions", (c * 4).toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        import spark.implicits._
        // deterministic caption corpus, cached as tokens (compute excluded)
        val toks = spark.range(0L, n, 1L, c * 8)
          .map(id => SyntheticImages.genCaption(id))
          .toDF("text")
          .select(graft.functions.TextHash.tokens(col("text")).as("toks"))
          .persist()
        toks.count() // materialize cache
        def once(): Double = {
          val t0 = System.nanoTime()
          toks.select(graft.functions.GraftExpressions.minhashShingles(
              col("toks"), graft.config.GoldenConfig.ShingleK).as("sig"))
            .select(sum(element_at(col("sig"), 1))).head()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup
        val wall = (1 to reps).map(_ => once()).min
        (c, wall)
      } finally spark.stop()
    }
    val lo = results.minBy(_._1); val hi = results.maxBy(_._1)
    val eff = (lo._2 * lo._1) / (hi._2 * hi._1)
    val runs = results.map { case (c, w) =>
      s"""{"cores":$c,"wall_sec":$w,"rows_per_sec":${n / w}}""" }.mkString("[", ",", "]")
    println(s"""{"bench":"kernel_scaling","n":$n,"runs":$runs,"efficiency":$eff}""")
  }
}
