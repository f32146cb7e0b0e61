package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Dev-only: times cumulative sub-steps of the MinHash candidate path so
  * the cost of each stage (signatures, bands, salted self-join, verify)
  * can be separated. Each step re-derives its ancestors (stateless), so
  * step_i − step_{i−1} ≈ the marginal cost of stage i. */
object ProfileSteps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def sig = MinHashLsh.signaturesFromText(docs, "doc_id", "text")
    def bands = MinHashLsh.bands(sig)
    def folded = bands.select(
      (col("band_idx") * lit(graft.config.GoldenConfig.P) + col("band_hash")).as("bucket"),
      col("id"))
    def candFromScratch = MinHashLsh.candidatePairs(bands)
    def sh = MinHashLsh.shingleTable(docs, "doc_id", "text")
    def verify = MinHashLsh.verifyPairs(candFromScratch, sh).orderBy("a", "b")
    val steps: Seq[(String, () => DataFrame)] = Seq(
      "1_signatures" -> (() => sig),
      "2_bands" -> (() => bands),
      "3_folded" -> (() => folded),
      "4_cand_selfjoin" -> (() => candFromScratch),
      "5_shingles" -> (() => sh),
      "6_verify(q07)" -> (() => verify))
    def run(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    steps.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } } // warmup
    steps.foreach { case (n, fn) =>
      val ts = (1 to 3).map(_ => run(fn))
      println(f"$n%-16s min ${ts.min}%6.3f  samples ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
