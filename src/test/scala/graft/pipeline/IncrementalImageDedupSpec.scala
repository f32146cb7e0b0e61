package graft.pipeline

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.images.SyntheticImages

/** Incremental (delta-vs-corpus) dedup must reproduce the full re-run's
  * clustering on the planted synthetic corpus: the generator plants dups at
  * id%20 ∈ {8,9} (→ corpus half) and {18,19} (→ delta half) of each base
  * id%20 == 0, so recall requires BOTH delta×corpus cross pairs and the
  * delta-internal pair (18,19). */
class IncrementalImageDedupSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private val n = 2000L
  private lazy val all = SyntheticImages.generate(spark, n).toDF().localCheckpoint()
  private val idNum = expr("cast(substring(image_id, 5) as bigint)")
  private lazy val corpus = all.where(idNum % 20 < 10).localCheckpoint()
  private lazy val delta = all.where(idNum % 20 >= 10).localCheckpoint()

  "IncrementalImageDedup" should "equal a full re-run over corpus ∪ delta" in {
    val fullClusters = ImageDedupPipeline.runDirect(spark, all)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val corpusClusters = ImageDedupPipeline.runDirect(spark, corpus)
    val inc = IncrementalImageDedup.runDirect(spark, corpus, corpusClusters, delta)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    inc.keySet shouldBe fullClusters.keySet
    // identical partitions AND identical min-id labels
    inc shouldBe fullClusters
  }

  it should "achieve recall and precision 1.0 against the planted truth" in {
    val corpusClusters = ImageDedupPipeline.runDirect(spark, corpus)
    val inc = IncrementalImageDedup.runDirect(spark, corpus, corpusClusters, delta)
      .localCheckpoint()
    val truth = SyntheticImages.truth(spark, n).toDF()
    val (recall, truePairs, _) = graft.Main.pairRecall(inc, truth)
    val (precision, _, _) = graft.Main.pairPrecision(inc, truth)
    truePairs should be > 0L
    recall shouldBe 1.0
    precision shouldBe 1.0
  }
}
