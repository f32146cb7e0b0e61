package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.SparkTestBase

class PercentilesSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  // plain-Scala lower-rank percentile: sorted(ceil(p*n/100) - 1)
  private def ref(vals: Seq[Long], p: Int): Long = {
    val s = vals.sorted
    s(((p * s.size + 99) / 100) - 1)
  }

  "exactPercentiles" should "match the sorted lower-rank definition per group" in {
    val rnd = new scala.util.Random(7)
    val rows = (for (g <- Seq("a", "b", "c"); _ <- 0 until (100 + rnd.nextInt(200)))
      yield (g, rnd.nextInt(50).toLong)) :+ (("d", 42L)) // singleton group
    val out = Percentiles.exactPercentiles(rows.toDF("g", "v"), "g", "v",
        Seq(1, 50, 90, 99, 100))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2))
    byG.foreach { case (g, vs) =>
      out(g) shouldBe ((ref(vs, 1), ref(vs, 50), ref(vs, 90), ref(vs, 99), ref(vs, 100)))
    }
    out("d") shouldBe ((42L, 42L, 42L, 42L, 42L))
  }
}
