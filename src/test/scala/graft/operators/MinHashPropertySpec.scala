package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random
import graft.config.GoldenConfig._

/** Host-side property tests of the MinHash math itself (no Spark):
  * the estimator concentrates around exact Jaccard, and banding collision
  * count is monotone in similarity (FIXTURES.md §4). Deterministic seeded
  * sampling (no wall-clock, reproducible). */
class MinHashPropertySpec extends AnyFlatSpec with Matchers {

  /** Pure-Scala mirror of the kernel (same GoldenConfig arithmetic). */
  private def sig(shingles: Set[String]): Array[Long] = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    for (s <- shingles) {
      val x = strHash(s)
      var i = 0
      while (i < NumHashes) {
        val v = (hashA(i) * x + hashB(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    mins
  }

  private def estimate(a: Set[String], b: Set[String]): Double = {
    val (sa, sb) = (sig(a), sig(b))
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / NumHashes
  }

  private def exact(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  "minhash estimate" should "concentrate around exact jaccard (4 sigma)" in {
    val rnd = new Random(Seed)
    val universe = (1 to 60).map(i => s"w$i")
    for (trial <- 1 to 60) {
      val a = universe.filter(_ => rnd.nextBoolean()).toSet + "w1"
      val b = universe.filter(_ => rnd.nextBoolean()).toSet + "w2"
      val err = math.abs(estimate(a, b) - exact(a, b))
      // sd = sqrt(J(1-J)/n) <= 0.5/sqrt(128) ≈ 0.0442; allow 4 sigma
      withClue(s"trial $trial: ") { err should be <= 0.18 }
    }
  }

  it should "be exact for identical and near-zero for disjoint sets" in {
    val a = Set("x1", "x2", "x3")
    estimate(a, a) shouldBe 1.0
    estimate(a, Set("y1", "y2", "y3")) should be <= 0.05
  }

  "band collisions" should "be monotone-ish in similarity" in {
    val universe = (1 to 60).map(i => s"u$i")
    val baseSet = universe.take(30).toSet
    def bandsOf(s: Set[String]): Seq[Long] = {
      val m = sig(s)
      (0 until Bands).map { j =>
        m.slice(j * RowsPerBand, (j + 1) * RowsPerBand)
          .foldLeft(0L)((h, v) => (h * StrBase + v) % P)
      }
    }
    // other(k): keeps k of the base's 30 words, replaces the rest
    def collisions(k: Int): Int = {
      val other = universe.take(k).toSet ++ universe.slice(30, 60 - k)
      bandsOf(baseSet).zip(bandsOf(other)).count { case (x, y) => x == y }
    }
    collisions(30) shouldBe Bands              // identical sets
    collisions(29) should be >= collisions(15) // high sim ≥ mid sim
    collisions(15) should be >= collisions(2)  // mid sim ≥ low sim
    collisions(29) should be >= 1              // τ≈0.42 < J≈0.87 ⇒ expect hits
  }
}
