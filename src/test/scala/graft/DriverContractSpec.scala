package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Guards the driver contract's shape: every `SparkEntry.queries` entry
  * must carry a DuckDB oracle, except the explicitly documented rows-only
  * queries — a new query silently missing its oracle (or an oracle whose
  * query was renamed away) fails here before the driver ever runs. */
class DriverContractSpec extends AnyFlatSpec with Matchers {

  /** Queries with no SQL-expressible oracle. Empty since round 4: q39's
    * wrapping 64-bit stub arithmetic is emulated in HUGEINT and q40's
    * k-means went fixed-point — every registered query is hash-checked. */
  private val RowsOnly = Set.empty[String]

  "SparkEntry" should "have an oracle for every query except the documented rows-only set" in {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    (queries -- oracles) shouldBe RowsOnly
    // and no orphaned oracles for queries that don't exist
    (oracles -- queries) shouldBe Set.empty
  }

  it should "name queries in contiguous qNN order" in {
    val nums = SparkEntry.queries.keySet.map(_.take(3).stripPrefix("q").toInt)
    nums shouldBe (1 to nums.max).toSet
  }
}
