package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._
import graft.functions.TextHash.{tokens, strHash}

/** SimHash near-duplicate detection (SURVEY §2 B4/B5).
  *
  * Text variant (oracle-checkable): weighted 32-bit SimHash over token
  * frequencies — bit b is set iff Σ_tokens freq · sign(bit b of strHash(tok))
  * > 0. Conceptual ancestor in the reference is the banded geo-distance
  * scoring (R:.../deduplication/similarity/EuclidianDistance.scala → our
  * Hamming banding, SURVEY §2 A36).
  *
  * Near-dup search uses pigeonhole bucketing: split the simhash into
  * HammingChunks contiguous chunks; two hashes within Hamming distance
  * HammingMax share at least one identical (chunk_idx, chunk_value) —
  * an equi-join, never an all-pairs scan. Exact popcount(xor) filters the
  * collisions. Identical scheme, 64-bit, serves the image phash path.
  */
object SimHashNearDup {

  /** (id, text) → (id, simhash: long) with `bits`-bit simhash. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String,
                   bits: Int = SimHashBits): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("token"))
    val freq = tok.groupBy("id", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("th", graft.functions.GraftExpressions.strHash(col("token")))
    // explode bits: contribution of each token to each bit position
    val bitRows = freq.select(col("id"),
        explode(sequence(lit(0L), lit(bits - 1L))).as("bit"),
        col("cnt"), col("th"))
      .withColumn("contrib",
        expr("cnt * ((shiftright(th, cast(bit AS int)) & CAST(1 AS bigint)) * 2 - 1)"))
    bitRows.groupBy("id", "bit").agg(sum(col("contrib")).as("s"))
      .groupBy("id")
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS bigint), cast(bit AS int)) ELSE CAST(0 AS bigint) END"))
        .as("simhash"))
  }

  /** Hamming-bucket rows: (id, chunk_idx, chunk_val) — chunkBits-wide slices. */
  def buckets(sim: DataFrame, simCol: String = "simhash",
              bits: Int = SimHashBits, chunks: Int = HammingChunks): DataFrame = {
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1L
    sim.select(col("id"), col(simCol).as("sh_"),
        explode(sequence(lit(0L), lit(chunks - 1L))).as("chunk_idx"))
      .withColumn("chunk_val",
        expr(s"shiftright(sh_, cast(chunk_idx * $chunkBits AS int)) & CAST($mask AS bigint)"))
      .drop("sh_")
  }

  /** Distinct pairs (a, b, dist) with popcount(xor) <= maxDist, via
    * pigeonhole bucket equi-join + exact Hamming filter. */
  def nearDupPairs(sim: DataFrame, simCol: String = "simhash",
                   bits: Int = SimHashBits, maxDist: Int = HammingMax,
                   saltCap: Int = SaltCap, saltFanout: Int = SaltFanout): DataFrame = {
    val b = buckets(sim, simCol, bits, maxDist + 1)
    val cand = SkewSalting.selfJoinPairs(b, Seq("chunk_idx", "chunk_val"), "id",
      saltCap, saltFanout)
    val ha = sim.select(col("id").as("a"), col(simCol).as("sim_a"))
    val hb = sim.select(col("id").as("b"), col(simCol).as("sim_b"))
    cand.join(ha, "a").join(hb, "b")
      .withColumn("dist", expr("cast(bit_count(sim_a ^ sim_b) AS bigint)"))
      .where(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist"))
  }
}
