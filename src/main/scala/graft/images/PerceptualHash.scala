package graft.images

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._

/** Distributed DCT perceptual hash (pHash) over 8×8 intensity blocks —
  * the classic image near-dup signature (Zauner 2010's pHash; the DCT
  * step is what makes it robust to brightness/contrast shifts, unlike
  * [[ImageCodec.phash]]'s average-hash which thresholds raw means).
  *
  * Everything is exact INTEGER arithmetic: the 8-point DCT-II basis is
  * pinned as the fixed-point table [[graft.config.GoldenConfig.DctCoef]]
  * (cos values rounded to 2^14 units at build time), the input block is a
  * 64-length array of 0..255 codes, and the hash bits threshold the AC
  * coefficients against their LOWER MEDIAN (the 32nd of 63 sorted values
  * — pinned, no float interpolation). The DuckDB oracle interpolates the
  * same coefficient literals, so signatures hash-match bit for bit; no
  * cross-engine libm cos() anywhere.
  *
  * Block sources: the real image path feeds 8×8 box-downscaled grayscale
  * from [[ImageCodec]]-decoded pixels; the embedding path feeds
  * [[graft.operators.AnnSearch.sq8Encode]] codes (a 64-dim embedding IS
  * an 8×8 feature block under SQ8). Either way the operator is pure
  * per-row column arithmetic — map-side at any corpus size, no shuffle,
  * no UDF, whole-stage-codegen'd (the separable two-stage DCT keeps the
  * expression tree at 2·64·8 multiply-adds, not 64·64).
  *
  * The 63 AC bits fold into two non-negative longs (hi = bits 1..31,
  * lo = bits 32..63, MSB-first) so ANSI arithmetic never overflows and
  * the result hashes exactly.
  */
object PerceptualHash {

  /** The flattened fixed-point DCT basis as a 64-literal array column
    * (row-major: cf[8u + x + 1] = C(u)(x)). */
  private def cfLit: Column = array(DctCoef.flatten.map(lit).toIndexedSeq: _*)

  /** Let-binding: evaluate `v` exactly ONCE per row and hand the bound
    * value to `body` as a lambda variable. Spark has no explicit `let`,
    * but a single-element `transform` is one: `array(v)` evals v once,
    * the lambda variable is a cheap slot read wherever `body` references
    * it. This is the load-bearing trick of this file — the DCT stages
    * reference their inputs up to 512 times each, and Spark's
    * higher-order array functions are CodegenFallback (interpreted), so
    * letting the optimizer inline stage N's expression into each of stage
    * N+1's references (CollapseProject does, through orderBy/write plans)
    * re-evaluates the whole subtree per reference — a combinatorially
    * exploding interpreted walk (observed: minutes per 500 rows). Lambda
    * binding makes eval-once a property of the EXPRESSION, not of plan
    * shape. */
  private def bindLet(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Row-pass DCT: g(u,y) = Σ_x C(u)(x)·p(x,y), flattened as g[8u+y].
    * `block` must be a 64-length numeric array (0-based p[x,y] = block[8x+y]).
    * `cf` must be a let-bound reference to [[cfLit]] — as a raw CreateArray
    * it would re-materialize the 64-literal array at every one of the 512
    * interpreted element_at references. */
  private def rowPass(block: Column, cf: Column): Column =
    transform(sequence(lit(0), lit(63)), j => {
      val u = shiftright(j, 3)
      val y = j.bitwiseAND(lit(7))
      aggregate(sequence(lit(0), lit(7)), lit(0L), (acc, x) =>
        acc + element_at(cf, u * 8 + x + 1) *
          element_at(block, x * 8 + y + 1).cast("long"))
    })

  /** Column-pass DCT over the row-pass output: F(u,v) = Σ_y C(v)(y)·g(u,y),
    * flattened as f[8u+v]. */
  private def colPass(g: Column, cf: Column): Column =
    transform(sequence(lit(0), lit(63)), j => {
      val u = shiftright(j, 3)
      val v = j.bitwiseAND(lit(7))
      aggregate(sequence(lit(0), lit(7)), lit(0L), (acc, y) =>
        acc + element_at(cf, v * 8 + y + 1) * element_at(g, u * 8 + y + 1))
    })

  /** The full pHash of one 64-length 0..255 block as a
    * struct(phash_hi, phash_lo) column — each DCT stage and the median
    * let-bound ([[bindLet]]) so the whole hash is one self-contained
    * eval-once expression: per row a fixed ~1.2k integer ops regardless
    * of how the optimizer rearranges projections. Map-side at any corpus
    * size, no shuffle, no UDF. */
  def dctHash(block0: Column): Column =
    // bind the INPUT too: if the caller's block is itself a computed
    // expression (e.g. sq8Encode's zip_with after CollapseProject merges
    // the projections), the row pass's 512 element_at references would
    // re-evaluate it 512 times per row (measured: 13 ms/row → ~0.1 ms/row)
    bindLet(block0) { block =>
    bindLet(cfLit) { cf =>
      bindLet(rowPass(block, cf)) { g =>
        bindLet(colPass(g, cf)) { f =>
          // lower median of the 63 AC coefficients (f[1] is DC)
          bindLet(element_at(array_sort(slice(f, 2, 63)), 32)) { med =>
            def fold(lo: Int, hi: Int): Column =
              aggregate(sequence(lit(lo), lit(hi)), lit(0L), (acc, i) =>
                acc * 2L + when(element_at(f, i) > med, 1L).otherwise(0L))
            struct(fold(2, 32).as("phash_hi"), fold(33, 64).as("phash_lo"))
          }
        }
      }
    }
    }

  /** (id, phash_hi, phash_lo) signatures for a corpus of 64-length 0..255
    * blocks. Runs the compiled kernel (HashKernels.phash64 — same
    * fixed-point DCT + lower-median arithmetic as [[dctHash]],
    * kernel-parity unit-tested) through an `inline` Generate so the hash
    * is evaluated exactly once per row even after CollapseProject. */
  def signatures(df: DataFrame, idCol: String, blockCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      inline(transform(
        array(graft.functions.GraftExpressions.phash64(
          col(blockCol).cast("array<bigint>"))),
        a => struct(element_at(a, 1).as("phash_hi"),
          element_at(a, 2).as("phash_lo")))))

  /** pHash near-dup pairs at Hamming distance ≤ `maxDist` over the 63
    * signature bits, by the pigeonhole band join (the [[ImageCodec]]
    * aHash path's scale shape, reused at the signature level): the 63
    * bits split into `maxDist + 1` chunks, a pair within distance must
    * agree EXACTLY on some chunk, so candidates come from equi-joins on
    * (chunk_idx, chunk_value) — never all pairs — and exact Hamming
    * (codegen'd bit_count over the two xor'd longs) verifies.
    *
    * @return (a, b, dist), a < b */
  def nearDupPairs(sigs: DataFrame, maxDist: Int = 8): DataFrame = {
    require(maxDist >= 1 && maxDist <= 31, "maxDist in [1, 31]")
    val chunks = maxDist + 1
    val per = 63 / chunks // chunk c covers bits [c*per, ...); last takes the tail
    // bit k (0-based, MSB-first over the 63 AC bits): 0..30 in hi, 31..62 in lo
    def bitAt(k: Int): Column = {
      val (src, pos) = if (k < 31) (col("phash_hi"), 30 - k) else (col("phash_lo"), 62 - k)
      shiftright(src, pos) % 2L
    }
    val chunkCols = (0 until chunks).map { c =>
      val hi = if (c == chunks - 1) 63 else (c + 1) * per
      (c * per until hi).map(bitAt).foldLeft(lit(0L))((acc, b) => acc * 2L + b)
        .as(s"_ch$c")
    }
    // materialize once: the 4 chunk-join branches each reference this
    // table twice, and re-deriving it would re-run the whole upstream
    // signature pipeline (range aggs + interpreted DCT) 8 times over
    val keyed = sigs.select(col("id") +: col("phash_hi") +: col("phash_lo") +: chunkCols: _*)
      .localCheckpoint(false)
    val cand = (0 until chunks).map { c =>
      keyed.select(col(s"_ch$c").as("_k"), col("id").as("a"),
          col("phash_hi").as("ha"), col("phash_lo").as("la"))
        .join(keyed.select(col(s"_ch$c").as("_k"), col("id").as("b"),
          col("phash_hi").as("hb"), col("phash_lo").as("lb")), "_k")
        .where(col("a") < col("b"))
        .select("a", "b", "ha", "la", "hb", "lb")
    }.reduce(_ unionByName _).distinct()
    cand
      .withColumn("dist",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("long"))
      .where(col("dist") <= maxDist.toLong)
      .select(col("a"), col("b"), col("dist"))
  }
}
