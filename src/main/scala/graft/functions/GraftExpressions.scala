package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.config.GoldenConfig.NumHashes

/** Custom Catalyst expressions for the dedup hot path (SURVEY.md §4.2).
  * Both emit a single static-kernel call from `doGenCode`, so they stay
  * inside whole-stage codegen spans instead of falling back to row-at-a-time
  * interpretation like nested higher-order functions do. */

/** strHash(string) → long in [0, P). */
case class StrHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.strHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.strHash($c);")
  override protected def withNewChildInternal(newChild: Expression): StrHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_str_hash"
}

/** minhash_sig(array<string>) → array<long> of NumHashes affine-min hashes;
  * null on empty input. */
case class MinHashSigExpr(child: Expression, n: Int = NumHashes)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashSig(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashKernels.minHashSig($c, $n);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** gram_hashes(array<string> tokens, l) → array<long> rolling window hashes;
  * null when fewer than l tokens. */
case class GramHashesExpr(child: Expression, l: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    HashKernels.gramHashes(input.asInstanceOf[ArrayData], l)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashKernels.gramHashes($c, $l);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_hashes"
}

/** minhash_shingles(array<string> tokens, k, n) → fused shingle+MinHash
  * signature; null when fewer than k tokens. */
case class MinHashShinglesExpr(child: Expression, k: Int, n: Int = NumHashes)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashShingles(input.asInstanceOf[ArrayData], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashKernels.minHashShingles($c, $k, $n);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): MinHashShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_shingles"
}

/** shingle_hashes(array<string> tokens, k) → distinct sorted shingle hashes;
  * null when fewer than k tokens. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashKernels.shingleHashes($c, $k);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** shingle_strings(array<string> tokens, k) → distinct shingle strings in
  * first-occurrence order; empty array when fewer than k tokens. */
case class ShingleStringsExpr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleStrings(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.shingleStrings($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): ShingleStringsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_strings"
}

/** band_hashes(array<bigint> sig, bands, r) → array<bigint> of per-band
  * polynomial folds (band_idx = position). */
case class BandHashArrExpr(child: Expression, bands: Int, r: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.bandHashArr(input.asInstanceOf[ArrayData], bands, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.bandHashArr($c, $bands, $r);")
  override protected def withNewChildInternal(newChild: Expression): BandHashArrExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_band_hashes"
}

/** simhash(array<string> tokens, bits) → long weighted SimHash. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simHash($c, $bits);")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** phash64(array<bigint> 64-block) → array<long> [phash_hi, phash_lo]. */
case class PHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashKernels.phash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.phash64($c);")
  override protected def withNewChildInternal(newChild: Expression): PHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_phash64"
}

/** pq_code(array<bigint> sq8-code, array<array<bigint>> codebook) →
  * array<bigint> of M nearest-entry indices. */
case class PqCodeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.pqCode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.pqCode($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqCodeExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_code"
}

/** pq_adc(array<bigint> tbl, array<bigint> pqcode) → bigint lookup sum. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.pqAdc($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_pq_adc"
}

/** dot_f(array<float>, array<float>) → double, left-fold order. */
case class DotFExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  // contract: both children are array<float> (the engine's embedding type;
  // AbstractDataType is private[sql], so the check is an analysis-time
  // require instead of ExpectsInputTypes)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot_f expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.dotF($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotFExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot_f"
}

/** hyperplane_bucket(array<float>, planes[, offset]) → long LSH bucket id
  * over planes [offset, offset + planes) — offset = t·planes gives banded
  * table t's bucket. */
case class HyperplaneBucketExpr(child: Expression, planes: Int, offset: Int = 0)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_bucket expects array<float>, got $other")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashKernels.hyperplaneBucket(input.asInstanceOf[ArrayData], planes, offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.hyperplaneBucket($c, $planes, $offset);")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_bucket"
}

object GraftExpressions {
  /** Compiled left-fold dot product of two float-array columns. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(DotFExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Compiled random-hyperplane LSH bucket of a float-array column;
    * `offset` selects the plane range [offset, offset + planes) for banded
    * multi-table LSH. */
  def hyperplaneBucket(vec: Column, planes: Int, offset: Int = 0): Column =
    Bridge.column(HyperplaneBucketExpr(Bridge.expression(vec), planes, offset))

  /** Rolling l-gram hashes over a token array (window fold of token
    * hashes — the substring-pass candidate key). */
  def gramHashes(tokens: Column, l: Int): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(tokens), l))

  /** Fused shingle+MinHash signature straight from a token array. */
  def minhashShingles(tokens: Column, k: Int, n: Int = NumHashes): Column =
    Bridge.column(MinHashShinglesExpr(Bridge.expression(tokens), k, n))

  /** Distinct sorted k-shingle hashes from a token array. */
  def shingleHashes(tokens: Column, k: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(tokens), k))

  /** Fast fused equivalent of
    * TextHash.minhashSignature(TextHash.hashArray(shingles)). */
  def minhashSig(shingles: Column, n: Int = NumHashes): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingles), n))

  /** Fast equivalent of TextHash.strHash. */
  def strHash(s: Column): Column =
    Bridge.column(StrHashExpr(Bridge.expression(s)))

  /** Compiled per-band polynomial folds of a MinHash signature. */
  def bandHashArr(sig: Column, bands: Int, r: Int): Column =
    Bridge.column(BandHashArrExpr(Bridge.expression(sig), bands, r))

  /** Compiled PQ assignment: M nearest-codebook-entry indices per code. */
  def pqCode(code: Column, cbs: Column): Column =
    Bridge.column(PqCodeExpr(Bridge.expression(code), Bridge.expression(cbs)))

  /** Compiled ADC lookup sum of a pqcode against a per-query table. */
  def pqAdc(tbl: Column, pqcode: Column): Column =
    Bridge.column(PqAdcExpr(Bridge.expression(tbl), Bridge.expression(pqcode)))

  /** Compiled distinct shingle strings (TextHash.shingles equivalent). */
  def shingleStrings(tokens: Column, k: Int): Column =
    Bridge.column(ShingleStringsExpr(Bridge.expression(tokens), k))

  /** Compiled weighted SimHash of a token array (one pass, no shuffle). */
  def simHash(tokens: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokens), bits))

  /** Compiled integer DCT pHash of a 64-length block → [hi, lo]. */
  def phash64(block: Column): Column =
    Bridge.column(PHash64Expr(Bridge.expression(block)))
}
