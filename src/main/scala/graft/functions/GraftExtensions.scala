package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.config.GoldenConfig.{NumHashes, ShingleK, SubstringL}

/** SQL surface for the custom Catalyst expressions: registers
  * `graft_str_hash`, `graft_minhash`, `graft_minhash_shingles`,
  * `graft_shingle_hashes`, `graft_gram_hashes` into the session function
  * registry, so the engine's kernels are first-class in `spark.sql(...)`
  * — e.g. `SELECT graft_minhash_shingles(split(lower(caption),' '))`.
  *
  * Two entry points:
  *  - spark-submit: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (the standard SparkSessionExtensions injection path);
  *  - programmatic: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects exactly 1 argument")
    args.head
  }

  /** (name, info, builder) triples — single source for both entry points. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_str_hash",
      info("graft_str_hash", "polynomial rolling hash of a string into [0, P)"),
      (args: Seq[Expression]) => StrHashExpr(one(args, "graft_str_hash"))),
    ("graft_minhash",
      info("graft_minhash", s"batched $NumHashes-hash MinHash signature of array<string> shingles"),
      (args: Seq[Expression]) => MinHashSigExpr(one(args, "graft_minhash"))),
    ("graft_minhash_shingles",
      info("graft_minhash_shingles", s"fused $ShingleK-shingle + MinHash signature of array<string> tokens"),
      (args: Seq[Expression]) => MinHashShinglesExpr(one(args, "graft_minhash_shingles"), ShingleK)),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", s"distinct sorted $ShingleK-shingle hashes of array<string> tokens"),
      (args: Seq[Expression]) => ShingleHashesExpr(one(args, "graft_shingle_hashes"), ShingleK)),
    ("graft_gram_hashes",
      info("graft_gram_hashes", s"rolling $SubstringL-gram window hashes of array<string> tokens"),
      (args: Seq[Expression]) => GramHashesExpr(one(args, "graft_gram_hashes"), SubstringL)),
    ("graft_dot_f",
      info("graft_dot_f", "left-fold dot product of two array<float> embeddings"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot_f expects exactly 2 arguments")
        DotFExpr(args(0), args(1))
      }),
    ("graft_hyperplane_bucket",
      info("graft_hyperplane_bucket",
        s"${graft.config.GoldenConfig.AnnHyperplanes}-plane LSH bucket of an array<float> embedding"),
      (args: Seq[Expression]) => HyperplaneBucketExpr(
        one(args, "graft_hyperplane_bucket"), graft.config.GoldenConfig.AnnHyperplanes)),
    ("graft_bounded_topk",
      info("graft_bounded_topk",
        "aggregate: the k smallest (key, id) long pairs per group, ascending — " +
          "k-capped partial state (straggler-proof grouped top-k); " +
          "usage: graft_bounded_topk(key, id, k) with literal k"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_bounded_topk expects (key, id, k)")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_bounded_topk: k must be an integer literal, got $other")
        }
        BoundedTopKAgg(args(0), args(1), k)
      }))

  /** Register the functions into an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(
        spark, FunctionIdentifier(name), i, builder)
    }
}
