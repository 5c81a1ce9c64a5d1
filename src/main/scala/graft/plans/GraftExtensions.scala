package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's codegen expressions.
  *
  * Registered two ways:
  *  - session build time: `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  *  - live session: `GraftExtensions.register(spark)`
  *
  * Gives the catalog/SQL entry point (graft.sources.Catalog) access to the
  * same compiled kernels the DataFrame API uses: `cosine_sim(a, b)`,
  * `minhash_sig(hashes, numPerm)`, `shingle_hashes(tokens, n)`,
  * `simhash64(tokens)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      /* arguments = */ "", /* examples = */ "", /* note = */ "",
      /* group = */ "", /* since = */ "", /* deprecated = */ "",
      /* source = */ "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => VectorExpressions.CosineSim(args(0), args(1))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(hashes, numPerm) - minhash signature of a hash-set column"),
      (args: Seq[Expression]) => {
        val n = intArg(args(1), "minhash_sig", 2)
        VectorExpressions.MinHashSig(args(0), n,
          (0 until n).map(graft.operators.Dedup.coeffA),
          (0 until n).map(graft.operators.Dedup.coeffB))
      }),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(tokens, n) - distinct 60-bit word n-gram hashes"),
      (args: Seq[Expression]) =>
        TextExpressions.ShingleHashesExpr(args(0), intArg(args(1), "shingle_hashes", 2))),
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a token array"),
      (args: Seq[Expression]) => TextExpressions.SimHash64Expr(args(0))),
    ("bloom_might_contain",
      info("bloom_might_contain",
        "bloom_might_contain(bits, hash, k) - probe a graft Bloom bitmap (array<bigint>)"),
      (args: Seq[Expression]) =>
        BloomExpressions.BloomMightContain(args(0), args(1),
          intArg(args(2), "bloom_might_contain", 3))))

  /** Register into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
