package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions (SURVEY.md §4.2: "custom
  * `Expression` with `doGenCode` beats a Scala UDF beats anything else").
  *
  * The higher-order-function formulations (`zip_with` + `aggregate`) are
  * semantically identical but run interpreted with per-element boxing —
  * measured 85 s for the sf0.1 embedding near-dup join. These expressions
  * compile to tight primitive loops inside whole-stage codegen. Numerics
  * are kept bit-identical to the HOF versions (same per-accumulator
  * sequential fold order, double arithmetic, no FMA) so the DuckDB oracle
  * comparisons are unaffected.
  */
object VectorExpressions {

  /** Shared by interpreted eval and generated code: a dimension mismatch is
    * a data bug — fail loudly (DuckDB's list_cosine_similarity does too)
    * instead of silently truncating to a plausible-looking similarity. */
  def checkedLength(fn: String, a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb)
      throw new IllegalArgumentException(
        s"$fn: array length mismatch ($na vs $nb)")
    na
  }

  /** Cosine similarity over two equal-length float/double arrays, in
    * double: dot/(√Σx²·√Σy²) with sequential accumulation. */
  case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    private def elemGetter(e: Expression): String =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => "getFloat"
        case _ => "getDouble"
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xa = a.asInstanceOf[ArrayData]
      val xb = b.asInstanceOf[ArrayData]
      val n = VectorExpressions.checkedLength("cosine_sim", xa, xb)
      val fa = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val fb = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x: Double = if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
        val y: Double = if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = graft.plans.VectorExpressions.checkedLength("cosine_sim", $a, $b);
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.${elemGetter(left)}($i);
           |  double $y = (double) $b.${elemGetter(right)}($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  /** Dot product over two equal-length float/double arrays, in double, same
    * sequential accumulation order as [[CosineSim]]'s dot term — so
    * `DotProduct(a,b) / (sqrt(DotProduct(a,a)) * sqrt(DotProduct(b,b)))`
    * is bit-identical to `CosineSim(a,b)` (asserted in tests). Used to
    * hoist the per-vector norms out of pairwise similarity joins. */
  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    private def elemGetter(e: Expression): String =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => "getFloat"
        case _ => "getDouble"
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val xa = a.asInstanceOf[ArrayData]
      val xb = b.asInstanceOf[ArrayData]
      val n = VectorExpressions.checkedLength("dot_product", xa, xb)
      val fa = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val fb = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
      var dot = 0.0
      var i = 0
      while (i < n) {
        val x: Double = if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
        val y: Double = if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
        dot += x * y
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = graft.plans.VectorExpressions.checkedLength("dot_product", $a, $b);
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $a.${elemGetter(left)}($i) * (double) $b.${elemGetter(right)}($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** MinHash signature: for each permutation p, min over the input hash set
    * of (A(p)·(h pmod P) + B(p)) mod P. Identical arithmetic to
    * [[graft.operators.Dedup.minhashSignature]]'s HOF form — including
    * `floorMod` for the input hash, so negative inputs (reachable through
    * the SQL-registered function) agree with the HOF's `pmod` — compiled to
    * a two-level primitive loop. Coefficients are Seq (value equality), so
    * semantically identical expressions canonicalize/CSE correctly. */
  case class MinHashSig(child: Expression, numPerm: Int,
                        coeffA: Seq[Long], coeffB: Seq[Long]) extends UnaryExpression {
    private val P = 2147483647L
    @transient private lazy val aArr: Array[Long] = coeffA.toArray
    @transient private lazy val bArr: Array[Long] = coeffB.toArray

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_sig needs array<bigint>, got $dt")
      }

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val sig = new Array[Long](numPerm)
      var p = 0
      while (p < numPerm) {
        val a = aArr(p); val b = bArr(p)
        var mn = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = java.lang.Math.floorMod(hs.getLong(i), P)
          val v = (a * h + b) % P
          if (v < mn) mn = v
          i += 1
        }
        sig(p) = mn
        p += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      nullSafeCodeGen(ctx, ev, hs => {
        val n = ctx.freshName("n")
        val sig = ctx.freshName("sig")
        val p = ctx.freshName("p")
        val i = ctx.freshName("i")
        val mn = ctx.freshName("mn")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        s"""
           |int $n = $hs.numElements();
           |long[] $sig = new long[$numPerm];
           |for (int $p = 0; $p < $numPerm; $p++) {
           |  long $mn = Long.MAX_VALUE;
           |  for (int $i = 0; $i < $n; $i++) {
           |    long $h = java.lang.Math.floorMod($hs.getLong($i), ${P}L);
           |    long $v = ($aRef[$p] * $h + $bRef[$p]) % ${P}L;
           |    if ($v < $mn) $mn = $v;
           |  }
           |  $sig[$p] = $mn;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnGlue.column(CosineSim(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    ColumnGlue.column(DotProduct(
      ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** The verified-pair threshold test `round(cosr, 6) >= threshold`,
    * gated by a raw-double prefilter so the exact round — a PER-EVALUATION
    * java.math.BigDecimal construction (the r13 c31 profile's dominant
    * cost at ~12M candidates) — runs only on near-threshold survivors.
    * Correctness proof, kept in ONE place on purpose: 6dp rounding moves
    * a value by at most 5e-7 (+ representation epsilon), so
    * round(x,6) ≥ t ⟹ x ≥ t − 1e-6 — the prefilter admits a strict
    * superset, And short-circuits left-to-right in codegen, and the
    * surviving predicate is the exact one. The 1e-6 bound and the 6dp
    * precision must move in lockstep; that is why every similarity-join
    * verify (embeddingPairs, embeddingLshPairs, semanticDedupBlocked,
    * jlLshPairs) calls this instead of inlining the pair. */
  def cosineAtLeast(cosr: Column, threshold: Double): Column = {
    import org.apache.spark.sql.functions.{lit, round}
    cosr >= lit(threshold - 1e-6) && round(cosr, 6) >= lit(threshold)
  }

  def minhashSig(hashes: Column, numPerm: Int,
                 coeffA: Seq[Long], coeffB: Seq[Long]): Column =
    ColumnGlue.column(MinHashSig(
      ColumnGlue.expression(hashes), numPerm, coeffA, coeffB))
}
