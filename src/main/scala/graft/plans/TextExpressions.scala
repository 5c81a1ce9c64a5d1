package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hashing kernels for the dedup hot paths (SURVEY.md §4.2).
  *
  * Spark's higher-order functions (`transform`/`aggregate`) evaluate their
  * lambda interpreted, per element — measured as the dominant cost of the
  * minhash/simhash/jaccard pipelines at sf0.1 (md5 + base-16 parse per
  * shingle through an interpreted expression tree). These expressions do the
  * whole per-document loop in one compiled call.
  *
  * Determinism contract (graft.functions.Text): a token/shingle hash is the
  * first 15 hex chars of md5(utf8), parsed base-16 — 60 bits, positive,
  * bit-identical in every engine. [[TextHashKernels.md5_60]] computes the
  * same value directly from the digest bytes (nibbles 0..14 = bytes 0..6
  * plus the high nibble of byte 7), asserted equal to the HOF form in
  * `SimilarityAndDedupSpec`.
  */
object TextExpressions {

  /** Shared per-thread MD5 instance — digest() resets it. */
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Runtime kernels, referenced from generated code via `addReferenceObj`
    * (serializable singleton; executors re-resolve the MessageDigest). */
  object TextHashKernels extends Serializable {

    /** First 15 hex nibbles of md5(bytes), parsed base-16. */
    def md5_60(bytes: Array[Byte]): Long = {
      val d = md5Local.get().digest(bytes)
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      (h << 4) | ((d(7) >> 4) & 0xfL)
    }

    /** Distinct hashed word n-gram shingles, first-occurrence order.
      * Matches array_distinct(transform(shingles(toks, n), tokenHash)). */
    def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
      val numToks = toks.numElements()
      val count = numToks - n + 1
      if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        seen.add(md5_60(sb.toString.getBytes("UTF-8")))
        i += 1
      }
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }

    /** POSITIONAL hashed word n-gram spans — one hash per position, NOT
      * deduplicated (repeating a span twice yields its hash twice).
      * Matches transform over the raw sliding windows; the span-level
      * duplication stats need position multiplicity, which the set form
      * above deliberately erases. */
    def spanHashes(toks: ArrayData, n: Int): ArrayData = {
      val numToks = toks.numElements()
      val count = numToks - n + 1
      if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](count)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < count) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          j += 1
        }
        out(i) = md5_60(sb.toString.getBytes("UTF-8"))
        i += 1
      }
      new GenericArrayData(out)
    }

    /** First 8 bytes of md5(bytes) as a big-endian (signed) long — the full
      * 64-bit token hash behind [[simhash64]]. Equals
      * `(hi32 << 32) | lo32` where hi32/lo32 parse hex chars 1–8 / 9–16 of
      * the md5 string — the two POSITIVE 32-bit halves the DuckDB oracle
      * uses (a single 16-hex-char parse can overflow signed BIGINT). */
    def md5_64(bytes: Array[Byte]): Long = {
      val d = md5Local.get().digest(bytes)
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h
    }

    /** 64-bit simhash over distinct tokens: bit j set iff the count of
      * distinct token hashes with bit j set exceeds half. Matches
      * graft.operators.Dedup.simhash64Hof exactly (votes +1/-1, bit set on
      * vote > 0). 64 bits (vs the former 48) so the pigeonhole blocking in
      * Dedup.simhashPairs gets 16-bit chunk keys — candidate volume per
      * chunk table shrinks 16× (n²/2¹⁶ vs n²/2¹²), the difference between
      * workable and quadratic at 10⁹ documents. */
    def simhash64(toks: ArrayData): Long = {
      val n = toks.numElements()
      val seen = new java.util.HashSet[Long]()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = md5_64(toks.getUTF8String(i).getBytes)
        if (seen.add(h)) {
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
  }

  private def requireStringArray(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$name needs array<string>, got $other")
  }

  /** tokens → distinct 60-bit shingle hashes (compiled loop). */
  case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "shingle_hashes")

    override def nullSafeEval(input: Any): Any =
      TextHashKernels.shingleHashes(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("kernels", TextHashKernels,
        TextHashKernels.getClass.getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.shingleHashes($a, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
      copy(child = newChild)
  }

  /** tokens → positional (non-distinct) 60-bit span hashes (compiled loop). */
  case class SpanHashesExpr(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "span_hashes")

    override def nullSafeEval(input: Any): Any =
      TextHashKernels.spanHashes(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("kernels", TextHashKernels,
        TextHashKernels.getClass.getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.spanHashes($a, $n);")
    }

    override protected def withNewChildInternal(newChild: Expression): SpanHashesExpr =
      copy(child = newChild)
  }

  /** tokens → 64-bit simhash signature (compiled loop). */
  case class SimHash64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireStringArray(child.dataType, "simhash64")

    override def nullSafeEval(input: Any): Any =
      TextHashKernels.simhash64(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val k = ctx.addReferenceObj("kernels", TextHashKernels,
        TextHashKernels.getClass.getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.simhash64($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
      copy(child = newChild)
  }

  /** Column-API entry points. */
  def shingleHashes(tokens: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    ColumnGlue.column(ShingleHashesExpr(ColumnGlue.expression(tokens), n))
  }

  def spanHashes(tokens: Column, n: Int): Column = {
    require(n >= 1, s"span size must be >= 1, got $n")
    ColumnGlue.column(SpanHashesExpr(ColumnGlue.expression(tokens), n))
  }

  def simhash64(tokens: Column): Column =
    ColumnGlue.column(SimHash64Expr(ColumnGlue.expression(tokens)))
}
