package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: the single-table 8-bit hyperplane LSH
  * bucket of a 64-dim embedding, in one generated loop.
  *
  * Replaces the s02/d10 unrolled declarative fold — 8 planes × 64
  * `element_at` adds built as a ~512-node Catalyst tree. That tree is
  * instantiated on BOTH sides of d10's self-join, and the join stage's
  * generated method then crosses janino's 64 KB method limit: the whole
  * stage silently fell back to INTERPRETED execution ("Code grows
  * beyond 64 KB", observed every bench run) — the headline near-dup
  * path was running with zero codegen. As one plan node the stage
  * compiles again, and per-row cost drops from ~512 boxed closure
  * steps to one primitive loop (the MipsBuckets precedent, r7).
  *
  * Bit-exactness contract (the DuckDB oracle mirrors it): per plane p,
  * the projection is the LEFT fold from an explicit 0.0 accumulator
  * over j = 0..63 of `acc + (sign ? x_j : -x_j)` — IEEE addition order
  * identical to the unrolled form and to the oracle's
  * `list_reduce([0.0] || ...)`, so buckets are bitwise equal
  * (HyperplaneBucket8Spec pins native ≡ unrolled on real vectors).
  *
  * The sign matrix is the md5("{p}_{j}") recipe shared with the oracle
  * SQL (j 1-based), compiled once into a flat boolean[] reference
  * object. Null handling (r13 ADVICE #1, pinned bit-for-bit to the
  * replaced fold): a NULL ARRAY yields bucket 0 — the HOF form's
  * `when(null > 0).otherwise(0)` collapses a null input to 0, so this
  * expression is non-nullable and returns 0 there too. A null ELEMENT
  * likewise lands the vector in bucket 0 (null poisons every plane's
  * projection). The ONE documented divergence: fewer than 64 elements
  * always throws here, where the unrolled `element_at` only throws
  * under ANSI mode (the session default) and would yield bucket 0
  * non-ANSI — the embeddings corpus contract guarantees 64-dim
  * vectors, s14_embedding_health audits it, and
  * HyperplaneBucket8Spec pins all three edges.
  */
case class HyperplaneBucket8(child: Expression) extends UnaryExpression {
  import HyperplaneBucket8._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket8 expects ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = IntegerType
  // never null: a null array is bucket 0, like the fold it replaces
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() < Dim)
      throw new IllegalArgumentException(
        s"hyperplane_bucket8: need >= $Dim dims, got ${x.numElements()}")
    var k = 0
    while (k < Dim) {
      if (x.isNullAt(k)) return 0 // HOF form: null poisons every plane
      k += 1
    }
    var bucket = 0
    var p = 0
    while (p < Planes) {
      var proj = 0.0
      val base = p * Dim
      var j = 0
      while (j < Dim) {
        val v = x.getDouble(j)
        proj += (if (signs(base + j)) v else -v)
        j += 1
      }
      if (proj > 0.0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // hand-rolled (not nullSafeCodeGen): a null child must produce
    // bucket 0, not a null result — the fold this replaces is
    // when(... > 0).otherwise(0), which never emits null
    val childGen = child.genCode(ctx)
    val sg = ctx.addReferenceObj("hyperSigns", signs, "boolean[]")
    val a = childGen.value
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val k = ctx.freshName("k")
    val base = ctx.freshName("base")
    val proj = ctx.freshName("proj")
    val bucket = ctx.freshName("bucket")
    val v = ctx.freshName("v")
    val nulls = ctx.freshName("nulls")
    val body =
      s"""
         |int $bucket = 0;
         |if (!${childGen.isNull}) {
         |  if ($a.numElements() < $Dim) {
         |    throw new IllegalArgumentException(
         |      "hyperplane_bucket8: need >= $Dim dims, got " + $a.numElements());
         |  }
         |  boolean $nulls = false;
         |  for (int $k = 0; $k < $Dim; $k++) {
         |    if ($a.isNullAt($k)) { $nulls = true; break; }
         |  }
         |  if (!$nulls) {
         |    for (int $p = 0; $p < $Planes; $p++) {
         |      double $proj = 0.0;
         |      int $base = $p * $Dim;
         |      for (int $j = 0; $j < $Dim; $j++) {
         |        double $v = $a.getDouble($j);
         |        $proj += $sg[$base + $j] ? $v : -$v;
         |      }
         |      if ($proj > 0.0) $bucket |= (1 << $p);
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(
      code = code"""
        |${childGen.code}
        |$body
        |int ${ev.value} = $bucket;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket8 {
  val Planes = 8
  val Dim = 64

  /** Flat [p][j] sign matrix, seed recipe md5("{p}_{j}") with j
    * 1-based — the same bytes the oracle derives with DuckDB's md5()
    * and the same values SimilarityOps.hyperplaneSigns unrolled.
    * true = +1. */
  val signs: Array[Boolean] = {
    val out = new Array[Boolean](Planes * Dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    for (p <- 0 until Planes; j <- 1 to Dim) {
      md.reset()
      val h = md.digest(s"${p}_$j".getBytes("UTF-8"))
      out(i) = ((h(0) >> 4) & 0xf) >= 8
      i += 1
    }
    out
  }
}
