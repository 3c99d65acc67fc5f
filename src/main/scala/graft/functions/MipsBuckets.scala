package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: all 16 multi-table MIPS-LSH buckets of a
  * 65-dim norm-augmented vector, in one generated loop.
  *
  * Replaces s17's unrolled declarative form — 16 tables × 5 planes ×
  * 65 `element_at` adds built as a ~5,200-node Catalyst tree,
  * instantiated on BOTH the corpus and query sides. Analyzing,
  * optimizing and codegen'ing that tree cost 42–61 s on first run
  * (r7 verdict "What's wrong #3"); this expression is a single plan
  * node whose generated code is three nested constant-bound loops.
  *
  * Bit-exactness contract (the DuckDB oracle mirrors it): per table t
  * and plane p, the projection is the LEFT fold from an explicit 0.0
  * accumulator over j = 0..64 of `acc + (sign ? x_j : -x_j)` — IEEE
  * addition order identical to the unrolled form and to the oracle's
  * `list_reduce([0.0] || ...)`, so buckets are bitwise equal
  * (MipsBucketsSpec pins native ≡ unrolled on real vectors).
  *
  * The sign tensor is the md5("{t}t{p}_{j}") recipe shared with the
  * oracle SQL, compiled once into a flat boolean[] and attached to the
  * generated class as a reference object — a literal, not plan nodes.
  */
case class MipsBuckets(child: Expression) extends UnaryExpression {
  import MipsBuckets._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mips_buckets expects ARRAY<DOUBLE>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != Dim)
      throw new IllegalArgumentException(
        s"mips_buckets expects a $Dim-element norm-augmented vector, got ${x.numElements()}")
    var k = 0
    while (k < Dim) {
      if (x.isNullAt(k))
        throw new IllegalArgumentException(
          s"mips_buckets: null element at index $k (input must be null-free)")
      k += 1
    }
    val out = new Array[Int](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0
      var p = 0
      while (p < Bits) {
        var proj = 0.0
        val base = (t * Bits + p) * Dim
        var j = 0
        while (j < Dim) {
          val v = x.getDouble(j)
          proj += (if (signs(base + j)) v else -v)
          j += 1
        }
        if (proj > 0.0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sg = ctx.addReferenceObj("mipsSigns", signs, "boolean[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      val v = ctx.freshName("v")
      val k = ctx.freshName("k")
      s"""
         |if ($a.numElements() != $Dim) {
         |  throw new IllegalArgumentException(
         |    "mips_buckets expects a $Dim-element norm-augmented vector, got " + $a.numElements());
         |}
         |for (int $k = 0; $k < $Dim; $k++) {
         |  if ($a.isNullAt($k)) {
         |    throw new IllegalArgumentException(
         |      "mips_buckets: null element at index " + $k + " (input must be null-free)");
         |  }
         |}
         |int[] $out = new int[$Tables];
         |for (int $t = 0; $t < $Tables; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $Bits; $p++) {
         |    double $proj = 0.0;
         |    int $base = ($t * $Bits + $p) * $Dim;
         |    for (int $j = 0; $j < $Dim; $j++) {
         |      double $v = $a.getDouble($j);
         |      $proj += $sg[$base + $j] ? $v : -$v;
         |    }
         |    if ($proj > 0.0) $bucket |= (1 << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MipsBuckets {
  /** 16 tables × 5 planes: recall lever sized by s08's measurement of
    * the single-table tier (~0.01 recall@10) vs the 16-table union
    * (0.85 recall@3 at 41% candidate fraction on this corpus). */
  val Tables = 16
  val Bits = 5
  /** 64 embedding dims + the norm-augmentation coordinate. */
  val Dim = 65

  /** Flat [t][p][j] sign tensor, seed recipe md5("{t}t{p}_{j}") — the
    * same bytes the oracle derives with DuckDB's md5(). true = +1. */
  val signs: Array[Boolean] = {
    val out = new Array[Boolean](Tables * Bits * Dim)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    for (t <- 0 until Tables; p <- 0 until Bits; j <- 1 to Dim) {
      md.reset()
      val h = md.digest(s"${t}t${p}_$j".getBytes("UTF-8"))
      out(i) = ((h(0) >> 4) & 0xf) >= 8
      i += 1
    }
    out
  }
}
