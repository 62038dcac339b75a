// Lives inside an org.apache.spark.sql subpackage so the expression can
// use the private[sql] extension surface (AbstractDataType for
// ExpectsInputTypes, classic.ExpressionUtils for the Column bridge) — the
// standard third-party custom-Expression pattern.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity expression over two `array<float>`
  * columns — the (b) tier of the custom-operator preference order: unlike
  * the `graft.sim.VectorOps.cosineCol` UDF it participates in WHOLE-STAGE CODEGEN,
  * reading floats straight out of Tungsten `ArrayData` with no
  * deserialization to `Array[Float]` and no Scala closure dispatch per
  * row. Semantics are exactly `graft.sim.VectorOps.cosine` (parity-asserted in
  * VectorOpsParitySpec): dot over the common prefix, norms over each FULL
  * array, zero denominator → null.
  *
  * The interpreted `nullSafeEval` path and the generated code share the
  * accumulation order (index-ascending, double accumulation), so results
  * are bit-identical whichever path the planner takes.
  *
  * A NULL ELEMENT anywhere in either array yields a null result — the one
  * deliberate divergence from the UDF, which fails the whole task when
  * deserializing such a row to `Array[Float]`. A corrupt embedding should
  * drop its own row, not the job.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0
    var sx = 0.0
    var sy = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      sx += xi * xi
      sy += yi * yi
      i += 1
    }
    // norms run over each FULL array (VectorOps.l2norm contract)
    while (i < nx) {
      if (x.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble; sx += xi * xi; i += 1
    }
    i = n
    while (i < ny) {
      if (y.isNullAt(i)) return null
      val yi = y.getFloat(i).toDouble; sy += yi * yi; i += 1
    }
    val den = math.sqrt(sx) * math.sqrt(sy)
    if (den == 0.0) null else java.lang.Double.valueOf(dot / den)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val v = ctx.freshName("v")
      val den = ctx.freshName("den")
      val bad = ctx.freshName("badElem")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |final int $n = Math.min($nx, $ny);
         |double $dot = 0.0, $sx = 0.0, $sy = 0.0;
         |boolean $bad = false;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  final double xv = (double) $a.getFloat($i);
         |  final double yv = (double) $b.getFloat($i);
         |  $dot += xv * yv; $sx += xv * xv; $sy += yv * yv;
         |}
         |if (!$bad) {
         |  for (; $i < $nx; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |    final double $v = (double) $a.getFloat($i); $sx += $v * $v;
         |  }
         |}
         |if (!$bad) {
         |  for ($i = $n; $i < $ny; $i++) {
         |    if ($b.isNullAt($i)) { $bad = true; break; }
         |    final double $v = (double) $b.getFloat($i); $sy += $v * $v;
         |  }
         |}
         |final double $den = Math.sqrt($sx) * Math.sqrt($sy);
         |if ($bad || $den == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column API: `cosineSim(a, b)`. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
