package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity inner loops.
  *
  * The builtin formulation (`zip_with` to multiply elementwise, then
  * `aggregate` to fold) is semantically right but allocates an
  * intermediate array and walks it through lambda plumbing per pair — and
  * similarity search evaluates it |queries| × |corpus| times. These
  * kernels fuse the walk into one allocation-free loop with the SAME fold
  * order (left-to-right `acc + x·y` from 0.0), so results are
  * bit-identical to the HOF chain — including null propagation: a null
  * element or a length mismatch yields null, exactly like `zip_with`'s
  * null padding through `aggregate`. The HOF forms remain the reference
  * semantics; `VectorKernelsSpec` pins kernel ≡ HOF.
  *
  * Element types may be float or double on either side independently
  * (corpus embeddings are float, centroid literals are double); floats
  * widen exactly.
  */
object VectorKernels {

  private def elemKind(t: DataType): Option[Boolean] = t match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  private[functions] def checkVec(name: String, t: DataType): TypeCheckResult =
    elemKind(t) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> or array<double>, got ${t.catalogString}")
    }

  /** Σ a_i·b_i as a left fold from 0.0; null on length mismatch or any
    * null element (the zip_with/aggregate contract). */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ (v_i−c_i)² against a constant centroid, same fold contract. */
  def l2Const(v: ArrayData, vFloat: Boolean, cent: Array[Double]): Any = {
    val n = v.numElements()
    if (cent.length != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val d = x - cent(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dotCol(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2ConstCol(v: Column, cent: Array[Double]): Column =
    ColumnBridge.column(VecL2Const(ColumnBridge.expression(v), cent))
}

/** Fused dot product of two float/double arrays. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VectorKernels.checkVec(prettyName, left.dataType)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VectorKernels.checkVec(prettyName, right.dataType)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_dot"

  @transient private lazy val lFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |Object $tmp = graft.functions.VectorKernels.dot($a, $lFloat, $b, $rFloat);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : ((java.lang.Double) $tmp).doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fused squared-L2 distance of a float/double array to a constant
  * centroid (the codebook/centroid literal of the quantizer plans). */
case class VecL2Const(child: Expression, cent: Array[Double]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorKernels.checkVec(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_l2const"

  @transient private lazy val cFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorKernels.l2Const(v.asInstanceOf[ArrayData], cFloat, cent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("cent", cent, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("l2")
      s"""
         |Object $tmp = graft.functions.VectorKernels.l2Const($v, $cFloat, $centRef);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : ((java.lang.Double) $tmp).doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecL2Const =
    copy(child = newChild)
}
