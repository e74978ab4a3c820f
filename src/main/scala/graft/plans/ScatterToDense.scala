package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Sparse→dense scatter as a native Catalyst expression — the operation
  * pure HOFs genuinely cannot express in linear time (SURVEY.md §4.2
  * tier (b)). The HOF spec (`VectorOps.sparseToDenseHof`) probes
  * `array_position(indices, i)` for every dense slot: O(sz × nnz)
  * comparisons per row, the dominant cost of q_dense_vec. This emits
  * one fused loop: allocate the zero vector, scatter nnz values, done —
  * O(sz + nnz), no per-element search.
  *
  * Semantics pinned to the HOF spec (equivalence is property-tested):
  *  - FIRST occurrence of a duplicate index wins (`array_position`
  *    returns the first match); implemented by scattering in reverse
  *    pair order so earlier pairs overwrite later ones.
  *  - indices outside [0, size) are ignored (they never match a slot).
  *  - a null element in `values` scatters as a null element; a null
  *    element in `indices` is skipped.
  *  - pairs fold over the common prefix of the two arrays.
  *  - any NULL input (indices, values, size) → NULL result (the one
  *    documented divergence: the HOF form emits zeros for a null
  *    `indices` array — an accident of `when` null semantics, not a
  *    behavior anyone should rely on).
  */
case class ScatterToDense(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def isIntArray(t: DataType): Boolean = t match {
    case ArrayType(IntegerType | LongType, _) => true
    case _ => false
  }
  private def isNumArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntArray(first.dataType) && isNumArray(second.dataType) &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_scatter requires (array<int|bigint>, array<float|double>, int), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        third.dataType.simpleString)

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = second.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  private def idxIsLong: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == LongType
  private def valIsFloat: Boolean =
    second.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(idxAny: Any, valAny: Any, szAny: Any): Any = {
    val idx = idxAny.asInstanceOf[ArrayData]
    val vals = valAny.asInstanceOf[ArrayData]
    val sz = szAny.asInstanceOf[Int].max(0)
    val out = new Array[Any](sz)
    java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], java.lang.Double.valueOf(0.0))
    val n = math.min(idx.numElements(), vals.numElements())
    var j = n - 1
    while (j >= 0) {
      if (!idx.isNullAt(j)) {
        val p = if (idxIsLong) idx.getLong(j) else idx.getInt(j).toLong
        if (p >= 0 && p < sz) {
          out(p.toInt) =
            if (vals.isNullAt(j)) null
            else if (valIsFloat) java.lang.Double.valueOf(vals.getFloat(j).toDouble)
            else java.lang.Double.valueOf(vals.getDouble(j))
        }
      }
      j -= 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (idx, vals, sz) => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val szv = ctx.freshName("szv")
      val getP = if (idxIsLong) s"$idx.getLong($j)" else s"(long) $idx.getInt($j)"
      val getV = if (valIsFloat) s"(double) $vals.getFloat($j)" else s"$vals.getDouble($j)"
      s"""
         |final int $szv = java.lang.Math.max($sz, 0);
         |final Object[] $out = new Object[$szv];
         |java.util.Arrays.fill($out, Double.valueOf(0.0D));
         |final int $n = java.lang.Math.min($idx.numElements(), $vals.numElements());
         |for (int $j = $n - 1; $j >= 0; $j--) {
         |  if (!$idx.isNullAt($j)) {
         |    final long $p = $getP;
         |    if ($p >= 0L && $p < (long) $szv) {
         |      $out[(int) $p] = $vals.isNullAt($j) ? null : (Object) Double.valueOf($getV);
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ScatterToDense =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ScatterToDense {
  /** Column-API entry point. */
  def apply(indices: Column, values: Column, size: Column): Column =
    ColumnBridge.column(ScatterToDense(
      ColumnBridge.expression(indices),
      ColumnBridge.expression(values),
      ColumnBridge.expression(size)))
}
