package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** The centered outer product of a vector with itself as ONE codegen'd
  * expression: `graft_centered_outer(vec, means)` returns the n² products
  * (vec[i]−means[i])·(vec[j]−means[j]) flattened row-major (i outer, j
  * inner) — the per-row covariance contribution [[graft.llm.Pca.fit]]
  * folds into the d×d matrix.
  *
  * This replaces the declarative formulation (a NESTED
  * `transform(c, xi => transform(c, xj => struct(i, j, xi*xj)))` +
  * flatten + explode): higher-order functions evaluate INTERPRETED in
  * Spark (the [[ResizeNearestNN]] lesson), so that shape paid n² lambda
  * dispatches and n² struct allocations per row — measured 2.9 s of
  * embed_pca's 3.0 s at sf0.1 for n = 64. Here the whole product grid is
  * two tight loops over a primitive double buffer inside whole-stage
  * codegen. Values are bit-identical: the same cast-to-double, the same
  * subtraction, the same multiplication per (i, j); row-major emission
  * order matches the old transform×transform order, so downstream
  * aggregation sees the same value sequence.
  *
  * Scale shape: pure per-row map, zero shuffle; the explode +
  * (pos → (i,j))-keyed aggregation around it is unchanged. */
final case class CenteredOuterProducts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centered_outer"

  private def elemIsFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double> vec, array<double> means), " +
        s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(vec: Any, means: Any): Any =
    CenteredOuterProducts.compute(vec.asInstanceOf[ArrayData],
      means.asInstanceOf[ArrayData], elemIsFloat(left.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"""${ev.value} = graft.functions.CenteredOuterProducts$$.MODULE$$
         |  .compute($v, $m, ${elemIsFloat(left.dataType)});""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CenteredOuterProducts {

  def compute(vec: ArrayData, means: ArrayData,
              vecFloat: Boolean): ArrayData = {
    val n = means.numElements()
    require(vec.numElements() == n,
      s"graft_centered_outer: vector length ${vec.numElements()} != " +
        s"means length $n")
    val c = new Array[Double](n)
    var i = 0
    while (i < n) {
      require(!vec.isNullAt(i) && !means.isNullAt(i),
        s"graft_centered_outer: null element at dim $i")
      val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      c(i) = x - means.getDouble(i)
      i += 1
    }
    val out = new Array[Double](n * n)
    var k = 0
    i = 0
    while (i < n) {
      val ci = c(i)
      var j = 0
      while (j < n) {
        out(k) = ci * c(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
