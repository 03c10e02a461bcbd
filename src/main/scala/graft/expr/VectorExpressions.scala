package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity/ANN path.
  *
  * `zip_with(a, b, _*_)` + `aggregate(...)` composes correctly but runs
  * as *interpreted* higher-order functions (Catalyst does not codegen
  * lambda expressions), allocating a lambda frame per element. At
  * 100 TB × 10⁹ vectors the dot product is the innermost loop of the
  * engine, so it gets a real Catalyst expression with `doGenCode`: a
  * primitive double loop over the two `ArrayData`, no allocation, fully
  * inside whole-stage codegen.
  *
  * Summation order is left-to-right — bit-identical to the
  * `aggregate`-fold it replaces, so oracle-checked results don't move.
  * Degenerate inputs also match the fold (and fail loudly rather than
  * silently): mismatched lengths and null ELEMENTS yield NULL — the
  * zip_with+aggregate composition null-pads/null-propagates to NULL,
  * and DuckDB's list_dot_product errors on a length mismatch — where a
  * truncated partial sum would let a corrupt 63-dim embedding produce
  * a plausible wrong similarity that propagates invisibly into top-k
  * rankings.
  */
@ExpressionDescription(
  usage = "dot_product(a, b) - dot product of two array<double> columns")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // nullable beyond the children: a length mismatch or a null ELEMENT
  // produces null even from two non-null arrays
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("dot_product expects two array<double> args")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // the isNullAt test is a bitset probe on UnsafeArrayData —
      // branch-predicted free on the (universal) no-null case
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Column API over [[DotProduct]]; arguments must be array<double>
    * (use [[toDoubleArray]] on float embeddings first).
    */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  def l2Norm(v: Column): Column = sqrt(dotProduct(v, v))

  def cosineSimilarity(a: Column, b: Column,
      normA: Column, normB: Column): Column =
    dotProduct(a, b) / (normA * normB)

  /** THE 6-decimal rounded cosine every oracle-compared similarity
    * uses — one definition, so the rounding convention (what the
    * cross-engine hashes compare) cannot drift between the query and
    * operator families. `+ 0.0`: a near-orthogonal pair lands AT zero
    * and the engines disagree on the rounded zero's SIGN even from a
    * bit-identical input (Spark rounds through BigDecimal, which has
    * no signed zero → +0.0; DuckDB keeps IEEE's -0.0) — the
    * computed-zero rule, mirrored textually in every cosine oracle.
    */
  def cosineSimilarityRounded(a: Column, b: Column,
      normA: Column, normB: Column): Column =
    round(cosineSimilarity(a, b, normA, normB), 6) + lit(0.0)

  /** Symmetric int8 scalar-quantization scale: max|x| / 127. Exact
    * IEEE ops only (abs, max, one division) — engine-portable.
    */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** Quantize to int8 codes with round-half-up via `floor(x/s + 0.5)`
    * — floor is exact on every engine, unlike round() whose half-away
    * vs half-even mode differs. Codes stay in [-127, 127] by
    * construction of [[int8Scale]] (|x|/s ≤ 127, and
    * floor(-127 + 0.5) = -127). An all-zero vector (scale 0) encodes
    * as all-zero codes — guarded internally, because 0.0/0.0 is NaN
    * and the ANSI int cast would otherwise kill the query at the
    * first degenerate row (callers that pre-filter scale > 0 are
    * unaffected: the branch constant-folds nowhere but costs one
    * predicate per element).
    */
  def int8Quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale > 0, floor(x / scale + lit(0.5)).cast("int"))
        .otherwise(lit(0)))
}
