package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(tokens, n)`: the array of space-joined n-grams of a
  * token array — codegen replacement for the HOF form
  * `transform(sequence(1, size-n+1), i -> concat_ws(' ', toks[i..i+n-1]))`.
  *
  * The HOF form is quadratic in practice: higher-order lambdas evaluate
  * INTERPRETED (CodegenFallback), each position re-walks `element_at`
  * n times, and when the token expression is inlined (not an attribute)
  * every access re-tokenizes the document. Measured on the sf0.1 corpus
  * the swap in seed/shingle producers is ~20×. This kernel builds the
  * gram array in one pass over the materialized token array, stays inside
  * WholeStageCodegen via the same `addReferenceObj` pattern as
  * [[MapSumScore]], and is string-identical to the HOF output (nulls in
  * the token array are skipped by `UTF8String.concatWs`, exactly as
  * `concat_ws` does): a null array yields null, fewer than n tokens
  * yield an empty array.
  */
case class ShingleArray(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val toksOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val nOk = right.foldable && right.dataType == IntegerType &&
      (right.eval() match {
        case i: java.lang.Integer => i >= 1
        case _ => false
      })
    if (toksOk && nOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, positive int literal), got " +
        s"(${left.dataType.simpleString}, ${right.sql})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  @transient private lazy val n: Int =
    right.eval().asInstanceOf[java.lang.Integer].intValue()

  private val space = UTF8String.fromString(" ")

  def build(toksRaw: Any): ArrayData = {
    val toks = toksRaw.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val out = sz - n + 1
    if (out <= 0) return new GenericArrayData(new Array[Any](0))
    val res = new Array[Any](out)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var k = 0
      while (k < n) {
        parts(k) = if (toks.isNullAt(i + k)) null else toks.getUTF8String(i + k)
        k += 1
      }
      res(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(toks: Any, nArg: Any): Any = build(toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[ShingleArray].getName)
    nullSafeCodeGen(ctx, ev, (toks, _) => s"${ev.value} = $ref.build($toks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleArray =
    copy(left = newLeft, right = newRight)
}
