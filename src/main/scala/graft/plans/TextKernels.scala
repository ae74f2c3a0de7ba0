package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

/** `graft_cms_atleast(key, sketch, min)`: true iff a Count-Min sketch's
  * estimate for `key` reaches `min` — the candidate prefilter of the
  * heavy-hitters operator. The sketch (a `count_min_sketch(...)`
  * aggregate result, carried as a binary literal) is deserialized once
  * per executor from the plan; each probe is `depth` hash-and-read
  * operations, inside WholeStageCodegen via the [[MapSumScore]]
  * reference-object pattern.
  *
  * CMS estimates NEVER undercount, so filtering on this predicate keeps
  * a superset of the true heavy keys: downstream exact counting gives an
  * exact final answer regardless of sketch error. Probes hash the key's
  * UTF-8 bytes — the same path `count_min_sketch` takes when adding
  * string values, so fit and probe agree byte-for-byte.
  */
case class CmsAtLeast(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val keyOk = first.dataType == StringType
    val sketchOk = second.foldable && second.dataType == BinaryType &&
      second.eval() != null
    val minOk = third.foldable && third.dataType == LongType &&
      third.eval() != null
    if (keyOk && sketchOk && minOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, non-null binary literal, non-null " +
        s"long literal), got (${first.dataType.simpleString}, " +
        s"${second.sql}, ${third.sql})")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_cms_atleast"

  @transient private lazy val sketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      second.eval().asInstanceOf[Array[Byte]])
  @transient private lazy val min: Long =
    third.eval().asInstanceOf[java.lang.Long].longValue()

  def probe(key: Any): Boolean =
    sketch.estimateCount(key.asInstanceOf[UTF8String].getBytes) >= min

  override protected def nullSafeEval(key: Any, sk: Any, m: Any): Any =
    probe(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsAtLeast].getName)
    nullSafeCodeGen(ctx, ev, (key, _, _) => s"${ev.value} = $ref.probe($key);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CmsAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}
