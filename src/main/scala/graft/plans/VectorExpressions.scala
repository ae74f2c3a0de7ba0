package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector hot path (SURVEY.md §7.3: UDF
  * first, "promoted to Expression with codegen only on bench evidence" —
  * this is that promotion).
  *
  * Evidence: brute-force KNN at sf0.1 spent 125 s of a 151 s bench total in
  * the higher-order `zip_with`/`aggregate` folds, which Spark evaluates
  * interpreted (ArrayTransform/ArrayAggregate have no doGenCode), paying
  * per-element lambda dispatch ×3 folds ×4M pairs. `CosineSimilarity` fuses
  * dot product and both norms into ONE codegen'd loop over the raw
  * ArrayData, keeping the whole pair-scoring stage inside WholeStageCodegen.
  * Same left-to-right double accumulation and the same dot/(|a|·|b|)
  * operation sequence as DuckDB's list_cosine_similarity on DOUBLE[], so
  * oracled queries round identically (do NOT swap oracled paths to
  * normalize-then-dot: it perturbs per-element rounding by ~1e-14, enough
  * to flip a 4-decimal boundary on rare pairs).
  *
  * Arrays are treated as dense (null elements read as 0-bits), matching the
  * embeddings fixture and typical vector columns.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprChecks.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        final int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $xi = $x.getDouble($i);
          final double $yi = $y.getDouble($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        final double $denom = Math.sqrt($nx) * Math.sqrt($ny);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd dot product (same rationale as CosineSimilarity). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprChecks.requireDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        final int $n = Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

private[plans] object VectorExprChecks {
  /** Both children must already be array<double> — callers cast explicitly
    * (AbstractDataType/ImplicitCastInputTypes are private[sql], so the
    * implicit-coercion route isn't open to external expressions).
    */
  def requireDoubleArrays(name: String, left: Expression,
      right: Expression): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Session registration for the custom expressions (temp functions, usable
  * from `expr(...)` / SQL). Idempotent.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_vector_avg",
      exprs => VectorAvg(exprs.head).toAggregateExpression(), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)).toAggregateExpression(),
      "built-in")
  }
}
