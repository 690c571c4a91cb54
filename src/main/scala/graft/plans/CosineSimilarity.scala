package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine-similarity expression over two numeric arrays.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation ladder): the
  * composable form — `aggregate(zip_with(a,b,*),...)` — allocates an
  * intermediate array and evaluates its lambda per element in the
  * interpreter, outside whole-stage codegen. For ANN scoring the dot
  * product IS the hot loop (corpus x queries evaluations), so this
  * expression emits a single fused Java loop via doGenCode: no
  * allocation, no virtual calls, stays inside WholeStageCodegen.
  *
  * Semantics: double accumulation in index order (bit-identical to
  * the ordered HOF formulation); null if either side is null, lengths
  * differ, or either norm is zero (cosine undefined — matching the
  * guarded HOF path and DuckDB's null-on-0/0 double division; the raw
  * 0.0/0.0 would be NaN, which Spark sorts ABOVE every value, turning
  * a padding vector into everyone's rank-1 neighbor).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Input typing: the registration builder ([[GraftExtensions]]) wraps
  // both children in Cast(_, array<double>), so children are always
  // array<double> here (ExpectsInputTypes is private[sql] in Spark 4).
  override def dataType: DataType = DoubleType

  // Length mismatch yields null even when both children are
  // non-nullable — without this override codegen would emit an
  // assignment to a constant-folded isNull (uncompilable) and the
  // schema would wrongly promise nullable=false.
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
