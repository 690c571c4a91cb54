package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`): registers the native
  * functions the composable API can't express efficiently.
  *
  * Registered functions:
  *  - `cosine_sim(array<double>, array<double>) -> double`
  *    ([[CosineSimilarity]], codegen'd fused loop);
  *  - `hash60(string) -> long` ([[Hash60]], fused md5-prefix hash);
  *  - `hyperplane_bucket(array<double>, planes, maxDim) -> long`
  *    ([[HyperplaneBucket]], fused LSH sign-bit loop — one Catalyst
  *    node instead of a planes x maxDim unrolled term tree);
  *  - `nfc_normalize(string) -> string` ([[NfcNormalize]], codegen'd
  *    Unicode canonical composition with an allocation-free
  *    already-normalized fast path);
  *  - `contains_any(string, array<string> literal) -> boolean`
  *    ([[ContainsAny]], Aho-Corasick multi-substring matcher — O(len)
  *    per row vs the regex alternation's O(len x patterns); the
  *    robot-UA filter's scale path).
  *
  * Registered planner strategy:
  *  - [[AsOfJoinStrategy]], planning the whole-operator
  *    [[AsOfJoinPlan]] logical node to the sort-merge
  *    [[AsOfJoinExec]].
  *
  * Registered optimizer rule:
  *  - [[PushFilterThroughAsOf]], restoring filter pushdown across the
  *    custom node (left-side predicates into the left child, key
  *    predicates mirrored onto the right child pre-shuffle).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(spark => new AsOfJoinStrategy(spark))
    ext.injectOptimizerRule(spark => PushFilterThroughAsOf)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        val Seq(a, b) = children.map(Cast(_, ArrayType(DoubleType)))
        CosineSimilarity(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "hyperplane_bucket takes (vector, planes, maxDim)")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_bucket: $what must be an int literal, got $other")
        }
        HyperplaneBucket(Cast(children.head, ArrayType(DoubleType)),
          intLit(children(1), "planes"), intLit(children(2), "maxDim"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "hash60 takes exactly 1 argument")
        Hash60(Cast(children.head, StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(Cast(children.head, StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("contains_any"),
      new ExpressionInfo(classOf[ContainsAny].getName, "contains_any"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "contains_any takes (string, array<string> literal)")
        val patterns = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
              arr: org.apache.spark.sql.catalyst.util.ArrayData,
              ArrayType(StringType, _)) =>
            arr.toObjectArray(StringType)
              .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
              .toSeq
          case other => throw new IllegalArgumentException(
            s"contains_any: patterns must be an array<string> literal, got $other")
        }
        ContainsAny(Cast(children.head, StringType), patterns)
      }))
  }
}
