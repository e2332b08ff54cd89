package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CollapseSanitize, RollingHash, SanitizeName, SetJaccard, SetOverlap, TokenHash, VecDot, VecNorm2}

/** `SparkSessionExtensions` entry point: registers the engine's native
  * expressions at session build time, so deployments can opt in with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (Queries running on driver-provided sessions use
  * [[graft.functions.GraftFunctions.register]] instead, which installs the
  * same functions as session temp functions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => RollingHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("sanitize_name"),
      new ExpressionInfo(classOf[SanitizeName].getName, "sanitize_name"),
      exprs => SanitizeName(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("token_hash"),
      new ExpressionInfo(classOf[TokenHash].getName, "token_hash"),
      exprs => TokenHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("vec_norm2"),
      new ExpressionInfo(classOf[VecNorm2].getName, "vec_norm2"),
      exprs => VecNorm2(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("set_jaccard"),
      new ExpressionInfo(
        classOf[SetJaccard].getName, null, "set_jaccard",
        "_FUNC_(a, b) - Jaccard coefficient |a∩b|/|a∪b| of two ARRAY<STRING> " +
          "sets. PRECONDITION: both arrays must be sorted ascending (array_sort " +
          "order) and element-distinct — e.g. array_sort(array_distinct(x)); " +
          "unsorted or duplicated input yields an undefined result. " +
          "Two empty arrays yield 1.0.",
        "", "", "", "", "", "", "scala_udf"),
      exprs => SetJaccard(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("set_overlap"),
      new ExpressionInfo(
        classOf[SetOverlap].getName, null, "set_overlap",
        "_FUNC_(a, b) - Shared-element count |a∩b| of two ARRAY<STRING> sets. " +
          "PRECONDITION: both arrays must be sorted ascending (array_sort " +
          "order) and element-distinct; unsorted or duplicated input yields " +
          "an undefined result.",
        "", "", "", "", "", "", "scala_udf"),
      exprs => SetOverlap(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => CollapseSanitize)
  }
}
