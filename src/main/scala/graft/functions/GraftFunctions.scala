package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native Catalyst expressions, so
  * `spark.sql("SELECT be_int4(i), array_dot(a, b) ...")` works like any
  * built-in.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injection for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the deployment path);
  *  - [[GraftFunctions.register]] — runtime registration on an existing
  *    session (the embedded-library path used by the query inventory).
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "be_int4" -> (es => IntToBigEndianBinary(es.head)),
    "norm_text" -> (es => NormalizeText(es.head)),
    "array_dot" -> (es => ArrayDotProduct(es.head, es(1))),
    // second argument must be an integer literal (the width is a codegen
    // constant, like a cast's target type)
    "md5_prefix64" -> (es => Md5PrefixLong(es.head, es(1).eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"md5_prefix64 width must be an integer literal, got: $other")
    })))

  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point: native functions + the
  * region-aligned-sort planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.RegionSortStrategy)
    // strictly opt-in AQP: COUNT(DISTINCT x) → approx_count_distinct(x)
    // when the session sets graft.approx.distinct=true (off by default —
    // the rule changes results, so the user must ask for it)
    e.injectOptimizerRule(session => graft.plans.ApproxDistinctRewrite(
      () => session.conf.get("graft.approx.distinct", "false").toBoolean))
  }
}
