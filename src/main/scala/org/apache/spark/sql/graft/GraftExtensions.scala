package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook — the (c)-tier custom-operator surface:
  * registers the engine's native expressions as SQL functions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` plans the codegen'd
  * [[CosineSim]] with no Scala import.
  *
  * Two entry points for two deployment shapes:
  *   - cluster config: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     (applied at session build — the standard extension-jar path);
  *   - [[GraftExtensions.register]]: imperative registration on an
  *     already-built session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // the custom-plan tier: AsofJoinPlan plans to AsofJoinExec, and the
    // companion optimizer rule sinks left-only filters through the join
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsofJoin)
  }
}

object GraftExtensions {

  /** (identifier, info, builder) triples shared by both entry points so
    * the SQL surface cannot diverge between deployment shapes. */
  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSim(args.head, args(1))
      }))

  /** Register the function surface on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    AsofJoinNative.ensureStrategy(spark)
  }
}
