package graft.dialect

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-time registration of the ClickHouse function surface:
  *
  * {{{
  *   spark.sql.extensions=graft.dialect.GraftExtensions
  * }}}
  *
  * injects every [[ChFunctions.builders]] entry through
  * `SparkSessionExtensions.injectFunction`, so ALL sessions derived
  * from the context — including `newSession()` forks with fresh
  * session state — resolve `cityHash64`, `uniq`, `multiIf`, … as
  * native Catalyst expressions without any runtime call. The runtime
  * twin ([[ChFunctions.register]]) exists for sessions built without
  * this config (e.g. a harness-owned session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ChFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.dialect.ChFunctions", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    ext.injectOptimizerRule(graft.plans.FooterAggregates.apply)
    ext.injectOptimizerRule(graft.plans.AggProjectionRewrite.apply)
    ext.injectOptimizerRule(graft.plans.DictAggRewrite.apply)
    ext.injectOptimizerRule(graft.plans.BitmapDistinctRewrite.apply)
    ext.injectOptimizerRule(graft.plans.HashScanRewrite.apply)
    ext.injectPlannerStrategy(_ => graft.plans.DriverMergeStrategy)
  }
}
