package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into Spark's session `FunctionRegistry` (private[sql]) so the
  * dialect layer can register ClickHouse-named functions
  * (`cityHash64`, `uniq`, `multiIf`, …) as native Catalyst expression
  * builders on an ALREADY-RUNNING session — the driver harness builds
  * its own `SparkSession`, so a `SparkSessionExtensions` config hook is
  * not always available. Registration via the registry (not UDFs) keeps
  * these functions inside whole-stage codegen.
  */
object FunctionShim {

  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.dialect.ChFunctions", name),
      (exprs: Seq[Expression]) => builder(exprs))
  }
}
