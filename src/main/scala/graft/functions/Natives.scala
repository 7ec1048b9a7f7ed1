package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Column→Expression bridge for the native functions: registers the
  * builder in the active session's function registry ONLY on first use
  * (re-registering on every call is harmless but emits a
  * `SimpleFunctionRegistry` replace-warning per call, which polluted
  * every bench/verify artifact tail), then invokes it by name.
  *
  * Registration is per-session state; a second session re-registers
  * lazily on its own first call.
  */
private[functions] object Natives {

  def callRegistered(name: String, builder: Seq[Expression] => Expression,
                     args: Column*): Column = {
    val reg = SparkSession.active.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    call_function(name, args: _*)
  }
}
