package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Column→Expression bridge for the native functions: registers the
  * builder in the active session's function registry ONLY on first use
  * per session (re-registering on every call is harmless but emits a
  * `SimpleFunctionRegistry` replace-warning per call, which polluted
  * every bench/verify artifact tail), then invokes it by name.
  *
  * First-use tracking is OUR OWN per-session set, not
  * `functionRegistry.functionExists`: an existence probe would let a
  * same-named pre-existing registration (a user temp function, or a
  * future Spark builtin — `functionExists` sees builtins too) silently
  * shadow the native expression. The first call in each session always
  * `createOrReplaceTempFunction`s (the original replace semantics);
  * only OUR subsequent re-registrations are skipped. Sessions are weak
  * keys, so a stopped session's entry is collectable.
  */
private[functions] object Natives {

  private val registeredBySession =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()

  def callRegistered(name: String, builder: Seq[Expression] => Expression,
                     args: Column*): Column = {
    val session = SparkSession.active
    val firstUse = registeredBySession.synchronized {
      var names = registeredBySession.get(session)
      if (names == null) {
        names = new java.util.HashSet[String]()
        registeredBySession.put(session, names)
      }
      names.add(name)
    }
    if (firstUse)
      session.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    call_function(name, args: _*)
  }
}
