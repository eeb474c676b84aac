package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Register-once guard for the engine's native codegen kernels.
  *
  * Every kernel factory in this repo is STATELESS — per-query state (an LM
  * profile, an IVF centroid matrix, bloom bits) rides as a literal model-id
  * argument resolved at analysis time, never inside the registered builder.
  * Re-registering therefore installs a bit-identical builder, and the only
  * observable effect of `createOrReplaceTempFunction` on the second call is
  * the `SimpleFunctionRegistry ... replaced a previously registered
  * function` WARN — which, at one registration per query over a
  * 284-query bench, floods the log and interleaves with the single JSON
  * line the driver parses (r10 verdict item 7). This guard registers a
  * name at most once per session.
  *
  * The curried shape mirrors `createOrReplaceTempFunction`'s argument list
  * so call sites swap the receiver and keep their (name, builder, source)
  * tuple verbatim.
  */
object Registry {
  def once(spark: SparkSession)(name: String,
      builder: Seq[Expression] => Expression, source: String): Unit = {
    val reg = spark.sessionState.functionRegistry
    // bare check-then-act would race two threads registering the same name
    // (both pass the exists check, the second replace fires the WARN this
    // guard suppresses); serializing on the registry makes the registration
    // happen exactly once. Behaviour was already correct — builders are
    // stateless — this pins the clean-log contract too.
    reg.synchronized {
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, source)
    }
  }
}
