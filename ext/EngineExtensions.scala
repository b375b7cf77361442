package dbds.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Engine extension plugin: the Spark analog of the reference's
 *  IcebergExtensionCodec (ballista/core/src/serde/mod.rs:90) — a
 *  user-supplied module injected into the session that adds planner
 *  rules and functions without forking the engine.
 */
class EngineExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // injected native function: engine_version() -> marker string
    ext.injectFunction(
      (new FunctionIdentifier("engine_version"),
       new ExpressionInfo("dbds.ext.EngineExtensions", "engine_version"),
       (_: Seq[Expression]) =>
         Literal(UTF8String.fromString("dbds-spark-ext/1.0"), StringType))
    )
    // injected optimizer rule: drop Filter(true) no-ops
    ext.injectOptimizerRule(_ => DropTrueFilter)
  }
}

object DropTrueFilter extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Filter(Literal(true, _), child) => child
  }
}
