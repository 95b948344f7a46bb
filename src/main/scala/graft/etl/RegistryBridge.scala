package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** `SparkSession.sessionState` is private[sql]; this shim (same
  * namespace trick as [[ExprBridge]]) exposes just the temp-function
  * registration the engine's SQL surface needs.
  */
object RegistryBridge {
  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
