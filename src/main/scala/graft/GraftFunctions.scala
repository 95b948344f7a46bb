package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.RegistryBridge
import org.apache.spark.sql.types.{ArrayType, DateType, DoubleType, LongType, StringType}

import graft.etl.{DateKernels, PyText}
import graft.ops.{TextKernels, VectorKernels}

/** SQL surface for the engine's kernel functions.
  *
  * Two wirings:
  *  - `GraftFunctions.register(spark)` — imperative, for an existing
  *    session (tests, notebooks);
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` — declarative,
  *    the standard SparkSessionExtensions route for clusters.
  *
  * Each function is the SAME StaticInvoke expression the Column API
  * uses — one implementation, two surfaces, still codegen-friendly.
  */
object GraftFunctions {

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_tokenhash" -> (c => StaticInvoke(
      TextKernels.getClass, LongType, "tokenHash", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_simhash32" -> (c => StaticInvoke(
      TextKernels.getClass, LongType, "simhash32", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_fingerprint" -> (c => StaticInvoke(
      TextKernels.getClass, LongType, "fingerprint", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_parse_date" -> (c => StaticInvoke(
      DateKernels.getClass, DateType, "parseDate16", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_pytitle" -> (c => StaticInvoke(
      PyText.getClass, StringType, "title", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_normalize" -> (c => StaticInvoke(
      TextKernels.getClass, StringType, "normalizeText", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_token_entropy" -> (c => StaticInvoke(
      TextKernels.getClass, LongType, "tokenEntropyMicro", c, Seq(StringType),
      propagateNull = true, returnNullable = true)),
    "graft_zvalue" -> (c => StaticInvoke(
      graft.ops.LayoutKernels.getClass, LongType, "zValue", c,
      Seq(LongType, LongType),
      propagateNull = true, returnNullable = true)),
    "graft_dot" -> (c => StaticInvoke(
      VectorKernels.getClass, DoubleType, "dot", c,
      Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true)),
    "graft_cosine" -> (c => StaticInvoke(
      VectorKernels.getClass, DoubleType, "cosine", c,
      Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
      propagateNull = true, returnNullable = true)),
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => RegistryBridge.register(spark, name, b) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        b))
    }
}
