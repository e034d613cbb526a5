package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * embed_text(text, 64) ...")` works next to the Scala Column API.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "embed_text" -> ((args: Seq[Expression]) => EmbedText(args.head, intArg(args(1)))),
    "simhash64" -> ((args: Seq[Expression]) => SimHash64(args.head)),
    "rolling_hash" -> ((args: Seq[Expression]) => RollingHash(args.head)),
    "hamming64" -> ((args: Seq[Expression]) => HammingDist64(args.head, args(1))),
    "minhash_sig" -> ((args: Seq[Expression]) => MinHashSig(args.head, intArg(args(1)))),
    "vec_dot" -> ((args: Seq[Expression]) => DotProduct(args.head, args(1))),
    "vec_sqdist" -> ((args: Seq[Expression]) => SqDist(args.head, args(1))),
    "kmv_distinct" -> ((args: Seq[Expression]) =>
      KmvDistinct(args.head, if (args.length > 1) intArg(args(1)) else 256)
        .toAggregateExpression()),
    // the cross-engine md5 hash tier (q55's oracled variant): sketch and
    // estimate reproducible in any engine with md5
    "kmv_distinct_md5" -> ((args: Seq[Expression]) =>
      KmvDistinct(args.head, if (args.length > 1) intArg(args(1)) else 256,
        md5Mode = true).toAggregateExpression()))

  /** Register on an already-built session (temp functions in the session's
    * FunctionRegistry) — for sessions created without the extensions conf. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
