package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's native expressions, so
  * `spark.sql(...)` users get the same codegen'd kernels as the column
  * API: `dot_product(a, b)`, `simhash64(tokens)`,
  * `minhash_k(tokens, k)` (k a literal), `bspline_basis` is
  * deliberately absent (it carries fitted knots, not a SQL-able shape).
  *
  * Two surfaces: `GraftFunctions.register(spark)` on a live session, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build (the standard SparkSessionExtensions route).
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("dot_product"), info(classOf[DotProduct], "dot_product"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"dot_product expects 2 arguments, got ${args.size}")
        DotProduct(args.head, args(1))
      }),
    (FunctionIdentifier("simhash64"), info(classOf[SimHash64], "simhash64"),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"simhash64 expects 1 argument, got ${args.size}")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("minhash_k"), info(classOf[MinHashK], "minhash_k"),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"minhash_k expects 2 arguments, got ${args.size}")
        // accept any foldable int expression (e.g. `2 + 2`), not just an
        // already-folded Literal — fold it here
        args(1) match {
          case e if e.foldable && e.dataType == IntegerType =>
            e.eval() match {
              case k: Int => MinHashK(args.head, k)
              case _ => throw new IllegalArgumentException(
                "minhash_k expects a non-null constant int k")
            }
          case other => throw new IllegalArgumentException(
            s"minhash_k expects a constant int k, got $other")
        }
      }))

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, i, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, i, builder)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
