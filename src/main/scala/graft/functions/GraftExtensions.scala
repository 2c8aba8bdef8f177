package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the custom scalar kernels
  * available to any session built with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), without code having to call
  * GraftFunctions.register first. This is the deployment-grade wiring
  * the builder preference ladder asks for — registration travels with
  * the session config, so plain `spark.sql` users (REPL, HTTP API,
  * thrift-style clients) see the functions too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def inject(ext: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "rolling_hash64", es => RollingHash64(es.head))
    inject(ext, "simhash64", es => SimHash64(es.head))
    inject(ext, "poly_hash_mod", es => PolyHashMod(es.head))
    inject(ext, "shingle_hashes64", es => ShingleHashes64(es.head))
    inject(ext, "shingle_strings", es => ShingleStrings(es.head))
    inject(ext, "sign_lsh32", es => SignLsh32(es.head))
    inject(ext, "float_dot", es => FloatDot(es(0), es(1)))
    inject(ext, "sorted_intersect_card",
      es => SortedIntersectCard(es(0), es(1)))
  }
}
