package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the native hash
  * expressions as SQL functions so `spark.sql("SELECT poly_hash(text)")`
  * works. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * The DataFrame API does not need this — graft wraps the expressions
  * directly (see graft.plans.functions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash(str)")
        PolyHash(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes(str, k)")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        ShingleHashes(args.head, k)
      }))
  }
}

/** DataFrame-API wrappers for the native expressions. */
object functions {
  import org.apache.spark.sql.{Column, GraftBridge}

  def poly_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))

  def shingle_hashes(c: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c), k))

  def bigram_token_hashes(c: Column): Column =
    GraftBridge.column(BigramTokenHashes(GraftBridge.expression(c)))

  def simhash16(c: Column): Column =
    GraftBridge.column(SimHash16(GraftBridge.expression(c)))

  def simhash64_bands(c: Column): Column =
    GraftBridge.column(SimHash64Bands(GraftBridge.expression(c)))

  def sign_bucket_rh(c: Column, bits: Int, seed: Int): Column =
    GraftBridge.column(SignBucketRH(GraftBridge.expression(c), bits, seed))

  def dot_fold(a: Column, b: Column): Column =
    GraftBridge.column(DotFold(GraftBridge.expression(a), GraftBridge.expression(b)))

  def sqnorm_fold(a: Column): Column =
    GraftBridge.column(SqNormFold(GraftBridge.expression(a)))
}
