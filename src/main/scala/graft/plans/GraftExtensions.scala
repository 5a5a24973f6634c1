package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering graft's native expressions with the
  * function registry (usable from SQL and via `call_function`). Activated by
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set in GraftSession).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], arity: Int,
                 builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name expects $arity arguments")
        builder(children)
      })

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BandJoinRewrite)
    e.injectFunction(fn("cosine_similarity", classOf[CosineSimilarity], 2,
      c => CosineSimilarity(c(0), c(1))))
    e.injectFunction(fn("dot_product", classOf[DotProduct], 2,
      c => DotProduct(c(0), c(1))))
    e.injectFunction(fn("simhash64", classOf[SimHash64], 1,
      c => SimHash64(c(0))))
    e.injectFunction(fn("minhash_bands", classOf[MinHashBands], 3, c => {
      def intLit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException(
          s"minhash_bands: $name must be an integer literal")
      }
      MinHashBands(c(0), intLit(c(1), "numHashes"), intLit(c(2), "bandSize"))
    }))
    e.injectFunction(fn("word_shingles", classOf[WordShingles], 2, c => {
      val n = c(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException(
          "word_shingles: n must be an integer literal")
      }
      WordShingles(c(0), n)
    }))
  }
}
