package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType
import graft.functions.WinnowFingerprint

/** The engine's SQL surface extension, installed via
  * `spark.sql.extensions=graft.GraftExtensions` (see [[Sessions]]) — the
  * production registration path, so any session config pointing at this
  * class gets the functions with no code changes.
  *
  *  - `midquote(bid, ask)` — the reference's core scalar
  *    ((best_bid+best_ask)/2, correlation_matrix_exporter.py:100) as SQL
  *    sugar. Deliberately NOT a custom Expression: it rewrites to built-in
  *    `(bid+ask)/2` at registration, so it codegens exactly like the
  *    hand-written arithmetic — zero-cost syntax.
  *  - `winnow_fingerprint(words, k, base, mod)` — the genuinely custom
  *    [[WinnowFingerprint]] expression (single-pass rolling-hash
  *    winnowing; built-ins would need a k-fold explode).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // enable parquet row-group pruning for filters on the derived
    // nanos timestamp (see the rule's scaladoc for the equivalence proof)
    ext.injectOptimizerRule(_ => graft.plans.PushdownDerivedTimestamp)
    ext.injectFunction((
      new FunctionIdentifier("midquote"),
      new ExpressionInfo(classOf[Divide].getName, "midquote"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "midquote(bid, ask) takes 2 arguments")
        Divide(Add(Cast(args(0), DoubleType), Cast(args(1), DoubleType)),
          Literal(2.0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        "winnow_fingerprint"),
      (args: Seq[Expression]) => {
        def lit(e: Expression, name: String): Long = e match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case _ => throw new IllegalArgumentException(
            s"winnow_fingerprint: $name must be an integer literal")
        }
        args.length match {
          case 1 => WinnowFingerprint(args.head, 5, 131L, 1000000007L)
          case 4 => WinnowFingerprint(args.head,
            lit(args(1), "k").toInt, lit(args(2), "base"),
            lit(args(3), "mod"))
          case _ => throw new IllegalArgumentException(
            "winnow_fingerprint(words[, k, base, mod])")
        }
      }))
  }
}
