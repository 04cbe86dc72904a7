package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` entry point — the supported
  * way to ship custom Catalyst pieces to every session of a deployment
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `builder.withExtensions(new GraftExtensions)`):
  *
  *  - the native as-of join strategy (so [[AsofJoinNode]] plans built
  *    by any client of the library get the sort-merge exec without
  *    touching `experimental.extraStrategies`);
  *  - `hamming_distance(a, b)` as a SQL function, making the codegen'd
  *    POPCNT expression reachable from `spark.sql(...)` text, not just
  *    the Column API;
  *  - `cosine_sim(a, b)` likewise: the quantized-integer cosine of two
  *    embedding arrays as one codegen'd loop ([[CosineSim]]) — the
  *    declarative-path alternative to the pair-kernels, bit-identical
  *    to `VectorFns.quantize`+`qdot`;
  *  - `ascii_fold(s)`: the standard analyzer's normalizer as one
  *    codegen'd byte pass ([[AsciiFold]]) — SQL-text access to the
  *    same expression every analyzed DSL clause compiles to;
  *  - `english_fold(s)`: the english analyzer's normalizer
  *    ([[EnglishFold]]: standard pass + stop list + the pinned suffix
  *    stemmer) — the SQL-text twin of the `analyzer: "english"` DSL
  *    surfaces;
  *  - the [[HammingBandJoinRewrite]] optimizer rule, which turns a
  *    `hamming_distance(x, y) <= r` nested-loop similarity join into a
  *    banded equi-join automatically;
  *  - the [[RangeBandJoinRewrite]] optimizer rule (opt-in via
  *    `spark.graft.rangeJoin.bandWidth`), which turns a
  *    `pt >= lo && pt < hi` nested-loop interval join into the banded
  *    equi-join `operators.RangeBandJoin` hand-codes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => HammingBandJoinRewrite)
    ext.injectOptimizerRule(_ => RangeBandJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"hamming_distance expects 2 arguments, got ${args.length}")
        HammingDistance(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cosine_sim expects 2 arguments, got ${args.length}")
        CosineSim(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("ascii_fold"),
      new ExpressionInfo(classOf[AsciiFold].getName, "ascii_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"ascii_fold expects 1 argument, got ${args.length}")
        AsciiFold(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("english_fold"),
      new ExpressionInfo(classOf[EnglishFold].getName, "english_fold"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"english_fold expects 1 argument, got ${args.length}")
        EnglishFold(args.head)
      }))
  }
}
