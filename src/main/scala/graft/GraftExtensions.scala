package graft

import graft.functions.{ArrayDot, DamerauLevenshtein, StemDutch, StripAccents, TokenizeWs}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's custom Catalyst expressions. Configure with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and `SELECT stem_dutch(text)`, `strip_accents(s)`,
  * `damerau_levenshtein(a, b)`, `array_dot(a, b)` become available to
  * plain SQL (and therefore to spark.sql pipelines and thrift clients).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    ext.injectFunction((
      FunctionIdentifier("stem_dutch"),
      info("stem_dutch", "stem_dutch(str) - Snowball Dutch stem per token"),
      (args: Seq[Expression]) => StemDutch(args.head)))
    ext.injectFunction((
      FunctionIdentifier("strip_accents"),
      info("strip_accents", "strip_accents(str) - NFD accent strip + ascii"),
      (args: Seq[Expression]) => StripAccents(args.head)))
    ext.injectFunction((
      FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - OSA restricted Damerau-Levenshtein"),
      (args: Seq[Expression]) => DamerauLevenshtein(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - double-array dot product"),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("tokenize_ws"),
      info("tokenize_ws",
        "tokenize_ws(str) - whitespace tokens, empties dropped"),
      (args: Seq[Expression]) => TokenizeWs(args.head)))
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
