package graft

import graft.functions.{CosineSimExpr, DotProductExpr, JsonMergeShallowExpr, JsonProjectExpr, JsonValidExpr, LangIdExpr, NGramHashesExpr, RollingHashExpr, TokenStatsExpr, ToYamlExpr}
import graft.ops.TextAnalysis
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * so `spark.sql` users get the same surface as the Scala API:
  *
  *   spark.sql("SELECT json_project(spec, 'resourceID') FROM t")
  *
  * Two entry points:
  *   - session build time: `.withExtensions(new GraftExtensions)` or
  *     `.config("spark.sql.extensions", "graft.GraftExtensions")`;
  *   - an already-running session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {
  /** (name, usage, builder) for every engine SQL function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("json_project",
      "json_project(json, 'a.b,c') - project dotted paths out of a JSON document",
      (args: Seq[Expression]) => JsonProjectExpr(args(0), args(1))),
    ("json_merge_shallow",
      "json_merge_shallow(dest, src) - field-level shallow JSON merge",
      (args: Seq[Expression]) => JsonMergeShallowExpr(args(0), args(1))),
    ("rolling_hash",
      "rolling_hash(str) - 64-bit polynomial rolling hash",
      (args: Seq[Expression]) => RollingHashExpr(args.head)),
    ("json_valid",
      "json_valid(str) - true iff the string parses as JSON",
      (args: Seq[Expression]) => JsonValidExpr(args.head)),
    ("ngram_hashes",
      "ngram_hashes(text, n) - distinct xxhash64 word n-gram shingle hashes",
      (args: Seq[Expression]) => NGramHashesExpr(args(0),
        args(1).eval().asInstanceOf[Number].intValue())),
    ("dot_product",
      "dot_product(a, b) - codegen'd dot product over float/double arrays",
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    ("cosine_sim",
      "cosine_sim(a, b) - codegen'd cosine similarity (null on zero norm)",
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    ("token_stats",
      "token_stats(text) - struct(n_tokens, total_token_chars, stopword_hits)",
      (args: Seq[Expression]) => TokenStatsExpr(args.head, TextAnalysis.defaultStopwords)),
    ("lang_id",
      "lang_id(text) - marker-argmax language ID heuristic",
      (args: Seq[Expression]) => LangIdExpr(args.head)),
    ("to_yaml",
      "to_yaml(json) - render a JSON document as YAML",
      (args: Seq[Expression]) => ToYamlExpr(args.head)))

  /** Register into an existing session (temp-function registry). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
