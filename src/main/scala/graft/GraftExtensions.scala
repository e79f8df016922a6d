package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CharBigrams, FloatCosine, FloatDotProduct, TermCounts, WordBigrams}

/** SQL-surface registration for the engine's custom expressions
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`).
  *
  * The DataFrame API does not need this (graft.functions.
  * VectorFunctions builds Columns directly); the extension exists so
  * plain Spark SQL text can call `graft_dot(a, b)` too — SURVEY §3
  * entry point B. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[FloatCosine].getName, "graft_cosine"),
      (children: Seq[Expression]) => FloatCosine(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_char_bigrams"),
      new ExpressionInfo(classOf[CharBigrams].getName, "graft_char_bigrams"),
      (children: Seq[Expression]) => CharBigrams(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_term_counts"),
      new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts"),
      (children: Seq[Expression]) => TermCounts(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_word_bigrams"),
      new ExpressionInfo(classOf[WordBigrams].getName, "graft_word_bigrams"),
      (children: Seq[Expression]) => WordBigrams(children.head)))
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
