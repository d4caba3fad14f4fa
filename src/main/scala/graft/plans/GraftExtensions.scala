package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.GraftFunctions

/** SparkSessionExtensions hook: enables
  * `spark.sql.extensions=graft.plans.GraftExtensions` so any session —
  * including Thrift/Connect ones we don't construct — gets graft's SQL
  * functions. (SURVEY §4.2: the idiomatic replacement for the reference's
  * forked parser is extension injection, not a parser fork.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    ext.injectOptimizerRule(_ => FoldSelfCosine)
    // EP1: reference-dialect `OVER (WINDOW 'w' SECONDS[, SLIDE 's'
    // SECONDS])` statements parse directly via spark.sql — the translator
    // runs in front of the stock parser, everything else passes through.
    ext.injectParser((session, delegate) =>
      new graft.streaming.CepSqlParser(session, delegate))
  }
}
