package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.GraftFunctions

/** Session extension registering the graft expression library once
  * per session, so `spark.sql("SELECT graft_cosine(a, b) ...")` works
  * in any session created with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * including pure-SQL users who never touch the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}
