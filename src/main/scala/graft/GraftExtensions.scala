package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The library's single `spark.sql.extensions` entry point: SQL-callable
  * custom functions ([[graft.functions.GraftExtensions]]) plus the custom
  * planner strategies for the native as-of/interval joins
  * ([[graft.plans.GraftExtensions]]). The two component classes remain
  * usable individually for sessions that want only one surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new graft.functions.GraftExtensions()(ext)
    new graft.plans.GraftExtensions()(ext)
  }
}
