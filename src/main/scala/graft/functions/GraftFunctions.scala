package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)))
}
