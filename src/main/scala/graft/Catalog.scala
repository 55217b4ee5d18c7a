package graft

import org.apache.spark.sql.SparkSession

/** Pure-SQL entry point: registers every harness table as a temp view (and
  * the engine's custom functions via [[GraftExtensions]] when the session
  * was built with them), so a user can drive the whole engine through
  * `spark.sql(...)` alone. */
object Catalog {
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    tables.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
