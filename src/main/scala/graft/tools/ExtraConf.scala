package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared `SPARK_GRAFT_EXTRA_CONF` passthrough for the audit tools:
  * audit-scoped Spark confs applied at SESSION CREATION so core (non-SQL)
  * confs work too — e.g. sizing a big-driver leg:
  *   SPARK_GRAFT_EXTRA_CONF="spark.driver.maxResultSize=8g"
  * Values must not contain ','; a malformed entry fails loudly here
  * instead of an opaque index error at session build. */
object ExtraConf {
  def apply(builder: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map { e =>
        val kv = e.split("=", 2)
        require(kv.length == 2 && kv(0).nonEmpty,
          s"SPARK_GRAFT_EXTRA_CONF entry '$e' is not key=value")
        // every legitimate conf key is spark.*; a fragment of a
        // comma-containing VALUE that happens to carry '=' would
        // otherwise be applied silently as a bogus key=value pair
        require(kv(0).startsWith("spark."),
          s"SPARK_GRAFT_EXTRA_CONF entry '$e' does not look like a Spark " +
            "conf (key must start with 'spark.') — a comma inside a conf " +
            "value is not expressible in this format")
        kv
      })
      .getOrElse(Array.empty)
      .foldLeft(builder)((b, kv) => b.config(kv(0), kv(1)))
}
