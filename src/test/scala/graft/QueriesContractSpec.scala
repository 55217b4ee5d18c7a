package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every oracle key names a real query, every
  * query produces rows on the smoke dataset (the driver's t1 check), and
  * output column names contain no duplicates or parquet-hostile
  * characters. */
class QueriesContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry() is non-empty (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Catalog.registerAll exposes every table to spark.sql") {
    Catalog.registerAll(spark, TestSpark.sf0001)
    Catalog.tables.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1, s"table $t")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: runs at sf0.001, rows > 0, clean schema") {
      val df = fn(spark, TestSpark.sf0001)
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"duplicate columns: ${cols.toSeq}")
      assert(cols.forall(c => !c.exists(ch => " ,;{}()\n\t=".contains(ch))),
        s"parquet-hostile column name in ${cols.toSeq}")
      assert(df.count() > 0, s"$name produced no rows at sf0.001")
    }
  }
}
