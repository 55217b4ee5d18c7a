package graft

import graft.io.Compact
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet"))

  test("compact rewrites many small files into the computed count; content identical") {
    val df = spark.range(10000).select(col("id"), (col("id") % 97).as("v"))
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_compact_${System.nanoTime()}").getAbsolutePath
    df.repartition(32).write.mode("overwrite").parquet(s"$base/small")
    val smallCount = parquetFiles(s"$base/small").length
    assert(smallCount == 32)
    val bytes = Compact.dataBytes(spark, s"$base/small")
    assert(bytes > 0)
    // target slightly under half the input → expect ceil(bytes/target) files
    val target = bytes / 2 + 1
    val n = Compact.compact(spark, s"$base/small", s"$base/two", target)
    assert(n == 2 && parquetFiles(s"$base/two").length == 2)
    // giant target → exactly one file
    val n1 = Compact.compact(spark, s"$base/small", s"$base/one", 1L << 30)
    assert(n1 == 1 && parquetFiles(s"$base/one").length == 1)
    // content round-trips exactly
    val back = spark.read.parquet(s"$base/one")
    assert(back.count() == 10000 &&
      back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}
