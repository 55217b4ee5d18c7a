package graft

import graft.io.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (65535L, 65535L))
      .toDF("x", "y")
    val z = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 16)).as[Long].collect()
    // morton(x,y) with x on even bits: (1,0)->1, (0,1)->2, (1,1)->3,
    // (5,3)=(101,011)->0b011111=31? interleave: bit0:x=1,y=1->3; bit1:x=0,y=1->(0<<2)|(1<<3)=8; bit2:x=1,y=0->16 => 3+8+16=27
    assert(z.toSeq == Seq(0L, 1L, 2L, 3L, 27L, (1L << 32) - 1))
  }

  test("zValue three columns and bit-budget guard") {
    val df = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
    val z = df.select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 4))
      .as[Long].first()
    assert(z == 7L) // bit 0 of each -> positions 0,1,2
    assertThrows[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 22) // 66 bits
    }
  }

  test("z-clustered layout touches fewer files for a 2-D box than a 1-D sort") {
    // synthetic 2-D grid: ids 0..4095 with two independent dimensions
    val df = spark.range(4096)
      .select(col("id"),
        (col("id") % 64).as("x"),
        floor(col("id") / lit(64)).as("y"))
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_zorder_${System.nanoTime()}").getAbsolutePath
    // layout A: z-clustered on (x, y); layout B: range-sorted by x only
    ZOrder.cluster(df, Seq(col("x"), col("y")), numFiles = 16, bits = 6)
      .write.mode("overwrite").parquet(s"$base/z")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/flat")
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x").between(10, 17) && col("y").between(20, 27))
        .select(input_file_name()).distinct().count()
    val zTouched = filesTouched(s"$base/z")
    val flatTouched = filesTouched(s"$base/flat")
    // the box is 8x8 = 64 of 4096 rows (~1.6%); under the x-only sort its
    // rows spread across the files of 8 whole x-stripes (each stripe holds
    // all 64 y values), under z-order they concentrate in the files of one
    // Morton neighborhood
    assert(zTouched < flatTouched,
      s"z-order touched $zTouched files vs $flatTouched for the 1-D layout")
    // and the clustered rewrite loses no rows
    assert(spark.read.parquet(s"$base/z").count() == 4096)
  }
}
