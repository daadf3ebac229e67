package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (x even, y odd)") {
    // x=0b101, y=0b011 → z bits: x0=1@0, y0=1@1, x1=0@2, y1=1@3, x2=1@4, y2=0@5
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 3).as("z")).head().getLong(0)
    assert(z == (1 + 2 + 8 + 16))
    // key is monotone in each coordinate within the same other-coord
    val zs = Seq((0L, 7L), (1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == zs.sorted && zs.distinct.length == 4)
  }

  test("zorderWrite clusters both dimensions: per-file bounding boxes are small") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    ZOrder.zorderWrite(orders, "o_custkey", "o_orderkey", dir, nFiles = 8, bits = 12)

    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())

    // each file covers a contiguous z range ⇒ a small set of quad-tree
    // cells ⇒ the sum of per-file (x-range × y-range) areas is far
    // below nFiles × global area (what random placement would give)
    val files = back.select(input_file_name().as("f"), $"o_custkey", $"o_orderkey")
      .groupBy($"f")
      .agg((max($"o_custkey") - min($"o_custkey")).as("xr"),
           (max($"o_orderkey") - min($"o_orderkey")).as("yr"))
      .collect()
    assert(files.length >= 4) // range partitioner may merge tiny ranges
    val area = files.map(r => r.getLong(1).toDouble * r.getLong(2)).sum
    val g = orders.agg(
      (max($"o_custkey") - min($"o_custkey")).cast("double"),
      (max($"o_orderkey") - min($"o_orderkey")).cast("double")).head()
    val globalArea = g.getDouble(0) * g.getDouble(1)
    assert(area < files.length * globalArea / 2.0,
      s"z-order gave no clustering: $area vs ${files.length} x $globalArea")
  }
}
