package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton code, bit by bit. */
  private def morton(x: Long, y: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("mortonCol matches the bit-by-bit reference across the range") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1), ((1L << 31) - 1, (1L << 31) - 1))
    val out = pts.toDF("x", "y")
      .select(ZOrder.mortonCol($"x", $"y").as("z")).collect().map(_.getLong(0))
    assert(out.toSeq == pts.map { case (x, y) => morton(x, y) })
    // z interleaves: x=3,y=5 -> 0b100111 = 39
    assert(morton(3L, 5L) == 39L)
  }

  test("out-of-range and null inputs fail loudly") {
    val e = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(ZOrder.mortonCol($"x", $"y")).collect()
    }
    assert(e.getMessage.contains("out of [0, 2^31)"))
    intercept[Exception] {
      Seq((1L << 31, 0L)).toDF("x", "y")
        .select(ZOrder.mortonCol($"x", $"y")).collect()
    }
  }

  test("z-ordered layout prunes on BOTH dimensions; linear layout only on one") {
    // 64x64 grid; 16 files. A y-probe under an x-sorted layout touches
    // every file; under z-order it touches a few.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    val zdir = s"$base/zorder"
    val ldir = s"$base/linear"
    ZOrder.writeZOrdered(grid, zdir, "x", "y", nFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(ldir)
    def touched(dir: String, colName: String, v: Long): Long =
      ZOrder.fileRanges(spark.read.parquet(dir), colName)
        .filter(col("lo") <= v && col("hi") >= v).count()
    // x-probes: both layouts prune
    assert(touched(zdir, "x", 7L) <= 8, "z-order must bound x-probe files")
    assert(touched(ldir, "x", 7L) <= 2)
    // y-probes: only z-order prunes
    val zy = touched(zdir, "y", 7L)
    val ly = touched(ldir, "y", 7L)
    assert(ly == 16L, s"x-sorted layout should touch every file for a y-probe, got $ly")
    assert(zy <= 8, s"z-order should keep a y-probe to a file subset, got $zy")
    // layout changes bytes' ORDER only, never the rows
    assert(spark.read.parquet(zdir).count() == 64L * 64L)
    val back = spark.read.parquet(zdir).select("x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == grid.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
