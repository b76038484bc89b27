package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Morton interleave. */
  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i)))

  test("zValue matches the reference bit interleave on random coordinates") {
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) => assert(z == refZ(x, y, 16), s"($x,$y)") }
  }

  test("z-order files are rectangles; single-column stripes span the full other dimension") {
    val rng = new scala.util.Random(12)
    val d = Seq.fill(20000)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
      .toDF("x", "y")
    val zs = ZOrder.layoutStats(d, "x", "y", bits = 16, nFiles = 64).collect()
    assert(zs.length == 64)
    // 64 files on a 16-bit Morton curve = rectangles of 2^13 × 2^13:
    // both spans bounded by 1/8 of the domain (1250 bp)
    zs.foreach { r =>
      assert(r.getAs[Long]("span_x_bp") <= 1250, r.toString)
      assert(r.getAs[Long]("span_y_bp") <= 1250, r.toString)
    }
    // rows conserved across files
    assert(zs.map(_.getAs[Long]("n_rows")).sum == 20000)
  }

  test("layoutStats rejects a non-power-of-two file count") {
    val d = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.layoutStats(d, "x", "y", nFiles = 48)
    }
  }
}
