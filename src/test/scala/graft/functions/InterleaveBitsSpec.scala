package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class InterleaveBitsSpec extends SparkSpecBase {

  private def deinterleave(z: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    for (i <- 0 until 32) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  test("zorder2 is the exact inverse of de-interleaving") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      assert(deinterleave(InterleaveBitsFn.zorder2(x, y)) == (x, y))
    }
  }

  test("bit placement: x on even bits, y on odd bits") {
    assert(InterleaveBitsFn.zorder2(1L, 0L) == 1L)
    assert(InterleaveBitsFn.zorder2(0L, 1L) == 2L)
    assert(InterleaveBitsFn.zorder2(3L, 0L) == 5L)   // 0b0101
    assert(InterleaveBitsFn.zorder2(0L, 3L) == 10L)  // 0b1010
    assert(InterleaveBitsFn.zorder2(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L)
    // bits above 32 are ignored, not folded
    assert(InterleaveBitsFn.zorder2(1L << 40, 0L) == 0L)
  }

  test("z-locality: a kxk box maps into a bounded z-range") {
    // the layout property the expression exists for: all points of an
    // aligned 2^k x 2^k tile share their high bits, so the tile is ONE
    // contiguous z-range (here the 8x8 tile at (16, 8))
    val zs = for (x <- 16L until 24L; y <- 8L until 16L)
      yield InterleaveBitsFn.zorder2(x, y)
    assert(zs.max - zs.min == 63L && zs.toSet.size == 64)
  }

  test("SQL surface via extensions: zorder2 matches the Scala kernel") {
    import spark.implicits._
    val got = Seq((5L, 9L), (0L, 0L), (65535L, 1L))
      .toDF("x", "y")
      .select(call_function("zorder2", col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(InterleaveBitsFn.zorder2(5L, 9L), 0L,
      InterleaveBitsFn.zorder2(65535L, 1L)))
  }

  test("null inputs yield null, non-long inputs are rejected") {
    import spark.implicits._
    val rows = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(call_function("zorder2", col("x"), col("y")).as("z"))
      .collect()
    assert(rows.head.isNullAt(0))
    val err = intercept[Exception] {
      Seq(("a", 1L)).toDF("x", "y")
        .select(call_function("zorder2", col("x"), col("y"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("zorder2"))
  }
}
