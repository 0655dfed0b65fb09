package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave keys — the multi-dimensional data-layout
  * primitive: sorting / range-partitioning an Iceberg or parquet write
  * by `zkey(a, b)` clusters rows that are close in BOTH dimensions into
  * the same files, so min/max file statistics prune two-dimensional
  * range predicates (ts × conv_bucket, user × day, lat × lon) instead
  * of only the leading sort column. At 100 TB the win is file-level:
  * a query selecting 1% in each of two dimensions scans ~1% of a
  * z-ordered table vs ~100% of the non-leading dimension of a
  * lexicographically sorted one.
  *
  * The interleave is the branch-free magic-shift spread (the public
  * bit-twiddling form): each 16-bit input is spread to even bit
  * positions in 4 shift-or-mask steps, the second dimension lands on
  * odd bits. Pure integer `& | <<` — trivially codegen'd by Spark and
  * replayable verbatim in any engine with bit operators, which is what
  * makes the oracle exact. Inputs must already be in [0, 2^16); the op
  * REJECTS out-of-range values loudly (NULL-safe: NULL in → NULL key)
  * rather than silently masking — a masked coordinate would cluster
  * far-apart rows together, corrupting the layout it exists to build.
  */
object Zorder {

  /** Spread the low 16 bits of `x` to even bit positions (0, 2, …, 30). */
  private def spread16(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit coordinates: bit i of `c1` at
    * position 2i, bit i of `c2` at position 2i+1. NULL coordinates give
    * a NULL key; out-of-range values throw at execution (ANSI-style
    * guard via raise_error). */
  def zkey2(c1: Column, c2: Column): Column = {
    val guard = (c: Column) => when(c.isNull, c)
      .when(c >= 0 && c < 65536, c)
      .otherwise(raise_error(concat(
        lit("zkey2 coordinate out of [0, 65536): "), c.cast("string"))))
    spread16(guard(c1)).bitwiseOR(shiftleft(spread16(guard(c2)), 1))
  }

  /** Attach `zkey` for (c1, c2); the write-side use is
    * `df.repartitionByRange(n, col("zkey")).sortWithinPartitions("zkey")`
    * before the sink. */
  def withZkey(df: DataFrame, c1: String, c2: String): DataFrame =
    df.withColumn("zkey", zkey2(col(c1), col(c2)))
}
