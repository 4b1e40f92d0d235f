package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the lakehouse FILE-LAYOUT
  * operator for multi-dimensional locality: interleaving the bits of
  * two grid coordinates gives a single sort key under which rows close
  * in BOTH dimensions land in the same file, so a spatial (or any
  * 2-predicate) range scan prunes to the few files whose min/max
  * z-range intersects the query box — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. Usage on the write path:
  * `df.repartitionByRange(n, zValue(xBin, yBin)).sortWithinPartitions(...)
  * .write.parquet(...)`; the engine's parquet min/max stats then do
  * the pruning with no new machinery.
  *
  * Everything is plain shift/mask arithmetic over codegen'd built-ins
  * (no lambdas, no UDF) and replays exactly in any engine with 64-bit
  * integer ops — the q192 oracle mirrors it operation for operation.
  */
object ZOrder {

  /** Spread the low 32 bits of a non-negative int into the even bit
    * positions of a long (the classic magic-number dilation). */
  def spread(c: Column): Column = {
    val m16 = lit(0x0000FFFF0000FFFFL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m2 = lit(0x3333333333333333L)
    val m1 = lit(0x5555555555555555L)
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 16))).bitwiseAND(m16)
    val x2 = (x1.bitwiseOR(shiftleft(x1, 8))).bitwiseAND(m8)
    val x3 = (x2.bitwiseOR(shiftleft(x2, 4))).bitwiseAND(m4)
    val x4 = (x3.bitwiseOR(shiftleft(x3, 2))).bitwiseAND(m2)
    (x4.bitwiseOR(shiftleft(x4, 1))).bitwiseAND(m1)
  }

  /** Morton interleave of two non-negative grid coordinates (low 32
    * bits each): bit i of `a` lands at position 2i, of `b` at 2i+1.
    * Monotone locality: truncating low bits of z ⟺ coarsening BOTH
    * grids, so a right-shifted z is a quadtree cell id. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Reference Scala implementation (specs + driver-side checks). */
  def zValueRef(a: Long, b: Long): Long = {
    def sp(v: Long): Long = {
      var x = v & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    sp(a) | (sp(b) << 1)
  }
}
