package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Hilbert space-filling curve index (Skilling 2004, "Programming the
  * Hilbert curve", AIP Conf. Proc. 707 — public algorithm), for
  * multi-key clustering rewrites. Compared to the Z-curve's bit
  * interleave, consecutive Hilbert indices ALWAYS differ by one step
  * in exactly one axis (no Z-shape diagonal jumps), so a file holding
  * a contiguous index range covers a tighter axis-aligned region —
  * measurably narrower per-file [min,max] footer stats on every
  * cluster key, i.e. better file skipping from the same rewrite.
  *
  * Representation: `n` axes, `bits` bits per axis, index = `n*bits`
  * bits (callers keep `n*bits <= 62`). The transform works on
  * Skilling's "transpose" form; the index interleaves the transposed
  * bits MSB-first, axis 0 first.
  */
object SpaceCurves {

  /** Hilbert index of the point `x` (each axis in `[0, 2^bits)`).
    * Static entry point for [[HilbertIndex]]'s generated code. */
  def hilbertFromArray(x: ArrayData, bits: Int): Long = {
    val n = x.numElements()
    val ax = new Array[Long](n)
    var i = 0
    while (i < n) { ax(i) = x.getLong(i); i += 1 }
    hilbertIndex(ax, bits)
  }

  /** Axes -> Hilbert index. Mutates a private copy. */
  def hilbertIndex(axes: Array[Long], bits: Int): Long = {
    val n = axes.length
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"hilbert: need 1 <= n*bits <= 62, got n=$n bits=$bits")
    val x = axes.clone()
    // AxesToTranspose: inverse undo, then Gray encode
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose, MSB-first, axis 0 first
    var h = 0L
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) {
        h = (h << 1) | ((x(j) >>> b) & 1L)
        j += 1
      }
      b -= 1
    }
    h
  }

  /** Hilbert index -> axes (the inverse; used by tests to prove the
    * bijection and the unit-step adjacency property). */
  def hilbertAxes(h: Long, n: Int, bits: Int): Array[Long] = {
    require(n >= 1 && bits >= 1 && n * bits <= 62,
      s"hilbert: need 1 <= n*bits <= 62, got n=$n bits=$bits")
    // un-interleave into the transpose
    val x = new Array[Long](n)
    var pos = n * bits - 1
    var b = bits - 1
    while (b >= 0) {
      var j = 0
      while (j < n) {
        x(j) |= ((h >>> pos) & 1L) << b
        pos -= 1
        j += 1
      }
      b -= 1
    }
    // TransposeToAxes: Gray decode, then undo excess work
    var t = x(n - 1) >>> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    var q = 2L
    val top = 1L << bits
    while (q != top) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t2 = (x(0) ^ x(i)) & p; x(0) ^= t2; x(i) ^= t2 }
        i -= 1
      }
      q <<= 1
    }
    x
  }
}
