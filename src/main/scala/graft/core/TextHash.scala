package graft.core

import org.apache.spark.unsafe.types.UTF8String

/**
 * Document fingerprint kernels — static methods called from generated
 * code (the `StablePoint.fnv1a64` pattern), so the fold runs inside
 * WholeStageCodegen with zero allocation.
 */
object TextHash {

  /**
   * Rolling polynomial fingerprint over the text's UTF-8 BYTES:
   * h = fold(h*31 + byte) mod 2^31, left-to-right. One linear pass over
   * the UnsafeRow-backed byte array — the SQL-expression formulation
   * (`ascii(substring(t, i, 1))` per position) re-seeks the string from
   * the start for every character, i.e. O(len^2) per document: fine on a
   * 30-word fixture, a scale-killer on real 100 KB pages.
   *
   * For ASCII text this equals the per-character codepoint fold (byte ==
   * codepoint), which is what the DuckDB oracle replays with `ord()`;
   * for non-ASCII text the BYTE fold is the defined semantics (stable,
   * encoding-exact, no codepoint decoding on the hot path).
   */
  def fingerprint(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31L + (s.getByte(i) & 0xffL)) % 2147483648L
      i += 1
    }
    h
  }
}
