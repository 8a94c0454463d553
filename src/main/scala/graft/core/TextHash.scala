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

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /**
   * One-pass MinHash signature over word w-shingles — the native kernel
   * behind [[graft.functions.MinHashSig]], bit-identical to the Column
   * tower `transform(shingles) -> md5 -> conv -> 16x array_min` for
   * texts with >= w words:
   *
   *  - words split on the single space byte (0x20 — never part of a
   *    UTF-8 multibyte sequence), empty tokens kept like Spark's
   *    `split(text, " ")`;
   *  - a w-shingle joined with single spaces IS the original byte span
   *    from its first word's start to its last word's end (consecutive
   *    spaces produce empty tokens whose concat_ws rendering restores
   *    them), so each shingle hashes IN PLACE — no substring
   *    allocation, no shingle array;
   *  - shingle id = first 15 hex chars of md5 = the top 60 bits of the
   *    digest's first 8 big-endian bytes, then mod 2^31;
   *  - sig_j = min over shingles of (a_j * id + b_j) mod 2^31. The
   *    Column tower's array_distinct is a no-op under min and is
   *    skipped.
   *
   * Returns null when the text has fewer than w words (no shingles) —
   * the DuckDB twin's empty-list semantics.
   */
  /**
   * Sorted DISTINCT 60-bit shingle ids of the text's word w-shingles
   * (same in-place byte-span hashing as [[minhashSig]], without the
   * mod-2^31 reduction): the set representation the n-gram Jaccard
   * verify compares — an `array<long>` per document instead of the
   * shingle STRING array, so candidate pairs carry 8 bytes per shingle
   * across the verify join. Empty array when the text has < w words.
   */
  def shingleIds(s: UTF8String, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) starts.add(i + 1)
      i += 1
    }
    val nWords = starts.size()
    val nShingles = nWords - (w - 1)
    if (nShingles <= 0) return Array.emptyLongArray
    val md = Md5.get()
    val ids = new Array[Long](nShingles)
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts.get(sIdx)
      val until = if (sIdx + w < nWords) starts.get(sIdx + w) - 1 else n
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      ids(sIdx) = v >>> 4
      sIdx += 1
    }
    java.util.Arrays.sort(ids)
    // dedupe in place (sorted)
    var out = 0
    var k = 0
    while (k < ids.length) {
      if (out == 0 || ids(k) != ids(out - 1)) { ids(out) = ids(k); out += 1 }
      k += 1
    }
    if (out == ids.length) ids else java.util.Arrays.copyOf(ids, out)
  }

  /**
   * One-pass Gopher-style repetition stats:
   * `[n_words, n_distinct_words, max_word_count,
   *   n_bigrams, n_distinct_bigrams, max_bigram_count]`.
   *
   * Words are space-separated byte spans (empties kept, the `split`
   * semantics); each span / adjacent-span pair is hashed to the same
   * 60-bit md5 prefix as [[shingleIds]], then counted via one sort +
   * run scan. Distinct/max-multiplicity over the 60-bit ids equals the
   * string answer absent a hash collision among the document's actual
   * words — PipelineSpec pins equality against a driver-side string
   * twin (fixture corpus + edge cases), and the q88 oracle counts
   * strings.
   */
  def repetitionStats(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) starts.add(i + 1)
      i += 1
    }
    val nWords = starts.size()
    val md = Md5.get()
    def spanIds(w: Int): Array[Long] = {
      val m = nWords - (w - 1)
      if (m <= 0) return Array.emptyLongArray
      val ids = new Array[Long](m)
      var sIdx = 0
      while (sIdx < m) {
        val from = starts.get(sIdx)
        val until = if (sIdx + w < nWords) starts.get(sIdx + w) - 1 else n
        md.reset()
        md.update(bytes, from, until - from)
        val d = md.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        ids(sIdx) = v >>> 4
        sIdx += 1
      }
      ids
    }
    // (distinct count, max run length) over a sorted id array
    def runStats(ids: Array[Long]): (Long, Long) = {
      if (ids.isEmpty) return (0L, 0L)
      java.util.Arrays.sort(ids)
      var distinct = 1L
      var maxRun = 1L
      var run = 1L
      var k = 1
      while (k < ids.length) {
        if (ids(k) == ids(k - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else { distinct += 1; run = 1 }
        k += 1
      }
      (distinct, maxRun)
    }
    val (dw, mw) = runStats(spanIds(1))
    val bg = spanIds(2)
    val nBigrams = bg.length.toLong
    val (db, mb) = runStats(bg)
    Array(nWords.toLong, dw, mw, nBigrams, db, mb)
  }

  def minhashSig(s: UTF8String, w: Int, as: Array[Long], bs: Array[Long]): Array[Long] = {
    val bytes = s.getBytes // materialize once; spans index into this
    val n = bytes.length
    // word start offsets (split on ' ', empties kept): starts(i) is the
    // byte offset of word i; word i ends at starts(i+1) - 2 inclusive
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) starts.add(i + 1)
      i += 1
    }
    val nWords = starts.size()
    val nShingles = nWords - (w - 1)
    if (nShingles <= 0) return null
    val md = Md5.get()
    val mins = Array.fill(as.length)(Long.MaxValue)
    var sIdx = 0
    while (sIdx < nShingles) {
      val from = starts.get(sIdx)
      val until = if (sIdx + w < nWords) starts.get(sIdx + w) - 1 else n
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      val x = (v >>> 4) % 2147483648L
      var j = 0
      while (j < as.length) {
        val h = (as(j) * x + bs(j)) % 2147483648L
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      sIdx += 1
    }
    mins
  }
}
