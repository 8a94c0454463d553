package graft.core

/**
 * Page-derived point geometries: deterministic (lon, lat) from a page
 * key, per the north star ("page-derived point geometries" from a
 * stable hash of `url`). Two derivations:
 *
 *  - [[fromUrl]]: FNV-1a 64-bit over the UTF-8 bytes of the url — the
 *    library default for real string keys. Matches the Catalyst-side
 *    arithmetic used by `graft.functions.pointFromUrl` (which uses this
 *    same static method from codegen).
 *
 *  - id-based LCG ([[lonFromId]]/[[latFromId]]): pure 64-bit integer
 *    arithmetic on a numeric key — used by the oracle-checked queries
 *    because the identical expression is computable in ANSI SQL (DuckDB)
 *    for the driver's bit-exact compare. Constants are the classic
 *    glibc/BSD LCG multipliers (public domain).
 */
object StablePoint {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L
  private val TwoPow31 = 2147483648L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Zero-allocation twin over Spark's UTF8String (hot codegen path). */
  def fnv1a64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes()
    var h = FnvOffset
    var i = 0
    while (i < n) { h ^= (s.getByte(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  def lonFromUrl(u: org.apache.spark.unsafe.types.UTF8String): Double = {
    val h = fnv1a64(u)
    (h & 0x7fffffffL).toDouble / TwoPow31 * 360.0 - 180.0
  }
  def latFromUrl(u: org.apache.spark.unsafe.types.UTF8String): Double = {
    val h = fnv1a64(u)
    ((h >>> 31) & 0x7fffffffL).toDouble / TwoPow31 * 180.0 - 90.0
  }

  /** Stable point from a url: lon in [-180,180), lat in [-90,90). */
  def fromUrl(url: String): (Double, Double) = {
    val h = fnv1a64(url)
    val lo = h & 0x7fffffffL          // 31 bits -> lon
    val hi = (h >>> 31) & 0x7fffffffL // next 31 bits -> lat
    (lo.toDouble / TwoPow31 * 360.0 - 180.0,
     hi.toDouble / TwoPow31 * 180.0 - 90.0)
  }
  def lonFromUrl(url: String): Double = fromUrl(url)._1
  def latFromUrl(url: String): Double = fromUrl(url)._2

  /**
   * Oracle-expressible LCG hashes of a numeric id (exact in any SQL
   * engine; all intermediates < 2^63 for ids < 2^32). The lat round
   * chains off the lon round so SMALL ids still mix over the full range
   * (a single `id * 69069` round barely wraps for id < 31k).
   */
  def lonHash(id: Long): Long = (id * 1103515245L + 12345L) % TwoPow31
  def latHash(id: Long): Long = (lonHash(id) * 69069L + 1234567L) % TwoPow31

  def lonFromId(id: Long): Double = lonHash(id).toDouble / TwoPow31 * 360.0 - 180.0
  def latFromId(id: Long): Double = latHash(id).toDouble / TwoPow31 * 180.0 - 90.0
}
