package graft.operators

/**
 * Layer-name hygiene, mirroring the reference's rules:
 *  - [[sanitize]]: identifier-safe names — spaces/dots/dashes -> `_`,
 *    leading digit -> `x` prefix (reference rasterlayer.py:121-147).
 *  - [[dedup]]: duplicate names get `_1.._n` suffixes, first keeps the
 *    bare name (reference raster.py:444-479).
 */
object Naming {

  def sanitize(name: String): String = {
    val cleaned = name.replaceAll("[ .\\-]", "_")
    if (cleaned.nonEmpty && cleaned.head.isDigit) "x" + cleaned else cleaned
  }

  def dedup(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      seen.get(n) match {
        case None => seen(n) = 0; n
        case Some(k) =>
          var i = k + 1
          var candidate = s"${n}_$i"
          while (seen.contains(candidate)) { i += 1; candidate = s"${n}_$i" }
          seen(n) = i; seen(candidate) = 0
          candidate
      }
    }
  }

  def fix(names: Seq[String]): Seq[String] = dedup(names.map(sanitize))
}
