package graft.sources

/** Oracle-SQL literal helpers: DuckDB parses bare fractional literals as
  * DECIMAL and its decimal->double conversion mis-rounds 16+ digit
  * mantissas (> 2^53); casting from a STRING literal round-trips the
  * shortest-repr double exactly. Every fractional literal interpolated
  * into oracle SQL goes through [[OracleLit.d]]. */
object OracleLit {
  def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
  /** alias usable where `d` collides with local names */
  def d2(v: Double): String = d(v)
}
