package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that must hold WITHOUT running Spark:
  * the bench line budget and the queries/oracle correspondence. */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${q diff o}")
    assert((o diff q).isEmpty, s"oracles without query: ${o diff q}")
  }

  test("bench qNN short keys stay unique (the compact-line contract)") {
    val shorts = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    assert(shorts.distinct.size === shorts.size,
      shorts.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted.mkString(","))
  }

  test("query catalog fits the 1800-char bench line budget with margin") {
    // per query: "qNN":12.34, = len(short)+2 quotes+1 colon+5 digits+1 comma
    // (compact map is 2-decimal). 5 digits assumes every query < 100 s —
    // the whole catalog sums to ~75 s, so a single 100 s query would
    // already breach the 2x bar; and Bench's ordered-drop ladder (skew
    // block first, ~110 chars) still absorbs one such regression
    // without losing the query map.
    val qsLen = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_').length + 9).sum
    // fixed fields (metric/value/unit/sf/pipeline/skew) measured 332
    // chars on the 105-query run-G line (1,598 total = 1,266 map +
    // 332); +100 margin on top. Beyond this, Bench's ordered-drop
    // ladder (skew block first, ~120 chars) still absorbs ~10 more
    // queries before the map itself would be dropped.
    assert(qsLen + 332 + 100 <= 1800,
      s"query-map JSON ~$qsLen chars + fixed fields would overflow the driver tail window")
  }
}
