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
    // per query: "qNN":123.456, = len(short)+2 quotes+1 colon+7 digits+1 comma
    val qsLen = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_').length + 11).sum
    // measured fixed fields (metric/value/sf/pipeline/skew) ~ 430 chars
    assert(qsLen + 600 <= 1800,
      s"query-map JSON ~$qsLen chars + fixed fields would overflow the driver tail window")
  }
}
