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
    // per query: "qNN":12.3, = len(short)+2 quotes+1 colon+4 digits+1
    // comma — the compact map is ADAPTIVE precision (0.1 s above 1 s),
    // so 4 digits covers every query under 100 s
    val qsLen = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_').length + 8).sum
    // fixed fields measured 332 chars on the 105-query run-G line;
    // round 6: companion estimator key renames (-28), slim skew block
    // (-35), sf1 block (+55) -> ~324. +80 margin on top.
    // BARE-KEY second rung (round 6): when the qNN line overflows,
    // Bench re-emits the map with the digit-only keys (one char per
    // query back) BEFORE dropping any block — so the catalog has two
    // budgets: the soft one below (full keys fit outright) and the
    // hard one (bare keys must fit with skew+sf1 intact).
    val nQ = SparkEntry.queries.size
    assert(qsLen - nQ + 324 + 80 <= 1800,
      s"even bare-key query map ~${qsLen - nQ} chars would overflow the driver tail window")
    if (qsLen + 324 + 80 > 1800)
      info(s"full qNN keys past the soft budget ($qsLen chars, $nQ queries) — " +
        "the bare-key rung will carry the line")
  }
}
