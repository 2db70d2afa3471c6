package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: exactly what the harness checks at t1. */
class GraftSpec extends AnyFunSuite {
  private lazy val spark = killa.TestSpark.spark

  test("SparkEntry.entry returns rows on sf0.001 (driver t1 smoke)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracleSql key has a queries twin; names column-match contract") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os -- qs}")
    // round 3 closed the last rows-only registration (simhash's oracle
    // recomputes the FNV-1a64 family via a recursive CTE): EVERY registered
    // query now carries an independent DuckDB oracle
    assert((qs -- os).isEmpty, s"query without oracle: ${qs -- os}")
  }
}
