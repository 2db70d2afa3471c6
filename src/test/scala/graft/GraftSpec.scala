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
    // rows-only registrations are deliberate and few: only simhash remains
    // (hamming over our 64-bit hash family isn't SQL-expressible; it carries
    // an exhaustive Spark-side golden in PipelineOpsSpec instead)
    assert((qs -- os) == Set("q_dedup_simhash"))
  }
}
