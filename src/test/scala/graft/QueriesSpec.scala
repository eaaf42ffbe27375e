package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level contract check for the driver harness: every SparkEntry query
  * runs against sf0.001 and returns a sane row count; every oracle key refers
  * to an existing query. (Value-level equivalence vs DuckDB runs in the
  * driver; the in-repo equivalents live in the operator specs.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  // queries allowed to be legitimately empty at the smallest scale
  val mayBeEmpty = Set("e5_anti_join_vacancy", "dedup_jaccard_pairs",
    "embed_near_dups", "dedup_minhash_lsh", "dedup_simhash")

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
