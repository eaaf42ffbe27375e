package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{EntityIndexBuilder, EntityIndexConfig, IndexSinks, PropertyIndexBuilder}
import graft.model.{RawEntity, RawProperty}
import graft.parse.Kg

/** Reference output-format parity (S5–S8): within-line ordering follows the
  * kind lattice; E6 invariant holds at the line level.
  */
class IndexSinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entity index lines: primary label first, then infos, aliases, alias-infos") {
    import spark.implicits._
    val rows = Seq(
      RawEntity("Q1", "apple", "fruit", 5, Nil, Seq("pomme", "golden"), 0),
      RawEntity("Q2", "apple", "company", 8, Nil, Seq("pomme"), 1))
    val idx = EntityIndexBuilder.build(rows.toDF(), EntityIndexConfig(ignoreTypes = true))
    val lines = IndexSinks.entityIndexLines(idx)
      .collect().map(_.getString(0)).sorted
    // Q2 (more popular) reps group (apple, company)? groups: (apple,fruit)=Q1,
    // (apple,company)=Q2; O1: max 8 first → Q2 takes plain "apple";
    // Q1 → "apple (fruit)"; aliases: pomme shared→Q2 wins plain (count 8),
    // Q1 gets "pomme (fruit)"; golden unique→Q1
    val q1 = lines.find(_.startsWith("Q1\t")).get
    val q2 = lines.find(_.startsWith("Q2\t")).get
    assert(q1 == "Q1\tapple (fruit)\tgolden\tpomme (fruit)")
    assert(q2 == "Q2\tapple\tpomme")
  }

  test("property lines, prefixes, redirects, inverses") {
    import spark.implicits._
    val props = Seq(
      RawProperty("P1", "spouse", 5, Seq("married to"), Seq("P2"), 0),
      RawProperty("P2", "child", 3, Nil, Seq("P1"), 1))
    val idx = PropertyIndexBuilder.build(props.toDF())
    val lines = IndexSinks.propertyIndexLines(idx).collect().map(_.getString(0)).sorted
    assert(lines.contains("P1\tspouse\tmarried to"))
    assert(lines.contains("P2\tchild"))

    val pfx = IndexSinks.prefixLines(Kg.Wikidata, spark, entities = true)
      .collect().map(_.getString(0))
    assert(pfx.sameElements(Array("wd:\thttp://www.wikidata.org/entity/")))

    val redirects = Seq(("Q1", Seq("Q7", "Q9")), ("Q2", Seq.empty[String]))
      .toDF("qid", "redirects")
    val rl = IndexSinks.redirectLines(redirects).collect().map(_.getString(0))
    assert(rl.sameElements(Array("Q1\tQ7\tQ9")))

    val inv = IndexSinks.inverseLines(
      PropertyIndexBuilder.inversePairs(props.toDF(), idx))
      .collect().map(_.getString(0)).sorted
    assert(inv.sameElements(Array("P1\tP2", "P2\tP1")))
  }
}
