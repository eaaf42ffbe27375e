package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{EntityIndexBuilder, EntityIndexConfig, IndexStats}
import graft.parse.{Kg, ParseKit}
import graft.sources.TsvLoader

/** S2–S4: file → header assert → positional parse → cascade, end to end from
  * a real TSV on disk, plus the S9 coverage stats.
  */
class TsvLoaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def writeTsv(lines: Seq[String]): String = {
    val f = Files.createTempFile("graft-tsv", ".tsv")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("entity TSV: header arity, seq stability, malformed-row rejection") {
    val path = writeTsv(Seq(
      "ent\tent_name\tent_description\tlinks\ttypes\taliases",
      "<http://www.wikidata.org/entity/Q1>\t\"Paris\"@en\t\"city in France\"@en\t500\t\t\"City of Light\"",
      "garbage line without tabs enough", // rejected by parse (arity pad → no id)
      "<http://www.wikidata.org/entity/Q2>\t\"Paris\"@en\t\"city in Texas\"@en\t20\t\t"))
    val raw = TsvLoader.loadEntities(spark, path)
    assert(raw.count() == 3)
    val parsed = ParseKit.parseEntities(raw, Kg.Wikidata, ignoreTypes = true)
    val rows = parsed.orderBy("seq").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("qid").endsWith("Q1") && rows(0).getAs[Long]("seq") == 0)
    assert(rows(1).getAs[String]("qid").endsWith("Q2") && rows(1).getAs[Long]("seq") == 2)

    // qid normalization + cascade + stats end-to-end
    val ents = parsed.selectExpr(
      "regexp_extract(qid, 'Q\\\\d+', 0) AS qid", "label", "desc", "count",
      "types", "aliases", "seq")
    val idx = EntityIndexBuilder.build(ents, EntityIndexConfig(ignoreTypes = true))
    val stats = IndexStats.entityStats(spark, idx, ents)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(stats("entities") == 2.0)
    assert(stats("final_index_coverage_pct") == 100.0)
  }

  test("wrong header arity fails fast") {
    val path = writeTsv(Seq("a\tb\tc", "x\ty\tz"))
    val e = intercept[IllegalArgumentException] {
      TsvLoader.loadEntities(spark, path)
    }
    assert(e.getMessage.contains("expected 6"))
  }

  test("DumpQueries: SPARQL dump aggregations over an (s,p,o) triple table") {
    import spark.implicits._
    import graft.sources.DumpQueries
    val t = Seq(
      ("Q1", "rdfs:label", "alpha"),
      ("Q1", "skos:altLabel", "beta"), ("Q1", "skos:altLabel", "al"),
      ("Q1", "skos:altLabel", "beta"), // DISTINCT
      ("Q1", "wikibase:sitelinks", "42"),
      ("Q2", "rdfs:label", "gamma"), // no aliases/links/desc → '' / 0
      ("Q1", "schema:description", "a thing"),
      ("P5", "rdfs:label", "rel"),
      ("Q1", "P5", "Q2"), ("Q2", "P5", "Q1"), // two usages of P5
      ("P5", "wdt:P1696", "P6"),
      ("R9", "owl:sameAs", "Q1"), ("R8", "owl:sameAs", "Q1"))
      .toDF("s", "p", "o")
    val ents = DumpQueries.entityDump(t).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getLong(3), r.getString(5))))
      .toMap
    assert(ents("Q1") == (("alpha", "a thing", 42L, "al; beta")))
    assert(ents("Q2") == (("gamma", "", 0L, "")))
    val props = DumpQueries.propertyDump(t).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getString(4))))
      .toMap
    assert(props("P5") == (("rel", 2L, "P6")))
    // mixed entity+property table (ADVICE r03): unfiltered, every labeled
    // subject renders as a property row — the documented property-only-input
    // contract; the subject filter restores the reference's
    // `wikibase:directClaim`-restricted shape
    assert(props.keySet == Set("Q1", "Q2", "P5"))
    import spark.implicits._
    val onlyProps = DumpQueries.propertyDump(t, Some(Seq("P5").toDF("pid")))
      .collect().map(_.getString(0)).toSet
    assert(onlyProps == Set("P5"))
    // bookkeeping predicates don't count as usages: a self-described
    // rdfs:label subject must show usage 0, not the corpus's label count
    val selfDesc = t.union(Seq(("rdfs:label", "rdfs:label", "label")).toDF("s", "p", "o"))
    val props2 = DumpQueries.propertyDump(selfDesc).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(props2("rdfs:label") == 0L,
      s"schema predicates must not count as usages: ${props2("rdfs:label")}")
    assert(props2("P5") == 2L)
    val reds = DumpQueries.redirectDump(t).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(reds.toSeq == Seq(("Q1", "R8; R9")))
  }

  test("redirect file parse mirrors kg-entities.rs:63-93") {
    val path = writeTsv(Seq(
      "<http://www.wikidata.org/entity/Q1>\t<http://www.wikidata.org/entity/Q7>; <http://www.wikidata.org/entity/Q9>",
      "not-an-iri\t<http://www.wikidata.org/entity/Q5>",
      "<http://www.wikidata.org/entity/Q3>\t"))
    val r = TsvLoader.loadRedirects(spark, path, Kg.Wikidata.entPattern)
      .collect().map(x => (x.getString(0), x.getSeq[String](1)))
    assert(r.length == 1)
    assert(r(0)._1.endsWith("Q1") && r(0)._2.map(_.takeRight(2)) == Seq("Q7", "Q9"))
  }
}
