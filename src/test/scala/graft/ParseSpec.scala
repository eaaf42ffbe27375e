package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.{Kg, ParseKit}

/** P1–P11 parse/format layer vs the reference's edge cases
  * (`/root/reference/src/lib.rs:162-326`): quoted alias lists, (ontology) /
  * freebase-domain decoration, empty desc, malformed rows silently dropped.
  */
class ParseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entity dump parse: ids, labels, multi-value cols, rejects") {
    import spark.implicits._
    val raw = Seq(
      // (ent, ent_name, ent_description, links, types, aliases, seq)
      ("<http://www.wikidata.org/entity/Q42>", "\"Douglas Adams\"@en", "\"author\"@en",
        "123", "<http://www.wikidata.org/entity/Q5>; <http://www.wikidata.org/entity/Q36180>",
        "\"DNA; Adams, Douglas\"", 0L),
      ("<http://www.wikidata.org/entity/Q1>", "\"universe\"@en", "bad-desc",
        "9", "", "", 1L),
      // malformed: no Q-id match → dropped (kg-entities.rs:120-122)
      ("<http://example.org/thing/X1>", "\"x\"@en", "", "5", "", "", 2L),
      // malformed count → dropped (lib.rs:273)
      ("<http://www.wikidata.org/entity/Q7>", "\"seven\"@en", "", "NaNish", "", "", 3L))
      .toDF("ent", "ent_name", "ent_description", "links", "types", "aliases", "seq")
    val got = ParseKit.parseEntities(raw, Kg.Wikidata, ignoreTypes = false)
      .orderBy("seq").collect()
    assert(got.length == 2)
    val q42 = got(0)
    assert(q42.getString(0) == "http://www.wikidata.org/entity/Q42")
    assert(q42.getString(1) == "Douglas Adams")
    assert(q42.getString(2) == "author")
    assert(q42.getLong(3) == 123L)
    assert(q42.getSeq[String](4) == Seq(
      "http://www.wikidata.org/entity/Q5", "http://www.wikidata.org/entity/Q36180"))
    assert(q42.getSeq[String](5) == Seq("DNA", "Adams, Douglas"))
    val q1 = got(1)
    assert(q1.getString(2) == "") // desc regex miss → "" (lib.rs:242-246)
    assert(q1.getSeq[String](4).isEmpty && q1.getSeq[String](5).isEmpty)
  }

  test("property label decoration per KG (P8, lib.rs:177-193)") {
    import spark.implicits._
    val df = Seq(("l", "ontology/birthPlace"), ("l", "property/birthPlace"))
      .toDF("label", "pid_short")
    val dbp = df.select(
      ParseKit.decoratePropertyLabel(Kg.DBpedia, col("label"), col("pid_short")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(dbp == Seq("l (ontology)", "l"))
    val fb = Seq(("born", "people.person.date_of_birth"))
      .toDF("label", "pid_short")
      .select(ParseKit.decoratePropertyLabel(Kg.Freebase, col("label"), col("pid_short")).as("x"))
      .collect().head.getString(0)
    assert(fb == "born (person)")
    val fb2 = Seq(("x", "base.some_domain.prop_name"))
      .toDF("label", "pid_short")
      .select(ParseKit.decoratePropertyLabel(Kg.Freebase, col("label"), col("pid_short")).as("x"))
      .collect().head.getString(0)
    assert(fb2 == "x (some domain)")
  }

  test("short formatting (P10, lib.rs:281-374)") {
    import spark.implicits._
    val e = Seq("http://www.wikidata.org/entity/Q42").toDF("iri")
      .select(ParseKit.formatEntityShort(Kg.Wikidata, col("iri")).as("x"))
      .collect().head.getString(0)
    assert(e == "wd:Q42")
    val p = Seq("http://www.wikidata.org/entity/P31").toDF("iri")
      .select(ParseKit.formatPropertyShort(Kg.Wikidata, col("iri")).as("x"))
      .collect().head.getString(0)
    assert(p == "wdt:P31")
    val dbo = Seq("http://dbpedia.org/ontology/birthPlace").toDF("iri")
      .select(ParseKit.formatPropertyShort(Kg.DBpedia, col("iri")).as("x"))
      .collect().head.getString(0)
    assert(dbo == "dbo:birthPlace")
    val dbpp = Seq("http://dbpedia.org/property/born").toDF("iri")
      .select(ParseKit.formatPropertyShort(Kg.DBpedia, col("iri")).as("x"))
      .collect().head.getString(0)
    assert(dbpp == "dbp:born")
  }

  test("wikidata qualifier variants (P11, lib.rs:377-405)") {
    import spark.implicits._
    val got = Seq("spouse").toDF("label")
      .select(explode(ParseKit.wikidataQualifierVariants(col("label"))).as("q"))
      .select("q.surface", "q.pfx")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("spouse (statement)", "p"), ("spouse (qualifier)", "pq"),
      ("spouse (normalized qualifier)", "pqn"), ("spouse (value)", "ps"),
      ("spouse (normalized value)", "psn")))
  }
}
