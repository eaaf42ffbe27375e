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

  test("property label decoration per KG (P8, lib.rs:177-193) — full-IRI parity") {
    import spark.implicits._
    // the reference tests group 1 (the FULL IRI) with starts_with("ontology"),
    // which never matches — DBpedia labels are NEVER decorated (quirk kept)
    val df = Seq(("l", "http://dbpedia.org/ontology/birthPlace"),
      ("l", "http://dbpedia.org/property/birthPlace"))
      .toDF("label", "iri")
    val dbp = df.select(
      ParseKit.decoratePropertyLabel(Kg.DBpedia, col("label"), col("iri")).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(dbp == Seq("l", "l"))
    // freebase: penultimate '.'-segment of the FULL IRI
    val fb = Seq(("born", "http://rdf.freebase.com/ns/people.person.date_of_birth"))
      .toDF("label", "iri")
      .select(ParseKit.decoratePropertyLabel(Kg.Freebase, col("label"), col("iri")).as("x"))
      .collect().head.getString(0)
    assert(fb == "born (person)")
    val fb2 = Seq(("x", "http://rdf.freebase.com/ns/base.some_domain.prop_name"))
      .toDF("label", "iri")
      .select(ParseKit.decoratePropertyLabel(Kg.Freebase, col("label"), col("iri")).as("x"))
      .collect().head.getString(0)
    assert(fb2 == "x (some domain)")
    // the reference's 2-segment quirk: the domain comes out as "com/ns/people"
    val fb3 = Seq(("y", "http://rdf.freebase.com/ns/people.person"))
      .toDF("label", "iri")
      .select(ParseKit.decoratePropertyLabel(Kg.Freebase, col("label"), col("iri")).as("x"))
      .collect().head.getString(0)
    assert(fb3 == "y (com/ns/people)")
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

  test("long-form formatting (P10, lib.rs:281-326 short=false)") {
    import spark.implicits._
    def one(df: org.apache.spark.sql.DataFrame): String = df.collect().head.getString(0)
    // entity long form = identity (the reference returns the input unchanged)
    val e = Seq("http://www.wikidata.org/entity/Q42").toDF("iri")
    assert(one(e.select(ParseKit.formatEntity(Kg.Wikidata, col("iri"), short = false)
      .as("x"))) == "http://www.wikidata.org/entity/Q42")
    // wikidata long: default prefix is the DIRECT prop namespace
    val p = Seq("http://www.wikidata.org/entity/P31").toDF("iri")
    assert(one(p.select(ParseKit.formatProperty(Kg.Wikidata, col("iri"), short = false)
      .as("x"))) == "http://www.wikidata.org/prop/direct/P31")
    // custom prefix column (the qualifier path)
    assert(one(p.select(ParseKit.formatProperty(Kg.Wikidata, col("iri"), short = false,
      Some(lit("http://www.wikidata.org/prop/qualifier/")))
      .as("x"))) == "http://www.wikidata.org/prop/qualifier/P31")
    // null prefix in the column falls back to the default (Rust unwrap_or)
    assert(one(p.select(ParseKit.formatProperty(Kg.Wikidata, col("iri"), short = false,
      Some(lit(null: String)))
      .as("x"))) == "http://www.wikidata.org/prop/direct/P31")
    val fb = Seq("http://rdf.freebase.com/ns/people.person").toDF("iri")
    assert(one(fb.select(ParseKit.formatProperty(Kg.Freebase, col("iri"), short = false)
      .as("x"))) == "http://rdf.freebase.com/ns/people.person")
    // dbpedia long form keeps the reference's missing-separator quirk
    val db = Seq("http://dbpedia.org/ontology/birthPlace").toDF("iri")
    assert(one(db.select(ParseKit.formatProperty(Kg.DBpedia, col("iri"), short = false)
      .as("x"))) == "http://dbpedia.org/ontologybirthPlace")
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
