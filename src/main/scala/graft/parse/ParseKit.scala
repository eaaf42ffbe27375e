package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Knowledge-graph flavor. Mirrors the reference's `KnowledgeGraph` enum and
  * its per-KG regex patterns (`/root/reference/src/lib.rs:112-158`) — public
  * IRI layouts of Wikidata / Freebase / DBpedia.
  */
sealed trait Kg {
  def name: String
  /** entity IRI pattern; group 1 = full captured IRI tail, group 2 = short id */
  def entPattern: String
  def propPattern: String
  def entShortPrefix: String
  def entityPrefixes: Seq[(String, String)]
  def propertyPrefixes: Seq[(String, String)]
}
object Kg {
  case object Wikidata extends Kg {
    val name = "wikidata"
    val entPattern = """<?(http://www\.wikidata\.org/entity/(Q\d+))>?"""
    val propPattern = """<?(http://www\.wikidata\.org/entity/(P\d+))>?"""
    val entShortPrefix = "wd"
    val entityPrefixes = Seq("wd:" -> "http://www.wikidata.org/entity/")
    val propertyPrefixes = Seq(
      "wdt:" -> "http://www.wikidata.org/prop/direct/",
      "p:" -> "http://www.wikidata.org/prop/",
      "pq:" -> "http://www.wikidata.org/prop/qualifier/",
      "pqn:" -> "http://www.wikidata.org/prop/qualifier/value-normalized/",
      "ps:" -> "http://www.wikidata.org/prop/statement/",
      "psn:" -> "http://www.wikidata.org/prop/statement/value-normalized/")
  }
  case object Freebase extends Kg {
    val name = "freebase"
    val entPattern = """<?(http://rdf\.freebase\.com/ns/(m\..+))>?"""
    val propPattern = """<?(http://rdf\.freebase\.com/ns/(.+))>?"""
    val entShortPrefix = "fb"
    val entityPrefixes = Seq("fb:" -> "http://rdf.freebase.com/ns/")
    val propertyPrefixes = Seq("fbp:" -> "http://rdf.freebase.com/ns/property.")
  }
  case object DBpedia extends Kg {
    val name = "dbpedia"
    val entPattern = """<?(http://dbpedia\.org/resource/(.+))>?"""
    val propPattern = """<?(http://dbpedia\.org/(property|ontology)/(.+))>?"""
    val entShortPrefix = "dbr"
    val entityPrefixes = Seq("dbr:" -> "http://dbpedia.org/resource/")
    val propertyPrefixes = Seq(
      "dbp:" -> "http://dbpedia.org/property/",
      "dbo:" -> "http://dbpedia.org/ontology/")
  }
  val all: Seq[Kg] = Seq(Wikidata, Freebase, DBpedia)
}

/** P1–P11 (SURVEY.md §2.2) as `Column`-returning functions — every parse step
  * of the reference's `parse_entity` / `parse_property`
  * (`/root/reference/src/lib.rs:162-279`) re-expressed as codegen'd Catalyst
  * expressions. No UDFs: `regexp_extract` / `split` / higher-order array
  * functions keep the whole parse inside WholeStageCodegen.
  */
object ParseKit {

  /** The label pattern `^"(.*)"@en$` (`lib.rs:146`). */
  val labelPattern = "^\"(.*)\"@en$"

  /** P2/P3: extract short id (`Q42`, `P31`, `m.x`, resource tail) from an IRI
    * column; empty string when no match (callers filter, mirroring the
    * silent-skip at `kg-entities.rs:120-122`).
    */
  def extractId(c: Column, pattern: String, group: Int = 1): Column =
    regexp_extract(c, pattern, group)

  /** P4: `"label"@en` → trimmed label; empty when no match. */
  def extractLabel(c: Column): Column = trim(regexp_extract(c, labelPattern, 1))

  /** P5: optional description — parse failure yields "" (`lib.rs:242-246`). */
  def extractDesc(c: Column): Column = extractLabel(c)

  /** P6: `;`-separated multi-value column with optional surrounding quotes.
    * Mirrors `trim_start_matches('"')…split_terminator(';')…map(str::trim)`
    * (`lib.rs:194-199`, `lib.rs:258-267`). `split_terminator` drops a trailing
    * empty piece; we drop ALL empty pieces (superset, same observable result
    * after trim for well-formed dumps).
    */
  def splitMultiValue(c: Column, sep: String = ";"): Column =
    filter(
      transform(split(regexp_replace(c, "^\"|\"$", ""), sep), x => trim(x)),
      x => length(x) > 0)

  /** P6 variant for id-bearing multi-value columns (types, inverses,
    * redirects): each piece is regex-captured and non-matching pieces are
    * dropped (`lib.rs:200-212`, `lib.rs:247-257`).
    */
  def splitIds(c: Column, pattern: String, sep: String = ";"): Column =
    filter(
      transform(splitMultiValue(c, sep), x => regexp_extract(x, pattern, 1)),
      x => length(x) > 0)

  /** P8: KG-specific label decoration (`lib.rs:177-193`), BYTE-PARITY with
    * the reference: the reference tests/splits `prop` = the group-1 capture,
    * which is the FULL IRI, so
    *  - DBpedia: `starts_with("ontology")` on "http://dbpedia.org/…" is
    *    always false — DBpedia labels are NEVER decorated (an upstream quirk
    *    we reproduce rather than "fix"; a semantic fix would test the path
    *    segment);
    *  - Freebase: the penultimate '.'-segment OF THE FULL IRI with `_`→' ' —
    *    e.g. `…/ns/people.person.nationality` → "(person)" but the 2-segment
    *    `…/ns/people.person` → "(com/ns/people)" (same quirk as the Rust).
    * `propIri` must be the group-1 capture (the full IRI).
    */
  def decoratePropertyLabel(kg: Kg, label: Column, propIri: Column): Column = kg match {
    case Kg.Wikidata => label
    case Kg.DBpedia =>
      when(propIri.startsWith("ontology"), concat(label, lit(" (ontology)")))
        .otherwise(label)
    case Kg.Freebase =>
      // penultimate '.'-segment of the full IRI, '_' → ' '  (lib.rs:186-192)
      concat(
        label,
        lit(" ("),
        regexp_replace(element_at(split(propIri, "\\."), -2), "_", " "),
        lit(")"))
  }

  /** P10: entity formatting (`format_entity`, `lib.rs:360-374`): short →
    * `wd:Q42` / `fb:m.x` / `dbr:X`; long → the IRI unchanged (the reference
    * returns the input string before even matching).
    */
  def formatEntity(kg: Kg, entIri: Column, short: Boolean = true): Column =
    if (!short) entIri
    else concat(lit(kg.entShortPrefix + ":"), regexp_extract(entIri, kg.entPattern, 2))

  /** Backward-compatible alias of [[formatEntity]] short form. */
  def formatEntityShort(kg: Kg, entIri: Column): Column = formatEntity(kg, entIri)

  /** P10: property formatting (`format_property`, `lib.rs:281-326`), both
    * branches. `pfx` may be a per-row column (nulls fall back to the
    * reference defaults — `coalesce` mirrors Rust's `unwrap_or`).
    * DBpedia long form reproduces the reference byte-for-byte including its
    * missing separator: `"http://dbpedia.org/" + p_type` concatenated
    * directly with the name (`lib.rs:316-322` has no '/' between them).
    */
  def formatProperty(kg: Kg, propIri: Column, short: Boolean,
      pfx: Option[Column] = None): Column = {
    def orDefault(d: String): Column = pfx.map(c => coalesce(c, lit(d))).getOrElse(lit(d))
    val g2 = regexp_extract(propIri, kg.propPattern, 2)
    kg match {
      case Kg.Wikidata =>
        if (short) concat(orDefault("wdt"), lit(":"), g2)
        else concat(orDefault("http://www.wikidata.org/prop/direct/"), g2)
      case Kg.Freebase =>
        if (short) concat(orDefault("fb"), lit(":"), g2)
        else concat(orDefault("http://rdf.freebase.com/ns/"), g2)
      case Kg.DBpedia =>
        val g3 = regexp_extract(propIri, kg.propPattern, 3)
        if (short) // pfx is IGNORED in the reference's short dbpedia branch
          concat(when(g2 === "ontology", lit("dbo:")).otherwise(lit("dbp:")), g3)
        else
          concat(pfx.map(c => coalesce(c, concat(lit("http://dbpedia.org/"), g2)))
            .getOrElse(concat(lit("http://dbpedia.org/"), g2)), g3)
    }
  }

  /** Backward-compatible short-form property formatting. */
  def formatPropertyShort(kg: Kg, propIri: Column, pfx: Option[String] = None): Column =
    formatProperty(kg, propIri, short = true, pfx.map(lit(_)))

  /** P11: the 5 Wikidata qualifier variants of a property label
    * (`wikidata_qualifiers`, `lib.rs:377-405`). Returns an array<struct> to
    * `explode` — a pure built-in generate, no custom Generator needed.
    * `pfx` is the short prefix, `pfx_long` the full IRI prefix (the reference
    * returns both and the output keys on one or the other per
    * `--short-properties`, `kg-properties.rs:146-152`).
    */
  def wikidataQualifierVariants(label: Column): Column = {
    def v(suffix: String, short: String, long: String) =
      struct(concat(label, lit(s" ($suffix)")).as("surface"),
        lit(short).as("pfx"), lit(long).as("pfx_long"))
    array(
      v("statement", "p", "http://www.wikidata.org/prop/"),
      v("qualifier", "pq", "http://www.wikidata.org/prop/qualifier/"),
      v("normalized qualifier", "pqn", "http://www.wikidata.org/prop/qualifier/value-normalized/"),
      v("value", "ps", "http://www.wikidata.org/prop/statement/"),
      v("normalized value", "psn", "http://www.wikidata.org/prop/statement/value-normalized/"))
  }

  /** Parse a raw entity-dump DataFrame (6 TSV-shaped string columns
    * `ent, ent_name, ent_description, links, types, aliases`) into the
    * canonical entity schema. Malformed rows (no id / label / count) are
    * filtered out, mirroring the reference's silent skip (`kg-entities.rs:120`)
    * — callers can diff counts for a rejects metric.
    */
  private val emptyArr = array().cast("array<string>")

  def parseEntities(raw: DataFrame, kg: Kg, ignoreTypes: Boolean): DataFrame = {
    // reference allows 2..6 cols (`lib.rs:231`): desc/types/aliases optional.
    val parsed = raw
      .withColumn("qid", extractId(col("ent"), kg.entPattern))
      .withColumn("label", extractLabel(col("ent_name")))
      .withColumn("desc", coalesce(extractDesc(col("ent_description")), lit("")))
      // ANSI-safe: parse failure → null → row filtered (lib.rs:273 `?`)
      .withColumn("count", expr("try_cast(links AS BIGINT)"))
      .withColumn(
        "types",
        if (ignoreTypes) emptyArr
        else coalesce(splitIds(col("types"), kg.entPattern), emptyArr))
      .withColumn("aliases", coalesce(splitMultiValue(col("aliases")), emptyArr))
    parsed
      .filter(length(col("qid")) > 0 && length(col("label")) > 0 && col("count").isNotNull)
      .select("qid", "label", "desc", "count", "types", "aliases", "seq")
  }

  /** Parse a raw property-dump DataFrame (5 string columns
    * `p, p_label, p_count, p_aliases, p_invs`) into the canonical property
    * schema, applying P8 decoration.
    */
  def parseProperties(raw: DataFrame, kg: Kg): DataFrame = {
    val parsed = raw
      .withColumn("pid", regexp_extract(col("p"), kg.propPattern, 1))
      .withColumn("label0", extractLabel(col("p_label")))
      .withColumn("count", expr("try_cast(p_count AS BIGINT)"))
      .withColumn("aliases", coalesce(splitMultiValue(col("p_aliases")), emptyArr))
      .withColumn("inverses", coalesce(splitIds(col("p_invs"), kg.propPattern), emptyArr))
      // decoration keys off the group-1 FULL IRI, exactly like parse_property
      // (lib.rs:177-193) — see decoratePropertyLabel for the quirks this keeps
      .withColumn("label", decoratePropertyLabel(kg, col("label0"), col("pid")))
    parsed
      .filter(length(col("pid")) > 0 && length(col("label0")) > 0 && col("count").isNotNull)
      .select("pid", "label", "count", "aliases", "inverses", "seq")
  }
}
