package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in SparkEntry.queries.
  * Each statement runs against the same parquet tables (registered by stem
  * name) and must reproduce the Spark output exactly: same column names,
  * integer/exact-decimal arithmetic only (no float aggregation), identical
  * tie-breaks. Validated against duckdb 1.0.
  */
object Oracles {

  /** Shared k-means training CTEs over the `vec_id % mod = 0` embedding
    * subset — mirrors `Similarity.lloydAssign` step-for-step (hash-ordered
    * seeding, 2 truncated-mean Lloyd rounds), ending in the nearest-1
    * assignment `fin(vec_id, cid, …)` and `fa` (assignment joined back to
    * the quantized vectors). Appended to by `embed_kmeans` and
    * `semantic_dedup`; `ann_ivf_topk` keeps its historical inline copy
    * (different subset + a probe>1 tail).
    */
  private def kmeansCtes(mod: Int): String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
       |  FROM embeddings WHERE vec_id % $mod = 0),
       |n0 AS (SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
       |       FROM v),
       |n AS (SELECT * FROM n0 WHERE n2 > 0),
       |k AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS nc FROM n),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY
       |           (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |              list_transform(list_filter(string_split(CAST(vec_id AS VARCHAR), ''), c -> c <> ''),
       |                c -> CAST(ascii(c) AS BIGINT))),
       |              (acc, x) -> (acc * 31 + x) % 1000000007) * 1000003 + 12345) % 1000000007,
       |           vec_id) AS cid,
       |         q AS s
       |  FROM n QUALIFY cid <= (SELECT nc FROM k)),
       |cn0 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c0),
       |a1 AS (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
       |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
       |  FROM n JOIN cn0 c ON c.s2 > 0 QUALIFY rn = 1),
       |c1 AS (
       |  SELECT cid, list(sm ORDER BY i) AS s FROM (
       |    SELECT a1.cid, t.i, CAST(sum(n.q[t.i]) // count(*) AS BIGINT) AS sm
       |    FROM a1 JOIN n USING (vec_id), unnest(range(1, len(n.q)+1)) AS t(i)
       |    GROUP BY a1.cid, t.i)
       |  GROUP BY cid),
       |cn1 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c1),
       |a2 AS (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
       |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
       |  FROM n JOIN cn1 c ON c.s2 > 0 QUALIFY rn = 1),
       |c2 AS (
       |  SELECT cid, list(sm ORDER BY i) AS s FROM (
       |    SELECT a2.cid, t.i, CAST(sum(n.q[t.i]) // count(*) AS BIGINT) AS sm
       |    FROM a2 JOIN n USING (vec_id), unnest(range(1, len(n.q)+1)) AS t(i)
       |    GROUP BY a2.cid, t.i)
       |  GROUP BY cid),
       |cn2 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c2),
       |fin AS (
       |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
       |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
       |  FROM n JOIN cn2 c ON c.s2 > 0 QUALIFY rn = 1),
       |fa AS (SELECT fin.vec_id, fin.cid, n.q, n.n2 FROM fin JOIN n USING (vec_id))""".stripMargin

  val all: Map[String, String] = Map(

    // trained k-means corpus clustering: identical training to the IVF
    // index (seeding + 2 truncated-mean Lloyd rounds), nearest-1 output
    "embed_kmeans" ->
      (kmeansCtes(5) +
        "\nSELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM fin"),

    // SemDeDup: exact-cosine near-dup pairs WITHIN trained k-means
    // clusters; a vector is dropped when a smaller-id cluster-mate sits
    // above the cosine threshold (fixed IEEE-double comparison, identical
    // expression tree in Spark and here)
    "semantic_dedup" ->
      (kmeansCtes(5) +
        """,
          |pr AS (
          |  SELECT y.vec_id AS b_id,
          |    CAST(list_sum(list_transform(range(1, len(x.q)+1), i -> x.q[i]*y.q[i])) AS BIGINT) AS d,
          |    x.n2 AS na2, y.n2 AS nb2
          |  FROM fa x JOIN fa y ON x.cid = y.cid AND x.vec_id < y.vec_id),
          |drp AS (
          |  SELECT DISTINCT b_id AS vec_id FROM pr
          |  WHERE d >= 0 AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE) * 10000.0 >=
          |    900.0 * CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
          |SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cluster,
          |       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
          |FROM fin f LEFT JOIN drp d USING (vec_id)""".stripMargin),

    // SemDeDup with the maxCluster=15 rail BINDING at verify scale: a
    // cluster above the cap never enters the pair phase (its members all
    // keep=1) — the cap is the plain HAVING-style size window below,
    // byte-identical semantics to Similarity.semanticDedup(maxCluster=15)
    "semantic_dedup_capped" ->
      (kmeansCtes(5) +
        """,
          |csz AS (SELECT cid, count(*) AS n FROM fin GROUP BY cid),
          |pr AS (
          |  SELECT y.vec_id AS b_id,
          |    CAST(list_sum(list_transform(range(1, len(x.q)+1), i -> x.q[i]*y.q[i])) AS BIGINT) AS d,
          |    x.n2 AS na2, y.n2 AS nb2
          |  FROM fa x JOIN fa y ON x.cid = y.cid AND x.vec_id < y.vec_id
          |  JOIN csz ON csz.cid = x.cid AND csz.n <= 15),
          |drp AS (
          |  SELECT DISTINCT b_id AS vec_id FROM pr
          |  WHERE d >= 0 AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE) * 10000.0 >=
          |    900.0 * CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
          |SELECT f.vec_id, CAST(f.cid AS BIGINT) AS cluster,
          |       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
          |FROM fin f LEFT JOIN drp d USING (vec_id)""".stripMargin),

    "a1_group_label" ->
      """SELECT p_name AS surface, count(*) AS n_ents, min(p_partkey) AS min_id
        |FROM part GROUP BY p_name""".stripMargin,

    "a2_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY token""".stripMargin,

    "a4_rare_surfaces" ->
      """SELECT token, count(*) AS n, min(p_partkey) AS min_id
        |FROM (SELECT unnest(string_split(p_name || ' tok' || (p_partkey // 3), ' ')) AS token, p_partkey FROM part)
        |GROUP BY token HAVING count(*) <= 3""".stripMargin,

    "a5_max_count_dedup" ->
      """SELECT p_type, p_partkey FROM (
        |  SELECT p_type, p_partkey,
        |         row_number() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) WHERE rn = 1""".stripMargin,

    "a8_invert_index" ->
      """SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name""".stripMargin,

    "j1_left_join_enrich" ->
      """SELECT n_name, count(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS acctbal_cents
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin,

    "j2_two_hop" ->
      """SELECT r_name, count(*) AS n_suppliers, count(DISTINCT n_nationkey) AS n_nations
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""".stripMargin,

    "j3_popularity_demote" ->
      """SELECT p_brand,
        |       CAST(SUM(CASE WHEN l_extendedprice > p_retailprice * 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_demoted,
        |       count(*) AS n_total
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand""".stripMargin,

    "e1_unique_labels" ->
      """SELECT p_name || ' v' || (p_partkey % 997) AS surface, min(p_partkey) AS id
        |FROM part GROUP BY 1 HAVING count(*) = 1""".stripMargin,

    "e5_anti_join_vacancy" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)""".stripMargin,

    "semi_join_active" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin,

    "o2_window_top1" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "salted_agg_equiv" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id""".stripMargin,

    "sessionize_events" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(SUM(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM (SELECT user_id, ts,
        |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |      FROM events) GROUP BY user_id""".stripMargin,

    "turns_stable_order" ->
      """SELECT 'u' || user_id AS conv_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
        |       event_type AS text
        |FROM events""".stripMargin,

    "p11_qualifier_explode" ->
      """SELECT p_brand, p_brand || ' (' || q.kind_label || ')' AS surface, q.pfx
        |FROM (SELECT DISTINCT p_brand FROM part)
        |CROSS JOIN (VALUES ('statement','p'), ('qualifier','pq'),
        |  ('normalized qualifier','pqn'), ('value','ps'), ('normalized value','psn'))
        |  AS q(kind_label, pfx)""".stripMargin,

    "p2_regex_parse" ->
      """SELECT regexp_extract('<http://www.wikidata.org/entity/Q' || s_suppkey || '>',
        |         '<?(http://www\.wikidata\.org/entity/(Q\d+))>?', 2) AS qid,
        |       trim(regexp_extract('"label ' || s_suppkey || '"@en', '^"(.*)"@en$', 1)) AS label
        |FROM supplier""".stripMargin,

    "cc_components" ->
      """WITH RECURSIVE base AS (
        |  SELECT printf('N%06d', c_custkey) AS u, printf('N%06d', c_custkey - 1) AS v
        |  FROM customer WHERE c_custkey % 10 <> 0),
        |e AS (SELECT u, v FROM base UNION SELECT v, u FROM base),
        |nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e),
        |reach(a, b) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u)
        |SELECT a AS node, min(b) AS canonical_id FROM reach GROUP BY a""".stripMargin,

    // ---- KG cascade / mention / triple oracles on derived dictionaries ----

    // S1: the reference's SPARQL dump aggregation (GROUP_CONCAT DISTINCT with
    // "; ", fixed to sorted order on both sides) over an RDF-shaped table
    "s1_dump_agg" ->
      """WITH t AS (
        |  SELECT 'Q'||p_partkey AS s, 'rdfs:label' AS p, p_name AS o FROM part
        |  UNION ALL SELECT 'Q'||p_partkey, 'schema:description', p_type
        |    FROM part WHERE p_partkey % 10 <> 9
        |  UNION ALL SELECT 'Q'||p_partkey, 'wikibase:sitelinks', CAST(p_size AS VARCHAR) FROM part
        |  UNION ALL SELECT 'Q'||p_partkey, 'skos:altLabel', p_brand FROM part
        |  UNION ALL SELECT 'Q'||p_partkey, 'skos:altLabel', string_split(p_name, ' ')[1] FROM part
        |  UNION ALL SELECT 'Q'||p_partkey, 'wdt:P31', 'T'||(p_partkey % 7) FROM part),
        |labels AS (SELECT s AS qid, o AS label FROM t WHERE p = 'rdfs:label'),
        |descs AS (SELECT s AS qid, min(o) AS d FROM t WHERE p = 'schema:description' GROUP BY s),
        |links AS (SELECT s AS qid, max(CAST(o AS BIGINT)) AS cnt FROM t WHERE p = 'wikibase:sitelinks' GROUP BY s),
        |ty AS (SELECT s AS qid, string_agg(DISTINCT o, '; ' ORDER BY o) AS types
        |       FROM t WHERE p = 'wdt:P31' GROUP BY s),
        |al AS (SELECT s AS qid, string_agg(DISTINCT o, '; ' ORDER BY o) AS aliases
        |       FROM t WHERE p = 'skos:altLabel' GROUP BY s)
        |SELECT l.qid, l.label, COALESCE(d.d, '') AS "desc", COALESCE(k.cnt, 0) AS count,
        |       COALESCE(ty.types, '') AS types, COALESCE(al.aliases, '') AS aliases
        |FROM labels l LEFT JOIN descs d USING (qid) LEFT JOIN links k USING (qid)
        |LEFT JOIN ty USING (qid) LEFT JOIN al USING (qid)""".stripMargin,

    "kg_entity_index" ->
      """WITH ents AS (
        |  SELECT 'Q' || p_partkey AS qid, p_name AS label, p_type AS info,
        |         CAST(p_size AS BIGINT) AS cnt, p_partkey AS seq,
        |         list_filter([p_brand,
        |           CASE WHEN p_partkey % 10 = 0 THEN 'uniq-' || p_partkey END,
        |           CASE WHEN p_partkey % 7 = 3 THEN string_split(p_name, ' ')[1] || ' rod' END],
        |           x -> x IS NOT NULL) AS aliases
        |  FROM part),
        |alias_occ AS (SELECT unnest(aliases) AS a_surface, qid AS a_qid, cnt AS a_count FROM ents),
        |uniq_alias AS (
        |  SELECT a_surface, min(a_qid) AS a_qid, min(a_count) AS a_count
        |  FROM alias_occ GROUP BY a_surface HAVING count(*) <= 1),
        |cand AS (
        |  SELECT e.*, count(*) OVER (PARTITION BY e.label) AS grp_n,
        |         COALESCE(u.a_qid IS NOT NULL AND u.a_qid <> e.qid AND u.a_count > e.cnt, FALSE) AS ovr
        |  FROM ents e LEFT JOIN uniq_alias u ON e.label = u.a_surface),
        |e1 AS (SELECT label AS surface, qid AS id FROM cand WHERE grp_n = 1 AND NOT ovr),
        |e2 AS (
        |  SELECT c.* FROM cand c
        |  WHERE (grp_n > 1 OR ovr) AND info <> ''
        |    AND NOT EXISTS (SELECT 1 FROM e1 WHERE e1.surface = c.label || ' (' || c.info || ')')),
        |reps AS (
        |  SELECT *, count(*) OVER (PARTITION BY label, info) AS g_size,
        |         max(cnt) OVER (PARTITION BY label, info) AS g_max,
        |         row_number() OVER (PARTITION BY label, info ORDER BY cnt DESC, seq DESC) AS rn
        |  FROM e2),
        |e34 AS (
        |  SELECT *, SUM(CASE WHEN NOT ovr THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY label ORDER BY g_max DESC, g_size ASC, info ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_el
        |  FROM reps WHERE rn = 1),
        |e3_plain AS (SELECT label AS surface, qid AS id FROM e34 WHERE NOT ovr AND cum_el = 1),
        |e34_info AS (SELECT label AS surface, info, qid AS id FROM e34 WHERE NOT (NOT ovr AND cum_el = 1)),
        |taken_plain AS (SELECT surface FROM e1 UNION ALL SELECT surface FROM e3_plain),
        |alias_cand AS (SELECT qid, cnt, info, unnest(list_distinct(aliases)) AS alias FROM ents),
        |plain_round AS (
        |  SELECT ac.*, row_number() OVER (PARTITION BY alias ORDER BY cnt DESC, qid ASC) AS rn
        |  FROM alias_cand ac
        |  WHERE NOT EXISTS (SELECT 1 FROM taken_plain t WHERE t.surface = ac.alias)),
        |e5_plain AS (SELECT alias AS surface, qid AS id FROM plain_round WHERE rn = 1),
        |info_cand AS (
        |  SELECT ac.* FROM alias_cand ac
        |  WHERE NOT EXISTS (SELECT 1 FROM plain_round p
        |                    WHERE p.rn = 1 AND p.alias = ac.alias AND p.qid = ac.qid)
        |    AND ac.info <> ''
        |    AND NOT EXISTS (SELECT 1 FROM e34_info t
        |                    WHERE t.surface = ac.alias AND t.info = ac.info)),
        |e5_info AS (
        |  SELECT alias AS surface, info, qid AS id,
        |         row_number() OVER (PARTITION BY alias, info ORDER BY cnt DESC, qid ASC) AS rn
        |  FROM info_cand)
        |SELECT surface, '' AS info, id, 0 AS kind FROM e1
        |UNION ALL SELECT surface, '' AS info, id, 0 AS kind FROM e3_plain
        |UNION ALL SELECT surface, info, id, 1 AS kind FROM e34_info
        |UNION ALL SELECT surface, '' AS info, id, 2 AS kind FROM e5_plain
        |UNION ALL SELECT surface, info, id, 3 AS kind FROM e5_info WHERE rn = 1""".stripMargin,

    "kg_property_index" ->
      """WITH props AS (
        |  SELECT 'P' || s_suppkey AS pid, 'rel ' || (s_suppkey % 40) AS label,
        |         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cnt, s_suppkey AS seq,
        |         list_filter(['alias ' || (s_suppkey % 60),
        |           CASE WHEN s_suppkey % 5 = 0 THEN 'ualias ' || s_suppkey END],
        |           x -> x IS NOT NULL) AS aliases
        |  FROM supplier),
        |labels AS (
        |  SELECT label AS surface, pid, 0 AS kind FROM (
        |    SELECT *, row_number() OVER (PARTITION BY label ORDER BY cnt DESC, seq ASC) AS rn
        |    FROM props) WHERE rn = 1),
        |occ AS (SELECT unnest(aliases) AS surface, pid FROM props),
        |uniq AS (SELECT surface, min(pid) AS pid, 1 AS kind FROM occ
        |         GROUP BY surface HAVING count(*) = 1)
        |SELECT surface, pid, kind FROM labels
        |UNION ALL
        |SELECT surface, pid, kind FROM uniq u
        |WHERE NOT EXISTS (SELECT 1 FROM labels l WHERE l.surface = u.surface)""".stripMargin,

    "kg_mentions" ->
      """WITH corpus AS (
        |  SELECT p_brand AS brand, string_agg(p_name, ' ' ORDER BY p_partkey) AS text
        |  FROM part WHERE p_partkey % 10 = 0 GROUP BY p_brand),
        |dict AS (SELECT p_name AS surface, 'Q' || min(p_partkey) AS id FROM part GROUP BY p_name),
        |toks AS (
        |  SELECT brand, unnest(string_split(text, ' ')) AS tok,
        |         unnest(range(len(string_split(text, ' ')))) AS pos
        |  FROM corpus),
        |grams AS (
        |  SELECT brand, CAST(pos AS INT) AS s, CAST(pos + 1 AS INT) AS e, tok AS gram FROM toks
        |  UNION ALL
        |  SELECT t1.brand, CAST(t1.pos AS INT), CAST(t1.pos + 2 AS INT), t1.tok || ' ' || t2.tok
        |  FROM toks t1 JOIN toks t2 ON t1.brand = t2.brand AND t2.pos = t1.pos + 1),
        |matches AS (SELECT g.brand, g.s, g.e, d.id FROM grams g JOIN dict d ON g.gram = d.surface)
        |SELECT m.brand, m.s AS span_start, m.e AS span_end, m.id
        |FROM matches m
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM matches x
        |  WHERE x.brand = m.brand AND x.s < m.e AND m.s < x.e
        |    AND ((x.e - x.s) > (m.e - m.s) OR ((x.e - x.s) = (m.e - m.s) AND x.s < m.s)))""".stripMargin,

    "kg_triples" ->
      """WITH m AS (
        |  SELECT 'c' || (l_orderkey % 50) AS conv_id,
        |         CAST((l_orderkey // 50) % 20 AS INT) AS turn_idx,
        |         CAST(l_linenumber AS INT) AS s,
        |         CAST(l_linenumber + 1 AS INT) AS e,
        |         (l_linenumber % 3 = 0) AS is_prop,
        |         CASE WHEN l_linenumber % 3 = 0 THEN 'P' || l_suppkey
        |              ELSE 'Q' || l_partkey END AS id
        |  FROM lineitem),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN NOT is_prop THEN id END IGNORE NULLS)
        |      OVER (PARTITION BY conv_id ORDER BY turn_idx, s, e, id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS subj,
        |    first_value(CASE WHEN NOT is_prop THEN turn_idx END IGNORE NULLS)
        |      OVER (PARTITION BY conv_id ORDER BY turn_idx, s, e, id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_t,
        |    first_value(CASE WHEN NOT is_prop THEN id END IGNORE NULLS)
        |      OVER (PARTITION BY conv_id ORDER BY turn_idx, s, e, id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS obj_i
        |  FROM m)
        |SELECT subj, id AS pred, obj_i AS obj, conv_id, turn_idx
        |FROM w WHERE is_prop AND subj IS NOT NULL AND obj_i IS NOT NULL AND obj_t = turn_idx""".stripMargin,

    // ---- training-data ops ----

    "dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_jaccard_pairs" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
        |tok AS (SELECT DISTINCT id, token FROM (
        |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS token FROM docs)
        |  WHERE token <> ''),
        |sizes AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
        |inter AS (
        |  SELECT x.id AS a, y.id AS b, count(*) AS inter
        |  FROM tok x JOIN tok y ON x.token = y.token AND x.id < y.id
        |  GROUP BY x.id, y.id)
        |SELECT i.a, i.b, i.inter, sa.sz + sb.sz - i.inter AS uni
        |FROM inter i JOIN sizes sa ON i.a = sa.id JOIN sizes sb ON i.b = sb.id
        |WHERE i.inter * 100 >= 80 * (sa.sz + sb.sz - i.inter)""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the','a','and','of','to','in','is','it'], t))) AS BIGINT) AS n_stop,
        |  CASE WHEN length(text) = 0 THEN 0 ELSE
        |    (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 400 // length(text)
        |    + (length(text) - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))) * 300 // length(text)
        |    + CASE WHEN len(list_filter(string_split(text, ' '),
        |        t -> list_contains(['the','a','and','of','to','in','is','it'], t))) > 0
        |      THEN 300 ELSE 0 END
        |  END AS quality_milli
        |FROM documents""".stripMargin,

    "lang_id" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','of','to','in','is','it'], t))) AS BIGINT) AS en_hits,
        |  CAST(len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist','ein','zu','mit'], t))) AS BIGINT) AS de_hits,
        |  CAST(len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','de','un','est','que','pour'], t))) AS BIGINT) AS fr_hits,
        |  CASE
        |    WHEN len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','of','to','in','is','it'], t))) >= len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist','ein','zu','mit'], t)))
        |     AND len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','of','to','in','is','it'], t))) >= len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','de','un','est','que','pour'], t)))
        |     AND len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','of','to','in','is','it'], t))) > 0 THEN 'en'
        |    WHEN len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist','ein','zu','mit'], t))) >= len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','de','un','est','que','pour'], t)))
        |     AND len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist','ein','zu','mit'], t))) > 0 THEN 'de'
        |    WHEN len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','de','un','est','que','pour'], t))) > 0 THEN 'fr'
        |    ELSE 'und' END AS lang_pred
        |FROM documents""".stripMargin,

    "token_counts" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,

    "doc_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |      c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents""".stripMargin,

    // Gopher-family repetition signals: duplicate-token, top-unigram and
    // top-bigram fractions in integer per-mille + the keep decision
    "rep_signals" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |    CASE WHEN len(toks) = 0 THEN 0 ELSE
        |      CAST(list_max(list_transform(list_distinct(toks),
        |        d -> len(list_filter(toks, x -> x = d)))) AS BIGINT) END AS top_unigram,
        |    CASE WHEN len(toks) < 2 THEN 0 ELSE
        |      CAST(list_max(list_transform(
        |        list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])),
        |        d -> len(list_filter(
        |          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
        |          x -> x = d)))) AS BIGINT) END AS top_bigram
        |  FROM t)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CASE WHEN n_tokens = 0 THEN 0 ELSE (n_tokens - n_distinct) * 1000 // n_tokens END AS dup_token_milli,
        |  CASE WHEN n_tokens = 0 THEN 0 ELSE top_unigram * 1000 // n_tokens END AS top_unigram_milli,
        |  CASE WHEN n_tokens < 2 THEN 0 ELSE top_bigram * 2000 // n_tokens END AS top_bigram_milli,
        |  CAST(CASE WHEN (CASE WHEN n_tokens = 0 THEN 0 ELSE (n_tokens - n_distinct) * 1000 // n_tokens END) <= 900
        |        AND (CASE WHEN n_tokens = 0 THEN 0 ELSE top_unigram * 1000 // n_tokens END) <= 120
        |        AND (CASE WHEN n_tokens < 2 THEN 0 ELSE top_bigram * 2000 // n_tokens END) <= 400
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM s""".stripMargin,

    // fixed-size token windows (16 tokens, stride 12); window content pinned
    // by the engine-portable rolling-hash fingerprint of the joined window
    "chunk_windows" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, i AS chunk_idx, toks[i*12+1 : i*12+16] AS chunk
        |  FROM t, unnest(range(0, CASE WHEN len(toks) = 0 THEN 0 ELSE (len(toks)-1)//12 + 1 END)) AS u(i))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(array_to_string(chunk, ' '), ''), ch -> ch <> ''),
        |      ch -> CAST(ascii(ch) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS chunk_fp
        |FROM c""".stripMargin,

    // PII scrub: plant an email, an IPv4 and a phone per document from
    // doc_id (the synthetic corpus carries none), count matches on the
    // planted text, then redact email -> ip -> phone; the redacted bytes
    // are pinned by fingerprint
    "pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
        |      || ' call ' || CAST(doc_id % 900 + 100 AS VARCHAR)
        |      || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) AS pii
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(pii, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(pii, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        |    CAST(len(regexp_extract_all(pii, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(pii, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
        |        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |      '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM p)
        |SELECT doc_id, n_emails, n_ipv4, n_phones,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(redacted, ''), ch -> ch <> ''),
        |      ch -> CAST(ascii(ch) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS redacted_fp
        |FROM r""".stripMargin,

    // deterministic domain-mix sampling: per-source basis-point rates,
    // keep = content hash of the id under the rate threshold
    "domain_mix" ->
      """SELECT source, count(*) AS n_total,
        |  CAST(SUM(CASE WHEN
        |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(list_filter(string_split(CAST(doc_id AS VARCHAR), ''), c -> c <> ''),
        |         c -> CAST(ascii(c) AS BIGINT))),
        |       (acc, x) -> (acc * 31 + x) % 1000000007) * 747796405 + 2891336453) % 1000000007) % 10000 <
        |    CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 7500
        |                WHEN 'src2' THEN 2500 WHEN 'src3' THEN 0 ELSE 5000 END
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents GROUP BY source""".stripMargin,

    // train/eval decontamination: content-hash split -> 5-gram shingle
    // hashes on both sides (df-capped on the eval side) -> inverted join ->
    // per-train-doc shared-shingle counts + contamination per-mille
    "decontam_overlap" ->
      """WITH sp AS (
        |  SELECT doc_id, text,
        |    CASE WHEN h < 9000 THEN 'train' WHEN h < 9500 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, text,
        |          ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |             list_transform(list_filter(string_split(CAST(doc_id AS VARCHAR), ''), c -> c <> ''),
        |               c -> CAST(ascii(c) AS BIGINT))),
        |             (acc, x) -> (acc * 31 + x) % 1000000007) * 1103515245 + 12345) % 1000000007) % 10000 AS h
        |        FROM documents)),
        |trt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM sp WHERE split = 'train'),
        |tet AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM sp WHERE split = 'test'),
        |trsh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(array_to_string(toks[i : i+4], ' '), ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS sh
        |  FROM trt, unnest(range(1, len(toks) - 3)) AS u(i)
        |  WHERE len(toks) >= 5),
        |tesh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(array_to_string(toks[i : i+4], ' '), ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS sh
        |  FROM tet, unnest(range(1, len(toks) - 3)) AS u(i)
        |  WHERE len(toks) >= 5),
        |esh AS (SELECT sh FROM tesh GROUP BY sh HAVING count(*) <= 1000),
        |perdoc AS (SELECT id, count(*) AS n_shingles FROM trsh GROUP BY id),
        |shared AS (
        |  SELECT id, count(*) AS n_shared FROM trsh
        |  WHERE sh IN (SELECT sh FROM esh) GROUP BY id)
        |SELECT s.id AS doc_id, p.n_shingles, s.n_shared,
        |       s.n_shared * 1000 // p.n_shingles AS contam_milli
        |FROM shared s JOIN perdoc p ON s.id = p.id""".stripMargin,

    // exact per-domain length quantiles: (domain, token-count) histogram ->
    // per-domain cumulative -> smallest length whose cumulative reaches
    // ceil(q*n/1000), tested as the integer cross-product cum*1000 >= q*n
    "length_quantiles" ->
      """WITH t AS (
        |  SELECT source AS domain,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |h AS (SELECT domain, n, count(*) AS c FROM t GROUP BY domain, n),
        |w AS (
        |  SELECT domain, n,
        |    CAST(SUM(c) OVER (PARTITION BY domain ORDER BY n
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM h),
        |tot AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs FROM t GROUP BY domain),
        |qs AS (SELECT CAST(q_milli AS BIGINT) AS q_milli
        |       FROM (VALUES (250), (500), (750), (900), (990)) AS v(q_milli))
        |SELECT w.domain, qs.q_milli, MIN(tot.n_docs) AS n_docs, MIN(w.n) AS value
        |FROM w JOIN tot ON w.domain = tot.domain CROSS JOIN qs
        |WHERE w.cum * 1000 >= qs.q_milli * tot.n_docs
        |GROUP BY w.domain, qs.q_milli""".stripMargin,

    // tokenizer-training vocabulary: word frequencies, hapax tail pruned
    "word_freqs" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM tok GROUP BY token HAVING count(*) >= 100""".stripMargin,

    // BPE pair statistics: adjacent character pairs of each vocab word,
    // weighted by word frequency; top-50 with ties broken on the pair
    "bpe_pairs" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(token)),
        |           i -> substr(token, CAST(i AS INT), 2))) AS pair, cnt
        |  FROM vocab WHERE length(token) >= 2)
        |SELECT pair, CAST(sum(cnt) AS BIGINT) AS cnt
        |FROM pairs GROUP BY pair
        |ORDER BY cnt DESC, pair ASC LIMIT 50""".stripMargin,

    // deterministic corpus shuffle: content hash of "id#seed" times a large
    // multiplier mod 1e9+7 -> dense rank; the oracle's single-window
    // ROW_NUMBER checks the engine's two-level (hash-range-bucketed)
    // distributed rank exactly
    "shuffle_positions" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |       list_transform(list_filter(string_split(CAST(doc_id AS VARCHAR) || '#42', ''), c -> c <> ''),
        |         c -> CAST(ascii(c) AS BIGINT))),
        |       (acc, x) -> (acc * 31 + x) % 1000000007) * 2862933555) % 1000000007) AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM t""".stripMargin,

    // sequence packing: token counts -> exclusive prefix sum in doc_id
    // order -> each document explodes into the 1..k budget-64 sequences it
    // overlaps; the oracle's single-window prefix sum checks the engine's
    // two-level (bucketed) distributed prefix sum exactly
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
        |  FROM t),
        |e AS (
        |  SELECT doc_id, n, strt, u.i AS seq_id
        |  FROM s, unnest(range(strt // 64, (strt + n - 1) // 64 + 1)) AS u(i)
        |  WHERE n > 0)
        |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(strt, seq_id * 64) - strt AS BIGINT) AS doc_off,
        |  CAST(GREATEST(strt, seq_id * 64) - seq_id * 64 AS BIGINT) AS seq_off,
        |  CAST(LEAST(strt + n, (seq_id + 1) * 64) - GREATEST(strt, seq_id * 64) AS BIGINT) AS piece_len
        |FROM e""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    "frame_sample" ->
      """SELECT media_id, count(*) AS n_frames, CAST(SUM(fb) AS BIGINT) AS total_bytes
        |FROM (SELECT doc_id AS media_id, i, LEAST(32, strlen(text) - i*32) AS fb
        |      FROM documents, unnest(range(0, CAST(strlen(text)/32 AS BIGINT) + 1)) AS t(i)
        |      WHERE i % 2 = 0 AND strlen(text) - i*32 > 0)
        |GROUP BY media_id""".stripMargin,

    "embed_stats" ->
      """SELECT label, count(*) AS n,
        |       CAST(min(len(embedding)) AS INT) AS min_dim,
        |       CAST(max(len(embedding)) AS INT) AS max_dim
        |FROM embeddings GROUP BY label""".stripMargin,

    // ---- portable-hash LSH / quantized ANN family ----
    // Every hash below is the polynomial char hash mod 1e9+7 plus affine
    // integer mixing — the exact arithmetic the Spark operators run, so the
    // whole dedup/ANN story is driver-verified, not just in-engine-tested.

    "dedup_minhash_lsh" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |toks AS (
        |  SELECT doc_id AS id,
        |         list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
        |  FROM docs),
        |nz AS (SELECT id, toks FROM toks WHERE len(toks) > 0),
        |hs AS (
        |  SELECT id, toks, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(t, ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        |  FROM nz),
        |sigs AS (
        |  SELECT id, list_transform(range(0, 32), i ->
        |    list_min(list_transform(hs, h ->
        |      (h * ((i*1103515245+12345) % 2147483646 + 1)
        |       + (i*134775813+1) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |banded AS (
        |  SELECT id, b AS band,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
        |           (acc, x) -> (acc*1000003 + x) % 1000000007) AS bhash
        |  FROM sigs, unnest(range(0, 8)) AS t(b)),
        |cands AS (
        |  SELECT DISTINCT x.id AS a, y.id AS b
        |  FROM banded x JOIN banded y
        |    ON x.band = y.band AND x.bhash = y.bhash AND x.id < y.id)
        |SELECT c.a, c.b,
        |       CAST(len(list_intersect(ta.toks, tb.toks)) AS INT) AS inter,
        |       CAST(len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)) AS INT) AS uni
        |FROM cands c JOIN nz ta ON c.a = ta.id JOIN nz tb ON c.b = tb.id
        |WHERE len(list_intersect(ta.toks, tb.toks)) * 100
        |      >= 80 * (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)))""".stripMargin,

    // near-dup CLUSTERS: the capped-by-default pair set (df cap
    // greatest(100, corpus/100), bucket cap 1000 — the clusters entry point
    // routes through the tracked capped dedup) closed into connected
    // components by a recursive CTE (same closure shape as the
    // cc_components oracle) — one representative (min id) per cluster
    "dedup_clusters" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT DISTINCT doc_id AS id, token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs)
        |  WHERE token <> ''),
        |kept AS (
        |  SELECT id, token FROM tok
        |  WHERE token IN (SELECT token FROM tok GROUP BY token HAVING count(*) <=
        |    (SELECT greatest(100, CAST(floor(count(*) * 0.01) AS BIGINT)) FROM docs))),
        |toks AS (SELECT id, list(token) AS toks FROM kept GROUP BY id),
        |nz AS (SELECT id, toks FROM toks WHERE len(toks) > 0),
        |hs AS (
        |  SELECT id, toks, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(t, ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        |  FROM nz),
        |sigs AS (
        |  SELECT id, list_transform(range(0, 32), i ->
        |    list_min(list_transform(hs, h ->
        |      (h * ((i*1103515245+12345) % 2147483646 + 1)
        |       + (i*134775813+1) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |banded AS (
        |  SELECT id, b AS band,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
        |           (acc, x) -> (acc*1000003 + x) % 1000000007) AS bhash
        |  FROM sigs, unnest(range(0, 8)) AS t(b)),
        |capped AS (
        |  SELECT bd.* FROM banded bd
        |  JOIN (SELECT band, bhash FROM banded GROUP BY band, bhash
        |        HAVING count(*) <= 1000) keep USING (band, bhash)),
        |cands AS (
        |  SELECT DISTINCT x.id AS a, y.id AS b
        |  FROM capped x JOIN capped y
        |    ON x.band = y.band AND x.bhash = y.bhash AND x.id < y.id),
        |pairs AS (
        |  SELECT c.a, c.b
        |  FROM cands c JOIN nz ta ON c.a = ta.id JOIN nz tb ON c.b = tb.id
        |  WHERE len(list_intersect(ta.toks, tb.toks)) * 100
        |        >= 80 * (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)))),
        |e AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        |nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e),
        |reach(x, y) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT r.x, e.v FROM reach r JOIN e ON r.y = e.u)
        |SELECT x AS doc_id, min(y) AS rep_id FROM reach GROUP BY x""".stripMargin,

    // the full curation composition: quality gate (>= 900 keeps only docs
    // with a stopword hit) -> CAPPED minhash pairs over the SURVIVORS (df
    // cap greatest(100, survivors/100), bucket cap 1000 — curate routes
    // through the tracked capped dedup) -> recursive component closure ->
    // drop non-representatives -> content-hash split
    "curate_corpus" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |q AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      (length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 400 // length(text)
        |      + (length(text) - (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))) * 300 // length(text)
        |      + CASE WHEN len(list_filter(string_split(text, ' '),
        |          t -> list_contains(['the','a','and','of','to','in','is','it'], t))) > 0
        |        THEN 300 ELSE 0 END
        |    END AS quality_milli
        |  FROM docs),
        |kept AS (SELECT doc_id, text, quality_milli FROM q WHERE quality_milli >= 900),
        |tok AS (SELECT DISTINCT doc_id AS id, token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM kept)
        |  WHERE token <> ''),
        |tokk AS (
        |  SELECT id, token FROM tok
        |  WHERE token IN (SELECT token FROM tok GROUP BY token HAVING count(*) <=
        |    (SELECT greatest(100, CAST(floor(count(*) * 0.01) AS BIGINT)) FROM kept))),
        |toks AS (SELECT id, list(token) AS toks FROM tokk GROUP BY id),
        |nz AS (SELECT id, toks FROM toks WHERE len(toks) > 0),
        |hs AS (
        |  SELECT id, toks, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(t, ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        |  FROM nz),
        |sigs AS (
        |  SELECT id, list_transform(range(0, 32), i ->
        |    list_min(list_transform(hs, h ->
        |      (h * ((i*1103515245+12345) % 2147483646 + 1)
        |       + (i*134775813+1) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |banded AS (
        |  SELECT id, b AS band,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
        |           (acc, x) -> (acc*1000003 + x) % 1000000007) AS bhash
        |  FROM sigs, unnest(range(0, 8)) AS t(b)),
        |capped AS (
        |  SELECT bd.* FROM banded bd
        |  JOIN (SELECT band, bhash FROM banded GROUP BY band, bhash
        |        HAVING count(*) <= 1000) keep USING (band, bhash)),
        |cands AS (
        |  SELECT DISTINCT x.id AS a, y.id AS b
        |  FROM capped x JOIN capped y
        |    ON x.band = y.band AND x.bhash = y.bhash AND x.id < y.id),
        |pairs AS (
        |  SELECT c.a, c.b
        |  FROM cands c JOIN nz ta ON c.a = ta.id JOIN nz tb ON c.b = tb.id
        |  WHERE len(list_intersect(ta.toks, tb.toks)) * 100
        |        >= 80 * (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)))),
        |e AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        |nodes AS (SELECT u AS n FROM e UNION SELECT v AS n FROM e),
        |reach(x, y) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT r.x, e.v FROM reach r JOIN e ON r.y = e.u),
        |clus AS (SELECT x AS doc_id, min(y) AS rep_id FROM reach GROUP BY x),
        |dupes AS (SELECT doc_id FROM clus WHERE doc_id <> rep_id)
        |SELECT k.doc_id, k.quality_milli,
        |  CASE WHEN k.h < 9000 THEN 'train' WHEN k.h < 9500 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, quality_milli,
        |        ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(list_filter(string_split(CAST(doc_id AS VARCHAR), ''), c -> c <> ''),
        |             c -> CAST(ascii(c) AS BIGINT))),
        |           (acc, x) -> (acc * 31 + x) % 1000000007) * 1103515245 + 12345) % 1000000007) % 10000 AS h
        |      FROM kept) k
        |WHERE k.doc_id NOT IN (SELECT doc_id FROM dupes)""".stripMargin,

    // the capped shape: df cap (HAVING count <= 50 on token document
    // frequency) before signing AND verification, bucket cap (HAVING count
    // <= 5 per (band, bhash)) before the candidate self-join — both exact SQL
    "dedup_minhash_capped" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |tok AS (SELECT DISTINCT doc_id AS id, token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs)
        |  WHERE token <> ''),
        |kept AS (
        |  SELECT id, token FROM tok
        |  WHERE token IN (SELECT token FROM tok GROUP BY token HAVING count(*) <= 50)),
        |toks AS (SELECT id, list(token) AS toks FROM kept GROUP BY id),
        |nz AS (SELECT id, toks FROM toks WHERE len(toks) > 0),
        |hs AS (
        |  SELECT id, toks, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(t, ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        |  FROM nz),
        |sigs AS (
        |  SELECT id, list_transform(range(0, 32), i ->
        |    list_min(list_transform(hs, h ->
        |      (h * ((i*1103515245+12345) % 2147483646 + 1)
        |       + (i*134775813+1) % 2147483647) % 2147483647))) AS sig
        |  FROM hs),
        |banded AS (
        |  SELECT id, b AS band,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), sig[b*4+1 : b*4+4]),
        |           (acc, x) -> (acc*1000003 + x) % 1000000007) AS bhash
        |  FROM sigs, unnest(range(0, 8)) AS t(b)),
        |capped AS (
        |  SELECT bd.* FROM banded bd
        |  JOIN (SELECT band, bhash FROM banded GROUP BY band, bhash
        |        HAVING count(*) <= 5) keep USING (band, bhash)),
        |cands AS (
        |  SELECT DISTINCT x.id AS a, y.id AS b
        |  FROM capped x JOIN capped y
        |    ON x.band = y.band AND x.bhash = y.bhash AND x.id < y.id)
        |SELECT c.a, c.b,
        |       CAST(len(list_intersect(ta.toks, tb.toks)) AS INT) AS inter,
        |       CAST(len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)) AS INT) AS uni
        |FROM cands c JOIN nz ta ON c.a = ta.id JOIN nz tb ON c.b = tb.id
        |WHERE len(list_intersect(ta.toks, tb.toks)) * 100
        |      >= 80 * (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks)))""".stripMargin,

    "dedup_simhash" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0),
        |toks AS (
        |  SELECT doc_id AS id,
        |         list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
        |  FROM docs),
        |hs AS (
        |  SELECT id, len(toks) AS nt, list_transform(toks, t ->
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(t, ''), c -> c <> ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        |  FROM toks),
        |bits AS (
        |  SELECT id, list_transform(range(0, 48), b ->
        |    CASE WHEN 2 * len(list_filter(hs, h ->
        |      (h*(b*131+137) + b*1000003 + 7) % 1000000007 % 2 = 1)) > nt
        |    THEN 1 ELSE 0 END) AS bits
        |  FROM hs),
        |banded AS (
        |  SELECT id, bits, c AS chunk,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), bits[c*12+1 : c*12+12]),
        |           (acc, x) -> acc*2 + x) AS ckey
        |  FROM bits, unnest(range(0, 4)) AS t(c))
        |SELECT DISTINCT x.id AS a, y.id AS b,
        |       CAST(len(list_filter(range(1, 49), i -> x.bits[i] <> y.bits[i])) AS INT) AS hamming
        |FROM banded x JOIN banded y
        |  ON x.chunk = y.chunk AND x.ckey = y.ckey AND x.id < y.id
        |WHERE len(list_filter(range(1, 49), i -> x.bits[i] <> y.bits[i])) <= 3""".stripMargin,

    "ann_brute_topk" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |n0 AS (SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
        |       FROM v),
        |n AS (SELECT * FROM n0 WHERE n2 > 0),
        |ranked AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |           CAST(CAST(list_sum(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i])) AS BIGINT) AS DOUBLE)
        |             / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) DESC,
        |           b.vec_id ASC) AS rank
        |  FROM n a JOIN n b ON a.vec_id <> b.vec_id)
        |SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "ann_ivf_topk" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |n0 AS (SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
        |       FROM v),
        |n AS (SELECT * FROM n0 WHERE n2 > 0),
        |k AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS nc FROM n),
        |c0 AS (
        |  SELECT row_number() OVER (ORDER BY
        |           (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |              list_transform(list_filter(string_split(CAST(vec_id AS VARCHAR), ''), c -> c <> ''),
        |                c -> CAST(ascii(c) AS BIGINT))),
        |              (acc, x) -> (acc * 31 + x) % 1000000007) * 1000003 + 12345) % 1000000007,
        |           vec_id) AS cid,
        |         q AS s
        |  FROM n QUALIFY cid <= (SELECT nc FROM k)),
        |cn0 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c0),
        |a1 AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
        |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
        |  FROM n JOIN cn0 c ON c.s2 > 0 QUALIFY rn = 1),
        |c1 AS (
        |  SELECT cid, list(sm ORDER BY i) AS s FROM (
        |    SELECT a1.cid, t.i, CAST(sum(n.q[t.i]) // count(*) AS BIGINT) AS sm
        |    FROM a1 JOIN n USING (vec_id), unnest(range(1, len(n.q)+1)) AS t(i)
        |    GROUP BY a1.cid, t.i)
        |  GROUP BY cid),
        |cn1 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c1),
        |a2 AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
        |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
        |  FROM n JOIN cn1 c ON c.s2 > 0 QUALIFY rn = 1),
        |c2 AS (
        |  SELECT cid, list(sm ORDER BY i) AS s FROM (
        |    SELECT a2.cid, t.i, CAST(sum(n.q[t.i]) // count(*) AS BIGINT) AS sm
        |    FROM a2 JOIN n USING (vec_id), unnest(range(1, len(n.q)+1)) AS t(i)
        |    GROUP BY a2.cid, t.i)
        |  GROUP BY cid),
        |cn2 AS (SELECT cid, s, CAST(list_sum(list_transform(s, x -> x*x)) AS BIGINT) AS s2 FROM c2),
        |probe AS (
        |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY
        |    CAST(CAST(list_sum(list_transform(range(1, len(n.q)+1), i -> n.q[i]*c.s[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(n.n2 AS DOUBLE) * CAST(c.s2 AS DOUBLE)) DESC, cid ASC) AS rn
        |  FROM n JOIN cn2 c ON c.s2 > 0 QUALIFY rn <= 3),
        |cands AS (
        |  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS neighbor_id
        |  FROM probe a JOIN probe b ON a.cid = b.cid AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT c.vec_id, c.neighbor_id, row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |    CAST(CAST(list_sum(list_transform(range(1, len(x.q)+1), i -> x.q[i]*y.q[i])) AS BIGINT) AS DOUBLE)
        |      / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE)) DESC, c.neighbor_id ASC) AS rank
        |  FROM cands c JOIN n x ON c.vec_id = x.vec_id JOIN n y ON c.neighbor_id = y.vec_id)
        |SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "embed_near_dups" ->
      """WITH v AS (
        |  SELECT vec_id AS id, list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |n0 AS (SELECT id, q, CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS n2
        |       FROM v),
        |n AS (SELECT * FROM n0 WHERE n2 > 0),
        |b AS (
        |  SELECT id, q, n2,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, 4), p ->
        |      CASE WHEN CAST(list_sum(list_transform(range(1, len(q)+1), i ->
        |        q[i] * (CASE WHEN ((p*1000003 + (i-1)*7919 + 12345)
        |                          * (p*7919 + (i-1)*1000003 + 54321))
        |                          % 1000000007 % 2 = 1 THEN 1 ELSE -1 END)
        |      )) AS BIGINT) > 0 THEN 1 ELSE 0 END)),
        |      (acc, x) -> acc*2 + x) AS bucket
        |  FROM n)
        |SELECT a, b FROM (
        |  SELECT x.id AS a, y.id AS b,
        |         CAST(list_sum(list_transform(range(1, len(x.q)+1), i -> x.q[i]*y.q[i])) AS BIGINT) AS dot,
        |         x.n2 AS n2a, y.n2 AS n2b
        |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.id < y.id)
        |WHERE dot >= 0
        |  AND CAST(dot AS DOUBLE) * CAST(dot AS DOUBLE) * 10000
        |      >= 225 * CAST(n2a AS DOUBLE) * CAST(n2b AS DOUBLE)""".stripMargin,

    // px_sum folds the UTF-8 BYTES of the text (hex + nibble lookup), exactly
    // what PgmCodec sums from the raster — the round-2 oracle summed Unicode
    // codepoints and matched only because the testdata is ASCII (ADVICE r02)
    "multimodal_features" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n, hex(encode(text)) AS hx
        |  FROM documents),
        |m AS (
        |  SELECT doc_id AS media_id, n,
        |         COALESCE(list_sum(list_transform(range(0, n), i ->
        |           instr('123456789ABCDEF', substr(hx, 2*i+1, 1)) * 16
        |           + instr('123456789ABCDEF', substr(hx, 2*i+2, 1)))), 0) AS px_sum
        |  FROM h),
        |d AS (
        |  SELECT media_id, n, px_sum,
        |         n % 16 + 1 AS w,
        |         GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) / (n % 16 + 1)) AS BIGINT)) AS h
        |  FROM m)
        |SELECT media_id,
        |       CAST(strlen('P5' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10))
        |            + w * h AS BIGINT) AS n_bytes,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(px_sum AS BIGINT) AS pixel_sum,
        |       CAST(px_sum * 1000 // (w * h) AS BIGINT) AS mean_milli
        |FROM d""".stripMargin,

    // BMP twin of multimodal_features: width snaps to a multiple of 4 (so
    // the BMP stride adds no row padding), header+palette = 1078 bytes
    "multimodal_bmp" ->
      """WITH hb AS (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n, hex(encode(text)) AS hx
        |  FROM documents),
        |mb AS (
        |  SELECT doc_id AS media_id, n,
        |         COALESCE(list_sum(list_transform(range(0, n), i ->
        |           instr('123456789ABCDEF', substr(hx, 2*i+1, 1)) * 16
        |           + instr('123456789ABCDEF', substr(hx, 2*i+2, 1)))), 0) AS px_sum
        |  FROM hb),
        |db AS (
        |  SELECT media_id, n, px_sum,
        |         (n % 4 + 1) * 4 AS w,
        |         GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) / ((n % 4 + 1) * 4)) AS BIGINT)) AS h
        |  FROM mb)
        |SELECT media_id,
        |       CAST(w * h + 1078 AS BIGINT) AS n_bytes,
        |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(px_sum AS BIGINT) AS pixel_sum,
        |       CAST(px_sum * 1000 // (w * h) AS BIGINT) AS mean_milli
        |FROM db""".stripMargin,

    // WAV twin: one LE int16 sample per text byte (mono), so the decoded
    // absolute-amplitude sum IS the text byte sum; 44-byte canonical header
    "multimodal_wav" ->
      """WITH hb AS (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n, hex(encode(text)) AS hx
        |  FROM documents),
        |mb AS (
        |  SELECT doc_id AS media_id, n,
        |         COALESCE(list_sum(list_transform(range(0, n), i ->
        |           instr('123456789ABCDEF', substr(hx, 2*i+1, 1)) * 16
        |           + instr('123456789ABCDEF', substr(hx, 2*i+2, 1)))), 0) AS amp
        |  FROM hb)
        |SELECT media_id,
        |       CAST(n * 2 + 44 AS BIGINT) AS n_bytes,
        |       CAST(1 AS INT) AS channels, CAST(n AS INT) AS n_frames,
        |       CAST(amp AS BIGINT) AS amp_sum,
        |       CAST(amp * 1000 // GREATEST(1, n) AS BIGINT) AS mean_amp_milli
        |FROM mb""".stripMargin)
}
