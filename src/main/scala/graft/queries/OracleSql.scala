package graft.queries

import graft.functions.{PortableHash, Text}
import Num.Sql.{d4, dsum, davg}

/** DuckDB oracle SQL for every oracle-checked query.
  *
  * Where a query involves hashing or marker tables, the SQL is
  * *generated* from the same Scala constants the Spark side uses
  * (PortableHash coefficients, Text.LangMarkers, Text.Stopwords), so
  * the two sides cannot drift.
  */
object OracleSql {

  // minhash configuration (must precede the `pipeline` val initializer)
  private final val K = 5
  private final val NumHashes = 8
  private final val Bands = 2

  // ---------- shared fragments ----------

  /** 5-char shingle list of a text expression (mirrors Text.shingles). */
  def shinglesSql(x: String, k: Int): String =
    s"CASE WHEN length($x) >= $k THEN list_transform(range(0, length($x)-${k - 1}), i -> substr($x, i+1, $k)) ELSE [$x] END"

  /** mirrors PortableHash.md5Mod over a shingle list. */
  def shingleHashesSql(shs: String): String =
    s"list_transform($shs, s -> ${PortableHash.Sql.md5Mod("s")})"

  def minhashSql(hs: String, j: Int): String =
    s"list_min(list_transform($hs, h -> ${PortableHash.Sql.affine("h", j)}))"

  /** Whitespace tokens (mirrors Text.wsTokens). */
  def wsTokensSql(x: String): String =
    s"regexp_split_to_array(trim($x), '\\s+')"

  def wordTokensSql(x: String): String =
    s"regexp_split_to_array(lower(trim($x)), '[^a-z0-9]+')"

  /** Literal-marker occurrence count (mirrors Text.occurrences). */
  def occSql(x: String, m: String): String =
    s"((length($x) - length(replace($x, '$m', ''))) // ${m.length})"

  val relational: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum(d4("l_quantity"))} AS sum_qty,
         |  ${dsum(d4("l_extendedprice"))} AS sum_base_price,
         |  ${dsum(s"${d4("l_extendedprice")} * (1 - ${d4("l_discount")})")} AS sum_disc_price,
         |  ${dsum(s"${d4("l_extendedprice")} * (1 - ${d4("l_discount")}) * (1 + ${d4("l_tax")})")} AS sum_charge,
         |  ${davg(d4("l_quantity"))} AS avg_qty,
         |  ${davg(d4("l_extendedprice"))} AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey,
         |  ${dsum(s"${d4("l_extendedprice")} * (1 - ${d4("l_discount")})")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
         |  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q05_local_supplier" ->
      s"""SELECT n_name,
         |  ${dsum(s"${d4("l_extendedprice")} * (1 - ${d4("l_discount")})")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_forecast_revenue" ->
      s"""SELECT ${dsum(s"${d4("l_extendedprice")} * ${d4("l_discount")}")} AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q_filter_cmp" ->
      s"""SELECT l_linestatus, count(*) AS n_rows, ${dsum(d4("l_quantity"))} AS sum_qty
         |FROM lineitem
         |WHERE l_quantity < 10 AND l_discount >= 0.05 AND l_returnflag != 'A'
         |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_filter_in" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
         |  ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM orders
         |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus NOT IN ('F')
         |GROUP BY o_orderstatus, o_orderpriority
         |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "q_filter_contains" ->
      s"""SELECT p_brand, count(*) AS n_parts, ${dsum(d4("p_retailprice"))} AS sum_price
         |FROM part WHERE p_type LIKE '%ECO%'
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_filter_dnf" ->
      s"""SELECT o_orderstatus, count(*) AS n_rows, ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM orders
         |WHERE (o_orderstatus = 'F' AND o_totalprice > 100000)
         |   OR (o_orderpriority = '1-URGENT' AND o_totalprice < 50000)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_filter_includes" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE list_contains(${wsTokensSql("text")}, 'spark')
         |  AND (list_contains(${wsTokensSql("text")}, 'vector')
         |    OR list_contains(${wsTokensSql("text")}, 'stream'))
         |ORDER BY doc_id""".stripMargin,

    "q_table_projection" ->
      s"""SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
         |WHERE c_acctbal > 9000 ORDER BY c_custkey""".stripMargin,

    "q_topk_per_group" ->
      s"""SELECT p_brand, rank, p_partkey, p_retailprice FROM (
         |  SELECT p_brand, p_partkey, p_retailprice,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rank
         |  FROM part) WHERE rank <= 3
         |ORDER BY p_brand, rank""".stripMargin,

    "q_topk_agg" -> // identical semantics to q_topk_per_group, different operator
      s"""SELECT p_brand, rank, p_partkey, p_retailprice FROM (
         |  SELECT p_brand, p_partkey, p_retailprice,
         |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rank
         |  FROM part) WHERE rank <= 3
         |ORDER BY p_brand, rank""".stripMargin,

    "q_topk_window" ->
      s"""SELECT l_partkey, rank, l_orderkey, l_extendedprice FROM (
         |  SELECT l_partkey, l_orderkey, l_extendedprice,
         |    row_number() OVER (PARTITION BY l_partkey
         |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
         |  FROM lineitem) WHERE rank <= 2
         |ORDER BY l_partkey, rank""".stripMargin,

    "q_running_sum" ->
      s"""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
         |  round(CAST(sum(${d4("l_quantity")}) OVER (
         |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS run_qty
         |FROM lineitem WHERE l_suppkey <= 5
         |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q_agg_stats" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |  count(DISTINCT o_custkey) AS n_customers,
         |  round(min(o_totalprice), 4) AS min_price,
         |  round(max(o_totalprice), 4) AS max_price,
         |  ${davg(d4("o_totalprice"))} AS avg_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_semi_anti" ->
      s"""SELECT 'has_orders' AS cohort, c_mktsegment, count(*) AS n_customers
         |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         |GROUP BY c_mktsegment
         |UNION ALL
         |SELECT 'no_orders' AS cohort, c_mktsegment, count(*) AS n_customers
         |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         |GROUP BY c_mktsegment
         |ORDER BY cohort, c_mktsegment""".stripMargin,

    // the query requests columns (l_returnflag, l_quantity) through
    // the dedup, so the table prunes BEFORE the keep-first aggregate
    // and ties on (key, order) resolve by the REQUESTED projection —
    // the oracle mirrors that tie-break exactly (rows tying on the
    // whole pruned ordering are identical in every consumed column,
    // so the aggregate is well-defined on both engines)
    "q_dedup_unique" ->
      s"""SELECT l_returnflag, count(*) AS n_rows, ${dsum(d4("l_quantity"))} AS sum_qty
         |FROM (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY
         |      l_linenumber, l_returnflag, l_quantity, l_orderkey) AS rn
         |    FROM lineitem) WHERE rn = 1)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_upsert_merge" ->
      s"""SELECT o_orderstatus, count(*) AS n_rows, ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM (
         |  SELECT * FROM orders WHERE o_orderkey % 10 != 0
         |  UNION ALL
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    o_totalprice + 1000 AS o_totalprice, o_orderdate, o_orderpriority
         |  FROM orders WHERE o_orderkey % 10 = 0)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_schema_normalize" ->
      s"""SELECT c_mktsegment, count(*) AS n_rows,
         |  count(CAST(NULL AS VARCHAR)) AS n_phone,
         |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 4) AS sum_acctbal
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )

  // ---------- pipeline ----------

  private val fingerprintSql =
    "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"

  val pipeline: Map[String, String] = Map(
    "q_passage_dedup" ->
      s"""WITH tok AS (SELECT doc_id, source, ${wsTokensSql("text")} AS toks FROM documents),
         |chunks AS (
         |  SELECT doc_id, source,
         |    unnest(CASE WHEN len(toks) >= 8
         |      THEN list_transform(range(0, len(toks) // 8),
         |           i -> array_to_string(toks[(i*8+1):(i*8+8)], ' '))
         |      ELSE CAST([] AS VARCHAR[]) END) AS chunk
         |  FROM tok),
         |cnt AS (SELECT chunk, count(*) AS c FROM chunks GROUP BY chunk)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN cnt.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
         |FROM chunks JOIN cnt USING (chunk)
         |GROUP BY source ORDER BY source""".stripMargin,

    "q_contamination" ->
      s"""WITH tok AS (SELECT doc_id, source, ${wsTokensSql("text")} AS toks FROM documents),
         |grams AS (
         |  SELECT doc_id, source,
         |    unnest(list_transform(range(0, len(toks) - 7),
         |      i -> ${PortableHash.Sql.md5Mod("array_to_string(toks[(i+1):(i+8)], ' ')")})) AS h
         |  FROM tok WHERE len(toks) >= 8),
         |probe AS (SELECT DISTINCT h FROM grams WHERE doc_id % 50 = 0),
         |perdoc AS (
         |  SELECT doc_id, any_value(source) AS source,
         |    CAST(sum(CASE WHEN h IN (SELECT h FROM probe) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM grams WHERE doc_id % 50 <> 0 GROUP BY doc_id)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  CAST(sum(n_hits) AS BIGINT) AS gram_hits
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,

    "q_decontam_filter" ->
      s"""WITH tok AS (SELECT doc_id, source, ${wsTokensSql("text")} AS toks FROM documents),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, len(toks) - 7),
         |      i -> ${PortableHash.Sql.md5Mod("array_to_string(toks[(i+1):(i+8)], ' ')")})) AS h
         |  FROM tok WHERE len(toks) >= 8),
         |probe AS (SELECT DISTINCT h FROM grams WHERE doc_id % 50 = 0),
         |dirty AS (
         |  SELECT DISTINCT doc_id FROM grams
         |  WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM probe))
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(sum(CASE WHEN len(toks) >= 8 THEN len(toks) - 7 ELSE 0 END) AS BIGINT)
         |    AS clean_grams
         |FROM tok
         |WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
         |GROUP BY source ORDER BY source""".stripMargin,

    "q_quality_rules" -> qualityRulesSql,

    "q_srp_pairs" -> srpPairsSql,

    "q_redact" -> {
      import graft.functions.TextClean.{Sql => T}
      import graft.functions.TextClean.{EmailRe, Ipv4Re, PhoneRe}
      val txt =
        """('contact user' || user_id || '@mail.example.com or 10.0.' ||
          | (user_id % 256) || '.' || (event_id % 256) ||
          | ' phone 555-' || lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0') ||
          | '-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0') ||
          | ' type ' || event_type)""".stripMargin.replace("\n", "")
      s"""WITH g AS (SELECT event_type, $txt AS txt FROM events),
         |r AS (SELECT event_type, txt, ${T.redactPii("txt")} AS red FROM g)
         |SELECT event_type, count(*) AS n_events,
         |  ${dsumL(T.countMatches("txt", EmailRe))} AS emails,
         |  ${dsumL(T.countMatches("txt", Ipv4Re))} AS ips,
         |  ${dsumL(T.countMatches("txt", PhoneRe))} AS phones,
         |  ${dsumL(T.countMatches("red", EmailRe))} AS residual,
         |  ${dsumL(PortableHash.Sql.md5Long("red"))} AS digest
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "q_url_extract" -> {
      import graft.functions.TextClean.{Sql => T}
      val txt =
        """('see https://sub' || (user_id % 50) || '.site' || (user_id % 7) ||
          | '.' || (CASE CAST(user_id % 3 AS INTEGER) WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END) ||
          | '/p/' || event_id || ' end')""".stripMargin.replace("\n", "")
      s"""WITH g AS (SELECT ${T.urlHost(txt)} AS host FROM events),
         |d AS (SELECT host, ${T.domainOf("host")} AS domain FROM g)
         |SELECT domain, count(*) AS n_urls,
         |  CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
         |FROM d GROUP BY domain ORDER BY domain""".stripMargin
    },

    "q_zorder_hist" -> {
      import graft.queries.PipelineQueries.{ZQtyBounds, ZPriceBounds}
      // bucket = number of boundaries <= x (mirrors SearchSorted)
      def bucket(x: String, bounds: Array[Double]): String =
        bounds.map(b => s"(CASE WHEN $x >= $b THEN 1 ELSE 0 END)").mkString("(", " + ", ")")
      // Morton interleave: bit i of column c lands at i*2 + c
      def interleave(b0: String, b1: String, bits: Int): String =
        (0 until bits).flatMap { i =>
          Seq(s"((($b0 >> $i) & 1) << ${i * 2})", s"((($b1 >> $i) & 1) << ${i * 2 + 1})")
        }.mkString("(", " + ", ")")
      val z = interleave(
        bucket("CAST(l_quantity AS DOUBLE)", ZQtyBounds),
        bucket("CAST(l_extendedprice AS DOUBLE)", ZPriceBounds), bits = 3)
      s"""SELECT CAST($z AS BIGINT) AS z, count(*) AS n_rows
         |FROM lineitem GROUP BY 1 ORDER BY z""".stripMargin
    },

    "q_normalize" -> {
      import graft.functions.TextClean.{Sql => T}
      s"""WITH n AS (SELECT source, ${T.normalizeText("text")} AS norm FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  ${dsumL("length(norm)")} AS n_chars,
         |  ${dsumL(PortableHash.Sql.md5Long("norm"))} AS digest
         |FROM n GROUP BY source ORDER BY source""".stripMargin
    },

    "q_vocab" ->
      s"""WITH toks AS (
         |  SELECT unnest(${wordTokensSql("text")}) AS token FROM documents),
         |v AS (
         |  SELECT token, count(*) AS freq FROM toks
         |  WHERE token <> '' GROUP BY token HAVING count(*) >= 5)
         |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS vocab_id,
         |  token, freq
         |FROM v ORDER BY vocab_id""".stripMargin,

    "q_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sessions AS (
         |  SELECT user_id, ts, value,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM flagged)
         |SELECT user_id, session_seq,
         |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
         |  count(*) AS n_events,
         |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         |FROM sessions GROUP BY user_id, session_seq
         |ORDER BY user_id, session_seq""".stripMargin,

    "q_event_buckets" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
         |  count(*) AS n_events, ${dsum(d4("value"))} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT lang, count(*) AS n_unique_docs FROM (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY md5(trim(lower(text))) ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id, $fingerprintSql AS fp,
         |  len(${wsTokensSql("text")}) AS n_tokens,
         |  length(text) AS len_chars
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      s"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(${wsTokensSql("text")})) AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(${wordTokensSql("text")})) AS BIGINT) AS word_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS total_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_text_stats" -> textStatsSql,
    "q_lang_id" -> langIdSql,
    "q_minhash" -> minhashQuerySql,
    "q_minhash_pairs" -> minhashPairsSql,
    "q_dup_clusters" -> dupClustersSql,
    // same contract, different algorithm (large-star/small-star) —
    // the recursive-closure oracle is shared verbatim
    "q_cc_labels" -> dupClustersSql,
    "q_leak_split" -> leakSplitSql,
    "q_containment_dups" -> containmentDupsSql,
    "q_cluster_best" -> clusterBestSql,
    "q_soft_dedup" -> softDedupSql,

    // int8 quantization: floor — not round — arithmetic, with the
    // division order written identically on both sides, so codes and
    // reconstruction errors are bit-stable across engines
    "q_vec_quant" ->
      s"""WITH m AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS maxabs
         |  FROM embeddings),
         |c AS (
         |  SELECT vec_id, embedding, maxabs,
         |    CASE WHEN maxabs > 0
         |      THEN list_transform(embedding, x -> CAST(floor(x::DOUBLE * 127.0 / maxabs) AS BIGINT))
         |      ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS codes
         |  FROM m)
         |SELECT vec_id, round(maxabs, 4) AS maxabs,
         |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
         |  CAST(list_min(codes) AS BIGINT) AS code_min,
         |  CAST(list_max(codes) AS BIGINT) AS code_max,
         |  round(list_max(list_transform(range(1, len(embedding)+1),
         |    i -> abs(embedding[i]::DOUBLE - codes[i] * (maxabs / 127.0)))), 4) AS max_err
         |FROM c ORDER BY vec_id""".stripMargin,

    // n-gram novelty: distinct grams per doc, global first-doc per
    // gram, per-source novel fraction (same gram ids as the
    // decontamination oracle: md5Mod of space-joined ws tokens)
    "q_gram_novelty" -> {
      val n = Wave4Queries.Novel.N
      s"""WITH tok AS (SELECT doc_id, source, ${wsTokensSql("text")} AS toks FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, source, h FROM (
         |    SELECT doc_id, source,
         |      unnest(list_transform(range(0, len(toks) - ${n - 1}),
         |        i -> ${PortableHash.Sql.md5Mod(s"array_to_string(toks[(i+1):(i+$n)], ' ')")})) AS h
         |    FROM tok WHERE len(toks) >= $n)),
         |first AS (SELECT h, min(doc_id) AS first_doc FROM grams GROUP BY h),
         |perdoc AS (
         |  SELECT g.doc_id, any_value(g.source) AS source,
         |    count(*) AS n_grams,
         |    sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
         |  FROM grams g JOIN first f USING (h) GROUP BY g.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_grams) AS BIGINT) AS n_grams,
         |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
         |  round(CAST(sum(n_novel) AS DOUBLE) / CAST(sum(n_grams) AS DOUBLE), 4) AS novel_ratio
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
    },
    "q_knn_brute" -> knnBruteSql,
    "q_ann_ivf" -> annIvfSql,
    "q_boilerplate" -> {
      val toks = wsTokensSql("text")
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (SELECT DISTINCT doc_id, gram FROM tk,
         |  UNNEST(CASE WHEN len(toks) >= 3 THEN list_transform(
         |    generate_series(1, len(toks)-2),
         |    i -> array_to_string(toks[i:i+2], ' ')) ELSE [] END) AS u(gram)),
         |c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_docs FROM g GROUP BY gram),
         |r AS (SELECT gram, n_docs,
         |    row_number() OVER (ORDER BY n_docs DESC, gram) AS rank
         |  FROM c)
         |SELECT gram, n_docs, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin
    },

    "q_line_dedup" ->
      s"""WITH d AS (
         |  SELECT user_id, trim(event_type) AS et,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
         |    row_number() OVER (PARTITION BY user_id, trim(event_type)
         |                       ORDER BY ts, event_id) AS rn
         |  FROM events WHERE trim(event_type) <> ''),
         |tot AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_lines
         |        FROM events GROUP BY user_id),
         |kept AS (SELECT user_id,
         |    string_agg(et, chr(10) ORDER BY pos) AS ded,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM d WHERE rn = 1 GROUP BY user_id)
         |SELECT t.user_id, t.n_lines, k.n_kept,
         |  ${PortableHash.Sql.md5Long("k.ded")} AS digest
         |FROM tot t JOIN kept k USING (user_id)
         |ORDER BY t.user_id""".stripMargin,

    "q_ann_recall" ->
      s"""WITH approx AS ($annIvfSql),
         |exact AS ($knnBruteSql),
         |a AS (SELECT query_id, neighbor_id FROM approx WHERE rank <= 3),
         |e AS (SELECT query_id, neighbor_id FROM exact WHERE rank <= 3),
         |h AS (SELECT a.query_id, count(*) AS n_hit
         |      FROM a JOIN e USING (query_id, neighbor_id) GROUP BY 1),
         |d AS (SELECT query_id, count(*) AS n_exact FROM e GROUP BY 1)
         |SELECT d.query_id, d.n_exact, coalesce(h.n_hit, 0) AS n_hit,
         |  round(coalesce(h.n_hit, 0) / d.n_exact, 4) AS recall
         |FROM d LEFT JOIN h USING (query_id) ORDER BY d.query_id""".stripMargin,
    "q_simhash" -> simhashSql,
    "q_repetition" -> {
      val toks = wsTokensSql("text")
      val uniq = s"round(len(list_distinct(toks)) / greatest(len(toks), 1), 4)"
      // modal-token count == max per-distinct-token frequency
      val top = s"round(list_max(list_transform(list_distinct(toks), t -> len(list_filter(toks, x -> x = t)))) / greatest(len(toks), 1), 4)"
      s"""WITH tk AS (SELECT source, $toks AS toks FROM documents),
         |m AS (SELECT source, $uniq AS uniq, $top AS top FROM tk)
         |SELECT source, count(*) AS n_docs,
         |  ${decAvg("uniq")} AS avg_unique_ratio,
         |  ${decAvg("top")} AS avg_top_share
         |FROM m GROUP BY source ORDER BY source""".stripMargin
    },

    "q_gopher_rep" -> {
      import graft.functions.Repetition._
      val toks = wsTokensSql("text")
      def grams(n: Int) =
        s"""CASE WHEN len(toks) >= $n THEN list_transform(
           |generate_series(1, len(toks)-${n - 1}),
           |i -> array_to_string(toks[i:i+${n - 1}], ' ')) ELSE [] END"""
          .stripMargin.replace("\n", " ")
      // count of gram d inside list g
      def cnt(g: String) = s"len(list_filter($g, x -> x = d))"
      def dupChars(g: String) =
        s"""coalesce(list_sum(list_transform(list_distinct($g), d ->
           |CASE WHEN ${cnt(g)} > 1 THEN ${cnt(g)} * length(d) ELSE 0 END)), 0)"""
          .stripMargin.replace("\n", " ")
      def maxCnt(g: String) =
        s"coalesce(list_max(list_transform(list_distinct($g), d -> ${cnt(g)})), 0)"
      // longest gram achieving the max count (Repetition's tie-break)
      def topChars(g: String, mx: String) =
        s"""$mx * coalesce(list_max(list_transform(list_distinct($g), d ->
           |CASE WHEN ${cnt(g)} = $mx THEN length(d) END)), 0)"""
          .stripMargin.replace("\n", " ")
      s"""WITH lt AS (SELECT source, $toks AS toks,
         |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
         |                l -> l <> '') AS ls
         |  FROM documents),
         |g AS (SELECT source, ls, ${grams(2)} AS g2, ${grams(3)} AS g3,
         |    length(array_to_string(toks, ' ')) AS chars
         |  FROM lt),
         |mx AS (SELECT *, ${maxCnt("g2")} AS maxc2, ${maxCnt("g3")} AS maxc3 FROM g),
         |m AS (SELECT source,
         |    round((len(ls) - len(list_distinct(ls))) / greatest(len(ls), 1), 4) AS dlf,
         |    round(${dupChars("ls")} /
         |      greatest(coalesce(list_sum(list_transform(ls, l -> length(l))), 0), 1), 4) AS dlcf,
         |    round(${topChars("g2", "maxc2")} / greatest(chars, 1), 4) AS t2,
         |    round(${topChars("g3", "maxc3")} / greatest(chars, 1), 4) AS t3,
         |    round(${dupChars("g2")} / greatest(chars, 1), 4) AS d2
         |  FROM mx)
         |SELECT source, count(*) AS n_docs,
         |  ${dsumL(s"CASE WHEN dlf > $DupLineFracMax OR dlcf > $DupLineCharFracMax " +
          s"OR t2 > ${TopNgramCharFracMax(2)} OR t3 > ${TopNgramCharFracMax(3)} " +
          "THEN 1 ELSE 0 END")} AS n_flagged,
         |  ${decAvg("dlf")} AS avg_dup_line_frac,
         |  ${decAvg("dlcf")} AS avg_dup_line_char_frac,
         |  ${decAvg("t2")} AS avg_top2_char_frac,
         |  ${decAvg("t3")} AS avg_top3_char_frac,
         |  ${decAvg("d2")} AS avg_dup2_char_frac
         |FROM m GROUP BY source ORDER BY source""".stripMargin
    },

    "q_interval_overlap" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sessions AS (
         |  SELECT user_id, ts,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM flagged
         |), bounds AS (
         |  SELECT user_id, session_seq,
         |    epoch_us(min(ts)) AS s_start, epoch_us(max(ts)) AS s_end
         |  FROM sessions GROUP BY user_id, session_seq
         |), hours AS (
         |  SELECT DISTINCT user_id,
         |    (epoch_us(ts) // 3600000000) * 3600000000 AS h_start
         |  FROM events)
         |SELECT b.user_id, b.session_seq, CAST(count(*) AS BIGINT) AS n_hours
         |FROM bounds b JOIN hours h
         |  ON h.user_id = b.user_id
         | AND b.s_start <= h.h_start + 3599999999
         | AND h.h_start <= b.s_end
         |GROUP BY b.user_id, b.session_seq
         |ORDER BY b.user_id, b.session_seq""".stripMargin,

    "q_range_join" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sessions AS (
         |  SELECT user_id, ts,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM flagged
         |), bounds AS (
         |  SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e
         |  FROM sessions GROUP BY user_id, session_seq)
         |SELECT b.user_id, b.session_seq, count(*) AS n_matched
         |FROM bounds b JOIN events ev
         |  ON ev.user_id = b.user_id AND ev.ts BETWEEN b.s AND b.e
         |GROUP BY b.user_id, b.session_seq
         |ORDER BY b.user_id, b.session_seq""".stripMargin,

    "q_sample" -> sampleSql,
    "q_split" -> splitSql,
    "q_stratified" -> stratifiedSql,
    "q_binary_features" ->
      s"""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(hex(encode(text))) AS digest
         |FROM documents ORDER BY doc_id""".stripMargin
  )

  /** Ratio fragments mirroring Text.punctRatio / stopwordRatio /
    * meanTokenLen / qualityScore exactly (incl. rounding points).
    */
  private def punctSql(x: String) =
    s"round((length($x) - length(regexp_replace($x, '[.,;:!?]', '', 'g'))) / greatest(length($x), 1), 4)"
  private def digitSql(x: String) =
    s"round((length($x) - length(regexp_replace($x, '[0-9]', '', 'g'))) / greatest(length($x), 1), 4)"
  private def stopSql(x: String) = {
    val list = Text.Stopwords.map(w => s"'$w'").mkString(", ")
    s"round(len(list_filter(${wsTokensSql(x)}, t -> t IN ($list))) / greatest(len(${wsTokensSql(x)}), 1), 4)"
  }
  private def mtlSql(x: String) =
    s"round(list_sum(list_transform(${wsTokensSql(x)}, t -> length(t))) / greatest(len(${wsTokensSql(x)}), 1), 4)"
  private def qualitySql(x: String) =
    s"""round(0.4 * least(length($x) / 500.0, 1.0)
       | + 0.3 * (1.0 - least((${punctSql(x)} + ${digitSql(x)}) * 5.0, 1.0))
       | + 0.3 * least(${stopSql(x)} * 5.0, 1.0), 4)""".stripMargin.replace("\n", " ")

  private def decAvg(x: String) =
    s"round(CAST(sum(CAST($x AS DECIMAL(8,4))) AS DOUBLE) / count(*), 4)"

  /** Integer sum as BIGINT (DuckDB sums to HUGEINT/DECIMAL). */
  private def dsumL(x: String) = s"CAST(sum($x) AS BIGINT)"

  /** Mirrors functions/QualityRules — thresholds, stopword list and
    * bullet markers are spliced from the same Scala constants so the
    * two sides cannot drift.
    */
  private def qualityRulesSql: String = {
    import graft.functions.QualityRules._
    val stopList = RequiredStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    val bulletCond =
      BulletPrefixes.map(p => s"starts_with(trim(l), '$p')").mkString(" OR ")
    s"""WITH sig AS (
       |  SELECT source, text,
       |    ${wsTokensSql("text")} AS toks,
       |    ${wordTokensSql("text")} AS wtoks,
       |    string_split(text, chr(10)) AS ls
       |  FROM documents),
       |m AS (
       |  SELECT source,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    round(list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1), 4) AS mwl,
       |    round((${occSql("text", "#")} + ${occSql("text", "...")}) / greatest(len(toks), 1), 4) AS symr,
       |    round(len(list_filter(ls, l -> $bulletCond)) / greatest(len(ls), 1), 4) AS bulr,
       |    round(len(list_filter(ls, l -> ends_with(rtrim(l), '...'))) / greatest(len(ls), 1), 4) AS ellr,
       |    round(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) / greatest(len(toks), 1), 4) AS alpr,
       |    CAST(len(list_intersect(wtoks, $stopList)) AS BIGINT) AS stoph
       |  FROM sig),
       |f AS (
       |  SELECT source, alpr, mwl,
       |    CASE WHEN n_words < $MinWords OR n_words > $MaxWords THEN 1 ELSE 0 END AS f_words,
       |    CASE WHEN mwl < $MinMeanWordLen OR mwl > $MaxMeanWordLen THEN 1 ELSE 0 END AS f_mwl,
       |    CASE WHEN symr > $MaxSymbolRatio THEN 1 ELSE 0 END AS f_symbol,
       |    CASE WHEN bulr > $MaxBulletRatio THEN 1 ELSE 0 END AS f_bullet,
       |    CASE WHEN ellr > $MaxEllipsisRatio THEN 1 ELSE 0 END AS f_ellipsis,
       |    CASE WHEN alpr < $MinAlphaRatio THEN 1 ELSE 0 END AS f_alpha,
       |    CASE WHEN stoph < $MinStopHits THEN 1 ELSE 0 END AS f_stop
       |  FROM m)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN f_words + f_mwl + f_symbol + f_bullet + f_ellipsis + f_alpha + f_stop = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(sum(f_words) AS BIGINT) AS f_words,
       |  CAST(sum(f_mwl) AS BIGINT) AS f_mwl,
       |  CAST(sum(f_symbol) AS BIGINT) AS f_symbol,
       |  CAST(sum(f_bullet) AS BIGINT) AS f_bullet,
       |  CAST(sum(f_ellipsis) AS BIGINT) AS f_ellipsis,
       |  CAST(sum(f_alpha) AS BIGINT) AS f_alpha,
       |  CAST(sum(f_stop) AS BIGINT) AS f_stop,
       |  ${decAvg("alpr")} AS avg_alpha,
       |  ${decAvg("mwl")} AS avg_mwl
       |FROM f GROUP BY source ORDER BY source""".stripMargin
  }

  /** Mirrors Similarity.srpPairs — the ±1 hyperplane matrix is spliced
    * from the same Srp.signMatrix call the Spark side uses.
    */
  private def srpPairsSql: String = {
    import graft.functions.Srp
    val (nbits, bands, dim) = (16, 4, 64)
    val r = nbits / bands
    val matrix = Srp.signMatrix(nbits, dim)
    val bandSelects = (0 until bands).map { b =>
      s"SELECT id, $b AS band, ${Srp.Sql.bandValue("sig", b, r)} AS bh FROM s"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |s AS (SELECT id, ${Srp.Sql.signature("v", matrix)} AS sig FROM e),
       |b AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.id AS a_id, b2.id AS b_id
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bh = b2.bh AND a.id < b2.id)
       |SELECT a_id, b_id,
       |  round(list_cosine_similarity(ea.v::DOUBLE[], eb.v::DOUBLE[]), 4) AS cosine
       |FROM cand
       |JOIN e ea ON cand.a_id = ea.id
       |JOIN e eb ON cand.b_id = eb.id
       |WHERE round(list_cosine_similarity(ea.v::DOUBLE[], eb.v::DOUBLE[]), 4) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin
  }

  private def textStatsSql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |  ${decAvg(punctSql("text"))} AS avg_punct,
       |  ${decAvg(stopSql("text"))} AS avg_stopword,
       |  ${decAvg(mtlSql("text"))} AS avg_token_len,
       |  ${decAvg(qualitySql("text"))} AS avg_quality
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  private def langIdSql: String = {
    val padded = "(' ' || lower(text) || ' ')"
    val scores = Text.LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(m => occSql("p", m)).mkString(" + ")
    }
    val scoreCols = scores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n    ")
    val gm = s"greatest(${scores.map(s => s"s_${s._1}").mkString(", ")})"
    val caseExpr = scores.init
      .map { case (l, _) => s"WHEN s_$l = $gm THEN '$l'" }
      .mkString("CASE ", " ", s" ELSE '${scores.last._1}' END")
    s"""WITH scored AS (
       |  SELECT lang, $scoreCols
       |  FROM (SELECT lang, $padded AS p FROM documents))
       |SELECT lang, $caseExpr AS predicted, count(*) AS n_docs
       |FROM scored GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  private def sigSelect: String = sigSelect(false)

  private def sigSelect(recursive: Boolean): String = {
    val sigs = (0 until NumHashes)
      .map(j => s"${minhashSql("hs", j)} AS sig_$j")
      .mkString(",\n    ")
    s"""WITH ${if (recursive) "RECURSIVE " else ""}sh AS (
       |  SELECT doc_id, text, ${shinglesSql("text", K)} AS shs FROM documents),
       |hashed AS (
       |  SELECT doc_id, text, shs, ${shingleHashesSql("shs")} AS hs FROM sh),
       |sig AS (
       |  SELECT doc_id, text, shs, hs,
       |    $sigs
       |  FROM hashed)""".stripMargin
  }

  /** Containment near-dups over the rare-shingle inverted index —
    * the same shingle-hash sets as the minhash chain, blocked by
    * corpus document frequency in [2, MaxDf], verified by
    * `intersect / min(|A|, |B|)`; mirrors NearDup.containmentPairs
    * exactly (including the declared blocking assumption).
    */
  private def containmentDupsSql: String = {
    import graft.queries.PipelineQueries.ContainParams
    s"""$sigSelect,
       |sigd AS (SELECT doc_id, list_sort(list_distinct(hs)) AS shset FROM sig),
       |inv AS (SELECT doc_id, unnest(shset) AS g FROM sigd),
       |dfreq AS (SELECT g FROM inv GROUP BY g
       |          HAVING count(*) BETWEEN 2 AND ${ContainParams.MaxDf}),
       |blocked AS (SELECT i.doc_id, i.g FROM inv i JOIN dfreq d ON i.g = d.g),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |         FROM blocked a JOIN blocked b ON a.g = b.g AND a.doc_id < b.doc_id),
       |ver AS (SELECT a_id, b_id,
       |    round(len(list_intersect(sa.shset, sb.shset))::DOUBLE /
       |      least(len(sa.shset), len(sb.shset)), 4) AS containment
       |  FROM cand
       |  JOIN sigd sa ON sa.doc_id = a_id
       |  JOIN sigd sb ON sb.doc_id = b_id)
       |SELECT a_id, b_id, containment FROM ver
       |WHERE containment >= ${ContainParams.Threshold}
       |ORDER BY a_id, b_id""".stripMargin
  }

  private def minhashQuerySql: String =
    s"""$sigSelect
       |SELECT doc_id, ${(0 until NumHashes).map(j => s"sig_$j").mkString(", ")}
       |FROM sig ORDER BY doc_id""".stripMargin

  /** The shared CTE chain ending in `verified(a_id, b_id, jaccard)`. */
  private def minhashPairsCtes(recursive: Boolean): String = {
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val sigs = (b * rows until (b + 1) * rows).map(j => s"sig_$j").mkString(", ")
      s"SELECT doc_id, shset, $b AS band, md5(concat_ws('|', $sigs)) AS bh FROM sigd"
    }.mkString("\n  UNION ALL\n  ")
    s"""${sigSelect(recursive)},
       |sigd AS (SELECT *, list_sort(list_distinct(hs)) AS shset FROM sig),
       |banded AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |verified AS (
       |  SELECT a_id, b_id,
       |    round(len(list_intersect(sa.shset, sb.shset)) /
       |      (len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset))), 4) AS jaccard
       |  FROM cand
       |  JOIN sigd sa ON sa.doc_id = a_id
       |  JOIN sigd sb ON sb.doc_id = b_id)""".stripMargin
  }

  private def minhashPairsSql: String =
    s"""${minhashPairsCtes(false)}
       |SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  /** Connected components of the ≥0.5-Jaccard pair graph via a
    * recursive transitive-closure CTE, labeling each doc with the
    * minimum reachable doc id (mirrors NearDup.dupClusters).
    */
  /** The cumulative-boundary CASE mirroring Sampling.splitLabel —
    * ONE definition shared by every split-assigning oracle.
    */
  private def splitCaseSql: String = {
    val weights = PipelineQueries.SplitWeights
    val cumulative = weights.scanLeft(0.0)(_ + _._2).tail
    weights.zip(cumulative).init
      .map { case ((name, _), upper) => s"WHEN b < $upper THEN '$name'" }
      .mkString("CASE ", " ", s" ELSE '${weights.last._1}' END")
  }

  private def leakSplitSql: String = {
    val cases = splitCaseSql
    s"""${minhashPairsCtes(true)},
       |pairs AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |e AS (SELECT a_id AS s, b_id AS t FROM pairs
       |      UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s),
       |cmap AS (
       |  SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |  FROM reach GROUP BY s),
       |rep AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS rep
       |  FROM documents d LEFT JOIN cmap c USING (doc_id)),
       |lab AS (SELECT doc_id, rep, ${bucketSql("split", "rep")} AS b FROM rep),
       |asg AS (SELECT doc_id, rep, $cases AS split FROM lab),
       |straddle AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
       |  SELECT rep FROM asg GROUP BY rep HAVING count(DISTINCT split) > 1))
       |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
       |  (SELECT n FROM straddle) AS n_straddle
       |FROM asg GROUP BY split ORDER BY split""".stripMargin
  }

  private def dupClustersSql: String =
    s"""${minhashPairsCtes(true)},
       |pairs AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |e AS (SELECT a_id AS s, b_id AS t FROM pairs
       |      UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s)
       |SELECT s AS id, least(s, min(t)) AS cluster_id
       |FROM reach GROUP BY s ORDER BY id""".stripMargin

  /** Mirrors Wave4Queries.qClusterBest: the q_dup_clusters component
    * map, then the longest doc (id tie-break) survives per cluster;
    * unclustered docs are their own cluster.
    */
  private def clusterBestSql: String =
    s"""${minhashPairsCtes(true)},
       |pairs AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |e AS (SELECT a_id AS s, b_id AS t FROM pairs
       |      UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s),
       |cmap AS (
       |  SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |  FROM reach GROUP BY s),
       |kept AS (
       |  SELECT source, doc_id, n_chars FROM (
       |    SELECT d.source, d.doc_id, d.n_chars,
       |      row_number() OVER (
       |        PARTITION BY coalesce(c.cluster_id, d.doc_id)
       |        ORDER BY d.n_chars DESC, d.doc_id) AS rn
       |    FROM documents d LEFT JOIN cmap c USING (doc_id)) WHERE rn = 1)
       |SELECT source, count(*) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  min(doc_id) AS min_id
       |FROM kept GROUP BY source ORDER BY source""".stripMargin

  /** Mirrors NearDup.softDedup over the q_dup_clusters component map:
    * every cluster member survives iff
    * `md5('soft'|id) · |cluster| < 2³¹−1` — EXACT integer arithmetic,
    * no float probability — and unclustered docs always survive.
    */
  private def softDedupSql: String =
    s"""${minhashPairsCtes(true)},
       |pairs AS (SELECT a_id, b_id FROM verified WHERE jaccard >= 0.5),
       |e AS (SELECT a_id AS s, b_id AS t FROM pairs
       |      UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s),
       |cmap AS (
       |  SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |  FROM reach GROUP BY s),
       |csz AS (SELECT cluster_id, count(*) AS sz FROM cmap GROUP BY cluster_id),
       |kept AS (
       |  SELECT d.source, d.doc_id, d.n_chars
       |  FROM documents d
       |  LEFT JOIN (SELECT c.doc_id, z.sz FROM cmap c JOIN csz z USING (cluster_id)) m
       |    USING (doc_id)
       |  WHERE ${PortableHash.Sql.md5Mod("'soft' || '|' || CAST(d.doc_id AS VARCHAR)")}
       |    * coalesce(m.sz, 1) < ${PortableHash.Prime})
       |SELECT source, count(*) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  min(doc_id) AS min_id
       |FROM kept GROUP BY source ORDER BY source""".stripMargin

  /** Mirrors Similarity.ivfAssign + ivfTopK exactly: deterministic
    * seed centroids (vec_id % 100 == 0), rounded-L2 argmin assignment
    * with centroid-id tie-break, in-bucket rounded-cosine top-3.
    */
  private def annIvfSql: String = {
    val l2 = "round(list_sum(list_transform(range(1, len(e.embedding)+1), " +
      "i -> (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE) * (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE))), 4)"
    s"""WITH cents AS (
       |  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id % 100 = 0),
       |dists AS (
       |  SELECT e.vec_id, e.embedding, c.centroid_id, $l2 AS d2
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
       |    FROM dists) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
       |      FROM assigned WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv::DOUBLE[], a.embedding::DOUBLE[]), 4) AS sim
       |  FROM q JOIN assigned a USING (centroid_id)
       |  WHERE a.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Mirrors NearDup.simhash: 16-bit bit-majority over md5-derived
    * 48-bit token hashes ((h // 2^i) % 2 == floor-shift bit test).
    */
  private def simhashSql: String = {
    val bits = 16
    val hs = s"list_transform(${wsTokensSql("text")}, t -> ${PortableHash.Sql.md5Long("t")})"
    val terms = (0 until bits).map { i =>
      val p = 1L << i
      s"(CASE WHEN list_sum(list_transform(hs, x -> CASE WHEN (x // $p) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH h AS (SELECT doc_id, $hs AS hs FROM documents)
       |SELECT doc_id, CAST($terms AS BIGINT) AS simhash
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** Mirrors Sampling.hashBucket: md5-gated uniform bucket in [0,1). */
  private def bucketSql(salt: String, idExpr: String): String =
    s"(${PortableHash.Sql.md5Mod(s"'$salt' || '|' || CAST($idExpr AS VARCHAR)")} / ${PortableHash.Prime}.0)"

  private def sampleSql: String =
    s"""SELECT lang, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
       |FROM documents WHERE ${bucketSql("sample", "doc_id")} < 0.2
       |GROUP BY lang ORDER BY lang""".stripMargin

  private def splitSql: String = {
    val cases = splitCaseSql
    s"""WITH b AS (SELECT lang, ${bucketSql("split", "doc_id")} AS b FROM documents)
       |SELECT $cases AS split, lang, count(*) AS n_docs
       |FROM b GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }

  private def stratifiedSql: String = {
    // mirrors Sampling.stratifiedSample's foldLeft nesting order
    val rate = PipelineQueries.MixRates.foldLeft("0.5") { case (acc, (g, r)) =>
      s"CASE WHEN source = '$g' THEN $r ELSE $acc END"
    }
    s"""SELECT source, count(*) AS n_docs FROM documents
       |WHERE ${bucketSql("mix", "doc_id")} < $rate
       |GROUP BY source ORDER BY source""".stripMargin
  }

  private def knnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 4) AS sim
       |  FROM q CROSS JOIN embeddings c
       |  WHERE q.query_id != c.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---------- wave 2 ----------

  val wave2: Map[String, String] = Map(
    "q_asof_join" ->
      s"""WITH purchases AS (
         |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hts, count(*) AS hourly_events
         |  FROM events GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
         |  epoch_us(h.hts) AS hour_us, h.hourly_events
         |FROM purchases p ASOF JOIN hourly h
         |  ON p.user_id = h.user_id AND p.ts >= h.hts
         |ORDER BY p.event_id""".stripMargin,

    "q_asof_tolerance" -> {
      val tol = Wave2Queries.AsofToleranceUs
      s"""WITH purchases AS (
         |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hts, count(*) AS hourly_events
         |  FROM events GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
         |  CASE WHEN epoch_us(p.ts) - epoch_us(h.hts) <= $tol
         |       THEN epoch_us(h.hts) END AS hour_us,
         |  CASE WHEN epoch_us(p.ts) - epoch_us(h.hts) <= $tol
         |       THEN h.hourly_events END AS hourly_events
         |FROM purchases p ASOF LEFT JOIN hourly h
         |  ON p.user_id = h.user_id AND p.ts >= h.hts
         |ORDER BY p.event_id""".stripMargin
    },

    "q_asof_forward" ->
      s"""WITH purchases AS (
         |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         |hourly AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hts, count(*) AS hourly_events
         |  FROM events GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
         |  epoch_us(h.hts) AS hour_us, h.hourly_events
         |FROM purchases p ASOF JOIN hourly h
         |  ON p.user_id = h.user_id AND p.ts <= h.hts
         |ORDER BY p.event_id""".stripMargin,

    "q_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |  ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_quantiles" ->
      s"""SELECT o_orderpriority,
         |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
         |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
         |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_json_extract" ->
      s"""SELECT event_type,
         |  count(json_extract_string(props, '$$.k')) AS n_with_k,
         |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         |  min(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS min_k,
         |  max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS max_k
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_string_funcs" ->
      s"""SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 8) AS prefix,
         |  length(c_name) AS name_len, reverse(c_name) AS rname,
         |  concat_ws('-', c_mktsegment, c_name) AS tagged,
         |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded
         |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "q_date_funcs" ->
      s"""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
         |  count(*) AS n_orders,
         |  min(datediff('day', DATE '1995-01-01', o_orderdate)) AS min_days,
         |  max(datediff('day', DATE '1995-01-01', o_orderdate)) AS max_days
         |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin,

    "q_conditional_agg" ->
      s"""SELECT l_returnflag,
         |  count(CASE WHEN l_quantity > 40 THEN 1 END) AS n_large,
         |  count(CASE WHEN l_discount >= 0.05 THEN 1 END) AS n_discounted,
         |  ${dsum(s"CASE WHEN l_returnflag = 'R' THEN ${d4("l_extendedprice")} ELSE CAST(0 AS DECIMAL(12,4)) END")} AS returned_value
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_set_ops" ->
      s"""WITH b95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         |b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
         |SELECT 'both_years' AS cohort,
         |  (SELECT count(*) FROM (SELECT * FROM b95 INTERSECT SELECT * FROM b96)) AS n_customers
         |UNION ALL SELECT 'either_year',
         |  (SELECT count(*) FROM (SELECT * FROM b95 UNION SELECT * FROM b96))
         |UNION ALL SELECT 'only_1995',
         |  (SELECT count(*) FROM (SELECT * FROM b95 EXCEPT SELECT * FROM b96))
         |ORDER BY cohort""".stripMargin,

    "q_window_funcs" ->
      s"""SELECT o_custkey, o_orderkey,
         |  row_number() OVER w AS rn,
         |  lag(o_orderkey, 1) OVER w AS prev_order,
         |  lead(o_orderkey, 1) OVER w AS next_order,
         |  ntile(4) OVER w AS quartile,
         |  round(percent_rank() OVER w, 4) AS pct_rank,
         |  round(cume_dist() OVER w, 4) AS cdist
         |FROM orders WHERE o_custkey <= 20
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, rn""".stripMargin,

    "q_pivot" ->
      s"""SELECT o_orderpriority,
         |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_sql_interface" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders
         |FROM orders o
         |WHERE EXISTS (
         |  SELECT 1 FROM lineitem l
         |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q_collect_sorted" ->
      s"""SELECT o_orderpriority,
         |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
         |  count(DISTINCT o_orderstatus) AS n_statuses
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_vector_stats" ->
      s"""WITH n AS (
         |  SELECT label,
         |    round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS nrm
         |  FROM embeddings)
         |SELECT label, count(*) AS n_vecs,
         |  round(CAST(sum(CAST(nrm AS DECIMAL(12,4))) AS DOUBLE) / count(*), 4) AS avg_norm,
         |  round(min(nrm), 4) AS min_norm,
         |  round(max(nrm), 4) AS max_norm
         |FROM n GROUP BY label ORDER BY label""".stripMargin
  )

  // ---------- wave 3 (round 2) ----------

  val wave3: Map[String, String] = Map(
    // the Spark side reads a delta table built as: full nation, then
    // DELETE WHERE n_regionkey = 0 — so the oracle is the equivalent
    // SELECT over the source nation table
    "q_delta_read" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey <> 0 AND n_nationkey >= 5
        |ORDER BY n_nationkey""".stripMargin,

    // versionAsOf 0 predates the DELETE: full nation
    "q_delta_time_travel" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    // Spark side reads a delta table built as: full customer, then a
    // merge-on-read DELETE WHERE c_acctbal < 0 via deletion vectors
    // (no file rewritten — rows masked by a row-index bitmap at scan).
    // IS NOT TRUE mirrors DELETE semantics: NULL-predicate rows survive.
    "q_delta_dv" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND (c_acctbal < 0) IS NOT TRUE
        |ORDER BY c_custkey""".stripMargin,

    // Spark side reads the change data feed of a delta table built as:
    // v0 append (o_orderkey % 4 != 3), v1 enable CDF, v2 append the
    // rest, v3 DELETE WHERE o_orderstatus = 'F' (cdc files), v4 MERGE
    // (keys %100==0 → 'U'; deleted-at-v3 keys re-enter as inserts;
    // shifted %2000==0 keys insert). Reconstructed from the raw source.
    "q_delta_cdf" ->
      """WITH ch AS (
        |  SELECT o_orderkey, 'insert' AS change_type, 0 AS commit_version
        |  FROM orders WHERE o_orderkey % 4 <> 3
        |  UNION ALL
        |  SELECT o_orderkey, 'insert', 2 FROM orders WHERE o_orderkey % 4 = 3
        |  UNION ALL
        |  SELECT o_orderkey, 'delete', 3 FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, 'update_preimage', 4 FROM orders
        |  WHERE o_orderkey % 100 = 0 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, 'update_postimage', 4 FROM orders
        |  WHERE o_orderkey % 100 = 0 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, 'insert', 4 FROM orders
        |  WHERE o_orderkey % 100 = 0 AND o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey + 200000000, 'insert', 4 FROM orders
        |  WHERE o_orderkey % 2000 = 0)
        |SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
        |  count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM ch GROUP BY 1, 2
        |ORDER BY commit_version, change_type""".stripMargin,

    // Spark side reads a delta table after MERGE: updates for keys
    // %10==0 (+1000 price), inserts with fresh keys for %1000==0.
    "q_delta_merge" ->
      s"""WITH merged AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 10 <> 0
         |  UNION ALL
         |  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000
         |  FROM orders WHERE o_orderkey % 10 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 100000000, 'N', o_totalprice
         |  FROM orders WHERE o_orderkey % 1000 = 0)
         |SELECT o_orderstatus, count(*) AS n_rows,
         |  ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Spark side maintains the view INCREMENTALLY from the change
    // feed (delete F / update O +10 / append %3 as N folded into one
    // refresh); the oracle recomputes the final state from scratch
    "q_incr_view" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    ${d4("o_totalprice")} AS price FROM orders),
         |afterupd AS (
         |  SELECT o_orderkey, o_orderstatus,
         |    CASE WHEN o_orderstatus = 'O'
         |      THEN CAST(price + 10 AS DECIMAL(12,4)) ELSE price END AS price
         |  FROM base WHERE o_orderstatus <> 'F'),
         |appended AS (
         |  SELECT o_orderkey, 'N' AS o_orderstatus, price
         |  FROM base WHERE o_orderkey % 3 = 0),
         |finalstate AS (
         |  SELECT * FROM afterupd UNION ALL SELECT * FROM appended)
         |SELECT o_orderstatus, count(*) AS n_rows,
         |  ${dsum("price")} AS sum_price
         |FROM finalstate GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )

  // ---------- wave 4 (round 5) ----------

  val wave4: Map[String, String] = {
    import Wave4Queries.{Bm25, Lm, Substr}
    val termList = Bm25.Terms.map(t => s"'$t'").mkString(", ")
    // shared by q_bm25 and q_hybrid_search (the lexical tower)
    val bm25Ctes =
      s"""dl AS (
         |  SELECT doc_id, CAST(len(${wordTokensSql("text")}) AS BIGINT) AS dl,
         |    ${wordTokensSql("text")} AS toks
         |  FROM documents
         |), stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(dl) AS DOUBLE) AS sum_dl FROM dl
         |), tf AS (
         |  SELECT doc_id, dl, tok, CAST(count(*) AS DOUBLE) AS tf
         |  FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM dl)
         |  WHERE tok IN ($termList)
         |  GROUP BY doc_id, dl, tok
         |), df AS (
         |  SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok
         |), idf AS (
         |  SELECT tok, round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
         |  FROM df CROSS JOIN stats
         |), scored AS (
         |  SELECT doc_id,
         |    CAST(round(idf * (tf * (${Bm25.K1} + 1.0) /
         |      (tf + ${Bm25.K1} * (1.0 - ${Bm25.B} + ${Bm25.B} * CAST(dl AS DOUBLE) / (sum_dl / n_docs)))), 6)
         |      AS DECIMAL(18,6)) AS contrib
         |  FROM tf JOIN idf USING (tok) CROSS JOIN stats
         |)""".stripMargin
    Map(
      "q_cube" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           |  count(*) AS n_items, ${dsum(d4("l_quantity"))} AS sum_qty
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

      "q_window_range" ->
        s"""SELECT o_orderkey, o_custkey, d,
           |  round(CAST(sum(${d4("o_totalprice")}) OVER w AS DOUBLE), 4) AS trailing_sum,
           |  count(*) OVER w AS trailing_n
           |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
           |        CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
           |      FROM orders WHERE o_custkey <= 200)
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
           |             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
           |ORDER BY o_orderkey""".stripMargin,

      // constants (k1, b, terms) spliced from Wave4Queries.Bm25 so the
      // two sides cannot drift; arithmetic trees mirror the Spark
      // column expressions operation-for-operation (IEEE-identical)
      "q_bm25" ->
        s"""WITH $bm25Ctes
           |SELECT doc_id, round(CAST(sum(contrib) AS DOUBLE), 4) AS score, count(*) AS n_terms
           |FROM scored GROUP BY doc_id
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

      // lexical (BM25) rank ∪ vector (cosine-to-probe) rank, each
      // reciprocal rounded before the decimal sum — Cormack 2009 RRF
      "q_hybrid_search" -> {
        val k = Wave4Queries.Rrf.K
        s"""WITH $bm25Ctes,
           |lexs AS (
           |  SELECT doc_id, round(CAST(sum(contrib) AS DOUBLE), 4) AS score
           |  FROM scored GROUP BY doc_id),
           |lex AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |  FROM (SELECT * FROM lexs ORDER BY score DESC, doc_id
           |        LIMIT ${Wave4Queries.Rrf.ListN})),
           |probe AS (
           |  SELECT embedding AS pv FROM embeddings
           |  WHERE vec_id = ${Wave4Queries.Rrf.Probe}),
           |vecs AS (
           |  SELECT vec_id AS doc_id,
           |    round(list_cosine_similarity(embedding::DOUBLE[], pv::DOUBLE[]), 4) AS sim
           |  FROM embeddings CROSS JOIN probe),
           |vec AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
           |  FROM (SELECT * FROM vecs ORDER BY sim DESC, doc_id
           |        LIMIT ${Wave4Queries.Rrf.ListN})),
           |contribs AS (
           |  SELECT doc_id, CAST(round(1.0 / ($k + CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS c FROM lex
           |  UNION ALL
           |  SELECT doc_id, CAST(round(1.0 / ($k + CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS c FROM vec)
           |SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS rrf, count(*) AS n_lists
           |FROM contribs GROUP BY doc_id
           |ORDER BY rrf DESC, doc_id LIMIT ${Wave4Queries.Rrf.TopN}""".stripMargin
      },

      // p(w2|w1) = (c2+α)/(c1+α·V): exact integer counts, one IEEE
      // division, rounded per-bigram then decimal-summed — no
      // transcendentals, bit-stable by construction
      "q_ngram_lm" ->
        s"""WITH toks AS (
           |  SELECT doc_id, source, ${wordTokensSql("text")} AS t FROM documents
           |), uni AS (
           |  SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
           |), vocab AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS v FROM uni
           |), bg AS (
           |  SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
           |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t))) AS i
           |        FROM toks WHERE len(t) >= 2)
           |), bgc AS (
           |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
           |), scored AS (
           |  SELECT source,
           |    CAST(round((CAST(c2 AS DOUBLE) + ${Lm.Alpha}) /
           |      (CAST(c1 AS DOUBLE) + ${Lm.Alpha} * v), 6) AS DECIMAL(18,6)) AS p6
           |  FROM bg JOIN bgc USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN vocab
           |)
           |SELECT source, count(*) AS n_bigrams,
           |  round(CAST(sum(p6) AS DOUBLE) / count(*), 6) AS avg_p
           |FROM scored GROUP BY source ORDER BY source""".stripMargin,

      // ccnet-style tercile split over the same LM scores; the cut is
      // ntile over (score desc, doc_id) — a total order both engines
      // reproduce exactly, unlike interpolated percentile thresholds
      "q_ppl_buckets" ->
        s"""WITH toks AS (
           |  SELECT doc_id, source, ${wordTokensSql("text")} AS t FROM documents
           |), uni AS (
           |  SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
           |), vocab AS (
           |  SELECT CAST(count(*) AS DOUBLE) AS v FROM uni
           |), bg AS (
           |  SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
           |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t))) AS i
           |        FROM toks WHERE len(t) >= 2)
           |), bgc AS (
           |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
           |), scored AS (
           |  SELECT doc_id, source,
           |    CAST(round((CAST(c2 AS DOUBLE) + ${Lm.Alpha}) /
           |      (CAST(c1 AS DOUBLE) + ${Lm.Alpha} * v), 6) AS DECIMAL(18,6)) AS p6
           |  FROM bg JOIN bgc USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN vocab
           |), doc_scores AS (
           |  SELECT doc_id, source, sum(p6) AS sp6, count(*) AS nbg,
           |    CAST(sum(p6) AS DOUBLE) / count(*) AS score
           |  FROM scored GROUP BY doc_id, source
           |), cut AS (
           |  SELECT doc_id, source, sp6, nbg,
           |    ntile(3) OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS tercile
           |  FROM doc_scores
           |)
           |SELECT source,
           |  CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           |  count(*) AS n_docs,
           |  round(CAST(sum(sp6) AS DOUBLE), 6) AS sum_score,
           |  CAST(sum(nbg) AS BIGINT) AS n_bigrams,
           |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM cut GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

      // the Spark side reads a shallow CLONE edited as: DELETE WHERE
      // p_partkey < 200, then append of p_partkey >= 1800 shifted by
      // 1e6 — reconstructed here from the raw part table
      "q_delta_clone" ->
        s"""WITH cloned AS (
           |  SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_partkey >= 200
           |  UNION ALL
           |  SELECT p_partkey + 1000000, p_brand, p_retailprice FROM part
           |  WHERE p_partkey >= 1800)
           |SELECT p_brand, count(*) AS n_parts,
           |  CAST(sum(p_partkey) AS BIGINT) AS sum_key,
           |  ${dsum(d4("p_retailprice"))} AS sum_price
           |FROM cloned GROUP BY p_brand ORDER BY p_brand""".stripMargin,

      // reconstructs the Spark side's UPDATE (p_partkey < 500 gets
      // size+100 / price+10) from the raw part table
      "q_delta_update" ->
        s"""WITH updated AS (
           |  SELECT p_brand,
           |    CASE WHEN p_partkey < 500 THEN p_size + 100 ELSE p_size END AS p_size,
           |    CASE WHEN p_partkey < 500 THEN p_retailprice + 10 ELSE p_retailprice END AS p_retailprice
           |  FROM part)
           |SELECT p_brand, count(*) AS n_parts,
           |  CAST(sum(p_size) AS BIGINT) AS sum_size,
           |  ${dsum(d4("p_retailprice"))} AS sum_price
           |FROM updated GROUP BY p_brand ORDER BY p_brand""".stripMargin,

      // clustering (modulo-seed IVF argmin) and pruning (min-id of
      // each within-cluster cosine-threshold neighborhood survives)
      // both reconstructed; threshold/stride spliced from Wave4Queries
      "q_semdedup" -> {
        val l2 = "round(list_sum(list_transform(range(1, len(e.embedding)+1), " +
          "i -> (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE) * (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE))), 4)"
        s"""WITH cents AS (
           |  SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
           |  WHERE vec_id % ${Wave4Queries.Sem.Stride} = 0),
           |dists AS (
           |  SELECT e.vec_id, e.embedding, c.centroid_id, $l2 AS d2
           |  FROM embeddings e CROSS JOIN cents c),
           |assigned AS (
           |  SELECT vec_id, embedding, centroid_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
           |    FROM dists) WHERE rn = 1),
           |dropped AS (
           |  SELECT DISTINCT b.vec_id
           |  FROM assigned a JOIN assigned b USING (centroid_id)
           |  WHERE a.vec_id < b.vec_id
           |    AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
           |          >= ${Wave4Queries.Sem.Threshold})
           |SELECT a.vec_id, a.centroid_id,
           |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
           |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
           |ORDER BY a.vec_id""".stripMargin
      },

      // the whole packing plan is integer window arithmetic — the
      // oracle reproduces every per-document chunk span exactly
      "q_seq_pack" -> {
        val b = Wave4Queries.Pack.Budget
        s"""WITH d AS (
           |  SELECT doc_id, source,
           |    CAST(len(${wordTokensSql("text")}) AS BIGINT) AS n_tokens
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, source, n_tokens,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS tok_start
           |  FROM d)
           |SELECT doc_id, source, n_tokens, tok_start,
           |  CAST(tok_start // $b AS BIGINT) AS chunk_first,
           |  CAST(greatest(tok_start, tok_start + n_tokens - 1) // $b AS BIGINT) AS chunk_last
           |FROM c ORDER BY doc_id""".stripMargin
      },

      // the full funnel: quality flags (same CTEs as q_quality_rules)
      // → min-id-per-content-hash dedup → md5 sample gate
      "q_curation" -> {
        import graft.functions.QualityRules._
        val stopList = RequiredStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        val bulletCond =
          BulletPrefixes.map(p => s"starts_with(trim(l), '$p')").mkString(" OR ")
        s"""WITH sig AS (
           |  SELECT doc_id, source, text,
           |    ${wordTokensSql("text")} AS wtoks,
           |    ${wsTokensSql("text")} AS toks,
           |    string_split(text, chr(10)) AS ls
           |  FROM documents),
           |m AS (
           |  SELECT doc_id, source, text,
           |    CAST(len(toks) AS BIGINT) AS n_words,
           |    round(list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1), 4) AS mwl,
           |    round((${occSql("text", "#")} + ${occSql("text", "...")}) / greatest(len(toks), 1), 4) AS symr,
           |    round(len(list_filter(ls, l -> $bulletCond)) / greatest(len(ls), 1), 4) AS bulr,
           |    round(len(list_filter(ls, l -> ends_with(rtrim(l), '...'))) / greatest(len(ls), 1), 4) AS ellr,
           |    round(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) / greatest(len(toks), 1), 4) AS alpr,
           |    CAST(len(list_intersect(wtoks, $stopList)) AS BIGINT) AS stoph
           |  FROM sig),
           |passed AS (
           |  SELECT doc_id, source, text, n_words FROM m
           |  WHERE n_words >= ${Wave4Queries.Curate.MinWords}
           |    AND stoph >= ${Wave4Queries.Curate.MinStop}
           |    AND alpr >= ${Wave4Queries.Curate.MinAlpha}
           |    AND mwl >= ${Wave4Queries.Curate.MinMwl}
           |    AND mwl <= ${Wave4Queries.Curate.MaxMwl}),
           |deduped AS (
           |  SELECT doc_id, source, n_words FROM (
           |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           |    FROM passed) WHERE rn = 1),
           |sampled AS (
           |  SELECT * FROM deduped
           |  WHERE ${bucketSql("curate", "doc_id")} < ${Wave4Queries.Curate.Rate})
           |SELECT source, count(*) AS n_kept,
           |  CAST(sum(n_words) AS BIGINT) AS sum_words,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM sampled GROUP BY source ORDER BY source""".stripMargin
      },

      // chunk boundaries mirror Text.slidingChunks: starts at
      // i*stride, count = 1 + ceil(max(len-size,0)/stride)
      "q_chunks" -> {
        val sz = Wave4Queries.Chunk.Size
        val st = Wave4Queries.Chunk.Stride
        s"""WITH chunks AS (
           |  SELECT source,
           |    unnest(list_transform(
           |      range(0, 1 + (greatest(length(text) - $sz, 0) + ${st - 1}) // $st),
           |      i -> md5(substr(text, CAST(i * $st + 1 AS INTEGER), $sz)))) AS h
           |  FROM documents)
           |SELECT source, count(*) AS n_chunks,
           |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_chunks
           |FROM chunks GROUP BY source ORDER BY source""".stripMargin
      },

      // the exact shard assignment writeShuffledShards uses, so the
      // exported layout is provably recomputable from any engine
      "q_shard_stats" -> {
        val n = Wave4Queries.Shards.N
        s"""SELECT CAST(${PortableHash.Sql.md5Mod("'shard' || '|' || CAST(doc_id AS VARCHAR)")} % $n AS INTEGER) AS shard,
           |  count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
           |FROM documents GROUP BY shard ORDER BY shard""".stripMargin
      },

      // gate mirrors Sampling.weightedSample operation-for-operation:
      // bucket < least(1, least(1, n_chars/2000) * rate), pure IEEE
      // arithmetic on integer-derived values
      "q_weighted_sample" -> {
        val r = Wave4Queries.WSample.Rate
        val n = Wave4Queries.WSample.CharNorm
        s"""SELECT source, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM documents
           |WHERE ${bucketSql("wsample", "doc_id")} <
           |  least(1.0, least(1.0, CAST(n_chars AS DOUBLE) / $n) * $r)
           |GROUP BY source ORDER BY source""".stripMargin
      },

      "q_substr_dedup" -> {
        val k = Substr.K
        s"""WITH grams AS (
           |  SELECT doc_id, source,
           |    unnest(list_transform(range(0, greatest(length(text) - ${k - 1}, 0)),
           |                          i -> ${PortableHash.Sql.md5Mod(s"substr(text, i+1, $k)")})) AS h
           |  FROM documents
           |), byg AS (
           |  SELECT h, count(*) AS n_docs_for_gram
           |  FROM (SELECT DISTINCT h, doc_id FROM grams) GROUP BY h
           |), perdoc AS (
           |  SELECT g.doc_id, g.source, count(*) AS n_pos,
           |    CAST(sum(CASE WHEN byg.n_docs_for_gram >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pos
           |  FROM grams g JOIN byg USING (h)
           |  GROUP BY g.doc_id, g.source
           |)
           |SELECT source, count(*) AS n_docs, CAST(sum(n_pos) AS BIGINT) AS n_pos,
           |  CAST(sum(n_dup_pos) AS BIGINT) AS n_dup_pos
           |FROM perdoc GROUP BY source ORDER BY source""".stripMargin
      }
    )
  }

  val wave5: Map[String, String] = Map(
    // final state after the replaceWhere commit: the 1-URGENT slice
    // swapped for half-price rows (×0.5 — exact in doubles), every
    // other row untouched
    "q_replace_where" ->
      s"""WITH replaced AS (
         |  SELECT o_orderstatus,
         |    CASE WHEN o_orderpriority = '1-URGENT'
         |         THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice
         |  FROM orders)
         |SELECT o_orderstatus, count(*) AS n_orders,
         |  ${dsum(d4("o_totalprice"))} AS sum_price
         |FROM replaced GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the same synthesized nested JSON, extracted with DuckDB's JSON
    // path functions — proves Spark's variant_get path semantics
    "q_variant" -> {
      val js = """('{"user":{"id":' || user_id || ',"seg":"s' || (user_id % 5) ||
                 | '"},"meta":' || props || '}')""".stripMargin.replace("\n", "")
      s"""WITH v AS (SELECT
         |    json_extract_string($js, '$$.user.seg') AS seg,
         |    CAST(json_extract($js, '$$.user.id') AS BIGINT) AS uid,
         |    CAST(json_extract($js, '$$.meta.k') AS BIGINT) AS k
         |  FROM events)
         |SELECT seg, count(*) AS n_events, CAST(sum(k) AS BIGINT) AS sum_k,
         |  min(uid) AS min_uid, max(uid) AS max_uid
         |FROM v GROUP BY seg ORDER BY seg""".stripMargin
    },

    // lower()-keyed grouping is semantically equal to UTF8_LCASE
    // grouping on this ASCII domain; n_variants = 2 proves the Spark
    // side actually merged distinct binary strings
    "q_collation" ->
      s"""WITH m AS (
         |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
         |              ELSE lower(c_mktsegment) END AS seg_case, c_acctbal
         |  FROM customer)
         |SELECT min(lower(seg_case)) AS segment, count(*) AS n_customers,
         |  CAST(count(DISTINCT seg_case) AS BIGINT) AS n_variants,
         |  ${dsum(d4("c_acctbal"))} AS sum_bal
         |FROM m GROUP BY lower(seg_case) ORDER BY segment""".stripMargin,

    // bottom-k by the same md5 hash with the same total-order
    // tie-break; the KMV estimate is pure integer division
    "q_bottomk_sample" -> {
      val k = Wave5Queries.BottomK.K
      val num = (k - 1).toLong * PortableHash.Prime
      s"""WITH h AS (
         |  SELECT doc_id, ${PortableHash.Sql.md5Mod("'bk:' || doc_id")} AS h
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, h, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS rk
         |  FROM h ORDER BY h, doc_id LIMIT $k)
         |SELECT rk, doc_id, h,
         |  CAST($num // (max(h) OVER ()) AS BIGINT) AS est_distinct
         |FROM k ORDER BY rk""".stripMargin
    },

    // the audio payloads' parameters are pure row arithmetic; the
    // Spark side must CONSTRUCT real container bytes and PARSE them
    // back to these exact values for the hash to match
    "q_audio_meta" ->
      s"""SELECT event_id,
         |  CASE CAST(event_id % 3 AS INTEGER)
         |    WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'mp3' END AS format,
         |  CAST(CASE CAST(event_id % 3 AS INTEGER)
         |    WHEN 0 THEN 8000 * (1 + user_id % 3)
         |    WHEN 1 THEN 32000 + (user_id % 2) * 16000
         |    ELSE 44100 END AS BIGINT) AS sample_rate,
         |  CAST(CASE CAST(event_id % 3 AS INTEGER)
         |    WHEN 0 THEN 1 + user_id % 2
         |    WHEN 1 THEN 2
         |    ELSE CASE WHEN user_id % 2 = 0 THEN 1 ELSE 2 END END AS BIGINT) AS channels,
         |  CAST(1000 * (1 + user_id % 4) AS BIGINT) AS duration_ms
         |FROM events WHERE event_id < 600 ORDER BY event_id""".stripMargin,

    // the three PageRank iterations unrolled; every step is the exact
    // integer arithmetic GraphRank runs (floor division on positive
    // longs), so the full ranking hash-matches
    "q_domain_rank" -> {
      import Wave5Queries.Rank.{Nodes, EdgeMod, DampPct}
      val base = graft.operators.GraphRank.Base
      val teleNum = base * (100L - DampPct) / 100L
      def iter(i: Int): String =
        s"""c$i AS (
           |  SELECT e.dst AS node, CAST(sum(r.rank // d.deg) AS BIGINT) AS s
           |  FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.node = e.src
           |  GROUP BY e.dst),
           |r$i AS (
           |  SELECT nodes.node,
           |    CAST((SELECT $teleNum // n FROM params) +
           |         ($DampPct * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank
           |  FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src,
         |    (event_id * 31 + 7) % $Nodes AS dst
         |  FROM events
         |  WHERE event_id % $EdgeMod = 0
         |    AND user_id % $Nodes <> (event_id * 31 + 7) % $Nodes),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |params AS (SELECT count(*) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, (SELECT $base // n FROM params) AS rank FROM nodes),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT node, rank FROM r3 ORDER BY node""".stripMargin
    },

    // MMR unrolled PageRank-style: step N's argmax sees steps 1..N-1
    // as single-row CTEs. Similarities round to the 1e-4 grid BEFORE
    // the score arithmetic; the λ and 1−λ multipliers print via
    // Double.toString so both engines use the identical float64
    "q_mmr_select" -> {
      import Wave5Queries.MmrParams
      val mk = MmrParams.K
      val lam = MmrParams.Lambda.toString
      val oneMinus = (1.0 - MmrParams.Lambda).toString
      def cosTo(p: String) =
        s"round(list_cosine_similarity(c.v::DOUBLE[], $p.v::DOUBLE[]), 4)"
      def step(n: Int): String = {
        val prev = (1 until n).map(i => s"s$i")
        val ms =
          if (prev.isEmpty) "0.0"
          else if (prev.size == 1) cosTo(prev.head)
          else s"greatest(${prev.map(cosTo).mkString(", ")})"
        val from = ("rel c" +: prev).mkString(" CROSS JOIN ")
        val excl =
          if (prev.isEmpty) "TRUE"
          else prev.map(p => s"c.vec_id != $p.vec_id").mkString(" AND ")
        s"""s$n AS (
           |  SELECT c.vec_id, c.v, c.r, $ms AS ms
           |  FROM $from WHERE $excl
           |  ORDER BY $lam * c.r - $oneMinus * ($ms) DESC, c.vec_id
           |  LIMIT 1)""".stripMargin
      }
      val steps = (1 to mk).map(step).mkString(",\n")
      val out = (1 to mk).map(n =>
        s"SELECT $n AS rank, vec_id, r AS rel, ms AS max_sim FROM s$n")
        .mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = ${MmrParams.QueryId}),
         |rel AS (
         |  SELECT vec_id, embedding AS v,
         |    round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS r
         |  FROM embeddings CROSS JOIN q),
         |$steps
         |$out
         |ORDER BY rank""".stripMargin
    },

    // DSIR selection: the model (per-bucket Laplace-smoothed
    // target/raw ratio) and the per-doc score replay the engine's
    // exact arithmetic — ratios rounded to the 1e-6 grid and fixed as
    // DECIMAL BEFORE the per-doc sum, ranking on the exact decimal
    "q_dsir_select" -> {
      import Wave5Queries.DsirParams
      val k = DsirParams.K
      val topN = DsirParams.TopN
      val targets = DsirParams.Targets.map(s => s"'$s'").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, source, ${wsTokensSql("text")} AS toks FROM documents),
         |grams AS (
         |  SELECT doc_id, source IN ($targets) AS t,
         |    unnest(list_transform(range(0, len(toks) - 1),
         |      i -> ${PortableHash.Sql.md5Mod(s"array_to_string(toks[(i+1):(i+2)], ' ')")} % $k)) AS b
         |  FROM tok WHERE len(toks) >= 2),
         |model AS (
         |  SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
         |    sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
         |  FROM grams GROUP BY b),
         |tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM model),
         |lr AS (
         |  SELECT b, CAST(round(
         |    (CAST(ct AS DOUBLE) + 1.0) * (CAST(nr AS DOUBLE) + $k.0) /
         |    ((CAST(cr AS DOUBLE) + 1.0) * (CAST(nt AS DOUBLE) + $k.0)), 6)
         |    AS DECIMAL(18,6)) AS lr6
         |  FROM model CROSS JOIN tot),
         |pdb AS (SELECT doc_id, b, count(*) AS nb FROM grams GROUP BY doc_id, b),
         |scored AS (
         |  SELECT doc_id, sum(nb * lr6) AS sd
         |  FROM pdb JOIN lr USING (b) GROUP BY doc_id),
         |ranked AS (
         |  SELECT doc_id, sd, row_number() OVER (ORDER BY sd DESC, doc_id) AS rank
         |  FROM scored)
         |SELECT CAST(rank AS INT) AS rank, doc_id,
         |  round(CAST(sd AS DOUBLE), 6) AS dsir_score
         |FROM ranked WHERE rank <= $topN ORDER BY rank""".stripMargin
    },

    // Native Iceberg write: nation appended from scratch in two
    // snapshots (Hadoop-catalog commit protocol), read back with a
    // partition filter — oracle is the equivalent predicate on source
    "q_iceberg_write" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation
        |WHERE n_regionkey >= 2
        |ORDER BY n_nationkey""".stripMargin,

    // Native Iceberg read of the UniForm-exported customer copy: the
    // export stage DV-deleted negative balances (translated to
    // position delete files), the read filters to one partition — so
    // the oracle is the equivalent predicate over the source table
    "q_iceberg_read" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 0
        |ORDER BY c_custkey""".stripMargin,

    // R49 Avro content leg: the fixture splits nation across a native
    // parquet append and an add_files AVRO import (one snapshot, two
    // content formats) — the mixed scan must equal the plain
    // predicate over the source table
    "q_iceberg_avro" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation
        |WHERE n_regionkey >= 1
        |ORDER BY n_nationkey""".stripMargin,

    // R49 r15 rename leg: the fixture reads pre-rename parquet AND
    // Avro files (old column name on disk, resolved by field id) plus
    // a post-rename append — values must equal the source table with
    // the renamed column aliased
    "q_iceberg_rename" ->
      """SELECT n_nationkey, n_name AS nation_label, n_regionkey
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    // R49 manifest column-bounds skipping: the engine reads lineitem
    // through a natively written, orderkey-range-sorted Iceberg table
    // whose manifests carry per-file lower/upper bounds — values must
    // equal the plain predicate over the source rows
    "q_iceberg_stats_prune" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${dsum(d4("l_quantity"))} AS sum_qty,
         |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
         |FROM lineitem
         |WHERE l_orderkey < 1200
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
  )

  /** Round-7 static oracles. q_blocklist counts each pattern p as
    * `(length(text) - length(replace(text, p, ''))) // length(p)` —
    * DuckDB's non-overlapping occurrence count, which equals the
    * engine automaton's all-positions count because every pattern in
    * [[Wave6Queries.BlocklistParams]] is borderless (asserted by
    * BlocklistSpec), so occurrences cannot overlap.
    */
  val wave6: Map[String, String] = {
    val ps = Wave6Queries.BlocklistParams.Patterns
    val hitCols = ps.zipWithIndex.map { case (p, i) =>
      s"(length(text) - length(replace(text, '$p', ''))) // ${p.length} AS h$i"
    }.mkString(",\n|    ")
    val total = ps.indices.map(i => s"h$i").mkString(" + ")
    Map(
      "q_blocklist" ->
        s"""WITH h AS (
           |  SELECT source,
           |    $hitCols
           |  FROM documents)
           |SELECT source, count(*) AS docs,
           |  CAST(sum(CASE WHEN $total > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
           |  CAST(sum($total) AS BIGINT) AS total_hits,
           |  CAST(sum(h0) AS BIGINT) AS p0_hits,
           |  CAST(sum(h1) AS BIGINT) AS p1_hits
           |FROM h GROUP BY source ORDER BY source""".stripMargin,
      "q_fuzzy_decontam" -> fuzzyDecontamSql,
      "q_incr_dedup" -> incrDedupSql,
      "q_span_dedup" -> spanDedupSql,
      "q_span_decontam" -> spanDecontamSql,
      // the Spark side converts a hive parquet dir to Delta IN PLACE
      // (no rewrite) and reads it back through the Delta scanner with
      // a partition filter; the oracle recomputes from the table
      // native Iceberg merge-on-read DELETE: survivors of the
      // every-third-key position-delete pass
      "q_iceberg_delete" -> {
        val keys = Wave6Queries.IcebergDeleteParams.Keys.mkString(", ")
        s"""SELECT n_nationkey, n_name, n_regionkey
           |FROM nation WHERE n_nationkey NOT IN ($keys)
           |ORDER BY n_nationkey""".stripMargin
      },
      "q_scoped_compact" ->
        """WITH doubled AS (
          |  SELECT n_nationkey, n_name, n_regionkey FROM nation
          |  UNION ALL
          |  SELECT n_nationkey, n_name, n_regionkey FROM nation)
          |SELECT n_nationkey, n_name, n_regionkey FROM doubled
          |ORDER BY n_nationkey""".stripMargin,
      // post-compaction snapshot: same survivors as the MoR delete
      "q_iceberg_compact" -> {
        val keys = Wave6Queries.IcebergDeleteParams.Keys.mkString(", ")
        s"""SELECT n_nationkey, n_name, n_regionkey
           |FROM nation WHERE n_nationkey NOT IN ($keys)
           |ORDER BY n_nationkey""".stripMargin
      },
      // hard negatives: the knn-brute shape with a label-difference
      // constraint — same rounded cosine, same total-order tie-break
      "q_hard_negatives" ->
        """WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv, label AS ql
          |           FROM embeddings WHERE vec_id < 20),
          |scored AS (
          |  SELECT q.anchor_id, c.vec_id AS negative_id,
          |    round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 4) AS sim
          |  FROM q CROSS JOIN embeddings c
          |  WHERE q.ql != c.label),
          |ranked AS (
          |  SELECT anchor_id, negative_id, sim,
          |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, negative_id) AS rank
          |  FROM scored)
          |SELECT anchor_id, negative_id, sim, rank FROM ranked WHERE rank <= 3
          |ORDER BY anchor_id, rank""".stripMargin,
      "q_convert_delta" ->
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  min(doc_id) AS min_id
          |FROM documents WHERE source IN ('src3', 'src7', 'src11')
          |GROUP BY source ORDER BY source""".stripMargin,
      "q_cls_eval" ->
        s"""WITH p AS (
           |  SELECT label AS gold,
           |    CASE WHEN ${bucketSql("clseval", "vec_id")} < ${Wave6Queries.ClsEvalAgree}
           |         THEN label ELSE (label + 1) % 10 END AS pred
           |  FROM embeddings),
           |c AS (SELECT gold, pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
           |g AS (SELECT gold AS label, CAST(sum(n) AS BIGINT) AS n_gold FROM c GROUP BY 1),
           |q AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred FROM c GROUP BY 1),
           |t AS (SELECT gold AS label, n AS tp FROM c WHERE gold = pred),
           |m AS (
           |  SELECT coalesce(g.label, q.label) AS label,
           |    coalesce(g.n_gold, 0) AS n_gold,
           |    coalesce(q.n_pred, 0) AS n_pred
           |  FROM g FULL OUTER JOIN q ON g.label = q.label)
           |SELECT m.label, m.n_gold, m.n_pred, coalesce(t.tp, 0) AS tp,
           |  round(coalesce(t.tp, 0) / greatest(m.n_pred, 1), 4) AS prec,
           |  round(coalesce(t.tp, 0) / greatest(m.n_gold, 1), 4) AS rec,
           |  round(coalesce(t.tp, 0) * 2 / greatest(m.n_pred + m.n_gold, 1), 4) AS f1
           |FROM m LEFT JOIN t ON m.label = t.label
           |ORDER BY m.label""".stripMargin,

      // same hashed-feature replay as q_dsir_select, but the
      // coefficients are the spliced model weights and the readout is
      // the per-source survival of the margin>0 gate
      "q_quality_classifier" -> {
        import Wave6Queries.ClassifierParams
        val k = ClassifierParams.K
        val values = (0 until k).map(b =>
          s"($b, CAST(${ClassifierParams.weight(b)} AS DECIMAL(9,4)))").mkString(", ")
        s"""WITH w(b, w) AS (VALUES $values),
           |tok AS (
           |  SELECT doc_id, ${wsTokensSql("text")} AS toks FROM documents
           |  WHERE trim(text) <> ''),
           |uni AS (
           |  SELECT doc_id, unnest(list_transform(range(0, len(toks)),
           |    i -> ${PortableHash.Sql.md5Mod("toks[i+1]")} % $k)) AS b
           |  FROM tok WHERE len(toks) >= 1),
           |bi AS (
           |  SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
           |    i -> ${PortableHash.Sql.md5Mod("array_to_string(toks[(i+1):(i+2)], ' ')")} % $k)) AS b
           |  FROM tok WHERE len(toks) >= 2),
           |g AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
           |pd AS (SELECT doc_id, b, count(*) AS nb FROM g GROUP BY doc_id, b),
           |m AS (SELECT doc_id, sum(nb * w) AS mm FROM pd JOIN w USING (b) GROUP BY doc_id),
           |sc AS (
           |  SELECT d.doc_id, d.source,
           |    coalesce(m.mm, CAST(0 AS DECIMAL(19,4))) +
           |      CAST(${ClassifierParams.Bias} AS DECIMAL(9,4)) AS margin
           |  FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |  round(CAST(sum(margin) AS DOUBLE), 4) AS sum_margin
           |FROM sc GROUP BY source ORDER BY source""".stripMargin
      },
      // the page chrome (nav/rail/footer, all ≥50% link text) must be
      // dropped and the escaped article text decoded back verbatim;
      // the oracle is the whitespace-normalized original text
      "q_html_extract" ->
        """SELECT doc_id,
          |  trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g')) AS main_text,
          |  CAST(length(trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'))) AS BIGINT) AS n_chars
          |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,
      // video payload parameters are pure row arithmetic; the Spark
      // side must CONSTRUCT real MP4/AVI/MKV container bytes and
      // PARSE them back to these exact values for the hash to match
      "q_video_meta" ->
        """SELECT event_id,
          |  CASE CAST(event_id % 3 AS INTEGER)
          |    WHEN 0 THEN 'mp4' WHEN 1 THEN 'avi' ELSE 'mkv' END AS format,
          |  CAST(CASE CAST(event_id % 3 AS INTEGER)
          |    WHEN 0 THEN 320 + 16 * (user_id % 5)
          |    WHEN 1 THEN 640
          |    ELSE 640 + 16 * (user_id % 2) END AS BIGINT) AS width,
          |  CAST(CASE CAST(event_id % 3 AS INTEGER)
          |    WHEN 0 THEN 240 + 16 * (user_id % 3)
          |    WHEN 1 THEN 480
          |    ELSE 360 + 8 * (user_id % 2) END AS BIGINT) AS height,
          |  CAST(CASE CAST(event_id % 3 AS INTEGER)
          |    WHEN 0 THEN 1000 * (1 + user_id % 4)
          |    WHEN 1 THEN 1000 * (1 + user_id % 4) + 200 * (user_id % 3)
          |    ELSE 500 * (1 + user_id % 6) END AS BIGINT) AS duration_ms
          |FROM events WHERE event_id < 600 ORDER BY event_id""".stripMargin,
      // the Spark side appends nation natively, removes keys ≡ 2
      // (mod 5) via a scan-free Iceberg EQUALITY DELETE (content=2
      // manifest), and snapshot-reads — the sequence-gated anti-join
      // must equal this relational replay
      // the Spark side appends nation natively, then commits ONE
      // atomic equality-upsert snapshot (suffixed names for keys < 8
      // + a synthetic insert); the snapshot read must serve
      // latest-per-key, matching this relational merge replay
      "q_iceberg_upsert" ->
        """SELECT n_nationkey,
          |  CASE WHEN n_nationkey < 8 THEN n_name || '_UP' ELSE n_name END AS n_name,
          |  n_regionkey
          |FROM nation
          |UNION ALL SELECT 992, 'mu', 3
          |ORDER BY n_nationkey""".stripMargin,
      // SQL-string write pipeline (INSERT INTO iceberg + UPSERT INTO
      // USING view ON key through LakehouseSql): post-upsert state is
      // the same relational merge replay as q_iceberg_upsert
      "q_lakehouse_upsert" ->
        """SELECT n_nationkey,
          |  CASE WHEN n_nationkey < 8 THEN n_name || '_SQL' ELSE n_name END AS n_name,
          |  n_regionkey
          |FROM nation
          |UNION ALL SELECT 991, 'sigma', 2
          |ORDER BY n_nationkey""".stripMargin,
      "q_iceberg_eqdelete" ->
        """SELECT n_nationkey, n_name, n_regionkey
          |FROM nation WHERE n_nationkey % 5 <> 2
          |ORDER BY n_nationkey""".stripMargin,
      // the Spark side writes events natively as an Iceberg table
      // partitioned by days(ts) + bucket(16, user_id) and reads it
      // back day-range + bucket-pruned; the oracle replays the
      // filter relationally over the source events
      "q_iceberg_transform" ->
        """SELECT event_id, user_id, event_type, value
          |FROM events
          |WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'
          |  AND ts < TIMESTAMP '2024-01-06 00:00:00'
          |  AND user_id = 7
          |ORDER BY event_id""".stripMargin,
      // Delta leg of the triad's stats-pruning probes (the Spark side
      // writes lineitem as 8 orderkey-ranged Delta files and reads
      // bounds-pruned); parquet-direct relational replay
      "q_delta_stats_prune" ->
        s"""SELECT l_returnflag, count(*) AS n,
           |  ${dsum(d4("l_quantity"))} AS sum_qty,
           |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
           |FROM lineitem
           |WHERE l_orderkey < 1200
           |GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin,
      // typed changelog over the append → equality-upsert → equality-
      // graft-written Iceberg v3 deletion-vector table: two DV delete
      // rounds (the second REPLACES the first round's DV on shared
      // files) — survivors only
      "q_iceberg_dv" -> {
        val keys = Wave8Queries.IcebergDvParams.Round2Keys.mkString(", ")
        s"""SELECT n_nationkey, n_name, n_regionkey
           |FROM nation
           |WHERE n_nationkey >= ${Wave8Queries.IcebergDvParams.Round1Below}
           |  AND n_nationkey NOT IN ($keys)
           |ORDER BY n_nationkey""".stripMargin
      },
      // net-rows incremental over a compaction + DV-delete range:
      // second-append rows minus the in-range DV deletes; the delete
      // of a pre-range row (key 2) contributes nothing
      "q_iceberg_incr_dv" -> {
        val keys = Wave8Queries.IcebergIncrDvParams.DeleteKeys.mkString(", ")
        s"""SELECT n_nationkey, n_name, n_regionkey
           |FROM nation
           |WHERE n_nationkey >= ${Wave8Queries.IcebergIncrDvParams.SplitAt}
           |  AND n_nationkey NOT IN ($keys)
           |ORDER BY n_nationkey""".stripMargin
      },
      // cross-format CDC replication (Delta CDF → Iceberg replica):
      // the replica's final state replayed relationally — updates
      // applied, inserted keys appended, deleted keys (which apply
      // LAST, so they beat same-range updates) removed
      "q_replicate" -> {
        import Wave8Queries.{ReplicateParams => P}
        s"""SELECT s_suppkey, s_name, s_nationkey FROM (
           |  SELECT s_suppkey,
           |    CASE WHEN s_suppkey % ${P.UpdateMod} = 0 THEN 'UPDATED'
           |         ELSE s_name END AS s_name,
           |    s_nationkey
           |  FROM supplier
           |  WHERE s_suppkey >= ${P.DeleteBelow}
           |  UNION ALL
           |  SELECT s_suppkey + ${P.InsertOffset}, 'NEW', s_nationkey
           |  FROM supplier WHERE s_suppkey % ${P.InsertMod} = 0
           |) ORDER BY s_suppkey""".stripMargin
      },
      // the reverse leg (Hudi MOR source → Delta replica): log
      // upserts + tombstones folded into the one-commit Delta apply
      "q_replicate_hudi" -> {
        import Wave8Queries.{ReplicateHudiParams => P}
        val del = P.DeleteKeys.mkString(", ")
        s"""SELECT n_nationkey, n_name, n_regionkey FROM (
           |  SELECT n_nationkey,
           |    CASE WHEN n_regionkey = ${P.UpdateRegion} THEN 'REPL_UP'
           |         ELSE n_name END AS n_name,
           |    n_regionkey
           |  FROM nation WHERE n_nationkey NOT IN ($del)
           |  UNION ALL
           |  SELECT n_nationkey + ${P.InsertOffset}, 'NEW', n_regionkey
           |  FROM nation WHERE n_regionkey = ${P.InsertRegion}
           |) ORDER BY n_nationkey""".stripMargin
      },
      // deletion-vector MERGE: the post-merge customer state replayed
      // relationally — %UpdateMod keys renamed, %InsertMod keys
      // duplicated at +InsertOffset, keys below DeleteBelow removed
      // reconstructs the whole column-mapped DML ladder from raw part:
      // rename (p_size -> sz, pure aliasing here), UPDATE below 500,
      // DV DELETE >= 1500, MERGE upsert (< 100, doubled raw size) +
      // one inserted row
      "q_mapped_dml" -> {
        import Wave9Queries.{MappedDml => P}
        s"""WITH u AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN p_partkey < ${P.UpdateBelow} THEN p_size + 100 ELSE p_size END AS sz,
           |    CASE WHEN p_partkey < ${P.UpdateBelow} THEN p_retailprice + 10 ELSE p_retailprice END AS p_retailprice
           |  FROM part),
           |d AS (SELECT * FROM u WHERE p_partkey < ${P.DeleteFrom}),
           |src AS (
           |  SELECT p_partkey, p_brand, p_size * 2 AS sz, p_retailprice
           |  FROM part WHERE p_partkey < ${P.MergeBelow}
           |  UNION ALL
           |  SELECT ${P.InsertKey}, '${P.InsertBrand}', ${P.InsertSize}, ${P.InsertPrice}),
           |merged AS (
           |  SELECT * FROM src
           |  UNION ALL
           |  SELECT * FROM d WHERE p_partkey NOT IN (SELECT p_partkey FROM src))
           |SELECT p_brand, count(*) AS n_parts,
           |  CAST(sum(sz) AS BIGINT) AS sum_sz,
           |  ${dsum(d4("p_retailprice"))} AS sum_price
           |FROM merged GROUP BY p_brand ORDER BY p_brand""".stripMargin
      },
      // the SAME ladder driven through catalog SQL (UPDATE graft.`p`,
      // DELETE FROM, MERGE INTO via GraftDmlStrategy), plus the r15
      // CONDITIONAL matched-update leg (keys ≡ 0 mod 3 under
      // CondMergeBelow take the SET) and the r15 clause-surface leg:
      // overlapping matched clauses first-match-wins (mod-10 update
      // shadows the mod-5 delete), a conditional column-list INSERT
      // NULL-fills, and NOT MATCHED BY SOURCE deletes
      // [BsDeleteFrom, DeleteFrom) then bumps [BsTouchFrom,
      // BsDeleteFrom)
      "q_catalog_dml" -> {
        import Wave9Queries.{MappedDml => P}
        s"""WITH u AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN p_partkey < ${P.UpdateBelow} THEN p_size + 100 ELSE p_size END AS sz,
           |    CASE WHEN p_partkey < ${P.UpdateBelow} THEN p_retailprice + 10 ELSE p_retailprice END AS p_retailprice
           |  FROM part),
           |d AS (SELECT * FROM u WHERE p_partkey < ${P.DeleteFrom}),
           |src AS (
           |  SELECT p_partkey, p_brand, p_size * 2 AS sz, p_retailprice
           |  FROM part WHERE p_partkey < ${P.MergeBelow}
           |  UNION ALL
           |  SELECT ${P.InsertKey}, '${P.InsertBrand}', ${P.InsertSize}, ${P.InsertPrice}),
           |merged AS (
           |  SELECT * FROM src
           |  UNION ALL
           |  SELECT * FROM d WHERE p_partkey NOT IN (SELECT p_partkey FROM src)),
           |cond AS (
           |  SELECT p_partkey, p_brand, sz,
           |    CASE WHEN p_partkey < ${P.CondMergeBelow} AND p_partkey % 3 = 0
           |      THEN p_retailprice + 5 ELSE p_retailprice END AS p_retailprice
           |  FROM merged),
           |bs_src AS (
           |  SELECT p_partkey, p_brand FROM part WHERE p_partkey < ${P.BsMergeBelow}
           |  UNION ALL SELECT ${P.BsInsertKey}, 'Brand#98'
           |  UNION ALL SELECT ${P.BsSkipKey}, 'Brand#99'),
           |bs AS (
           |  SELECT c.p_partkey, c.p_brand, c.sz, c.p_retailprice,
           |    EXISTS (SELECT 1 FROM bs_src s WHERE s.p_partkey = c.p_partkey) AS matched
           |  FROM cond c),
           |bs2 AS (
           |  SELECT p_partkey, p_brand,
           |    CASE WHEN matched AND p_partkey % 10 = 0 THEN sz + 1 ELSE sz END AS sz,
           |    CASE WHEN NOT matched AND p_partkey >= ${P.BsTouchFrom} AND p_partkey < ${P.BsDeleteFrom}
           |      THEN p_retailprice + 1 ELSE p_retailprice END AS p_retailprice
           |  FROM bs
           |  WHERE NOT (matched AND p_partkey % 5 = 0 AND p_partkey % 10 <> 0)
           |    AND NOT (NOT matched AND p_partkey >= ${P.BsDeleteFrom} AND p_partkey < ${P.DeleteFrom})),
           |ins AS (
           |  SELECT s.p_partkey, s.p_brand, CAST(NULL AS INTEGER) AS sz,
           |    CAST(NULL AS DOUBLE) AS p_retailprice
           |  FROM bs_src s
           |  WHERE s.p_partkey % 2 = 0
           |    AND NOT EXISTS (SELECT 1 FROM cond c WHERE c.p_partkey = s.p_partkey)),
           |fin AS (SELECT * FROM bs2 UNION ALL SELECT * FROM ins),
           |resid AS (
           |  SELECT p_partkey, p_brand, sz,
           |    CASE WHEN p_partkey % 7 = 0 AND p_partkey < ${P.UpdateBelow}
           |      THEN p_retailprice + 2 ELSE p_retailprice END AS p_retailprice
           |  FROM fin
           |  WHERE NOT (p_partkey % 11 = 3 AND p_partkey >= ${P.BsTouchFrom}))
           |SELECT p_brand, count(*) AS n_parts,
           |  CAST(sum(sz) AS BIGINT) AS sum_sz,
           |  ${dsum(d4("p_retailprice"))} AS sum_price
           |FROM resid GROUP BY p_brand ORDER BY p_brand""".stripMargin
      },
      // r15: Iceberg DML ladder through catalog SQL — MoR position
      // deletes (rows >= 20 gone), a copy-on-write UPDATE of region-1
      // names, a CONDITIONAL matched MERGE (keys ≡ 0 mod 4 under
      // 12 bump n_regionkey using BOTH sides; key 990 inserts; every
      // other matched row untouched), then a RESIDUAL UPDATE
      // (keys ≡ 2 mod 5 under 20 take the _R suffix — the modulo
      // evaluates row-by-row in the CoW rewrite)
      "q_iceberg_update" ->
        """WITH u AS (
          |  SELECT n_nationkey,
          |    CASE WHEN n_regionkey = 1 THEN n_name || '_EU' ELSE n_name END AS n_name,
          |    n_regionkey
          |  FROM nation WHERE n_nationkey < 20),
          |m AS (
          |  SELECT n_nationkey, n_name,
          |    CASE WHEN n_nationkey < 12 AND n_nationkey % 4 = 0
          |      THEN (SELECT x.n_regionkey + 10 FROM nation x
          |            WHERE x.n_nationkey = u.n_nationkey) + n_regionkey
          |      ELSE n_regionkey END AS n_regionkey
          |  FROM u),
          |r AS (
          |  SELECT n_nationkey,
          |    CASE WHEN n_nationkey % 5 = 2 AND n_nationkey < 20
          |      THEN n_name || '_R' ELSE n_name END AS n_name,
          |    n_regionkey
          |  FROM m)
          |SELECT * FROM r
          |UNION ALL
          |SELECT 990, 'SYNTHESIA', 9
          |ORDER BY n_nationkey""".stripMargin,
      "q_merge_dv" -> {
        import Wave8Queries.{MergeDvParams => P}
        s"""SELECT c_custkey, c_name, c_nationkey FROM (
           |  SELECT c_custkey,
           |    CASE WHEN c_custkey % ${P.UpdateMod} = 0 THEN 'DVUP'
           |         ELSE c_name END AS c_name,
           |    c_nationkey
           |  FROM customer
           |  WHERE NOT (c_custkey BETWEEN 1 AND ${P.DeleteBelow - 1})
           |  UNION ALL
           |  SELECT c_custkey + ${P.InsertOffset}, 'NEW', c_nationkey
           |  FROM customer WHERE c_custkey % ${P.InsertMod} = 0
           |) ORDER BY c_custkey""".stripMargin
      },
      // delete Iceberg nation table: the upsert commit (ordinal 1)
      // replays as pre-image deletes + post-image inserts, the delete
      // commit (ordinal 2) as deletes of the post-upsert state; the
      // synthetic key 992 has no pre-image and 992 % 5 = 2 rows are
      // absent from the delete probe set (it draws from the source
      // nation only)
      "q_iceberg_changelog" ->
        """SELECT n_nationkey, n_name, n_regionkey, _change_type, _change_ordinal
          |FROM (
          |  SELECT n_nationkey, n_name || '_UP' AS n_name, n_regionkey,
          |    'insert' AS _change_type, 1 AS _change_ordinal
          |  FROM nation WHERE n_nationkey < 8
          |  UNION ALL SELECT 992, 'mu', 3, 'insert', 1
          |  UNION ALL
          |  SELECT n_nationkey, n_name, n_regionkey, 'delete', 1
          |  FROM nation WHERE n_nationkey < 8
          |  UNION ALL
          |  SELECT n_nationkey,
          |    CASE WHEN n_nationkey < 8 THEN n_name || '_UP' ELSE n_name END,
          |    n_regionkey, 'delete', 2
          |  FROM nation WHERE n_nationkey % 5 = 2
          |)
          |ORDER BY _change_ordinal, _change_type, n_nationkey""".stripMargin,
      // the same Iceberg changelog served through SQL (DESCRIBE
      // CHANGES, uniform cdc schema): _commit_version is the snapshot
      // sequence number — 2 for the upsert commit, 3 for the delete
      "q_lakehouse_changes" ->
        """SELECT n_nationkey, n_name, n_regionkey, _change_type, _commit_version
          |FROM (
          |  SELECT n_nationkey, n_name || '_UP' AS n_name, n_regionkey,
          |    'insert' AS _change_type, CAST(2 AS BIGINT) AS _commit_version
          |  FROM nation WHERE n_nationkey < 8
          |  UNION ALL SELECT 992, 'mu', 3, 'insert', 2
          |  UNION ALL
          |  SELECT n_nationkey, n_name, n_regionkey, 'delete', 2
          |  FROM nation WHERE n_nationkey < 8
          |  UNION ALL
          |  SELECT n_nationkey,
          |    CASE WHEN n_nationkey < 8 THEN n_name || '_UP' ELSE n_name END,
          |    n_regionkey, 'delete', 3
          |  FROM nation WHERE n_nationkey % 5 = 2
          |)
          |ORDER BY _commit_version, _change_type, n_nationkey""".stripMargin,
      // typed changelog over the MOR bulk-insert → log-upsert →
      // tombstone-delete Hudi nation table: the upsert commit
      // (ordinal 1) replays as pre-image deletes + post-image
      // inserts, the tombstones (ordinal 2) as deletes of the
      // post-upsert state; synthetic key 990 has no pre-image and
      // 990 % 5 = 0 keeps it out of the delete probe set
      "q_hudi_changelog" ->
        """SELECT n_nationkey, n_name, n_regionkey, _change_type, _change_ordinal
          |FROM (
          |  SELECT n_nationkey, lower(n_name) AS n_name, n_regionkey,
          |    'insert' AS _change_type, 1 AS _change_ordinal
          |  FROM nation WHERE n_nationkey < 10
          |  UNION ALL SELECT 990, 'atlantis', 2, 'insert', 1
          |  UNION ALL
          |  SELECT n_nationkey, n_name, n_regionkey, 'delete', 1
          |  FROM nation WHERE n_nationkey < 10
          |  UNION ALL
          |  SELECT n_nationkey,
          |    CASE WHEN n_nationkey < 10 THEN lower(n_name) ELSE n_name END,
          |    n_regionkey, 'delete', 2
          |  FROM nation WHERE n_nationkey % 5 = 3
          |)
          |ORDER BY _change_ordinal, _change_type, n_nationkey""".stripMargin,
      // IncrementalView over an ICEBERG base: the Spark side folds an
      // equality upsert (+1000 on keys ≡ 0 mod 3, inserted key 990)
      // and an equality delete (keys ≡ 2 mod 5) into one
      // changelog-fed refresh; the oracle recomputes the final
      // per-region aggregate from scratch
      "q_incr_view_iceberg" ->
        """WITH base AS (
          |  SELECT n_nationkey, n_regionkey,
          |    CAST(n_nationkey * 10 AS BIGINT) AS v FROM nation),
          |upserted AS (
          |  SELECT n_nationkey, n_regionkey,
          |    CASE WHEN n_nationkey % 3 = 0 THEN v + 1000 ELSE v END AS v
          |  FROM base
          |  UNION ALL SELECT 990, 2, CAST(777 AS BIGINT)),
          |finalstate AS (SELECT * FROM upserted WHERE n_nationkey % 5 <> 2)
          |SELECT n_regionkey, count(*) AS n_rows,
          |  CAST(sum(v) AS BIGINT) AS sum_v
          |FROM finalstate GROUP BY n_regionkey
          |ORDER BY n_regionkey""".stripMargin,
      // IncrementalView over a HUDI MOR base: same mutation script as
      // the Iceberg leg (log-upsert +1000 on keys ≡ 0 mod 3 + insert
      // 990, tombstone delete keys ≡ 2 mod 5), so the same relational
      // recompute is the oracle
      "q_incr_view_hudi" ->
        """WITH base AS (
          |  SELECT n_nationkey, n_regionkey,
          |    CAST(n_nationkey * 10 AS BIGINT) AS v FROM nation),
          |upserted AS (
          |  SELECT n_nationkey, n_regionkey,
          |    CASE WHEN n_nationkey % 3 = 0 THEN v + 1000 ELSE v END AS v
          |  FROM base
          |  UNION ALL SELECT 990, 2, CAST(777 AS BIGINT)),
          |finalstate AS (SELECT * FROM upserted WHERE n_nationkey % 5 <> 2)
          |SELECT n_regionkey, count(*) AS n_rows,
          |  CAST(sum(v) AS BIGINT) AS sum_v
          |FROM finalstate GROUP BY n_regionkey
          |ORDER BY n_regionkey""".stripMargin,
      // incremental read of the two-snapshot Iceberg nation table:
      // the appended slice IS the second append's predicate
      "q_iceberg_incr" ->
        """SELECT n_nationkey, n_name, n_regionkey
          |FROM nation WHERE n_nationkey >= 12
          |ORDER BY n_nationkey""".stripMargin,
      // the Spark side appends region < 3 to main, stages region >= 3
      // on an Iceberg BRANCH in two commits, and fastForwards main to
      // the branch head (write-audit-publish); the published snapshot
      // must be the full union
      "q_iceberg_wap" ->
        """SELECT n_nationkey, n_name, n_regionkey
          |FROM nation ORDER BY n_nationkey""".stripMargin,
      // the Spark side bulk-inserts nation as a native Hudi COW table,
      // UPSERTS (lowercase names for keys < 10 + a synthetic insert),
      // and snapshot-reads with a partition filter; the oracle replays
      // the merge relationally
      "q_hudi_read" ->
        """SELECT n_nationkey,
          |  CASE WHEN n_nationkey < 10 THEN lower(n_name) ELSE n_name END AS n_name,
          |  n_regionkey
          |FROM nation WHERE n_regionkey >= 2
          |UNION ALL SELECT 990, 'atlantis', 2
          |ORDER BY n_nationkey""".stripMargin,
      // the Spark side bulk-inserts nation as a native Hudi
      // MERGE_ON_READ table, upserts (uppercased _v2 names for keys
      // >= 15 as LOG files + a synthetic insert), and snapshot-reads
      // with a partition filter — the read-time base∪log merge must
      // equal this relational replay
      // Hudi commit-stats column-range skipping: the engine reads
      // orders through an unpartitioned 8-group ranged Hudi table —
      // values must equal the plain predicate over the source rows
      "q_hudi_stats_prune" ->
        s"""SELECT o_orderstatus, count(*) AS n,
           |  ${dsum(d4("o_totalprice"))} AS revenue,
           |  min(o_orderkey) AS min_ok, max(o_orderkey) AS max_ok
           |FROM orders
           |WHERE o_orderkey < 1500
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin,
      "q_hudi_mor" ->
        """SELECT * FROM (
          |  SELECT n_nationkey,
          |    CASE WHEN n_nationkey >= 15 THEN upper(n_name || '_v2') ELSE n_name END AS n_name,
          |    n_regionkey
          |  FROM nation WHERE n_regionkey <= 2
          |  UNION ALL SELECT 991, 'lemuria', 1
          |) WHERE n_nationkey NOT IN (3, 17)
          |ORDER BY n_nationkey""".stripMargin,
      // SCD2 versioned dimension from the event stream: consecutive
      // same-attribute observations collapse into one version row
      // with [from, to) validity; (ts, event_id) is the declared
      // total order; open current version renders -1
      "q_scd2" ->
        """WITH o AS (
          |  SELECT user_id, epoch_us(ts) AS t, event_id, event_type
          |  FROM events WHERE user_id < 20),
          |f AS (
          |  SELECT user_id, t, event_id, event_type,
          |    CASE WHEN row_number() OVER w = 1
          |           OR lag(event_type) OVER w IS DISTINCT FROM event_type
          |         THEN 1 ELSE 0 END AS chg
          |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
          |v AS (
          |  SELECT user_id, t, event_type,
          |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
          |  FROM f),
          |g AS (
          |  SELECT user_id, version, min(t) AS eff_from_us, min(event_type) AS event_type
          |  FROM v GROUP BY 1, 2)
          |SELECT user_id, event_type, eff_from_us,
          |  coalesce(lead(eff_from_us) OVER (PARTITION BY user_id ORDER BY version), -1) AS eff_to_us,
          |  version
          |FROM g ORDER BY user_id, version""".stripMargin,
      // hourly LOCF gap fill (users < 10): simultaneous observations
      // collapse to max(value); grid instants are epoch-aligned hour
      // multiples in [first obs (ceil), last obs]; each span
      // [t, next) contributes exactly its covered instants
      "q_gap_fill" -> {
        val st = 3600L * 1000000L
        s"""WITH obs AS (
           |  SELECT user_id, epoch_us(ts) AS t, max(value) AS v
           |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
           |spans AS (
           |  SELECT user_id, t, v,
           |    coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t),
           |             max(t) OVER (PARTITION BY user_id) + 1) AS e
           |  FROM obs),
           |g AS (
           |  SELECT user_id, v,
           |    unnest(generate_series(t + ($st - (t % $st)) % $st,
           |                           (e - 1) - (((e - 1) % $st + $st) % $st),
           |                           $st)) AS grid_us
           |  FROM spans
           |  WHERE t + ($st - (t % $st)) % $st
           |     <= (e - 1) - (((e - 1) % $st + $st) % $st))
           |SELECT user_id, grid_us, v AS value
           |FROM g ORDER BY user_id, grid_us""".stripMargin
      },
      // per-column profile of customer: counts/distincts exact,
      // float bounds rendered through DECIMAL(18,4) on both engines
      "q_profile" -> {
        def colSql(c: String, isFloat: Boolean) = {
          val mn = if (isFloat) s"CAST(CAST(round(min($c), 4) AS DECIMAL(18,4)) AS VARCHAR)"
                   else s"CAST(min($c) AS VARCHAR)"
          val mx = if (isFloat) s"CAST(CAST(round(max($c), 4) AS DECIMAL(18,4)) AS VARCHAR)"
                   else s"CAST(max($c) AS VARCHAR)"
          s"""SELECT '$c' AS "column", count(*) AS n_rows,
             |  count(*) - count($c) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  $mn AS min_s, $mx AS max_s
             |FROM customer""".stripMargin
        }
        Seq(
          colSql("c_custkey", false), colSql("c_name", false),
          colSql("c_mktsegment", false), colSql("c_acctbal", true),
          colSql("c_nationkey", false))
          .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      },
      // length-bucketed padded batches: power-of-two bins (exact
      // integer ceil-log2 via bin-string length), capacity =
      // budget div bin_cap, batches fill in (len, id) order
      "q_length_batches" ->
        """WITH d AS (
          |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len
          |  FROM documents WHERE length(text) > 0 AND length(text) <= 4096),
          |b AS (
          |  SELECT doc_id, len,
          |    CAST(greatest(4, length(bin(greatest(len, 2) - 1))) AS INTEGER) AS bin
          |  FROM d),
          |c AS (
          |  SELECT doc_id, len, bin,
          |    least(CAST(1 AS BIGINT) << bin, 4096) AS bin_cap
          |  FROM b),
          |a AS (
          |  SELECT bin, bin_cap, len,
          |    (row_number() OVER (PARTITION BY bin ORDER BY len, doc_id) - 1)
          |      // (4096 // bin_cap) AS batch
          |  FROM c)
          |SELECT bin, batch, count(*) AS n_seqs,
          |  CAST(sum(len) AS BIGINT) AS sum_len,
          |  CAST(max(len) AS BIGINT) AS max_len,
          |  CAST(min(bin_cap) AS BIGINT) AS padded
          |FROM a GROUP BY bin, batch
          |ORDER BY bin, batch""".stripMargin,
      // the Spark side runs a SQL string through the lakehouse front
      // door against the native Iceberg orders copy (WHERE → Filter
      // algebra → month-transform pruning); verbatim copy, so the
      // oracle is the raw relational aggregate
      "q_lakehouse_sql" ->
        s"""SELECT strftime(o_orderdate, '%Y-%m') AS ord_month,
           |  count(*) AS n_orders,
           |  ${dsum(d4("o_totalprice"))} AS revenue
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
           |GROUP BY ord_month
           |ORDER BY ord_month""".stripMargin,
      // the Spark side copies customer into a native Delta table,
      // orders into a native Iceberg table (month(o_orderdate)
      // transform), and nation into a native Hudi table, then joins
      // the three FORMATS in one plan; the copies are verbatim, so
      // the oracle is the plain relational join over the raw parquet
      "q_lakehouse_join" ->
        s"""SELECT n_name,
           |  count(*) AS n_orders,
           |  ${dsum(d4("o_totalprice"))} AS revenue
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE c_mktsegment = 'BUILDING'
           |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY n_name""".stripMargin,
      // Hudi incremental (bulkInsert, upsert]: exactly the upsert's
      // changed rows with their new values
      "q_hudi_incr" ->
        """SELECT n_nationkey, lower(n_name) AS n_name, n_regionkey
          |FROM nation WHERE n_nationkey < 10
          |UNION ALL SELECT 990, 'atlantis', 2
          |ORDER BY n_nationkey""".stripMargin,
      // the Spark side EXPORTS the documents as WebDataset tar shards
      // and recomputes these stats from the IMPORTED tar entries —
      // the oracle recomputes them straight from the table with the
      // same md5 shard hash, so the whole tar round trip is on the
      // hash: assignment, entry count, and payload bytes
      "q_wds_shards" -> {
        val n = Wave6Queries.WdsParams.Shards
        s"""SELECT CAST(${PortableHash.Sql.md5Mod("'shard' || '|' || CAST(doc_id AS VARCHAR)")} % $n AS INTEGER) AS shard,
           |  count(*) * 2 AS n_entries,
           |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys,
           |  CAST(sum(octet_length(CAST(text AS BLOB)) + octet_length(CAST(source AS BLOB))) AS BIGINT) AS sum_bytes
           |FROM documents GROUP BY shard ORDER BY shard""".stripMargin
      }
    )
  }

  /** DuckDB oracle for temperature mixing: quotas are computed ONCE
    * (same deterministic driver arithmetic as
    * [[graft.operators.Mixing.temperatureQuotas]]) and spliced as a
    * VALUES table; membership replays the same portable md5 ranking
    * with the same id tie-break.
    */
  private def domainMixSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import Wave6Queries.MixParams
    val quotas = graft.operators.Mixing.temperatureQuotas(
      Tables.table(spark, dir, "documents"), "source",
      MixParams.Temperature, MixParams.TargetFraction)
    val qRows = quotas.map(q => s"('${q.domain}', ${q.quota})").mkString(",\n|    ")
    val order = PortableHash.Sql.md5Mod(
      s"'${MixParams.Salt}' || '|' || CAST(doc_id AS VARCHAR)")
    s"""WITH q AS (
       |  SELECT * FROM (VALUES
       |    $qRows) AS t(source, quota)),
       |ranked AS (
       |  SELECT source, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY $order, doc_id) AS rn
       |  FROM documents),
       |kept AS (
       |  SELECT r.source, r.doc_id, r.n_chars
       |  FROM ranked r JOIN q USING (source) WHERE r.rn <= q.quota)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
       |  min(doc_id) AS min_kept_id
       |FROM kept GROUP BY source ORDER BY source""".stripMargin
  }

  /** DuckDB oracle for IVF-PQ search: composes the two proven oracle
    * shapes — the kmeans oracle's literal-centroid assignment CTE and
    * the PQ oracle's codebook/code/LUT chain — plus per-query probe
    * lists spliced from the SAME driver computation the engine uses
    * ([[graft.operators.Pq.probeCentroids]]). Candidates = rows whose
    * coarse bucket is probed; ranking = the fixed-order ADC sum.
    */
  private def ivfPqSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import Wave6Queries.IvfPqParams
    import graft.operators.{Pq, Similarity}
    val emb = Tables.table(spark, dir, "embeddings")
    val coarse = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = IvfPqParams.CoarseK, maxIter = IvfPqParams.CoarseIter)
    val model = Pq.fit(emb, "vec_id", "embedding",
      IvfPqParams.Dims, IvfPqParams.M, IvfPqParams.Ksub, IvfPqParams.PqIter)
    val d = model.subDim
    val queries = Pq.collectQueries(emb, "vec_id", "embedding", IvfPqParams.QueryBound)

    val coarseRows = coarse.sortBy(_._1).map { case (cid, v) =>
      s"($cid, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n|    ")
    val bookRows = model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.sortBy(_._1).map { case (cid, v) =>
        s"($j, $cid, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n|    ")
    val lutRows = queries.sortBy(_._1).map { case (qid, qv) =>
      val probes = Pq.probeCentroids(coarse, qv, IvfPqParams.NProbe)
      val luts = Pq.lut(model, qv).map(row =>
        s"[${row.map(_.toString).mkString(", ")}]::DOUBLE[]")
      s"($qid, [${probes.mkString(", ")}]::BIGINT[], ${luts.mkString(", ")})"
    }.mkString(",\n|    ")
    val lutCols = (0 until model.m).map(j => s"l$j").mkString(", ")
    val codeCols = (0 until model.m)
      .map(j => s"max(CASE WHEN j = $j THEN code END) AS c$j").mkString(",\n|    ")
    val adist = (0 until model.m).map(j => s"q.l$j[c.c$j + 1]").mkString(" + ")
    val coarseL2 = "round(list_sum(list_transform(range(1, len(e.embedding)+1), " +
      "i -> (e.embedding[i]::DOUBLE - cc.cv[i]) * (e.embedding[i]::DOUBLE - cc.cv[i]))), 4)"
    s"""WITH coarse AS (
       |  SELECT * FROM (VALUES
       |    $coarseRows) AS t(centroid_id, cv)),
       |cdists AS (
       |  SELECT e.vec_id, cc.centroid_id, $coarseL2 AS d2
       |  FROM embeddings e CROSS JOIN coarse cc),
       |assigned AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
       |    FROM cdists) WHERE rn = 1),
       |books AS (
       |  SELECT * FROM (VALUES
       |    $bookRows) AS t(j, cid, cv)),
       |subd AS (
       |  SELECT e.vec_id, b.j, b.cid,
       |    round(list_sum(list_transform(range(1, ${d + 1}),
       |      i -> (e.embedding[b.j * $d + i]::DOUBLE - b.cv[i])
       |         * (e.embedding[b.j * $d + i]::DOUBLE - b.cv[i]))), 4) AS d2
       |  FROM embeddings e CROSS JOIN books b),
       |codes AS (
       |  SELECT vec_id, j, cid AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
       |    FROM subd) WHERE rn = 1),
       |codev AS (
       |  SELECT vec_id,
       |    $codeCols
       |  FROM codes GROUP BY vec_id),
       |luts AS (
       |  SELECT * FROM (VALUES
       |    $lutRows) AS t(query_id, probes, $lutCols)),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round($adist, 4) AS adist
       |  FROM codev c
       |  JOIN assigned a ON a.vec_id = c.vec_id
       |  CROSS JOIN luts q
       |  WHERE list_contains(q.probes, a.centroid_id) AND c.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adist, rank FROM ranked
       |WHERE rank <= ${IvfPqParams.TopK}
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Mirrors NearDup.crossMinhashPairs + Wave6Queries.qFuzzyDecontam:
    * the standard signature/band CTE chain, corpus↔probe band join
    * split on the mod-17 slice, exact shingle-set Jaccard verify, per-
    * source rollup of flagged corpus docs.
    */
  private def fuzzyDecontamSql: String = {
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val sigs = (b * rows until (b + 1) * rows).map(j => s"sig_$j").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $sigs)) AS bh FROM sigd"
    }.mkString("\n  UNION ALL\n  ")
    val m = Wave6Queries.FuzzyDecontamParams.Mod
    val thr = Wave6Queries.FuzzyDecontamParams.Threshold
    s"""$sigSelect,
       |sigd AS (SELECT *, list_sort(list_distinct(hs)) AS shset FROM sig),
       |banded AS (
       |  $bandSelects
       |),
       |cpairs AS (
       |  SELECT DISTINCT a.doc_id AS c_id, b.doc_id AS p_id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  WHERE a.doc_id % $m != 0 AND b.doc_id % $m = 0),
       |ver AS (
       |  SELECT c_id, p_id,
       |    round(len(list_intersect(sa.shset, sb.shset)) /
       |      (len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset))), 4) AS jaccard
       |  FROM cpairs
       |  JOIN sigd sa ON sa.doc_id = c_id
       |  JOIN sigd sb ON sb.doc_id = p_id),
       |flags AS (
       |  SELECT c_id, count(*) AS n_p, max(jaccard) AS mj
       |  FROM ver WHERE jaccard >= $thr GROUP BY c_id)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN f.c_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(sum(coalesce(f.n_p, 0)) AS BIGINT) AS n_pairs,
       |  round(max(coalesce(f.mj, 0.0)), 4) AS max_jaccard
       |FROM documents d LEFT JOIN flags f ON d.doc_id = f.c_id
       |WHERE d.doc_id % $m != 0
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** Mirrors IncrementalNearDup + Wave6Queries.qIncrDedup: the same
    * signature/band CTE chain, the mod-10 batch probing the indexed
    * remainder, exact shingle-set Jaccard verify, per-source rollup
    * of the BATCH docs — the oracle proves the Delta-index-mediated
    * candidates equal directly-computed ones.
    */
  private def incrDedupSql: String = {
    val rows = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val sigs = (b * rows until (b + 1) * rows).map(j => s"sig_$j").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $sigs)) AS bh FROM sigd"
    }.mkString("\n  UNION ALL\n  ")
    val m = Wave6Queries.IncrDedupParams.Mod
    val thr = Wave6Queries.IncrDedupParams.Threshold
    s"""$sigSelect,
       |sigd AS (SELECT *, list_sort(list_distinct(hs)) AS shset FROM sig),
       |banded AS (
       |  $bandSelects
       |),
       |cpairs AS (
       |  SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS idx_id
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
       |  WHERE a.doc_id % $m != 0 AND b.doc_id % $m = 0),
       |ver AS (
       |  SELECT new_id, idx_id,
       |    round(len(list_intersect(sa.shset, sb.shset)) /
       |      (len(sa.shset) + len(sb.shset) - len(list_intersect(sa.shset, sb.shset))), 4) AS jaccard
       |  FROM cpairs
       |  JOIN sigd sa ON sa.doc_id = new_id
       |  JOIN sigd sb ON sb.doc_id = idx_id),
       |flags AS (
       |  SELECT new_id, count(*) AS n_p, max(jaccard) AS mj
       |  FROM ver WHERE jaccard >= $thr GROUP BY new_id)
       |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN f.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(sum(coalesce(f.n_p, 0)) AS BIGINT) AS n_pairs,
       |  round(max(coalesce(f.mj, 0.0)), 4) AS max_jaccard
       |FROM documents d LEFT JOIN flags f ON d.doc_id = f.new_id
       |WHERE d.doc_id % $m = 0
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  /** Mirrors SpanDedup.removeRepeatedSpans + Wave6Queries.qSpanDedup:
    * 8-word non-overlapping spans, global first occurrence by
    * (doc_id, pos), later occurrences dropped, docs WITH drops
    * rebuilt from surviving spans + the sub-span tail (single-space
    * joined); untouched docs keep their original text verbatim.
    */
  private def spanDecontamSql: String = {
    val n = 4
    s"""WITH tok AS (
       |  SELECT doc_id, source, text, ${wsTokensSql("text")} AS toks FROM documents),
       |probe AS (
       |  SELECT DISTINCT u.gram FROM tok,
       |    UNNEST(CASE WHEN len(toks) >= $n THEN list_transform(
       |      generate_series(1, len(toks)-${n - 1}),
       |      i -> array_to_string(toks[i:i+${n - 1}], ' ')) ELSE [] END) AS u(gram)
       |  WHERE doc_id % 50 = 0),
       |base AS (SELECT doc_id, source, text, toks, len(toks) // $n AS m
       |         FROM tok WHERE doc_id % 50 <> 0),
       |pos AS (SELECT doc_id, toks, unnest(range(0, m)) AS pos FROM base),
       |hs AS (
       |  SELECT doc_id, pos,
       |    array_to_string(toks[(pos*$n+1):(pos*$n+$n)], ' ') AS chunk
       |  FROM pos),
       |dl AS (
       |  SELECT doc_id, list_sort(list(pos)) AS dp
       |  FROM hs JOIN probe ON hs.chunk = probe.gram GROUP BY doc_id),
       |rebuilt AS (
       |  SELECT b.doc_id, b.source,
       |    CASE WHEN d.doc_id IS NULL THEN b.text
       |    ELSE coalesce(array_to_string(list_concat(
       |      [array_to_string(b.toks[(i*$n+1):(i*$n+$n)], ' ')
       |        FOR i IN range(0, b.m) IF NOT list_contains(d.dp, i)],
       |      CASE WHEN b.m*$n < len(b.toks) AND NOT (len(b.toks) = 1 AND b.toks[1] = '')
       |        THEN [array_to_string(b.toks[(b.m*$n+1):len(b.toks)], ' ')]
       |        ELSE CAST([] AS VARCHAR[]) END), ' '), '') END AS nt,
       |    b.text AS orig
       |  FROM base b LEFT JOIN dl d USING (doc_id))
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN nt != orig THEN 1 ELSE 0 END) AS BIGINT) AS n_excised,
       |  CAST(sum(length(nt)) AS BIGINT) AS sum_chars,
       |  CAST(sum(${PortableHash.Sql.md5Mod("nt")}) AS BIGINT) AS text_hash_sum
       |FROM rebuilt GROUP BY source ORDER BY source""".stripMargin
  }

  private def spanDedupSql: String = {
    val n = 8
    s"""WITH tok AS (
       |  SELECT doc_id, source, text, ${wsTokensSql("text")} AS toks FROM documents),
       |base AS (SELECT doc_id, source, text, toks, len(toks) // $n AS m FROM tok),
       |pos AS (SELECT doc_id, toks, unnest(range(0, m)) AS pos FROM base),
       |hs AS (
       |  SELECT doc_id, pos,
       |    md5(array_to_string(toks[(pos*$n+1):(pos*$n+$n)], ' ')) AS h
       |  FROM pos),
       |rk AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
       |    count(*) OVER (PARTITION BY h) AS cnt
       |  FROM hs),
       |dl AS (
       |  SELECT doc_id, list_sort(list(pos)) AS dp
       |  FROM rk WHERE cnt > 1 AND rn > 1 GROUP BY doc_id),
       |rebuilt AS (
       |  SELECT b.doc_id, b.source,
       |    CASE WHEN d.doc_id IS NULL THEN b.text
       |    -- coalesce: DuckDB's array_to_string([]) is NULL where
       |    -- Spark's array_join([]) is '' (the every-span-dropped doc)
       |    ELSE coalesce(array_to_string(list_concat(
       |      [array_to_string(b.toks[(i*$n+1):(i*$n+$n)], ' ')
       |        FOR i IN range(0, b.m) IF NOT list_contains(d.dp, i)],
       |      CASE WHEN b.m*$n < len(b.toks) AND NOT (len(b.toks) = 1 AND b.toks[1] = '')
       |        THEN [array_to_string(b.toks[(b.m*$n+1):len(b.toks)], ' ')]
       |        ELSE CAST([] AS VARCHAR[]) END), ' '), '') END AS nt,
       |    b.text AS orig
       |  FROM base b LEFT JOIN dl d USING (doc_id))
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN nt != orig THEN 1 ELSE 0 END) AS BIGINT) AS n_modified,
       |  CAST(sum(length(nt)) AS BIGINT) AS sum_chars,
       |  CAST(sum(${PortableHash.Sql.md5Mod("nt")}) AS BIGINT) AS text_hash_sum
       |FROM rebuilt GROUP BY source ORDER BY source""".stripMargin
  }

  val all: Map[String, String] =
    relational ++ pipeline ++ wave2 ++ wave3 ++ wave4 ++ wave5 ++ wave6

  /** Oracles whose SQL embeds values computed DETERMINISTICALLY from
    * the data at `dir` — merged over [[all]] by Verify, which knows
    * the scale-factor directory. q_ann_kmeans splices the learned
    * k-means centroids into its oracle as a literal matrix: the
    * learner itself is deterministic (hash-sample init, exact-decimal
    * means, fixed iterations — SimilaritySpec), so the assignment +
    * in-bucket top-k become SQL-expressible the same way q_ann_ivf's
    * modulo-seed variant already is. q_bpe_tokens splices the learned
    * merge table and applies it with a recursive CTE (see
    * [[bpeTokensSql]]).
    */
  def dynamic(
      spark: org.apache.spark.sql.SparkSession,
      dir: String
  ): Map[String, String] = Map(
    "q_ann_kmeans" -> annKmeansSql(spark, dir),
    "q_bpe_tokens" -> bpeTokensSql(spark, dir),
    "q_pca_project" -> pcaProjectSql(spark, dir),
    "q_emb_outliers" -> embOutliersSql(spark, dir),
    "q_pq_ann" -> pqAnnSql(spark, dir),
    // the persisted-index search replays the identical pipeline: fit
    // is deterministic and the model round-trips Delta bit-exactly
    "q_vec_index" -> pqAnnSql(spark, dir),
    "q_filtered_ann" -> pqAnnSql(spark, dir,
      labelEq = Some(Wave6Queries.FilteredAnnLabel)),
    "q_domain_mix" -> domainMixSql(spark, dir),
    "q_ivfpq" -> ivfPqSql(spark, dir),
    // the persisted IVF-PQ index replays the identical pipeline:
    // coarse fit + PQ fit are deterministic, the tables round-trip
    // Delta bit-exactly, and probed search ranks the same candidates
    "q_ivfpq_persist" -> ivfPqSql(spark, dir))

  /** DuckDB oracle for PCA projection: Pca.fit is partitioning- and
    * run-invariant (exact decimal moments + deterministic Jacobi), so
    * the learned components splice as literal arrays. Each projection
    * is `list_sum(v[i]·c[i]) − μ·c` — the SAME ascending-index double
    * accumulation the engine's VecDot performs, minus the same
    * driver-precomputed scalar — bit-identical before the shared
    * round(4). Double literals print via Double.toString (shortest
    * round-trip), so DuckDB parses back the exact float64.
    */
  private def pcaProjectSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import Wave5Queries.PcaParams
    val model = graft.operators.Pca.fit(
      Tables.table(spark, dir, "embeddings"), "embedding",
      PcaParams.Dims, PcaParams.K)
    val projCols = model.components.zipWithIndex.map { case (c, j) =>
      val lit = c.map(_.toString).mkString("[", ", ", "]")
      val md = graft.operators.Pca.meanDot(model, j).toString
      s"""round(list_sum(list_transform(range(1, ${PcaParams.Dims + 1}),
         |    i -> e.embedding[i]::DOUBLE * ($lit::DOUBLE[])[i])) - ($md), 4) AS p$j""".stripMargin
    }.mkString(",\n|  ")
    s"""SELECT e.vec_id, e.label,
       |  $projCols
       |FROM embeddings e
       |ORDER BY e.vec_id""".stripMargin
  }

  /** DuckDB oracle for embedding outliers: same spliced model as
    * q_pca_project; the residual is `‖v−μ‖² − Σ_j p_j²` with every
    * term the identical ascending-index double accumulation, rounded
    * once at the end.
    */
  private def embOutliersSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import Wave5Queries.PcaParams
    import Wave6Queries.OutlierParams
    val model = graft.operators.Pca.fit(
      Tables.table(spark, dir, "embeddings"), "embedding",
      PcaParams.Dims, PcaParams.K)
    val muLit = model.mean.map(_.toString).mkString("[", ", ", "]")
    val centered =
      s"""list_sum(list_transform(range(1, ${PcaParams.Dims + 1}),
         |    i -> (e.embedding[i]::DOUBLE - ($muLit::DOUBLE[])[i]) *
         |         (e.embedding[i]::DOUBLE - ($muLit::DOUBLE[])[i])))""".stripMargin
    val projSq = model.components.zipWithIndex.map { case (c, j) =>
      val cl = c.map(_.toString).mkString("[", ", ", "]")
      val md = graft.operators.Pca.meanDot(model, j).toString
      val pj = s"""(list_sum(list_transform(range(1, ${PcaParams.Dims + 1}),
                  |    i -> e.embedding[i]::DOUBLE * ($cl::DOUBLE[])[i])) - ($md))""".stripMargin
      s"($pj * $pj)"
    }.mkString(" + ")
    s"""WITH r AS (
       |  SELECT e.vec_id, e.label,
       |    round($centered - ($projSq), 4) AS resid
       |  FROM embeddings e),
       |rk AS (
       |  SELECT label, vec_id, resid,
       |    row_number() OVER (PARTITION BY label ORDER BY resid DESC, vec_id) AS rank
       |  FROM r)
       |SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, resid
       |FROM rk WHERE rank <= ${OutlierParams.TopK}
       |ORDER BY label, rank""".stripMargin
  }

  /** DuckDB oracle for greedy BPE encoding — SQL-expressible after
    * all thanks to the components-before-compounds invariant of a
    * LEARNED merge table: any merge whose component token was produced
    * by another merge necessarily has a higher rank (the component had
    * to exist when the pair was counted), so the engine's
    * lowest-rank-first per-word loop (Bpe.encodeWord) is equivalent to
    * applying the merges once each, in rank order, replacing every
    * occurrence — which IS expressible as a 20-step recursive CTE.
    *
    * Token-list encoding: each token is wrapped in chr(31) sentinels
    * and concatenated ("⟨a⟩⟨b⟩" = 0x1f a 0x1f 0x1f b 0x1f), so the
    * merge rewrite `replace(s, ⟨a⟩⟨b⟩, ⟨ab⟩)` can neither match a
    * token-content suffix/prefix (content never contains 0x1f) nor
    * starve an adjacent non-overlapping occurrence (each boundary owns
    * its own sentinel pair). Token count = sentinels / 2. The CTE runs
    * over the DISTINCT (source, word) table — the same
    * vocabulary-not-corpus trick the learner uses — then re-weights by
    * word frequency.
    */
  private def bpeTokensSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val merges = graft.functions.Bpe.learn(
      Tables.table(spark, dir, "documents"), "text", numMerges = 20)
    require(merges.nonEmpty, "BPE oracle needs a non-empty merge table")
    def esc(s: String) = s.replace("'", "''")
    val rows = merges.zipWithIndex.map { case ((a, b), r) =>
      s"($r, '${esc(a)}', '${esc(b)}')"
    }.mkString(",\n|    ")
    val S = "chr(31)"
    s"""WITH RECURSIVE merges(rank, a, b) AS (VALUES
       |    $rows),
       |words AS (
       |  SELECT d.source, t.w, count(*)::BIGINT AS freq
       |  FROM documents d, unnest(regexp_split_to_array(d.text, '\\s+')) AS t(w)
       |  WHERE len(t.w) > 0
       |  GROUP BY d.source, t.w),
       |init AS (
       |  SELECT source, w, freq,
       |    $S || array_to_string(string_split(w, ''), $S||$S) || $S AS s
       |  FROM words),
       |enc AS (
       |  SELECT 0 AS r, source, w, freq, s FROM init
       |  UNION ALL
       |  SELECT e.r + 1, e.source, e.w, e.freq,
       |         replace(e.s, $S||m.a||$S||$S||m.b||$S, $S||m.a||m.b||$S)
       |  FROM enc e JOIN merges m ON m.rank = e.r),
       |counted AS (
       |  SELECT source, freq, (len(s) - len(replace(s, $S, ''))) / 2 AS n_tok
       |  FROM enc WHERE r = ${merges.size}),
       |chars AS (
       |  SELECT source, sum(len(text))::BIGINT AS n_chars
       |  FROM documents GROUP BY source),
       |toks AS (
       |  SELECT source, sum(n_tok * freq)::BIGINT AS total_tokens
       |  FROM counted GROUP BY source)
       |SELECT t.source, t.total_tokens,
       |  round(c.n_chars::DOUBLE / t.total_tokens, 4) AS chars_per_token
       |FROM toks t JOIN chars c USING (source)
       |ORDER BY t.source""".stripMargin
  }

  private def annKmeansSql(
      spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    import Wave3Queries.Ann
    val cents = graft.operators.Similarity.kmeansCentroids(
      Tables.table(spark, dir, "embeddings"), "vec_id", "embedding",
      k = Ann.K, maxIter = Ann.MaxIter)
    // Double.toString is the shortest round-tripping repr, so DuckDB
    // parses back the exact same float64 the Spark plan used
    val rows = cents.sortBy(_._1).map { case (cid, v) =>
      s"($cid, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n|    ")
    val l2 = "round(list_sum(list_transform(range(1, len(e.embedding)+1), " +
      "i -> (e.embedding[i]::DOUBLE - c.cv[i]) * (e.embedding[i]::DOUBLE - c.cv[i]))), 4)"
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    $rows) AS t(centroid_id, cv)),
       |dists AS (
       |  SELECT e.vec_id, e.embedding, c.centroid_id, $l2 AS d2
       |  FROM embeddings e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, centroid_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
       |    FROM dists) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, centroid_id
       |      FROM assigned WHERE vec_id < ${Ann.QueryBound}),
       |scored AS (
       |  SELECT q.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv::DOUBLE[], a.embedding::DOUBLE[]), 4) AS sim
       |  FROM q JOIN assigned a USING (centroid_id)
       |  WHERE a.vec_id != q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= ${Ann.TopK}
       |ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB oracle for PQ-ADC ANN: [[graft.operators.Pq]]'s training
    * is deterministic (it is m runs of the same k-means the kmeans
    * oracle splices), so the codebooks AND the per-query ADC lookup
    * tables splice as literals. Encode replays the engine's
    * rounded-argmin per subspace (same `ORDER BY d2, cid` tie-break);
    * the approximate distance is the same fixed-order `l0[..] +
    * l1[..] + ...` chain of identical literal doubles the engine's
    * left-associated lookup sum computes — bit-identical before the
    * shared round(4).
    */
  private def pqAnnSql(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      labelEq: Option[Int] = None): String = {
    import Wave6Queries.PqParams
    import graft.operators.Pq
    val emb = Tables.table(spark, dir, "embeddings")
    val model = Pq.fit(emb, "vec_id", "embedding",
      PqParams.Dims, PqParams.M, PqParams.Ksub, PqParams.MaxIter)
    val d = model.subDim
    val bookRows = model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.sortBy(_._1).map { case (cid, v) =>
        s"($j, $cid, [${v.map(_.toString).mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n|    ")
    val queries = Pq.collectQueries(emb, "vec_id", "embedding", PqParams.QueryBound)
    val lutCols = (0 until model.m).map(j => s"l$j")
    val lutRows = queries.sortBy(_._1).map { case (qid, qv) =>
      val luts = Pq.lut(model, qv).map(row =>
        s"[${row.map(_.toString).mkString(", ")}]::DOUBLE[]")
      s"($qid, ${luts.mkString(", ")})"
    }.mkString(",\n|    ")
    val codeCols = (0 until model.m)
      .map(j => s"max(CASE WHEN j = $j THEN code END) AS c$j").mkString(",\n|    ")
    val adist = (0 until model.m).map(j => s"q.l$j[c.c$j + 1]").mkString(" + ")
    s"""WITH books AS (
       |  SELECT * FROM (VALUES
       |    $bookRows) AS t(j, cid, cv)),
       |subd AS (
       |  SELECT e.vec_id, b.j, b.cid,
       |    round(list_sum(list_transform(range(1, ${d + 1}),
       |      i -> (e.embedding[b.j * $d + i]::DOUBLE - b.cv[i])
       |         * (e.embedding[b.j * $d + i]::DOUBLE - b.cv[i]))), 4) AS d2
       |  FROM embeddings e CROSS JOIN books b),
       |codes AS (
       |  SELECT vec_id, j, cid AS code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rn
       |    FROM subd) WHERE rn = 1),
       |codev AS (
       |  SELECT vec_id,
       |    $codeCols
       |  FROM codes GROUP BY vec_id),
       |luts AS (
       |  SELECT * FROM (VALUES
       |    $lutRows) AS t(query_id, ${lutCols.mkString(", ")})),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |    round($adist, 4) AS adist
       |  FROM codev c CROSS JOIN luts q
       |  WHERE c.vec_id != q.query_id${labelEq.map(l =>
            s" AND c.vec_id IN (SELECT vec_id FROM embeddings WHERE label = $l)")
            .getOrElse("")}),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, adist, rank FROM ranked
       |WHERE rank <= ${PqParams.TopK}
       |ORDER BY query_id, rank""".stripMargin
  }
}
