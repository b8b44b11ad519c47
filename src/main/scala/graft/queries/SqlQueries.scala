package graft.queries

import graft.{Fixtures, Tables}

/** SQL-text entry points (SURVEY.md §2.2 requires both API styles):
  * range frames (Q23b), subqueries (Q33a/b/c), CTEs (Q34). The Spark
  * text runs over temp views; the oracle text is identical except
  * wallet_txs comes from the deterministic CTE (Fixtures.cte).
  * Delegated warehouse surface (resources/redshift.py:89-112).
  */
object SqlQueries {

  /** Build a QueryDef whose Spark side is `spark.sql(text)` over the
    * registered views. `needsWalletCte` prepends the wallet_txs
    * derivation on the DuckDB side only. */
  private def sqlQ(name: String, text: String, needsWalletCte: Boolean,
      oracleText: Option[String] = None): QueryDef = {
    val duck =
      if (!needsWalletCte) oracleText.getOrElse(text)
      else {
        val t = oracleText.getOrElse(text)
        // merge WITH clauses: our CTE first, then the query's own
        if (t.trim.toUpperCase.startsWith("WITH"))
          Fixtures.cte.stripSuffix("\n") + ", " + t.trim.drop(4)
        else Fixtures.cte + t
      }
    QueryDef(name, duck) { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql(text)
    }
  }

  /** Sliding RANGE frame keyed on a numeric (double) column. */
  val q23b = sqlQ("q23b_range_frame",
    """SELECT o_orderkey,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS cnt_in_range,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE), 6) AS sum_in_range
      |FROM orders
      |WINDOW w AS (ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin,
    needsWalletCte = false)

  /** Scalar subquery over an aggregate of the same CTE. */
  val q33a = sqlQ("q33a_scalar_subquery",
    """WITH g AS (SELECT wallet_address, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM wallet_txs GROUP BY wallet_address)
      |SELECT wallet_address, cnt FROM g
      |WHERE cnt > (SELECT AVG(cnt) FROM g)
      |ORDER BY wallet_address""".stripMargin,
    needsWalletCte = true)

  val q33b = sqlQ("q33b_in_subquery",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin,
    needsWalletCte = false)

  val q33c = sqlQ("q33c_exists_correlated",
    """SELECT wallet_address, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM wallet_txs w1
      |WHERE EXISTS (SELECT 1 FROM wallet_txs w2
      |              WHERE w2.wallet_address = w1.wallet_address
      |                AND w2.quantity > 990)
      |GROUP BY wallet_address ORDER BY wallet_address""".stripMargin,
    needsWalletCte = true)

  /** Explicit GROUPING SETS (the third grouping-analytics form next to
    * q19 ROLLUP / q19b CUBE): per-region, per-status, and grand-total
    * slices in one pass — SQL-native entry (the DataFrame API spells
    * only rollup/cube; arbitrary sets are a SQL-text feature). */
  val q19d = sqlQ("q19d_grouping_sets",
    """SELECT r_name, o_orderstatus,
      |  CAST(GROUPING(r_name) AS INTEGER) AS gr,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS gs,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 6) AS total
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (o_orderstatus), ())
      |ORDER BY gr, gs, r_name NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    needsWalletCte = false)

  val q34 = sqlQ("q34_cte_selfjoin",
    """WITH t AS (SELECT token_symbol, CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM wallet_txs GROUP BY token_symbol)
      |SELECT a.token_symbol AS s1, b.token_symbol AS s2, a.cnt
      |FROM t a JOIN t b ON a.cnt = b.cnt AND a.token_symbol < b.token_symbol
      |ORDER BY s1, s2""".stripMargin,
    needsWalletCte = true)

  // ───────────────────── dual SQL-text entries ─────────────────────
  // SURVEY §2.2 promises BOTH entry styles per relational query; the
  // reference's entire query surface is SQL text loaded into a
  // warehouse (resources/redshift.py:89-112). Each pair below is the
  // SAME query as its DataFrame twin, entered as `spark.sql` text over
  // the registered views. Most oracle texts are ANSI enough to run
  // verbatim on Spark; wallet_txs queries drop the DuckDB-only CTE
  // (the Spark side reads the registered view) and q17 swaps
  // strftime → date_format. SqlDualEntrySpec asserts text ≡ DataFrame
  // row-for-row; the driver hash-checks each `_sql` entry against the
  // twin's oracle independently.

  /** (DataFrame twin, Spark-SQL text) pairs for every dual entry. */
  val dualPairs: Seq[(QueryDef, String)] = {
    def verbatim(t: QueryDef) = (t, t.oracle.get)
    def noCte(t: QueryDef) = (t, t.oracle.get.stripPrefix(Fixtures.cte))
    Seq(
      verbatim(Joins.q08), verbatim(Joins.q09), verbatim(Joins.q10),
      verbatim(Joins.q10b), verbatim(Joins.q11), verbatim(Joins.q12),
      verbatim(Joins.q13), verbatim(Joins.q13b), verbatim(Joins.q15),
      noCte(Aggregates.q16),
      (Aggregates.q17, Aggregates.q17.oracle.get.replace(
        "strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S')",
        "date_format(min(l_shipdate), 'yyyy-MM-dd HH:mm:ss')")),
      noCte(Aggregates.q18), verbatim(Aggregates.q19),
      verbatim(Aggregates.q19b), verbatim(Aggregates.q19c),
      noCte(Aggregates.q20), verbatim(Aggregates.q49),
      noCte(Windows.q21), noCte(Windows.q22), noCte(Windows.q23),
      noCte(Windows.q24), noCte(Windows.q24b),
      noCte(Scans.q04), noCte(Scans.q05), noCte(Scans.q06),
      // Spark spells the string type STRING, not bare VARCHAR
      (Scans.q07, Scans.q07.oracle.get.stripPrefix(Fixtures.cte)
        .replace("AS VARCHAR)", "AS STRING)")),
      // q25's oracle text extends the wallet CTE's WITH-list; standalone
      // Spark text re-opens the WITH over the registered view
      (SetsFuncs.q25,
        "WITH " + SetsFuncs.q25.oracle.get.stripPrefix(Fixtures.cte)
          .trim.stripPrefix(",").trim),
      verbatim(SetsFuncs.q28), noCte(SetsFuncs.q32),
      // DuckDB-dialect twins below get hand-translated Spark texts
      // (string_split→split, strftime→date_format, list_*→HOFs,
      // json_extract→get_json_object); the spec + oracle pin both.
      (SetsFuncs.q26,
        """SELECT tx_hash,
          |  upper(token_symbol) AS sym_up,
          |  substring(wallet_address, 3, 6) AS addr_mid,
          |  length(wallet_address) AS addr_len,
          |  concat(from_address, '->', coalesce(to_address, '?')) AS edge,
          |  trim(concat(' ', token_symbol, ' ')) AS sym_trim,
          |  regexp_replace(tx_hash, '0xh', 'H') AS hash_h,
          |  lpad(token_symbol, 8, '*') AS sym_pad,
          |  element_at(split(coalesce(to_address, '0xt?'), 't'), 2) AS to_num,
          |  regexp_extract(coalesce(to_address, '0xt0'), '0xt(\\d+)', 1) AS to_digits
          |FROM wallet_txs ORDER BY tx_hash""".stripMargin),
      (SetsFuncs.q27,
        """SELECT event_id,
          |  date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss') AS day_start,
          |  year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
          |  unix_timestamp(ts) AS epoch_s,
          |  date_format(to_timestamp(from_unixtime(unix_timestamp(ts))), 'yyyy-MM-dd HH:mm:ss') AS from_epoch,
          |  date_format(ts + INTERVAL 7 DAY, 'yyyy-MM-dd HH:mm:ss') AS next_week
          |FROM events ORDER BY event_id""".stripMargin),
      (SetsFuncs.q29,
        """SELECT vec_id,
          |  size(embedding) AS dim,
          |  element_at(embedding, 1) AS e1,
          |  round(CAST(aggregate(embedding, CAST(0 AS DECIMAL(37,14)),
          |    (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(23,14)) AS DECIMAL(37,14))) AS DOUBLE), 6) AS sumsq,
          |  size(filter(embedding, x -> x > 0.1)) AS n_big,
          |  element_at(embedding, 5) AS e5,
          |  round(CAST(aggregate(slice(embedding, 1, 3), CAST(0 AS DECIMAL(37,14)),
          |    (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) AS DECIMAL(23,14)) AS DECIMAL(37,14))) AS DOUBLE), 6) AS s3,
          |  array_contains(embedding, CAST(0.0 AS FLOAT)) AS has_zero
          |FROM embeddings ORDER BY vec_id""".stripMargin),
      (SetsFuncs.q30,
        """SELECT event_id,
          |  array_join(map_keys(from_json(props, 'map<string,bigint>')), ',') AS keys,
          |  element_at(from_json(props, 'map<string,bigint>'), 'k') AS k_val,
          |  size(map_keys(from_json(props, 'map<string,bigint>'))) AS n_keys,
          |  element_at(map_values(from_json(props, 'map<string,bigint>')), 1) AS v1
          |FROM events ORDER BY event_id""".stripMargin),
      (SetsFuncs.q31,
        """SELECT event_id,
          |  get_json_object(props, '$.k') AS k_str,
          |  CAST(get_json_object(props, '$.k') AS BIGINT) AS k_num,
          |  get_json_object(props, '$.missing') AS missing
          |FROM events ORDER BY event_id""".stripMargin),
      // north-star family (round-12): the SQL-able dedup/text-analysis
      // queries get SQL-text twins too — UNNEST→explode/LATERAL VIEW is
      // spelled as a subquery-projected explode, list_* HOFs→filter/
      // aggregate/transform, string_split_regex→split
      (NorthStar.q41a,
        """WITH dup AS (SELECT doc_id, text, lang FROM documents
          |             UNION ALL
          |             SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
          |             WHERE doc_id % 10 = 0)
          |SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
          |  CAST(COUNT(*) AS BIGINT) AS copies
          |FROM dup
          |GROUP BY md5(text) HAVING COUNT(*) > 1
          |ORDER BY content_hash""".stripMargin),
      (NorthStar.q43a,
        """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          |FROM (SELECT explode(split(lower(text), '\\s+')) AS token FROM documents)
          |WHERE token <> ''
          |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin),
      (NorthStar.q43b, sparkLanguageIdSql),
      (NorthStar.q43c,
        """SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, avg_word_len,
          |  punct_ratio, stopword_ratio, quality FROM (
          |  SELECT doc_id,
          |    size(toks) AS n_tokens,
          |    ROUND(nchar / greatest(CAST(size(toks) AS DOUBLE), 1.0D), 6) AS avg_word_len,
          |    ROUND(punct / greatest(nchar, 1.0D), 6) AS punct_ratio,
          |    ROUND(stop_hits / greatest(CAST(size(toks) AS DOUBLE), 1.0D), 6) AS stopword_ratio,
          |    ROUND(least(CAST(size(toks) AS DOUBLE) / 100.0D, 1.0D) * 0.4D +
          |      (1.0D - punct / greatest(nchar, 1.0D)) * 0.3D +
          |      least(stop_hits / greatest(CAST(size(toks) AS DOUBLE), 1.0D) * 5.0D, 1.0D) * 0.3D, 6) AS quality
          |  FROM (
          |    SELECT doc_id,
          |      split(lower(text), '\\s+') AS toks,
          |      CAST(length(text) AS DOUBLE) AS nchar,
          |      CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '')) AS DOUBLE) AS punct,
          |      CAST(size(filter(split(lower(text), '\\s+'),
          |        t -> array_contains(array('the','of','and','to','in','is','on','for'), t))) AS DOUBLE) AS stop_hits
          |    FROM documents))
          |ORDER BY doc_id""".stripMargin),
      (NorthStar.q43d,
        """SELECT doc_id,
          |  CAST(ws_tokens AS INT) AS ws_tokens,
          |  CAST(bpe_tokens AS INT) AS bpe_tokens,
          |  CAST(regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS INT) AS re_tokens,
          |  aggregate(
          |    transform(filter(split(lower(trim(text)), ''), c -> c <> ''),
          |      c -> CAST(ascii(c) AS BIGINT)),
          |    CAST(7 AS BIGINT),
          |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
          |FROM (
          |  SELECT doc_id, text,
          |    size(split(trim(text), '\\s+')) AS ws_tokens,
          |    aggregate(split(trim(text), '\\s+'), 0,
          |      (acc, w) -> acc + CAST(ceil(CAST(length(w) AS DOUBLE) / 4.0D) AS INT)) AS bpe_tokens
          |  FROM documents)
          |ORDER BY doc_id""".stripMargin),
      // round-15 additions (round-14 verdict item 5): the six new
      // SQL-expressible queries get their `_sql` twins. q41h's oracle
      // is ANSI enough to run verbatim (md5 / || / NOT IN are shared
      // dialect); the rest swap DuckDB spellings — quantile_cont→
      // percentile, strftime→date_format, datediff('day',a,b)→
      // datediff(b,a), '//'→DIV, list comprehension→transform(sequence).
      verbatim(NorthStar.q41h),
      (NorthStar.q43f,
        """SELECT lang,
          |  CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  ROUND(percentile(n_chars, 0.25D), 6) AS p25,
          |  ROUND(percentile(n_chars, 0.5D), 6) AS p50,
          |  ROUND(percentile(n_chars, 0.75D), 6) AS p75,
          |  ROUND(percentile(n_chars, 0.9D), 6) AS p90
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      (Curation5x.q55,
        """WITH t AS (
          |  SELECT doc_id, split(lower(trim(text)), '\\s+') AS w FROM documents),
          |m AS (
          |  SELECT doc_id, CAST(size(w) AS BIGINT) AS n_words,
          |    ROUND(1.0D - size(array_distinct(w)) / CAST(size(w) AS DOUBLE), 6) AS dup_word_frac,
          |    CASE WHEN size(w) >= 2 THEN
          |      ROUND(1.0D - size(array_distinct(transform(sequence(1, size(w) - 1),
          |        i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))))
          |        / CAST(size(w) - 1 AS DOUBLE), 6)
          |    ELSE 0.0D END AS dup_2gram_frac
          |  FROM t)
          |SELECT doc_id, n_words, dup_word_frac, dup_2gram_frac,
          |  CAST(CASE WHEN dup_word_frac <= 0.55D AND dup_2gram_frac <= 0.04D
          |       THEN 1 ELSE 0 END AS BIGINT) AS keep
          |FROM m ORDER BY doc_id""".stripMargin),
      (Sampling.q56,
        s"""WITH c AS (
           |  SELECT source AS s,
           |    CAST(1 + CAST(substr(source, 4) AS BIGINT) % 3 AS BIGINT) AS w,
           |    COUNT(*) AS n
           |  FROM documents GROUP BY 1),
           |r AS (
           |  SELECT a.s, a.w, a.n, MIN((10000 * b.n * a.w) DIV (b.w * a.n)) AS rate_bp
           |  FROM c a CROSS JOIN c b GROUP BY 1, 2, 3)
           |SELECT d.source, r.w AS target_w, r.rate_bp,
           |  CAST(COUNT(*) AS BIGINT) AS kept
           |FROM documents d JOIN r ON d.source = r.s
           |WHERE ${graft.ops.Sampler.bucketSql("d.doc_id")} < r.rate_bp
           |GROUP BY 1, 2, 3 ORDER BY d.source""".stripMargin),
      (Analytics.q57,
        """WITH v AS (
          |  SELECT user_id, MIN(ts) AS t_view FROM events
          |  WHERE event_type = 'view' GROUP BY 1),
          |c AS (
          |  SELECT e.user_id, MIN(e.ts) AS t_click
          |  FROM events e JOIN v ON e.user_id = v.user_id
          |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
          |p AS (
          |  SELECT e.user_id, MIN(e.ts) AS t_purchase
          |  FROM events e JOIN c ON e.user_id = c.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
          |SELECT v.user_id,
          |  date_format(v.t_view, 'yyyy-MM-dd HH:mm:ss') AS t_view,
          |  date_format(c.t_click, 'yyyy-MM-dd HH:mm:ss') AS t_click,
          |  date_format(p.t_purchase, 'yyyy-MM-dd HH:mm:ss') AS t_purchase
          |FROM v LEFT JOIN c ON v.user_id = c.user_id
          |       LEFT JOIN p ON v.user_id = p.user_id
          |ORDER BY v.user_id""".stripMargin),
      (Analytics.q58,
        """WITH first_seen AS (
          |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
          |  FROM events GROUP BY 1)
          |SELECT date_format(f.cohort_w, 'yyyy-MM-dd') AS cohort_week,
          |  CAST(datediff(date_trunc('week', e.ts), f.cohort_w) / 7 AS BIGINT) AS week_n,
          |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
          |FROM events e JOIN first_seen f ON e.user_id = f.user_id
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      // round-15 batch-2 additions: q47b's oracle is fully shared
      // dialect (verbatim); q60/q60b/q61 swap strftime→date_format and
      // date_diff('second',a,b)→unix_timestamp(b)-unix_timestamp(a);
      // q43h/q43g swap unnest(string_split_regex)→explode(split).
      verbatim(Joins.q47b), verbatim(Warehouse.q65), verbatim(Warehouse.q66),
      (Warehouse.q60,
        s"""WITH ${Warehouse.feedCte}
           |SELECT cust_id, segment, acctbal,
           |  date_format(eff_ts, 'yyyy-MM-dd HH:mm:ss') AS valid_from,
           |  date_format(lead(eff_ts) OVER (PARTITION BY cust_id ORDER BY eff_ts),
           |              'yyyy-MM-dd HH:mm:ss') AS valid_to,
           |  CAST(CASE WHEN lead(eff_ts) OVER (PARTITION BY cust_id ORDER BY eff_ts)
           |       IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
           |FROM chg ORDER BY cust_id, valid_from""".stripMargin),
      (Warehouse.q60b,
        s"""WITH ${Warehouse.feedCte},
           |r AS (SELECT chg.*, ROW_NUMBER() OVER (
           |        PARTITION BY cust_id ORDER BY eff_ts DESC) AS rn FROM chg)
           |SELECT cust_id, segment, acctbal,
           |  date_format(eff_ts, 'yyyy-MM-dd HH:mm:ss') AS as_of
           |FROM r WHERE rn = 1 ORDER BY cust_id""".stripMargin),
      (Analytics.q61,
        """WITH o AS (
          |  SELECT user_id, ts, event_id, value,
          |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          |  FROM events),
          |s AS (
          |  SELECT user_id, ts, event_id, value,
          |    SUM(CASE WHEN prev_ts IS NULL
          |             OR unix_timestamp(ts) - unix_timestamp(prev_ts) > 1800
          |        THEN 1 ELSE 0 END)
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          |  FROM o)
          |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          |  date_format(MIN(ts), 'yyyy-MM-dd HH:mm:ss') AS session_start,
          |  date_format(MAX(ts), 'yyyy-MM-dd HH:mm:ss') AS session_end,
          |  CAST(COUNT(*) AS BIGINT) AS n_events,
          |  CAST(unix_timestamp(MAX(ts)) - unix_timestamp(MIN(ts)) AS BIGINT) AS duration_s,
          |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS total_value
          |FROM s GROUP BY 1, 2
          |ORDER BY user_id, session_idx""".stripMargin),
      (NorthStar.q43h,
        """WITH toks AS (
          |  SELECT doc_id, explode(split(lower(text), '\\s+')) AS term
          |  FROM documents),
          |t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
          |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
          |n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tc),
          |lp AS (SELECT t2.doc_id,
          |         ROUND(ln(CAST(tc.cnt AS DOUBLE) / n.total), 6) AS lp
          |       FROM t2 JOIN tc USING (term) CROSS JOIN n),
          |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          |        ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(lp), 6) AS avg_logp
          |      FROM lp GROUP BY 1)
          |SELECT doc_id, n_tokens, avg_logp, ROUND(exp(-avg_logp), 6) AS ppl
          |FROM d ORDER BY doc_id""".stripMargin),
      // q68: generate_series→explode(sequence), strftime→date_format;
      // WINDOW clause is shared dialect.
      (Analytics.q68,
        """WITH daily AS (
          |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
          |    CAST(COUNT(*) AS BIGINT) AS cnt,
          |    ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS val_sum
          |  FROM events GROUP BY 1, 2),
          |users AS (SELECT DISTINCT user_id FROM events),
          |spine AS (
          |  SELECT u.user_id,
          |    explode(sequence(DATE '2024-01-01', DATE '2024-01-30',
          |      interval 1 day)) AS day
          |  FROM users u),
          |filled AS (
          |  SELECT s.user_id, s.day,
          |    COALESCE(d.cnt, 0L) AS cnt, COALESCE(d.val_sum, 0.0D) AS val_sum
          |  FROM spine s LEFT JOIN daily d
          |    ON d.user_id = s.user_id AND d.day = s.day)
          |SELECT user_id, date_format(day, 'yyyy-MM-dd') AS day,
          |  CAST(cnt AS BIGINT) AS cnt, val_sum,
          |  ROUND(CAST(SUM(CAST(val_sum AS DECIMAL(28,6))) OVER w AS DOUBLE)
          |        / COUNT(*) OVER w, 6) AS avg_7d
          |FROM filled
          |WINDOW w AS (PARTITION BY user_id ORDER BY day
          |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
          |ORDER BY user_id, day""".stripMargin),
      // q43i: parallel-UNNEST zip → posexplode, string_agg(ORDER BY) →
      // concat_ws over array_sort(collect_list(struct)); chr(10) shared.
      (NorthStar.q43i,
        """WITH docs2 AS (
          |  SELECT doc_id,
          |    concat(text,
          |      CASE WHEN doc_id % 3 = 0
          |        THEN concat(chr(10), 'subscribe to our newsletter today') ELSE '' END,
          |      CASE WHEN doc_id % 5 = 0
          |        THEN concat(chr(10), 'copyright 2024 example corp all rights reserved') ELSE '' END)
          |    AS text
          |  FROM documents),
          |lines AS (SELECT doc_id, posexplode(split(text, chr(10))) AS (pos, line) FROM docs2),
          |freq AS (SELECT line, COUNT(*) AS ldf FROM lines GROUP BY 1),
          |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
          |         JOIN freq USING (line) WHERE freq.ldf <= 10),
          |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
          |          md5(concat_ws(chr(10),
          |            transform(array_sort(collect_list(struct(pos, line))),
          |              x -> x.line))) AS clean_hash
          |        FROM kept GROUP BY 1)
          |SELECT d.doc_id,
          |  CAST(size(split(d.text, chr(10))) AS BIGINT) AS n_lines_in,
          |  COALESCE(a.n_lines_kept, 0L) AS n_lines_kept,
          |  COALESCE(a.clean_hash, md5('')) AS clean_hash
          |FROM docs2 d LEFT JOIN agg a USING (doc_id)
          |ORDER BY doc_id""".stripMargin),
      // q43g (TF-IDF): unnest(string_split_regex) → explode(split),
      // double literals D-suffixed; everything else is shared dialect.
      (NorthStar.q43g,
        """WITH toks AS (
          |  SELECT doc_id, explode(split(lower(text), '\\s+')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
          |       FROM toks WHERE term <> '' GROUP BY 1, 2),
          |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
          |scored AS (
          |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
          |    ROUND(tf.tf * (ln((n.n + 1.0D) / (df.df + 1.0D)) + 1.0D), 6) AS tfidf
          |  FROM tf JOIN df USING (term) CROSS JOIN n)
          |SELECT doc_id, term, tf, df, tfidf, CAST(rk AS INTEGER) AS rk FROM (
          |  SELECT scored.*, ROW_NUMBER() OVER (
          |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
          |  FROM scored) t WHERE rk <= 5
          |ORDER BY doc_id, rk""".stripMargin),
      // round-15 batch 9 additions: q70/q72 swap strftime→date_format;
      // q71 additionally quantile_cont→percentile, //→DIV, VARCHAR→
      // STRING; q73/q43j are full rewrites (unnest(string_split_regex)
      // → explode(split), list_transform(generate_series)→
      // transform(sequence), //→DIV).
      (Warehouse.q70, Warehouse.q70.oracle.get.replace(
        "strftime(o_orderdate, '%Y-%m')",
        "date_format(o_orderdate, 'yyyy-MM')")),
      (Warehouse.q71, Warehouse.q71.oracle.get
        .replace("quantile_cont(n_chars, 0.5)", "percentile(n_chars, 0.5D)")
        .replace("n_chars // 250", "n_chars DIV 250")
        .replace("CAST(b AS VARCHAR)", "CAST(b AS STRING)")),
      (Analytics.q72, Analytics.q72.oracle.get.replace(
        "strftime(ts, '%Y-%m-%d')",
        "date_format(ts, 'yyyy-MM-dd')")),
      (Aggregates.q73,
        """WITH toks AS (
          |  SELECT explode(split(lower(text), '\\s+')) AS term FROM documents),
          |t2 AS (SELECT term FROM toks WHERE term <> ''),
          |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
          |r AS (SELECT term, cnt,
          |        ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk FROM tc),
          |top AS (SELECT term, cnt, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 10),
          |sk AS (SELECT e.item AS term, e.count AS apx
          |       FROM (SELECT explode(tk) AS e FROM
          |              (SELECT approx_top_k(term, 50, 10000) AS tk FROM t2)))
          |SELECT t.term, t.cnt, t.rk,
          |  (s.apx IS NOT NULL AND s.apx = t.cnt) AS sketch_ok
          |FROM top t LEFT JOIN sk s ON t.term = s.term
          |ORDER BY rk""".stripMargin),
      (NorthStar.q43j,
        """WITH w AS (
          |  SELECT doc_id, split(trim(lower(text)), '\\s+') AS w
          |  FROM documents
          |  WHERE size(split(trim(lower(text)), '\\s+')) >= 2),
          |bg AS (
          |  SELECT doc_id, p.a AS a, p.b AS b
          |  FROM (SELECT doc_id, explode(transform(sequence(1, size(w) - 1),
          |          i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))) AS p
          |        FROM w)),
          |bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bg GROUP BY 1, 2),
          |toks AS (SELECT explode(split(trim(lower(text)), '\\s+')) AS t
          |         FROM documents),
          |t2 AS (SELECT t FROM toks WHERE t <> ''),
          |uc AS (SELECT t AS a, CAST(COUNT(*) AS BIGINT) AS ca FROM t2 GROUP BY 1),
          |vocab AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM t2),
          |lp AS (SELECT bg.doc_id,
          |         CAST(ROUND(ln(CAST(bc.cab + 1 AS DOUBLE) / CAST(uc.ca + vocab.v AS DOUBLE))
          |              * 1000000.0D) AS BIGINT) AS lpm
          |       FROM bg JOIN bc USING (a, b) JOIN uc USING (a) CROSS JOIN vocab),
          |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          |        -(CAST(((-SUM(lpm)) * 1000) DIV COUNT(*) AS DOUBLE)) / 1000000000.0D AS avg_logp
          |      FROM lp GROUP BY 1)
          |SELECT doc_id, n_bigrams, avg_logp, ROUND(exp(-avg_logp), 6) AS ppl
          |FROM d ORDER BY doc_id""".stripMargin),
      // round-15 batch 10: q75 is ANSI enough to run verbatim (WINDOW
      // clause, lead, || are shared dialect); q76 swaps quantile_cont→
      // percentile.
      verbatim(Analytics.q75),
      (Curation5x.q76, Curation5x.q76.oracle.get
        .replace("quantile_cont(n_chars, 0.05)", "percentile(n_chars, 0.05D)")
        .replace("quantile_cont(n_chars, 0.95)", "percentile(n_chars, 0.95D)")),
      // batch 11: q77 swaps VARCHAR→STRING; q78's global window text is
      // ANSI (the DataFrame twin deliberately plans it differently —
      // Ranking.globalRank vs the text's single-partition window — and
      // the hash must still agree)
      (Sampling.q77, Sampling.q77.oracle.get
        .replace("CAST(doc_id AS VARCHAR)", "CAST(doc_id AS STRING)")),
      verbatim(Curation5x.q78),
      // batch 13: q81 swaps only the tokenizer spelling, plus a
      // BROADCAST hint pinning the pairs join's build side to the
      // query batch (round-22: with both sides broadcastable, AQE's
      // side choice followed exchange-completion order — build=index
      // runs the 4.5M-row pair explosion as ONE post-coalesce task,
      // a measured 4-5 s serial stage; build=query-batch streams the
      // index wide. Same rows either way — the DSL twin pins the same
      // side, see TextAnalysis.moreLikeThisStages)
      (NorthStar.q81, NorthStar.q81.oracle.get
        .replace("unnest(string_split_regex(lower(text), '\\s+'))",
          "explode(split(lower(text), '\\\\s+'))")
        .replace("pairs AS (SELECT q.qid",
          "pairs AS (SELECT /*+ BROADCAST(q) */ q.qid")),
      // batch 14: q82 swaps to_days→timestampadd and strftime→
      // date_format; NOTE the SQL text keeps the INTERVAL-join
      // formulation, so this dual pins interval ≡ as-of a second time,
      // now inside one engine
      (Warehouse.q82, Warehouse.q82.oracle.get
        .replace("TIMESTAMP '2024-01-01 00:00:00'\n" +
          "          + to_days(CAST(event_id % 120 AS INT))",
          "timestampadd(DAY, CAST(event_id % 120 AS INT), " +
            "TIMESTAMP '2024-01-01 00:00:00')")
        .replace("strftime(f.lts, '%Y-%m-%d %H:%M:%S')",
          "date_format(f.lts, 'yyyy-MM-dd HH:mm:ss')")),
      // batch 16: q84 moves IGNORE NULLS outside the call (Spark's
      // clause syntax vs DuckDB's in-argument form) and swaps
      // date_diff('second',…)→unix_timestamp diff (the q61 rule:
      // timestampdiff(SECOND,…) truncates the INTERVAL, DuckDB counts
      // second BOUNDARIES — off by one whenever the sub-second parts
      // straddle, 102 rows at sf0.001); q85 swaps
      // DuckDB's `//` integer division for Spark's `div` (same floor
      // semantics on positive BIGINTs — the all-integer discipline is
      // what makes the dual possible at all); q86 swaps VARCHAR→STRING;
      // q87 like q84 plus strftime→date_format — its global-window text
      // is the naive single-partition formulation (q78 precedent: the
      // DataFrame twin plans globalPrefixSum instead and must
      // hash-agree).
      (Analytics.q84, Analytics.q84.oracle.get
        .replace("END IGNORE NULLS)", "END) IGNORE NULLS")
        .replace("date_diff('second', touch_ts, ts)",
          "unix_timestamp(ts) - unix_timestamp(touch_ts)")),
      (Graphs.q85, Graphs.q85.oracle.get
        .replace("p.pts // d.outdeg", "p.pts div d.outdeg")
        .replace(")) // 100", ")) div 100")),
      (Warehouse.q86, Warehouse.q86.oracle.get
        .replace("CAST(NULL AS VARCHAR)", "CAST(NULL AS STRING)")),
      (Analytics.q87, Analytics.q87.oracle.get
        .replace("date_diff('second', prev_ts, ts)",
          "unix_timestamp(ts) - unix_timestamp(prev_ts)")
        .replace("strftime(ts, '%Y-%m-%d')", "date_format(ts, 'yyyy-MM-dd')")),
      // batch 20: q93's support/confidence/lift text is ANSI enough to
      // run verbatim (exact BIGINT counts, one division per ratio —
      // the all-integer discipline again)
      verbatim(Analytics.q93),
      // batch 21: q95's NTILE text is ANSI-verbatim; like q78/q87 the
      // SQL dual deliberately plans the naive single-partition window
      // while the DataFrame twin plans globalRank + the closed form,
      // and both must hash-agree
      verbatim(Curation5x.q95),
      // round 16: q96's dual exercises the HLL sketch functions through
      // SQL TEXT (hll_sketch_agg / hll_union_agg / hll_sketch_estimate)
      // — the oracle stays the exact-twin + verdict booleans
      (Warehouse.q96,
        """WITH ord AS (
          |  SELECT o_orderstatus AS status, o_custkey AS cust, o_orderdate AS od
          |  FROM orders),
          |base AS (SELECT status, hll_sketch_agg(cust) AS sk FROM ord
          |         WHERE od < TIMESTAMP '2000-01-01 00:00:00' GROUP BY status),
          |delta AS (SELECT status, hll_sketch_agg(cust) AS sk FROM ord
          |          WHERE od >= TIMESTAMP '2000-01-01 00:00:00' GROUP BY status),
          |merged AS (
          |  SELECT status, hll_sketch_estimate(hll_union_agg(sk)) AS est_m
          |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
          |  GROUP BY status),
          |whole AS (SELECT status, hll_sketch_estimate(hll_sketch_agg(cust)) AS est_w
          |          FROM ord GROUP BY status),
          |ex AS (SELECT status, CAST(COUNT(DISTINCT cust) AS BIGINT) AS exact_custs
          |       FROM ord GROUP BY status)
          |SELECT ex.status, ex.exact_custs,
          |  (abs(est_m - exact_custs) <= exact_custs * 0.05) AS approx_ok,
          |  (abs(est_m - est_w) <= greatest(exact_custs * 0.033, 2.0D)) AS merge_law_ok
          |FROM ex JOIN merged m ON m.status = ex.status
          |JOIN whole w ON w.status = ex.status
          |ORDER BY ex.status""".stripMargin))
  }

  /** Spark-SQL text of q43b, generated from the SAME stopword profiles
    * and argmax construction as the DataFrame twin / DuckDB oracle
    * (NorthStar.q43b) — one source of truth for the lists and the
    * tie-break CASE. Spark's `greatest` needs ≥ 2 args, so a single
    * earlier score is referenced bare. */
  private def sparkLanguageIdSql: String = {
    val langs = graft.ops.TextAnalysis.stopwords.keys.toSeq.sorted
    def lst(l: String) =
      graft.ops.TextAnalysis.stopwords(l).map(w => s"'$w'").mkString("array(", ", ", ")")
    val scoreCols = langs.map(l =>
      s"ROUND(CAST(size(filter(toks, t -> array_contains(${lst(l)}, t))) AS DOUBLE) / greatest(size(toks), 1), 6) AS score_$l")
      .mkString(",\n  ")
    val pred = langs.tail.reverse.map { l =>
      val earlier = langs.takeWhile(_ != l).map(e => s"score_$e")
      val hi = if (earlier.size == 1) earlier.head
               else earlier.mkString("greatest(", ", ", ")")
      s"WHEN score_$l > $hi THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.head}' END")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |  $scoreCols
       |  FROM (SELECT doc_id, lang,
       |          split(lower(text), '\\\\s+') AS toks
       |        FROM documents))
       |SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
       |  $pred AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** The `_sql`-suffixed QueryDefs: Spark side is `spark.sql(text)`
    * over the registered views; oracle is the twin's (same answer). */
  val dualDefs: Seq[QueryDef] = dualPairs.map { case (twin, text) =>
    QueryDef(twin.name + "_sql", twin.oracle.get) { (s, dir) =>
      Tables.registerViews(s, dir)
      s.sql(text)
    }
  }

  val defs: Seq[QueryDef] = Seq(q19d, q23b, q33a, q33b, q33c, q34) ++ dualDefs
}
