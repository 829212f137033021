"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Catalog: exact queries are DuckDB-oracle-checked; sketch queries
(estimates from our mergeable sketches) are rows-only, each paired
with an exact companion so accuracy is externally checkable.
Implementations live in sketchlib/spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sketchlib.spark import queries as Q  # noqa: E402
from sketchlib.spark.session import attach_package  # noqa: E402
from sketchlib.spark.textops import _LANG_PROFILES  # noqa: E402


def _langid_oracle() -> str:
    structs = ", ".join(
        "{'score': len(list_intersect(toks, [%s])), 'lang': '%s'}"
        % (", ".join(f"'{w}'" for w in sorted(ws)), lang)
        for lang, ws in sorted(_LANG_PROFILES.items()))
    return (
        "WITH s AS (SELECT doc_id, "
        "list_distinct(list_filter(string_split(lower(text), ' '), "
        "x -> x != '')) AS toks "
        "FROM documents), "
        f"sc AS (SELECT doc_id, toks, list_max([{structs}]) AS best FROM s) "
        "SELECT doc_id, "
        "CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred, "
        "round(best.score / greatest(len(toks), 1), 4) AS confidence FROM sc")


def _pii_oracle() -> str:
    """Composes the SAME lookahead-free patterns as textops.pii_scrub,
    in the same order, each over the previous stage's scrubbed text."""
    from sketchlib.spark.textops import PII_PATTERNS
    prev, sql, counts = "text", "", []
    for i, (name, pat) in enumerate(PII_PATTERNS):
        cur = f"t{i}"
        src = "documents" if i == 0 else f"s{i - 1}"
        sql += (f"{'WITH ' if i == 0 else ', '}s{i} AS (SELECT doc_id, "
                f"len(regexp_extract_all({prev}, '{pat}')) AS c{i}, "
                f"regexp_replace({prev}, '{pat}', '<{name.upper()}>', 'g') "
                f"AS {cur}"
                + "".join(f", c{j}" for j in range(i)) + f" FROM {src}) ")
        counts.append(f"c{i}")
        prev = cur
    n = len(PII_PATTERNS)
    return (sql + f"SELECT doc_id, t{n - 1} AS text_scrubbed, "
            + " + ".join(counts) + f" AS n_redactions FROM s{n - 1}")


def _wrap(fn: Callable) -> Callable:
    """Ship sketchlib to Spark workers before any pandas UDF runs."""
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        attach_package(spark)
        return fn(spark, sf_dir)
    return inner


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's three-stage Bloom pipeline output —
    per-lang designed-vs-measured FPR with false-negative counts
    (ref /root/reference/spark/main.py:178-183) on sf0.001."""
    attach_package(spark)
    return Q.q_bloom_fpr_validation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries (the driver's CORRECTNESS snapshot holds 50
    rows): all 33 oracle-checked exacts FIRST, then 17 rows-only sketch
    estimates — every registered query gets a driver-side row. Related
    estimates that held separate round-4 slots are merged into combined
    read-outs (kll CDF into kll_quantiles_nchars; theta overlap/diff +
    HLL containment into sketch_set_algebra; CMS + count-sketch token
    frequencies into token_freq_sketch_accuracy; LSH + IVF ANN into
    ann_approx_topk; FD est + exact spectrum into fd_spectrum_vs_exact;
    hll_distinct_lang is the rollup's bitwise twin and lives inside
    hll_rollup_lang). The merged-away per-technique functions remain in
    sketchlib.spark.queries (bench.py and pytest still exercise them).
    """
    return {
        # ---- exact, oracle-checked (33) ----
        "calib_counts_lang": _wrap(Q.q_calib_counts_lang),
        "distinct_texts_lang": _wrap(Q.q_distinct_texts_lang),
        "distinct_users_daily": _wrap(Q.q_distinct_users_daily),
        "quantiles_nchars_lang": _wrap(Q.q_quantiles_nchars_lang),
        "quantiles_value_event": _wrap(Q.q_quantiles_value_event),
        "heavy_tokens_lang": _wrap(Q.q_heavy_tokens_lang),
        "dedup_exact": _wrap(Q.q_dedup_exact),
        "token_counts": _wrap(Q.q_token_counts),
        "token_counts_bpe": _wrap(Q.q_token_counts_bpe),
        "quality_scores": _wrap(Q.q_quality_scores),
        "repetition_scores": _wrap(Q.q_repetition_scores),
        "pii_scrub": _wrap(Q.q_pii_scrub),
        "ngram_jaccard_pairs": _wrap(Q.q_ngram_jaccard_pairs),
        "dedup_clusters": _wrap(Q.q_dedup_clusters),
        "corpus_curation": _wrap(Q.q_corpus_curation),
        "url_canon_dedup": _wrap(Q.q_url_canon_dedup),
        "decontamination": _wrap(Q.q_decontamination),
        "hash_split_counts": _wrap(Q.q_hash_split_counts),
        "content_fingerprint": _wrap(Q.q_content_fingerprint),
        "langid_heuristic": _wrap(Q.q_langid),
        "props_json_stats": _wrap(Q.q_props_json_stats),
        "label_centroids": _wrap(Q.q_label_centroids),
        "ann_cosine_topk": _wrap(Q.q_ann_cosine_topk),
        "embedding_neardup_pairs": _wrap(Q.q_embedding_neardup_pairs),
        "pricing_summary": _wrap(Q.q_pricing_summary),
        "shipping_priority": _wrap(Q.q_shipping_priority),
        "bloom_semijoin": _wrap(Q.q_bloom_semijoin),
        "join_size_exact": _wrap(Q.q_join_size_exact),
        "short_doc_share_lang": _wrap(Q.q_short_doc_share_lang),
        "user_overlap_exact": _wrap(Q.q_user_overlap_exact),
        "user_jaccard_exact": _wrap(Q.q_user_jaccard_exact),
        "user_containment_exact": _wrap(Q.q_user_containment_exact),
        "user_difference_exact": _wrap(Q.q_user_difference_exact),
        # ---- sketch estimates, rows-only (17; exact companions above) ----
        "bloom_fpr_validation": _wrap(Q.q_bloom_fpr_validation),
        "bloom_membership": _wrap(Q.q_bloom_membership),
        "sample_docs_lang": _wrap(Q.q_sample_docs_lang),
        "sketch_accuracy_lang": _wrap(Q.q_sketch_accuracy_lang),
        "kll_quantiles_nchars": _wrap(Q.q_kll_quantiles_nchars),
        "tdigest_quantiles_value": _wrap(Q.q_tdigest_quantiles_value),
        "hll_rollup_lang": _wrap(Q.q_hll_rollup_lang),
        "token_freq_sketch_accuracy": _wrap(Q.q_token_freq_sketch_accuracy),
        "cms_heavy_hitters_scale": _wrap(Q.q_cms_heavy_hitters_scale),
        "cms_join_size": _wrap(Q.q_cms_join_size),
        "simhash_pairs": _wrap(Q.q_simhash_pairs),
        "dedup_clusters_minhash": _wrap(Q.q_dedup_clusters_minhash),
        "embedding_neardup_lsh": _wrap(Q.q_embedding_neardup_lsh),
        "ann_approx_topk": _wrap(Q.q_ann_approx_topk),
        "fd_spectrum_vs_exact": _wrap(Q.q_fd_spectrum_vs_exact),
        "sketch_set_algebra": _wrap(Q.q_sketch_set_algebra),
        "media_features": _wrap(Q.q_media_features),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "calib_counts_lang":
            "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "distinct_texts_lang":
            "SELECT lang, count(DISTINCT text) AS n_distinct "
            "FROM documents GROUP BY lang",
        "distinct_users_daily":
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')",
        "quantiles_nchars_lang":
            "SELECT lang, "
            "round(quantile_cont(n_chars, 0.25), 4) AS p25, "
            "round(quantile_cont(n_chars, 0.5), 4) AS p50, "
            "round(quantile_cont(n_chars, 0.9), 4) AS p90, "
            "round(quantile_cont(n_chars, 0.99), 4) AS p99 "
            "FROM documents GROUP BY lang",
        "quantiles_value_event":
            "SELECT event_type, "
            "round(quantile_cont(value, 0.5), 4) AS p50, "
            "round(quantile_cont(value, 0.95), 4) AS p95 "
            "FROM events GROUP BY event_type",
        "heavy_tokens_lang":
            "WITH toks AS (SELECT lang, unnest(list_filter("
            "string_split(text, ' '), x -> x != '')) AS token "
            "FROM documents), "
            "counts AS (SELECT lang, token, count(*) AS cnt FROM toks "
            "GROUP BY lang, token) "
            "SELECT lang, token, cnt, CAST(rnk AS INTEGER) AS rnk FROM ("
            "SELECT *, row_number() OVER (PARTITION BY lang "
            "ORDER BY cnt DESC, token ASC) AS rnk FROM counts) WHERE rnk <= 10",
        "dedup_exact":
            "SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, "
            "count(*) AS n_copies FROM documents "
            "WHERE text IS NOT NULL GROUP BY md5(text)",
        "token_counts":
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x != '')) AS BIGINT) AS n_tokens FROM documents",
        "token_counts_bpe":
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'"
            ")) AS BIGINT) AS n_bpe_tokens FROM documents",
        "quality_scores":
            "WITH t AS (SELECT doc_id, length(text) AS n_chars_raw, "
            "list_filter(string_split(text, ' '), x -> x != '') AS toks "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(n_chars_raw AS BIGINT) AS n_chars_text, "
            "CAST(len(toks) AS BIGINT) AS n_tokens, "
            "round(len(list_distinct(toks)) / len(toks), 4) AS uniq_ratio, "
            "round(list_sum(list_transform(toks, x -> length(x))) "
            "/ len(toks), 4) AS avg_token_len FROM t",
        "repetition_scores":
            "WITH l AS (SELECT doc_id, string_split(text, chr(10)) "
            "AS lines FROM documents), "
            "ls AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, "
            "round((len(lines) - len(list_distinct(lines))) / len(lines), 4) "
            "AS dup_line_frac FROM l), "
            "t AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x != '') AS t FROM documents), "
            "b AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i+1])) AS bigram FROM t "
            "WHERE len(t) >= 2), "
            "c AS (SELECT doc_id, bigram, count(*) AS cnt FROM b "
            "GROUP BY doc_id, bigram), "
            "tb AS (SELECT doc_id, round(max(cnt) / sum(cnt), 4) "
            "AS top_bigram_frac FROM c GROUP BY doc_id) "
            "SELECT ls.doc_id, n_lines, dup_line_frac, tb.top_bigram_frac "
            "FROM ls LEFT JOIN tb ON ls.doc_id = tb.doc_id",
        "props_json_stats":
            # TRY_CAST matches Spark's cast('long') NULL-on-failure
            # semantics, so a non-integer k diverges in neither engine
            "SELECT event_type, "
            "count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS n_with_k, "
            "CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) "
            "AS BIGINT) AS sum_k, "
            "round(avg(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)),"
            " 4) AS avg_k FROM events GROUP BY event_type",
        "label_centroids":
            "SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 4) "
            "AS centroid_v FROM (SELECT label, unnest(embedding) AS v, "
            "generate_subscripts(embedding, 1) AS pos FROM embeddings) "
            "GROUP BY label, pos",
        "ngram_jaccard_pairs":
            # shingle-frequency cap (<= 1000) mirrors the implementation's
            # max_shingle_freq default so impl and oracle agree at ANY
            # scale, not just where the cap happens not to bind
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x != '') AS t "
            "FROM documents), "
            "sh0 AS (SELECT DISTINCT doc_id AS doc, "
            "unnest(list_transform(range(1, len(t) - 1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle "
            "FROM toks WHERE len(t) >= 3), "
            "sh AS (SELECT sh0.* FROM sh0 JOIN (SELECT shingle "
            "FROM sh0 GROUP BY shingle HAVING count(*) <= 1000) f "
            "USING (shingle)), "
            "sizes AS (SELECT doc, count(*) AS sz FROM sh0 GROUP BY doc), "
            "inter AS (SELECT a.doc AS a_id, b.doc AS b_id, count(*) AS inter "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc "
            "GROUP BY a.doc, b.doc) "
            "SELECT a_id, b_id, "
            "round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc = a_id "
            "JOIN sizes sb ON sb.doc = b_id "
            "WHERE inter / (sa.sz + sb.sz - inter) >= 0.5",
        "corpus_curation":
            "WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents "
            "WHERE text IS NOT NULL GROUP BY md5(text)), "
            "kept AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)), "
            "q AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x != '') AS toks, "
            "lower(text) AS ltext, text FROM kept), "
            "feats AS (SELECT doc_id, "
            "CAST(len(toks) AS BIGINT) AS n_tokens, "
            "round(len(list_distinct(toks)) / len(toks), 4) AS uniq_ratio, "
            "CAST(len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'"
            ")) AS BIGINT) AS n_bpe_tokens, "
            "list_distinct(list_filter(string_split(ltext, ' '), "
            "x -> x != '')) AS dtoks FROM q), "
            "sc AS (SELECT doc_id, n_tokens, uniq_ratio, n_bpe_tokens, "
            "list_max([" + ", ".join(
                "{'score': len(list_intersect(dtoks, [%s])), 'lang': '%s'}"
                % (", ".join(f"'{w}'" for w in sorted(ws)), lang)
                for lang, ws in sorted(_LANG_PROFILES.items()))
            + "]) AS best FROM feats) "
            "SELECT doc_id, best.lang AS lang_pred, n_tokens, n_bpe_tokens, "
            "uniq_ratio FROM sc "
            "WHERE n_tokens >= 5 AND uniq_ratio >= 0.3 AND best.score > 0",
        "hash_split_counts":
            # same md5-bucket math as sampling.hash_split (seed=7,
            # sorted labels test/train/val, cum thresholds at 0.05/0.95
            # of 2^32 = 214748364 / 4080218931)
            "WITH b AS (SELECT lang, "
            "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':7'), "
            "1, 8)) AS UBIGINT) AS h FROM documents) "
            "SELECT lang, CASE WHEN h < 214748364 THEN 'test' "
            "WHEN h < 4080218931 THEN 'train' ELSE 'val' END AS split, "
            "count(*) AS n_docs FROM b GROUP BY 1, 2",
        "dedup_clusters":
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x != '') AS t "
            "FROM documents), "
            "sh0 AS (SELECT DISTINCT doc_id AS doc, "
            "unnest(list_transform(range(1, len(t) - 1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle "
            "FROM toks WHERE len(t) >= 3), "
            "sh AS (SELECT sh0.* FROM sh0 JOIN (SELECT shingle "
            "FROM sh0 GROUP BY shingle HAVING count(*) <= 1000) f "
            "USING (shingle)), "
            "sizes AS (SELECT doc, count(*) AS sz FROM sh0 GROUP BY doc), "
            "inter AS (SELECT a.doc AS a_id, b.doc AS b_id, count(*) AS inter "
            "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc "
            "GROUP BY a.doc, b.doc), "
            "pairs AS (SELECT a_id, b_id FROM inter "
            "JOIN sizes sa ON sa.doc = a_id JOIN sizes sb ON sb.doc = b_id "
            "WHERE inter / (sa.sz + sb.sz - inter) >= 0.5), "
            "edges AS (SELECT a_id AS a, b_id AS b FROM pairs "
            "UNION ALL SELECT b_id, a_id FROM pairs), "
            "nodes AS (SELECT DISTINCT a AS n FROM edges), "
            "reach(s, t) AS (SELECT n, n FROM nodes "
            "UNION SELECT r.s, e.b FROM reach r JOIN edges e ON e.a = r.t) "
            "SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s",
        "ann_cosine_topk":
            "WITH norms AS (SELECT vec_id, sqrt(sum(x * x)) AS norm FROM ("
            "SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x "
            "FROM embeddings) GROUP BY vec_id), "
            "dots AS (SELECT q_id, nbr_id, sum(xq * xn) AS dot FROM ("
            "SELECT a.vec_id AS q_id, b.vec_id AS nbr_id, "
            "CAST(unnest(a.embedding) AS DOUBLE) AS xq, "
            "CAST(unnest(b.embedding) AS DOUBLE) AS xn "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id < 10 AND a.vec_id != b.vec_id) "
            "GROUP BY q_id, nbr_id), "
            "scored AS (SELECT q_id, nbr_id, dot / (nq.norm * nn.norm) AS score "
            "FROM dots JOIN norms nq ON nq.vec_id = q_id "
            "JOIN norms nn ON nn.vec_id = nbr_id) "
            "SELECT q_id, nbr_id, CAST(rnk AS INTEGER) AS rnk, "
            "round(score, 3) AS score FROM ("
            "SELECT *, row_number() OVER (PARTITION BY q_id "
            "ORDER BY score DESC, nbr_id ASC) AS rnk FROM scored) "
            "WHERE rnk <= 5",
        "pricing_summary":
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "round(avg(l_quantity), 4) AS avg_qty, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus",
        "shipping_priority":
            "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, "
            "o_orderpriority, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
            "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10",
        "short_doc_share_lang":
            "SELECT lang, "
            "round(avg(CASE WHEN n_chars <= 200 THEN 1.0 ELSE 0.0 END), 4) "
            "AS share_le_200, "
            "round(avg(CASE WHEN n_chars <= 500 THEN 1.0 ELSE 0.0 END), 4) "
            "AS share_le_500 "
            "FROM documents GROUP BY lang",
        "join_size_exact":
            "SELECT count(*) AS join_rows FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey",
        "bloom_semijoin":
            "SELECT o_orderpriority, count(*) AS n_items, "
            "round(sum(l_extendedprice), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
            "GROUP BY o_orderpriority",
        "url_canon_dedup":
            # analytically-derived canonical per template (the Spark
            # side runs the real canonicalizer on the messy variants)
            "WITH v AS (SELECT doc_id, doc_id % 10 AS t, "
            "CAST(doc_id // 10 AS VARCHAR) AS g FROM documents), "
            "c AS (SELECT doc_id, CASE "
            "WHEN t IN (0, 1, 4, 5) THEN 'http://example.com/doc/' || g "
            "WHEN t IN (3, 6) THEN 'http://example.com/doc/' || g "
            "|| '?a=1&b=2' "
            "WHEN t = 2 THEN 'https://example.com/doc/' || g "
            "WHEN t = 7 THEN 'http://example.com:443/doc/' || g "
            "WHEN t = 8 THEN 'example.com/Doc/' || g "
            "ELSE 'https://example.com:8080/doc/' || g END "
            "AS canonical_url FROM v) "
            "SELECT canonical_url, min(doc_id) AS keep_id, "
            "count(*) AS n_variants FROM c GROUP BY canonical_url",
        "decontamination":
            # benchmark = shingles of docs with doc_id % 97 == 0; the
            # 3-gram expression mirrors ngram_jaccard's oracle
            "WITH toks AS (SELECT doc_id, "
            "list_filter(string_split(text, ' '), x -> x != '') AS t "
            "FROM documents), "
            "dsh AS (SELECT DISTINCT doc_id, "
            "unnest(list_transform(range(1, len(t) - 1), "
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh "
            "FROM toks WHERE len(t) >= 3), "
            "bsh AS (SELECT DISTINCT sh FROM dsh WHERE doc_id % 97 = 0), "
            "hits AS (SELECT d.doc_id, count(*) AS n "
            "FROM dsh d JOIN bsh USING (sh) GROUP BY d.doc_id) "
            "SELECT doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_hits "
            "FROM documents LEFT JOIN hits USING (doc_id)",
        "content_fingerprint":
            # identical normalization chain in both engines: collapse
            # whitespace, trim, lowercase, md5, first 16 hex chars
            "SELECT doc_id AS doc, substring(md5(lower(trim("
            "regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16) "
            "AS fingerprint FROM documents WHERE text IS NOT NULL",
        "langid_heuristic": _langid_oracle(),
        "pii_scrub": _pii_oracle(),
        "user_overlap_exact":
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(DISTINCT a.user_id) AS n_shared "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type "
            "GROUP BY a.event_type, b.event_type",
        "embedding_neardup_pairs":
            "WITH norms AS (SELECT vec_id, sqrt(sum(x * x)) AS norm FROM ("
            "SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x "
            "FROM embeddings) GROUP BY vec_id), "
            "dots AS (SELECT a_id, b_id, sum(xa * xb) AS dot FROM ("
            "SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
            "CAST(unnest(a.embedding) AS DOUBLE) AS xa, "
            "CAST(unnest(b.embedding) AS DOUBLE) AS xb "
            "FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) "
            "GROUP BY a_id, b_id) "
            "SELECT a_id, b_id, round(dot / (na.norm * nb.norm), 3) AS score "
            "FROM dots JOIN norms na ON na.vec_id = a_id "
            "JOIN norms nb ON nb.vec_id = b_id "
            "WHERE dot / (na.norm * nb.norm) >= 0.4",
        "user_containment_exact":
            "WITH u AS (SELECT DISTINCT event_type, user_id FROM events), "
            "na AS (SELECT event_type, count(*) AS n FROM u "
            "GROUP BY event_type), "
            "sh AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS s FROM u a JOIN u b ON a.user_id = b.user_id "
            "AND a.event_type != b.event_type GROUP BY 1, 2) "
            "SELECT x.event_type AS type_a, y.event_type AS type_b, "
            "round(coalesce(sh.s, 0) / x.n, 4) AS containment "
            "FROM na x JOIN na y ON x.event_type != y.event_type "
            "LEFT JOIN sh ON sh.type_a = x.event_type "
            "AND sh.type_b = y.event_type",
        "user_jaccard_exact":
            "WITH u AS (SELECT DISTINCT event_type, user_id FROM events), "
            "na AS (SELECT event_type, count(*) AS n FROM u "
            "GROUP BY event_type), "
            "sh AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS s FROM u a JOIN u b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT type_a, type_b, "
            "round(s / (x.n + y.n - s), 4) AS jaccard "
            "FROM sh JOIN na x ON x.event_type = type_a "
            "JOIN na y ON y.event_type = type_b",
        "user_difference_exact":
            "WITH u AS (SELECT DISTINCT event_type, user_id FROM events), "
            "na AS (SELECT event_type, count(*) AS n FROM u GROUP BY event_type), "
            "sh AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS s FROM u a JOIN u b ON a.user_id = b.user_id "
            "AND a.event_type != b.event_type GROUP BY 1, 2) "
            "SELECT x.event_type AS type_a, y.event_type AS type_b, "
            "x.n - coalesce(sh.s, 0) AS n_only_a "
            "FROM na x JOIN na y ON x.event_type != y.event_type "
            "LEFT JOIN sh ON sh.type_a = x.event_type "
            "AND sh.type_b = y.event_type",
        # sketch queries intentionally omitted -> rows-only driver check
    }
