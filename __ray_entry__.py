"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (frontier shards + fetch +
span decomposition) and returns the interleaved document table.
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2
plus the training-data-pipeline suite; ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one (same column names, same rounding).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from crawl4ai_llm_ray.pipelines import (
    ann,
    crawl_queries,
    dedup,
    multimodal,
    relational,
    relational2,
    relational3,
    text,
)


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic frontier → wave-based crawl
    (cuckoo-filter seen set, politeness, robots, priority drain) → interleaved
    (doc_id, spans) document table."""
    return crawl_queries.crawl_interleaved_docs()


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- relational / reference-storage semantics (SURVEY §2) ---
        "filter_project": relational.filter_project,          # M3/M4
        "agg_q1": relational.agg_pushdown_q1,                 # A1/A3 combiner
        "sort_paginate": relational.sort_paginate,            # O1/O2
        "topk_orders": relational.topk,                       # O2
        "semi_join": relational.semi_join,                    # J1
        "anti_join": relational.anti_join,                    # J3
        "union_distinct": relational.union_distinct,          # D3
        "upsert_latest": relational.upsert_last_writer,       # M6
        "key_derivation": relational.key_derivation,          # M1
        "broadcast_join_agg": relational.broadcast_join_agg,  # star join
        "window_tumbling": relational.window_tumbling,        # §2.9
        "count_group": relational.count_group,                # A1
        "json_filter": relational.json_filter,                # M4 dot-notation
        "join_3way_topk": relational2.join_3way_topk,
        "having_filter": relational2.having_filter,
        "case_when_agg": relational2.case_when_agg,
        "distinct_count": relational2.distinct_count,
        "string_funcs": relational2.string_funcs,             # §2.8
        "date_funcs": relational2.date_funcs,                 # §2.8
        "window_sliding": relational2.window_sliding,         # §2.9
        "sessionize": relational2.sessionize,                 # §2.9
        "token_count_bpe": relational2.token_count_bpe,
        "topk_per_group": relational3.topk_per_group,
        "quantiles_per_group": relational3.quantiles_per_group,
        "corr_per_group": relational3.corr_per_group,
        "rolling_mean": relational3.rolling_mean,
        "approx_distinct_hll": relational3.approx_distinct_hll,  # rows-only
        # --- text analysis ---
        "token_count": text.token_count,
        "quality_score": text.quality_score,
        "lang_id": text.lang_id,
        "doc_fingerprint": text.doc_fingerprint,
        "rolling_fingerprint": text.rolling_hash_fingerprint,  # rows-only
        "deterministic_sample": text.deterministic_sample,
        "random_sample": text.random_sample,                   # rows-only
        # --- dedup family ---
        "dedup_exact_text": dedup.dedup_exact_text,           # D1
        "dedup_exact_prefix": dedup.dedup_exact_prefix,       # D1
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,          # rows-only
        "dedup_clusters": dedup.dedup_clusters,                # rows-only
        "simhash": dedup.simhash,                              # rows-only
        "embed_cosine_pairs": dedup.embed_cosine_pairs,
        "embed_lsh_pairs": dedup.embed_lsh_pairs,              # rows-only
        # --- similarity search ---
        "ann_topk": ann.ann_topk,
        "ann_ivf_topk": ann.ann_ivf_topk,                      # rows-only
        # --- multimodal (stubbed decode, real plumbing) ---
        "media_features": multimodal.media_features,           # rows-only
        "media_resize_plan": multimodal.media_resize_plan,     # rows-only
        "media_chunks": multimodal.media_chunks,               # rows-only
        "text_embeddings": multimodal.text_embeddings,         # rows-only
        # --- crawl pipeline artifacts (rows-only; exact parity in pytest) ---
        "crawl_interleaved_docs": crawl_queries.crawl_interleaved_docs,
        "crawl_doc_stats": crawl_queries.crawl_doc_stats,
        "crawl_span_explode": crawl_queries.crawl_span_explode,
        "crawl_metrics": crawl_queries.crawl_metrics,
        "crawl_seen_set": crawl_queries.crawl_seen_set,
        "crawl_doc_lookup": crawl_queries.crawl_doc_lookup,
    }


def oracle_sql() -> dict[str, str]:
    stop_list = "('the','a','of','to','and')"
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return {
        "filter_project": """
            SELECT l_orderkey, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
        """,
        "agg_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "sort_paginate": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            ORDER BY c_acctbal DESC, c_custkey LIMIT 50 OFFSET 100
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """,
        "union_distinct": """
            SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region
        """,
        "upsert_latest": """
            SELECT user_id, event_type, value FROM (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
        """,
        "key_derivation": """
            SELECT s_suppkey, s_name || '_' || CAST(s_suppkey AS VARCHAR) AS derived_id
            FROM supplier
        """,
        "broadcast_join_agg": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_tumbling": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
                   count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type, bucket
        """,
        "count_group": """
            SELECT o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_orderpriority
        """,
        "json_filter": """
            SELECT event_type, count(*) AS n FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
            GROUP BY event_type
        """,
        "join_3way_topk": """
            SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "having_filter": """
            SELECT o_custkey, count(*) AS n FROM orders
            GROUP BY o_custkey HAVING count(*) > 15
        """,
        "case_when_agg": """
            SELECT l_returnflag,
                   round(sum(CASE WHEN l_extendedprice > 30000 THEN l_quantity ELSE 0 END), 2) AS hi_qty,
                   round(sum(CASE WHEN l_extendedprice > 30000 THEN 0 ELSE l_quantity END), 2) AS lo_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "distinct_count": """
            SELECT s_nationkey, count(DISTINCT s_suppkey) AS n_suppliers
            FROM supplier GROUP BY s_nationkey
        """,
        "string_funcs": """
            SELECT p_partkey, upper(p_name) AS name_upper,
                   substr(p_name, 1, 8) AS name_prefix,
                   length(p_name)::BIGINT AS name_len,
                   p_brand || ':' || p_name AS branded
            FROM part
        """,
        "date_funcs": """
            SELECT year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m,
                   count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY y, m
        """,
        "window_sliding": """
            WITH e AS (SELECT event_type,
                              CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
                       FROM events)
            SELECT event_type,
                   (sec // 3600) * 3600 - j * 3600 AS w_start,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM e CROSS JOIN generate_series(0, 1) AS g(j)
            GROUP BY event_type, w_start
        """,
        "sessionize": """
            WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
                       FROM events),
            o AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                                 OR sec - lag(sec) OVER w > 1800
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
            s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY sec
                                           ROWS UNBOUNDED PRECEDING) AS sid
                  FROM o)
            SELECT user_id, min(sec) AS session_start_sec,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
                SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) WHERE rn <= 3
        """,
        "quantiles_per_group": """
            SELECT o_orderpriority,
                   round(quantile_disc(o_totalprice, 0.5), 2) AS p50,
                   round(quantile_disc(o_totalprice, 0.9), 2) AS p90
            FROM orders GROUP BY o_orderpriority
        """,
        "corr_per_group": """
            SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "rolling_mean": """
            SELECT user_id, event_id,
                   round(avg(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS roll_avg
            FROM events
        """,
        "token_count_bpe": """
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))::BIGINT AS n_bpe
            FROM documents
        """,
        "token_count": f"""
            SELECT doc_id, len({toks})::BIGINT AS n_tokens FROM documents
        """,
        "quality_score": f"""
            WITH T AS (SELECT doc_id, lower(text) AS lt, {toks} AS toks FROM documents)
            SELECT doc_id,
                   len(toks)::BIGINT AS n_tokens,
                   len(list_filter(toks, x -> x IN {stop_list}))::BIGINT AS stop_hits,
                   CASE WHEN len(toks) > 0
                        THEN len(list_filter(toks, x -> x IN {stop_list}))::DOUBLE / len(toks)
                        ELSE 0.0 END AS stop_ratio,
                   len(regexp_extract_all(lt, '[^a-z0-9 ]'))::BIGINT AS punct_n
            FROM T
        """,
        "lang_id": f"""
            WITH T AS (SELECT doc_id, {toks} AS toks FROM documents),
            S AS (SELECT doc_id,
                   len(list_filter(toks, x -> x IN ('der','die','das'))) AS de,
                   len(list_filter(toks, x -> x IN ('the','a','of'))) AS en,
                   len(list_filter(toks, x -> x IN ('le','la','de'))) AS fr
                  FROM T)
            SELECT doc_id,
                   CASE WHEN de = 0 AND en = 0 AND fr = 0 THEN 'unk'
                        WHEN de >= en AND de >= fr THEN 'de'
                        WHEN en >= fr THEN 'en'
                        ELSE 'fr' END AS lang_pred
            FROM S
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "deterministic_sample": """
            SELECT doc_id, text FROM documents
            WHERE substr(md5(text), 1, 1) IN ('0', '1')
        """,
        "dedup_exact_text": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "dedup_exact_prefix": f"""
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY array_to_string(list_slice({toks}, 1, 5), ' ')
        """,
        "ngram_jaccard_pairs": f"""
            WITH toksrc AS (SELECT doc_id, {toks} AS t FROM documents),
            tri AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
                FROM toksrc WHERE len(t) >= 3
            ),
            ex AS (SELECT doc_id, unnest(sh) AS s FROM tri),
            pairs AS (
                SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            sizes AS (SELECT doc_id, len(sh) AS n FROM tri)
            SELECT p.a AS doc_a, p.b AS doc_b
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.a
            JOIN sizes sb ON sb.doc_id = p.b
            WHERE p.inter::DOUBLE / (sa.n + sb.n - p.inter) >= 0.4
        """,
        "embed_cosine_pairs": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
        """,
        "ann_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cos
            FROM embeddings WHERE vec_id <> 0
            ORDER BY cos DESC, vec_id DESC LIMIT 10
        """,
    }
