"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every operator family from SURVEY.md §2 (implementations in
dedupe_archived_files_spark.queries); `oracle_sql()` gives the DuckDB-equivalent
SQL. Column names/types are aligned pairwise (see queries.py parity rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_archived_files_spark import queries as Q
from dedupe_archived_files_spark.config import PipelineConfig
from dedupe_archived_files_spark.plans.pipeline import run_pipeline_checkpointed


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full dedupe pipeline (extract → block → score → cluster →
    resolve) over the documents table viewed as web pages; every doc gets its
    duplicate-cluster assignment (singletons map to themselves).

    Runs through the CHECKPOINTED pipeline against a fresh temp root, so every
    grading run also exercises the commit/lineage path (stage parquet +
    per-partition lineage rows + atomic markers), then runs AGAIN against the
    same root with a one-row delta (the lexicographically-first url re-crawled
    with identical content at a newer warc_ts) so the MERGE-upsert + scoped
    edge recompute branch is exercised per grading run too (VERDICT r4 #5).
    Identical content ⇒ identical clusters ⇒ the returned rows (and the
    driver's value hash) are unchanged. Output is identical to the in-memory
    run_pipeline form: clusters rows are exactly the CC labels."""
    import tempfile

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    cfg = PipelineConfig(tau_jaccard=0.9, shingle_size=3)
    root = tempfile.mkdtemp(prefix="entry_ckpt_")
    run_pipeline_checkpointed(pages, root, cfg)
    first = pages.orderBy("url").limit(1)
    delta = first.withColumn(
        "warc_ts", F.lit("2025-06-02 00:00:00").cast("timestamp")
    )
    snapshot2 = pages.join(first.select("url"), "url", "left_anti").unionByName(
        delta.select(*pages.columns)
    )
    clusters = run_pipeline_checkpointed(snapshot2, root, cfg)
    labels = clusters.select("url", "cluster_id")
    return (
        pages.select("url")
        .join(labels, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("cluster_id"), F.col("url")).alias("cluster_id"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # exact-duplicate family (reference J1/J2/J3/A1/A6)
        "exact_dup_groups_events": Q.exact_dup_groups_events,
        "exact_dup_clusters_documents": Q.exact_dup_clusters_documents,
        "quick_block_verify_documents": Q.quick_block_verify_documents,
        # near-duplicate family (north rule)
        "near_dup_jaccard_pairs": Q.near_dup_jaccard_pairs,
        "minhash_lsh_near_dup": Q.minhash_lsh_near_dup,
        "simhash_hamming_pairs": Q.simhash_hamming_pairs,
        "simhash_banded_near_dup": Q.simhash_banded_near_dup,
        "connected_components_docs": Q.connected_components_docs,
        # text analysis
        "lang_id_documents": Q.lang_id_documents,
        "quality_scores_documents": Q.quality_scores_documents,
        "token_counts_documents": Q.token_counts_documents,
        "repetition_stats_documents": Q.repetition_stats_documents,
        "dataset_split_documents": Q.dataset_split_documents,
        "decontaminate_documents": Q.decontaminate_documents,
        "stratified_sample_documents": Q.stratified_sample_documents,
        "doc_fingerprints": Q.doc_fingerprints,
        "human_readable_sizes": Q.human_readable_sizes,
        # relational operator family (reference joins/aggs/sorts)
        "semi_join_suppliers": Q.semi_join_suppliers,
        "anti_join_customers": Q.anti_join_customers,
        "left_join_coalesce_default": Q.left_join_coalesce_default,
        "last_writer_wins_events": Q.last_writer_wins_events,
        "group_stats_documents": Q.group_stats_documents,
        "union_dedup_docs": Q.union_dedup_docs,
        "topk_chars_per_lang": Q.topk_chars_per_lang,
        "tumbling_window_counts": Q.tumbling_window_counts,
        # embeddings / ANN
        "embedding_topk_cosine": Q.embedding_topk_cosine,
        "embedding_ann_lsh": Q.embedding_ann_lsh,
        "embedding_ann_ivf": Q.embedding_ann_ivf,
        "embedding_ann_ivf2": Q.embedding_ann_ivf2,
        "embedding_cosine_near_dup": Q.embedding_cosine_near_dup,
        # SemDeDup-style k-means-blocked semantic dedup (rows-only driver
        # check — centroids engine-internal; recall+precision gated in pytest
        # vs brute-force all-pairs truth, reported per bench run)
        "semantic_dedup_embeddings": Q.semantic_dedup_embeddings,
        # multimodal plumbing
        "multimodal_binary_meta": Q.multimodal_binary_meta,
        # archive enumeration (reference S3-S7/S9-S11 core domain)
        "archive_member_enumeration": Q.archive_member_enumeration,
        # event-time operators (gap sessionization, composed AS-OF join)
        "sessionize_events": Q.sessionize_events,
        "asof_join_events": Q.asof_join_events,
        # passage-level near-dup (winnowing inverted index, MOSS shape)
        "fingerprint_overlap_near_dup": Q.fingerprint_overlap_near_dup,
        # hierarchy reporting (ROLLUP — supplements the reference's absent
        # grouping-sets family)
        "corpus_rollup_stats": Q.corpus_rollup_stats,
        # composite curation flagship: token gate + Gopher repetition gates +
        # benchmark decontamination + deterministic split, one cascade
        "curate_documents": Q.curate_documents,
    }


_TOKS = "list_filter(string_split(lower(text), ' '), x -> x != '')"
_LANG_SETS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que"],
}


def _simhash_sql() -> str:
    bit_sum = " + ".join(
        f"(CASE WHEN sum(2 * ((h >> {b}) & 1) - 1) > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
        for b in range(60)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         unnest(list_distinct({_TOKS})) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, lang, source,
         CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
),
sig AS (
  SELECT doc_id, lang, source, {bit_sum} AS sh
  FROM th GROUP BY doc_id, lang, source
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sig a JOIN sig b
  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 10
"""


_JACCARD_PAIRS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, list_distinct({_TOKS}) AS toks FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       round(len(list_intersect(a.toks, b.toks)) * 1.0
             / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jac
FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) * 1.0
      / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.9
"""


def _lang_id_sql() -> str:
    score = lambda lang: (  # noqa: E731
        "len(list_filter(toks, t -> list_contains(["
        + ", ".join(f"'{w}'" for w in _LANG_SETS[lang])
        + "], t)))"
    )
    g = f"greatest({score('en')}, {score('de')}, {score('fr')}, {score('es')})"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CASE WHEN {g} = 0 THEN 'und'
            WHEN {score('en')} = {g} THEN 'en'
            WHEN {score('de')} = {g} THEN 'de'
            WHEN {score('fr')} = {g} THEN 'fr'
            ELSE 'es' END AS pred_lang,
       {g} AS best_score
FROM t
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_groups_events": """
            SELECT md5(props) AS content_hash, count(*) AS n_copies,
                   min(event_id) AS canonical_id
            FROM events GROUP BY props HAVING count(*) >= 2
        """,
        "exact_dup_clusters_documents": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
                   count(*) OVER (PARTITION BY md5(text)) AS cluster_size
            FROM documents
        """,
        "quick_block_verify_documents": """
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   (a.text = b.text) AS verified
            FROM documents a JOIN documents b
              ON md5(substr(a.text, 1, 32)) = md5(substr(b.text, 1, 32))
             AND a.doc_id < b.doc_id
        """,
        "near_dup_jaccard_pairs": _JACCARD_PAIRS_SQL,
        "minhash_lsh_near_dup": _JACCARD_PAIRS_SQL,
        "simhash_hamming_pairs": _simhash_sql(),
        # banded variant verifies to the identical pair set (J2-superset
        # invariant) — same oracle by construction
        "simhash_banded_near_dup": _simhash_sql(),
        "connected_components_docs": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, lang, source, list_distinct({_TOKS}) AS toks FROM documents
            ),
            e AS (
              SELECT a.doc_id AS u, b.doc_id AS v
              FROM t a JOIN t b
                ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
              WHERE len(list_intersect(a.toks, b.toks)) * 1.0
                    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
            ),
            sym AS (
              SELECT u, v FROM e UNION SELECT v, u FROM e
              UNION SELECT u, u FROM e UNION SELECT v, v FROM e
            ),
            reach(u, v) AS (
              SELECT u, v FROM sym
              UNION
              SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
            )
            SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u
        """,
        "lang_id_documents": _lang_id_sql(),
        "quality_scores_documents": f"""
            WITH t AS (SELECT doc_id, text, len({_TOKS}) AS n_tok FROM documents)
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(n_tok AS BIGINT) AS n_tokens,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                         / nullif(n_tok, 0), 4) AS avg_token_len,
                   round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                         / nullif(length(text), 0), 4) AS punct_ratio,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                         / nullif(length(text), 0), 4) AS alpha_ratio
            FROM t
        """,
        "token_counts_documents": f"""
            WITH t AS (
              SELECT doc_id, {_TOKS} AS ws,
                     list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x != '') AS re
              FROM documents
            )
            SELECT doc_id, CAST(len(ws) AS BIGINT) AS ws_tokens,
                   CAST(len(re) AS BIGINT) AS re_tokens,
                   CAST(len(list_distinct(re)) AS BIGINT) AS distinct_tokens
            FROM t
        """,
        # benchmark decontamination: 8-token grams built with the same
        # 1-based / end-exclusive range() construction as the repetition
        # oracle, hashed with the shared md5 60-bit-prefix formula; the
        # benchmark subset (doc_id % 25 == 0) and per-position hit counting
        # (corpus grams NOT dedup'd, benchmark grams dedup'd) mirror the
        # Spark operator exactly
        "decontaminate_documents": f"""
            WITH t AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            g AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
              FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 6),
                         i -> {" || ' ' || ".join(f"toks[i + {j}]" for j in range(8))}))
                         AS g
                FROM t WHERE len(toks) >= 8
              )
            ),
            b AS (SELECT DISTINCT h FROM g WHERE doc_id % 25 = 0),
            c AS (SELECT doc_id, h FROM g WHERE doc_id % 25 != 0),
            hits AS (
              SELECT doc_id, count(*) AS n FROM c JOIN b USING (h)
              GROUP BY doc_id
            )
            SELECT t.doc_id,
                   CAST(coalesce(hits.n, 0) AS BIGINT)
                     AS n_contaminated_grams,
                   hits.n IS NOT NULL AS contaminated
            FROM t LEFT JOIN hits USING (doc_id)
            WHERE t.doc_id % 25 != 0
        """,
        # stratified sample: same salted-md5 rank, same (hash, doc_id)
        # tie-break, same per-lang quota (40)
        "stratified_sample_documents": """
            WITH h AS (
              SELECT doc_id, lang,
                     CAST(concat('0x', substr(md5('sample-v1:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
              FROM documents
            )
            SELECT doc_id, lang, sample_rank FROM (
              SELECT doc_id, lang,
                     CAST(row_number() OVER (PARTITION BY lang
                       ORDER BY h, doc_id) AS BIGINT) AS sample_rank
              FROM h
            ) WHERE sample_rank <= 40
        """,
        # deterministic hash split: same salted-md5 60-bit-prefix bucket
        # formula (Spark conv(substr(md5,1,15),16,10) == DuckDB
        # CAST(concat('0x',...) AS BIGINT) — both positive, both int64)
        "dataset_split_documents": """
            WITH b AS (
              SELECT doc_id, lang,
                     CAST(concat('0x', substr(md5('split-v1:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                       AS bucket
              FROM documents
            )
            SELECT doc_id, lang, bucket,
                   CASE WHEN bucket < 90 THEN 'train'
                        WHEN bucket < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        # Gopher-style repetition stats: same tokenizer, same n-gram
        # construction (1-based list indexing, range() end-exclusive), same
        # max-count / lexicographically-greatest tie-break as the Spark
        # max(struct(n, bg)) — and the same unrounded int64-quotient
        # comparison discipline as the other ratio oracles
        "repetition_stats_documents": f"""
            WITH t AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            tri AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                     ELSE [] END AS tg
              FROM t
            ),
            bg AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
              FROM t WHERE len(toks) >= 2
            ),
            c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
            w AS (
              SELECT doc_id, bg, n,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY n DESC, bg DESC) AS rn,
                     sum(n) OVER (PARTITION BY doc_id) AS n_bigrams
              FROM c
            ),
            top AS (SELECT doc_id, bg, n, n_bigrams FROM w WHERE rn = 1)
            SELECT t.doc_id,
                   CAST(coalesce(top.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   coalesce(top.bg, '') AS top_bigram,
                   round(coalesce(top.n * 1.0 / top.n_bigrams, 0), 4)
                     AS top_bigram_frac,
                   round(CASE WHEN len(tg) > 0 THEN
                       (len(tg) - len(list_distinct(tg))) * 1.0 / len(tg)
                     ELSE 0 END, 4) AS dup_trigram_frac
            FROM t
            JOIN tri USING (doc_id)
            LEFT JOIN top USING (doc_id)
        """,
        "doc_fingerprints": """
            WITH pos AS (
              SELECT doc_id, i AS pos,
                     CAST(concat('0x', substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 15)) AS BIGINT) AS h
              FROM documents, unnest(range(1, length(text) - 6)) AS u(i)
              WHERE length(text) >= 8
            ),
            mins AS (
              SELECT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
              FROM pos
            )
            SELECT doc_id, CAST(count(DISTINCT mh) AS BIGINT) AS n_fp,
                   CAST(sum(mh % 1000000007) AS BIGINT) AS fp_checksum
            FROM mins GROUP BY doc_id
        """,
        "human_readable_sizes": """
            SELECT doc_id,
                   CASE WHEN n_chars < 1024 THEN round(CAST(n_chars AS DOUBLE), 1)
                        WHEN n_chars < 1048576 THEN round(n_chars / 1024.0, 1)
                        ELSE round(n_chars / 1048576.0, 1) END AS size_value,
                   CASE WHEN n_chars < 1024 THEN 'B'
                        WHEN n_chars < 1048576 THEN 'KB'
                        ELSE 'MB' END AS size_unit
            FROM documents
        """,
        "semi_join_suppliers": """
            SELECT s_suppkey, s_name FROM supplier s
            WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "left_join_coalesce_default": """
            SELECT o_orderkey, coalesce(c.c_mktsegment, 'NONE') AS segment
            FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
              ON o.o_custkey = c.c_custkey
        """,
        "last_writer_wins_events": """
            SELECT user_id, event_id, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "group_stats_documents": """
            SELECT lang, source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents GROUP BY lang, source
        """,
        "union_dedup_docs": """
            SELECT doc_id FROM documents WHERE lang = 'en'
            UNION
            SELECT doc_id FROM documents WHERE n_chars > 300
        """,
        "topk_chars_per_lang": """
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(rk AS BIGINT) AS rk
            FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id ASC) AS rk
              FROM documents
            ) WHERE rk <= 3
        """,
        "tumbling_window_counts": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
                   count(*) AS n, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "embedding_topk_cosine": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            n AS (
              SELECT vec_id, v,
                     sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
              FROM e
            ),
            s AS (
              SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                     list_aggregate(
                       list_transform(range(1, len(q.v) + 1), i -> q.v[i] * t.v[i]),
                       'sum') / (q.nrm * t.nrm) AS sim
              FROM n q JOIN n t ON q.vec_id != t.vec_id
              WHERE q.vec_id < 20
            )
            SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS rk, round(sim, 4) AS sim
            FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, neighbor_id ASC) AS rk
              FROM s
            ) WHERE rk <= 5
        """,
        # embedding_ann_lsh / embedding_ann_ivf / embedding_ann_ivf2:
        # intentionally no oracle (engine-internal hyperplane / centroid
        # constants) → driver records the weaker rows-only check; recall vs
        # the brute-force baseline is gated >= 0.9 in pytest and reported per
        # bench run (BENCH_r*.json ann_recall).
        "embedding_cosine_near_dup": """
            WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            n AS (
              SELECT vec_id, label, v,
                     sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
              FROM e
            )
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   round(list_aggregate(
                           list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                           'sum') / (a.nrm * b.nrm), 4) AS sim
            FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
            -- filter on the ROUNDED sim, matching the engine: raw engine/oracle
            -- folds can differ in the last ulp at the 0.3 boundary
            WHERE round(list_aggregate(
                    list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i]),
                    'sum') / (a.nrm * b.nrm), 4) >= 0.3
        """,
        "multimodal_binary_meta": """
            SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS content_md5, (text LIKE '<%') AS looks_html
            FROM documents
        """,
        # archive round-trip: the oracle rebuilds the expected member rows
        # straight from the documents table (member bytes are the UTF-8 text
        # by construction), so a hash match proves pack → sniff → enumerate
        # surfaced every member exactly once, byte-exact
        "archive_member_enumeration": """
            SELECT lang || '/' || CAST(doc_id % 8 AS VARCHAR) AS archive_id,
                   CAST(doc_id AS VARCHAR) || '.txt' AS member_path,
                   CAST(strlen(coalesce(text, '')) AS BIGINT) AS member_size,
                   sha256(coalesce(text, '')) AS full_hash
            FROM documents
        """,
        # gap sessionization: 30-min inactivity closes a session; ordering
        # key (ts, event_id) and truncate-to-second gap math match the Spark
        # window formulation exactly (date_diff('second') counts boundary
        # crossings == floor-epoch difference)
        "sessionize_events": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR date_diff('second', lag(ts) OVER w, ts) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM o
            )
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
                     AS duration_secs
            FROM s GROUP BY user_id, session_seq
        """,
        # as-of join: DuckDB's native ASOF LEFT JOIN is the oracle for the
        # Spark union+window composition; build side deduped to one row per
        # (user_id, ts) on both sides so ties are deterministic
        "asof_join_events": """
            WITH v AS (
              SELECT user_id, ts, max(event_id) AS view_event_id
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ),
            p AS (
              SELECT event_id, ts, user_id, value AS purchase_value
              FROM events WHERE event_type = 'purchase'
            )
            SELECT p.event_id, p.ts AS purchase_ts, p.user_id,
                   p.purchase_value, v.view_event_id, v.ts AS view_ts
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        """,
        # passage-level near-dup: winnowing fingerprint inverted index with
        # the SAME doc-frequency cap (32), min-shared threshold (10) and
        # containment floor (0.3) the Spark operator applies — thresholds are
        # part of the operator contract, so outputs match exactly at any
        # scale (the >= 0.3 filter runs on the unrounded IEEE quotient of the
        # same two int64s in both engines, so it cannot flake at boundaries)
        "fingerprint_overlap_near_dup": """
            WITH pos AS (
              SELECT doc_id, i AS pos,
                     CAST(concat('0x', substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 15)) AS BIGINT) AS h
              FROM documents, unnest(range(1, length(text) - 6)) AS u(i)
              WHERE length(text) >= 8
            ),
            mins AS (
              SELECT doc_id,
                     min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
              FROM pos
            ),
            fps AS (SELECT DISTINCT doc_id, mh AS fp FROM mins),
            kept AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 32),
            f2 AS (SELECT fps.doc_id, fps.fp FROM fps JOIN kept USING (fp)),
            nf AS (SELECT doc_id, count(*) AS n_fp FROM f2 GROUP BY doc_id),
            pr AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     count(*) AS n_shared
              FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 10
            )
            SELECT doc_id_a, doc_id_b, CAST(n_shared AS BIGINT) AS n_shared,
                   round(n_shared * 1.0 / least(na.n_fp, nb.n_fp), 4)
                     AS containment
            FROM pr
            JOIN nf na ON na.doc_id = pr.doc_id_a
            JOIN nf nb ON nb.doc_id = pr.doc_id_b
            WHERE n_shared * 1.0 / least(na.n_fp, nb.n_fp) >= 0.3
        """,
        # ROLLUP hierarchy: DuckDB's GROUPING() semantics match Spark's
        # grouping(); group nulls coalesced to the same sentinel both sides
        "corpus_rollup_stats": """
            SELECT coalesce(lang, '<all>') AS lang,
                   coalesce(source, '<all>') AS source,
                   CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT)
                     AS grouping_level,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
            FROM documents
            GROUP BY ROLLUP(lang, source)
        """,
        # composite curation cascade: benchmark > low_quality > repetitive >
        # contaminated > kept(+split). Every gate compares int64
        # cross-products (top_n*10 > n_bg, dup_tg*50 > n_tg), never a rounded
        # float, so engine parity holds bit-for-bit; gram hashing, benchmark
        # membership (doc_id % 25), and the split bucket reuse the exact
        # formulas of the component oracles above
        "curate_documents": f"""
            WITH t AS (
              SELECT doc_id, {_TOKS} AS toks FROM documents
            ),
            tri AS (
              SELECT doc_id, len(toks) AS n_tokens,
                     CASE WHEN len(toks) >= 3 THEN
                       list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                     ELSE [] END AS tg
              FROM t
            ),
            trif AS (
              SELECT doc_id, n_tokens, len(tg) AS n_tg,
                     len(tg) - len(list_distinct(tg)) AS dup_tg
              FROM tri
            ),
            bg AS (
              SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
              FROM t WHERE len(toks) >= 2
            ),
            c AS (SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
            top AS (SELECT doc_id, max(n) AS top_n, sum(n) AS n_bg
                    FROM c GROUP BY doc_id),
            g AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) AS h
              FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 6),
                         i -> {" || ' ' || ".join(f"toks[i + {j}]" for j in range(8))}))
                         AS g
                FROM t WHERE len(toks) >= 8
              )
            ),
            b AS (SELECT DISTINCT h FROM g WHERE doc_id % 25 = 0),
            hits AS (SELECT DISTINCT g.doc_id FROM g JOIN b USING (h)
                     WHERE g.doc_id % 25 != 0),
            s AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5('split-v1:' ||
                       CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                       AS bucket
              FROM documents
            ),
            v AS (
              SELECT trif.doc_id,
                     CASE WHEN trif.doc_id % 25 = 0 THEN 'benchmark'
                          WHEN trif.n_tokens < 16 THEN 'low_quality'
                          WHEN coalesce(top.top_n, 0) * 10
                                 > coalesce(top.n_bg, 0)
                               OR trif.dup_tg * 50 > trif.n_tg
                            THEN 'repetitive'
                          WHEN hits.doc_id IS NOT NULL THEN 'contaminated'
                          ELSE 'kept' END AS verdict,
                     s.bucket
              FROM trif
              LEFT JOIN top USING (doc_id)
              LEFT JOIN hits ON hits.doc_id = trif.doc_id
              JOIN s ON s.doc_id = trif.doc_id
            )
            SELECT doc_id, verdict,
                   CASE WHEN verdict = 'kept' THEN
                     CASE WHEN bucket < 90 THEN 'train'
                          WHEN bucket < 95 THEN 'val' ELSE 'test' END
                   ELSE '' END AS split
            FROM v
        """,
    }
