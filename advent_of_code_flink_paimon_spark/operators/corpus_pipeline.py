"""End-to-end corpus curation pipeline (the charter's 'LLM training-data
pipeline' as ONE composed, oracle-checked operator).

Stages (all deterministic, shared with the DuckDB oracle):
  1. quality gate     — n_tokens ≥ 30 AND type-token-ratio ≥ 0.3 (x23 rules)
  2. exact dedup      — md5(text) fingerprint, keep the min doc_id
  3. near-dedup       — drop every doc that is the LARGER id of a
                        jaccard ≥ 0.5 shingle pair (canonical-min keep);
                        Spark generates candidates via MinHash-LSH, the
                        oracle exhaustively — identical output at the
                        testdata's similarity margin (dedup.py rationale)
  4. accounting       — kept docs + whitespace-token totals per (lang, source)

Scale shape: stages 1-2 are scan + one hash-agg; stage 3 is the LSH
banding join (linear in docs × bands); stage 4 a partial+final agg.
Nothing quadratic, nothing driver-side — the whole pipeline is a single
lazy DataFrame a 100 TB corpus can flow through.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from advent_of_code_flink_paimon_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_docs,
)
from advent_of_code_flink_paimon_spark.operators.registry import T, query


@query(
    "x40_corpus_curation",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS ttr
        FROM documents
    ),
    quality AS (
        SELECT * FROM toks WHERE n_tokens >= 30 AND ttr >= 0.3
    ),
    exact AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM quality
        ) WHERE rn = 1
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            [s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s) - 1)]
        )) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM exact)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    near_dup_j AS (
        SELECT DISTINCT b.doc_id AS j
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        JOIN sizes sa ON sa.doc_id = a.doc_id
        JOIN sizes sb ON sb.doc_id = b.doc_id
        GROUP BY a.doc_id, b.doc_id, sa.n, sb.n
        HAVING COUNT(*) * 1.0 / (sa.n + sb.n - COUNT(*)) >= {JACCARD_THRESHOLD}
    ),
    kept AS (
        SELECT * FROM exact WHERE doc_id NOT IN (SELECT j FROM near_dup_j)
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           SUM(n_tokens) AS total_tokens,
           MIN(doc_id) AS min_doc_id
    FROM kept GROUP BY lang, source
    """,
)
def x40_corpus_curation(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    quality = (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("ttr", F.size(F.array_distinct(toks)) / F.size(toks))
        .filter((F.col("n_tokens") >= 30) & (F.col("ttr") >= 0.3))
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    exact = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    shingled = shingle_docs(exact).persist()
    pairs = lsh_candidate_pairs(minhash_signatures(shingled))
    dup_j = (
        exact_jaccard(pairs, shingled)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(F.col("j").alias("doc_id"))
        .distinct()
    )
    kept = exact.join(dup_j, "doc_id", "left_anti")
    return kept.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )
