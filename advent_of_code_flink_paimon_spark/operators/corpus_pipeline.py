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
    fan_out,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_hash_arrays,
)
from advent_of_code_flink_paimon_spark.operators.registry import T, pin, query


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
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc_id
    FROM kept GROUP BY lang, source
    """,
)
def x40_corpus_curation(spark, sf_dir):
    docs = fan_out(T(spark, sf_dir, "documents"), heavy=True)
    toks = F.split("text", " ")
    quality = (
        docs.withColumn("n_tokens", F.size(toks))
        .withColumn("ttr", F.size(F.array_distinct(toks)) / F.size(toks))
        .filter((F.col("n_tokens") >= 30) & (F.col("ttr") >= 0.3))
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    exact = quality.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    sharr = pin(shingle_hash_arrays(exact))
    pairs = lsh_candidate_pairs(minhash_signatures(sharr))
    dup_j = (
        exact_jaccard(pairs, sharr)
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


@query(
    "x41_decontaminate",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 8
                    THEN list_transform(generate_series(1, len(w) - 7),
                                        i -> array_to_string(w[i:i+7], ' '))
                    ELSE [] END AS ngrams
        FROM d
    ),
    bench AS (SELECT DISTINCT unnest(ngrams) AS ng FROM g WHERE doc_id % 50 = 0),
    corpus AS (SELECT DISTINCT doc_id, unnest(ngrams) AS ng FROM g WHERE doc_id % 50 <> 0),
    tot AS (SELECT doc_id, len(list_distinct(ngrams)) AS n_ngrams
            FROM g WHERE doc_id % 50 <> 0),
    hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
             FROM corpus c JOIN bench b USING (ng) GROUP BY c.doc_id)
    SELECT t.doc_id, t.n_ngrams, COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) * 1.0 / NULLIF(t.n_ngrams, 0), 6)
               AS contamination
    FROM tot t LEFT JOIN hits h USING (doc_id)
    """,
)
def x41_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents whose word
    8-grams overlap a held-out benchmark set (here: every 50th doc).
    The standard eval-contamination check for LLM corpus curation.

    Scale shape: the benchmark n-gram set is tiny relative to the
    corpus (evals are ~1e5 grams vs 1e12 corpus grams), so it is
    deduped and **broadcast** — the corpus side streams through a
    broadcast-hash semi-ish join with zero shuffle of corpus n-grams;
    the only exchange is the per-doc count aggregation, keyed by
    doc_id. N-gram synthesis is pure codegen (transform/sequence/
    slice), no Python."""
    d = fan_out(T(spark, sf_dir, "documents"), heavy=True).withColumn("w", F.split("text", " "))
    # each 8-gram is hashed to 8 bytes inside the synthesis transform
    # (same trick as dedup.shingle_hash_arrays): overlap counts on
    # hashes equal counts on strings up to xxhash64 collisions
    # (P < 1e-10 corpus-wide), and the broadcast set + join keys shrink
    # ~6×. The per-doc array feeds three branches (benchmark set,
    # corpus explode, totals) — persist so one action computes it once.
    g = d.withColumn(
        "ngrams",
        F.expr(
            "CASE WHEN size(w) >= 8 THEN transform(sequence(1, size(w) - 7),"
            " i -> xxhash64(array_join(slice(w, i, 8), ' '))) ELSE array() END"
        ),
    ).select("doc_id", "ngrams")
    g = pin(g)
    bench = (
        g.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("ngrams").alias("ng"))
        .distinct()
    )
    corpus = (
        g.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id", F.explode("ngrams").alias("ng"))
        .distinct()
    )
    tot = g.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.size(F.array_distinct("ngrams")).alias("n_ngrams")
    )
    hits = (
        corpus.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        tot.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0))
                * 1.0
                / F.when(F.col("n_ngrams") > 0, F.col("n_ngrams")),
                6,
            ).alias("contamination"),
        )
    )
