"""Deterministic sampling operators for corpus curation (SURVEY.md
§2.11 extension surface).

Large-scale training-data pipelines need *reproducible* samples —
`df.sample()` depends on partition layout and seed plumbing, so these
operators derive keep/drop decisions purely from data values. Both are
single-pass, shuffle-minimal, and have exact DuckDB twins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from advent_of_code_flink_paimon_spark.operators.registry import T, pin, query

# Knuth's multiplicative-hash constant (2^32 * golden ratio).
_KNUTH = 2654435761
_BUCKETS = 1_000_000
_KEEP = 100_000  # 10 % sample


@query(
    "x42_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           (doc_id * {_KNUTH}) % {_BUCKETS} AS bucket
    FROM documents
    WHERE (doc_id * {_KNUTH}) % {_BUCKETS} < {_KEEP}
    """,
)
def x42_hash_sample(spark, sf_dir):
    """Deterministic ~10 % sample via multiplicative hashing of the key:
    keep iff (doc_id * knuth) mod 1e6 < 1e5. Unlike `df.sample()` the
    decision is a pure function of the row, so the sample is stable
    across partitionings, retries, and engines (hence SQL-twin-able).
    Zero shuffle — the predicate evaluates inside the scan. At 100 TB
    with arbitrary-width keys, swap the multiply for `xxhash64(key)`
    (same shape, no oracle twin since hash functions differ per
    engine); ids here are small enough that the product stays exact in
    int64 in both engines."""
    d = T(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_BUCKETS)
    return (
        d.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .filter(F.col("bucket") < _KEEP)
    )


@query(
    "x43_stratified_cap",
    oracle="""
    WITH r AS (
        SELECT lang, source,
               ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang, source) AS n_total
        FROM documents
    )
    SELECT lang, source, MAX(n_total) AS n_total, COUNT(*) AS n_kept
    FROM r WHERE rn <= 20 GROUP BY lang, source
    """,
)
def x43_stratified_cap(spark, sf_dir):
    """Per-stratum quota sampling: cap each (lang, source) group at 20
    documents, chosen deterministically by doc_id order — the domain-
    quota step of corpus mixing (cap over-represented sources). One
    hash exchange on the stratum key serves the row_number, the group
    count, and the final aggregate. At 100 TB a skewed stratum would
    bottleneck one task; mitigation is a two-level cap (salted
    pre-rank keeping ≥20 per salt, then exact rank) — unnecessary at
    the quota sizes used here."""
    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    r = d.select(
        "lang",
        "source",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("lang", "source")).alias("n_total"),
    )
    return (
        r.filter(F.col("rn") <= 20)
        .groupBy("lang", "source")
        .agg(F.max("n_total").alias("n_total"), F.count("*").alias("n_kept"))
    )


# ----------------------------------------------------------------------
# x35: token-budget sequence packing — the concat-and-chunk step that
# turns filtered documents into fixed-width training sequences (every
# LLM data pipeline ends with it). Pure integer window arithmetic →
# bit-exact oracle.
# ----------------------------------------------------------------------
PACK_BUDGET = 2048
PACK_SHARDS = 8

_SQL_TOKEN_PACK = f"""
WITH t AS (
    SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, shard, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
    FROM t
)
SELECT doc_id, shard, n_tokens,
       start_tok // {PACK_BUDGET} AS pack_id,
       start_tok % {PACK_BUDGET} AS pack_offset
FROM c
"""


@query("x35_token_pack", oracle=_SQL_TOKEN_PACK)
def x35_token_pack(spark, sf_dir):
    """Greedy sequential packing: within each shard, documents are laid
    end-to-end in doc_id order and assigned the 2048-token window their
    first token lands in (a doc may straddle two packs; training-side
    chunking splits it — this operator owns the layout, which is the
    deterministic part).

    Scale shape: a GLOBAL packing order would be a single-partition
    window sort — the classic scale killer — so packing is SHARDED
    (doc_id % 8 here; a real pipeline shards by source/path prefix):
    each shard's running sum is an independent hash-partitioned window,
    all shards pack in parallel, and sequence ids are (shard, pack_id)
    pairs. One shuffle on the slim (doc_id, n_tokens) projection."""
    d = T(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    return c.select(
        "doc_id", "shard", "n_tokens",
        F.floor(F.col("start_tok") / PACK_BUDGET).alias("pack_id"),
        (F.col("start_tok") % PACK_BUDGET).alias("pack_offset"),
    )


# ---------------------------------------------------------------------------
# x44: mixture resampling toward a target source distribution (DoReMi-ish)
# ---------------------------------------------------------------------------

# target MASS per source: boosted sources get 3× the weight of the rest
# (DoReMi, Xie et al. 2023, arXiv:2305.10429 — domain reweighting; the
# weights here are literals standing in for its learned mixture)
_MIX_BOOSTED = ("src0", "src1", "src2", "src3", "src4")
_MIX_BOOST_W = 3
_MIX_BASE_W = 1
_MIX_T = _MIX_BOOST_W * len(_MIX_BOOSTED) + _MIX_BASE_W * 15  # Σ target mass

_SQL_MIXTURE = f"""
WITH c AS (
    SELECT doc_id, source,
           (doc_id * {_KNUTH}) % {_BUCKETS} AS u,
           COUNT(*) OVER (PARTITION BY source) AS n_s,
           COUNT(*) OVER () AS n,
           CASE WHEN source IN {_MIX_BOOSTED} THEN {_MIX_BOOST_W}
                ELSE {_MIX_BASE_W} END AS t_s
    FROM documents
)
SELECT doc_id, source,
       u * {_MIX_T} * n_s < t_s * n * {_BUCKETS} AS keep
FROM c
"""


@query("x44_mixture_resample", oracle=_SQL_MIXTURE)
def x44_mixture_resample(spark, sf_dir):
    """Resample the corpus toward a TARGET source mixture (the DoReMi
    domain-reweighting step): per-source acceptance rate = target share
    / actual share (capped at 1 by construction of the comparison), and
    each doc's accept decision is the same multiplicative-hash
    uniform draw x42 uses — a pure function of the row, stable across
    partitionings, retries, and engines.

    The comparison is kept in INT64 (u·T·n_s < t_s·n·buckets; maxima
    ~1e13 ≪ 2^63), so both engines decide identically — no float rate
    ever materializes. Scale shape: the source histogram is a
    partial-aggregated groupBy broadcast back onto the scan (sources ≪
    rows; a window over the full corpus — one task per source, one
    GLOBAL single-partition count — is exactly the shape this avoids),
    then the decision is a scan-side predicate; no collect, no UDFs."""
    d = T(spark, sf_dir, "documents")
    u = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_BUCKETS)
    t_s = F.when(F.col("source").isin(*_MIX_BOOSTED), F.lit(_MIX_BOOST_W)).otherwise(
        F.lit(_MIX_BASE_W)
    )
    hist = d.groupBy("source").agg(F.count("*").alias("n_s"))
    total = d.agg(F.count("*").alias("n"))
    c = (
        d.select("doc_id", "source", u.alias("u"), t_s.alias("t_s"))
        .join(F.broadcast(hist), "source")
        .crossJoin(F.broadcast(total))
    )
    return c.select(
        "doc_id", "source",
        (F.col("u") * _MIX_T * F.col("n_s") < F.col("t_s") * F.col("n") * _BUCKETS).alias("keep"),
    )


# ---------------------------------------------------------------------------
# x54: domain mix report — the "data mixing card" a sampler is
# configured from (the per-source token histogram DoReMi/DSIR-style
# pipelines start with): per (source, lang), document and token
# counts, the source's share of corpus tokens, and an over-cap flag
# against a uniform-share budget.
# ---------------------------------------------------------------------------

_MIX_CAP_X = 2.0  # flag sources holding > 2x their uniform token share


@query(
    "x54_domain_mix_report",
    oracle=f"""
    WITH per AS (
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
            FROM per),
    src AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
            FROM per GROUP BY source)
    SELECT p.source, p.lang, p.n_docs, p.n_tokens,
           ROUND(s.src_tokens * 1.0 / t.tot, 6) AS source_share,
           s.src_tokens * t.n_sources > {_MIX_CAP_X} * t.tot AS over_cap
    FROM per p JOIN src s USING (source) CROSS JOIN tot t
    """,
)
def x54_domain_mix_report(spark, sf_dir):
    """Per-(source, lang) doc/token counts + each source's share of
    corpus tokens and an over-cap flag at 2x the uniform share — the
    report that decides mixture weights before resampling (x44).

    Scale shape: one grouped aggregation over (source, lang) — map-side
    partials make it O(distinct groups) post-shuffle; the corpus total
    and per-source rollup are group-count-sized and BROADCAST back, so
    no second pass over data. The over-cap comparison is integer-exact
    (tokens * n_sources vs 2 * total) — no float thresholds to drift
    across engines; only the reported share divides, rounded to 6."""
    d = T(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    )
    src = per.groupBy("source").agg(F.sum("n_tokens").cast("long").alias("src_tokens"))
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("tot"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return (
        per.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(F.col("src_tokens") * 1.0 / F.col("tot"), 6).alias("source_share"),
            (
                F.col("src_tokens") * F.col("n_sources")
                > F.lit(_MIX_CAP_X) * F.col("tot")
            ).alias("over_cap"),
        )
    )



# x-demoted round 16: x54_domain_mix_report yields its driver-registry slot to the
# streaming-card promotions (x132-x136); sampling/mixing stays driver-scored via x59/x85 (scored window) and
# x43/x44/x73/x78 (1-round-old r15 rows).
# Full strict-oracle gating continues via tests/test_relational_oracle.py.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r16d  # noqa: E402

_demote_r16d("x54_domain_mix_report")
del _demote_r16d

# ---------------------------------------------------------------------------
# x59: deterministic global shuffle -> training-shard manifest
# ---------------------------------------------------------------------------

_SHARDS = 16


_SQL_SHARD_ASSIGN = f"""
WITH d AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           (doc_id * {_KNUTH}) % {_BUCKETS} AS h
    FROM documents
),
s AS (SELECT doc_id, n_tokens, h, h % {_SHARDS} AS shard FROM d)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT)
           AS pos,
       CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
FROM s
"""


@query("x59_shard_assign", oracle=_SQL_SHARD_ASSIGN)
def x59_shard_assign(spark, sf_dir):
    """Deterministic global shuffle + shard manifest for a training
    run: every document gets a pseudo-random position — shard =
    hash % S, within-shard order by the hash itself — plus its token
    offset inside the shard, i.e. exactly the (shard, pos, start_tok)
    manifest a dataloader needs to stream shuffled, byte-addressable
    epochs WITHOUT a runtime shuffle buffer. The multiplicative-hash
    draw is the same pure-function-of-the-row idiom as x42/x44, so the
    "shuffle" is reproducible across partitionings, retries, and
    engines (df.orderBy(rand()) is none of those).

    Scale shape: one slim (doc_id, n_tokens, h) projection into ONE
    hash exchange on the shard key; position and offset are the same
    per-shard window sort (rank + running sum share it — x35's sharded
    running-sum pattern, never a single-partition global sort). S=16
    here; a 100 TB run sizes S so a shard ~ one output file (S in the
    tens of thousands), which WIDENS the exchange — per-task sort
    stays ~corpus/S and spills graceful."""
    d = T(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_BUCKETS)
    s = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        h.alias("h"),
        (h % _SHARDS).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return s.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("long").alias("pos"),
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long").alias("start_tok"),
    )


# ----------------------------------------------------------------------
# x73: temperature-based mixture sampling (Conneau & Lample 2019 §3.1 /
# mT5, Xue et al. 2021 §3.2): sampling weight q_s ∝ (n_s)^α with
# α = 0.5 flattens the source distribution — low-resource sources are
# up-weighted, dominant ones capped — the standard multilingual /
# multi-source token-budget law. α = 1/2 is chosen deliberately: sqrt
# is IEEE-correctly-rounded on both engines (pow(x, 0.3) is not), so
# the whole quota derivation replays bit-exactly.
# ----------------------------------------------------------------------

_SQL_TEMPERATURE_MIX = """
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM counts),
denom AS (SELECT list_sum(list(sqrt(n) ORDER BY source)) AS dn FROM counts),
quota AS (
  SELECT c.source, c.n, sqrt(c.n) / d.dn AS q,
         CAST(floor((t.nt // 2) * (sqrt(c.n) / d.dn)) AS BIGINT) AS quota
  FROM counts c CROSS JOIN denom d CROSS JOIN tot t
),
ranked AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
  FROM documents d
)
SELECT r.doc_id, r.source, CAST(q.n AS BIGINT) AS n_source,
       ROUND(q.q, 6) AS weight, q.quota, CAST(r.rk AS BIGINT) AS rk,
       r.rk <= q.quota AS sampled
FROM ranked r JOIN quota q USING (source)
"""


@query("x73_temperature_mixture", oracle=_SQL_TEMPERATURE_MIX)
def x73_temperature_mixture(spark, sf_dir):
    """Temperature-flattened source mixture: per-source sampling weight
    q_s = sqrt(n_s) / Σ_t sqrt(n_t), per-source quota = floor(B · q_s)
    for a budget of half the corpus, and a deterministic md5-ordered
    pick of each source's quota (reproducible across partitionings and
    engines — the x42 rule). Output: every document with its source's
    weight/quota, its pick rank, and the sampled flag.

    Determinism: sqrt is correctly rounded (α = 0.5 — the reason this
    operator avoids pow), the weight denominator is an ORDERED fold
    over the per-source sqrt terms (sum order pinned on both engines),
    and the budget·weight product multiplies bit-identical doubles, so
    floor can't flip across engines. Scale shape: the source stats are
    an S-row aggregate broadcast back; the pick is one per-source
    window over the md5 order — the same single-exchange shape as
    x43's stratified cap."""
    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    sn = F.sqrt(F.col("n").cast("double"))
    stats = counts.agg(
        F.sum("n").cast("long").alias("nt"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("source"), sn.alias("s")))),
                lambda e: e["s"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("dn"),
    )
    q = sn / F.col("dn")
    quota = counts.crossJoin(F.broadcast(stats)).select(
        "source",
        F.col("n").cast("long").alias("n_source"),
        F.round(q, 6).alias("weight"),
        F.floor(F.expr("nt div 2").cast("double") * q).cast("long").alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(w).cast("long").alias("rk")
    )
    return ranked.join(F.broadcast(quota), "source").select(
        "doc_id", "source", "n_source", "weight", "quota", "rk",
        (F.col("rk") <= F.col("quota")).alias("sampled"),
    )


# Driver-window policy: the 50-entry scored window and the 100-entry
# registry (2-round rotation) are full this round; x73 ships
# library-gated — the strict local harness (same compare, sf0.01)
# oracles it — and swaps into the registry when a slot opens, exactly
# the x62/x69/x70 path.
# x73_temperature_mixture PROMOTED to the scored registry in round 11 (VERDICT r10
# ask #1): its library-era demote call is retired; the entry takes a
# window slot freed by a long-stable relational demotion.


# ----------------------------------------------------------------------
# x78: source-vs-corpus distribution drift (KL divergence over unigram
# distributions) — the mixing diagnostic behind DoReMi-style reweighting
# (Xie et al. 2023) and domain-shift audits: KL(p_source ‖ p_corpus)
# per source, from exact token counts. A source whose language use
# diverges from the pool gets flagged before it skews the mixture.
# ----------------------------------------------------------------------

_SQL_SOURCE_KL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
corpus AS (SELECT term, COUNT(*) AS ct FROM tok GROUP BY term),
n AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt FROM corpus),
per_src AS (SELECT source, term, COUNT(*) AS cs FROM tok GROUP BY source, term),
n_src AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM per_src GROUP BY source)
SELECT p.source, s.ns AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       ROUND(SUM((p.cs * 1.0 / s.ns)
                 * ln((p.cs * 1.0 / s.ns) / (c.ct * 1.0 / n.nt))), 6) AS kl
FROM per_src p
JOIN n_src s USING (source)
JOIN corpus c USING (term)
CROSS JOIN n
GROUP BY p.source, s.ns
"""


@query("x78_source_kl_drift", oracle=_SQL_SOURCE_KL)
def x78_source_kl_drift(spark, sf_dir):
    """KL(p_source ‖ p_corpus) over unigram distributions, per source —
    every term a source uses also appears in the corpus pool (the
    source IS part of the pool), so the divergence is always finite
    and needs no smoothing.

    Scale shape: two count aggregations (per-(source, term) and
    per-term) + one vocabulary-sized broadcast join back; the KL sum
    is a per-source aggregation over vocab-sized rows. Every
    probability is a division of exact integers; the per-source sum of
    ~V doubles rounds to 6 (noise ~1e-15 vs the 5e-7 quantum)."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("term"))
    corpus = tok.groupBy("term").agg(F.count("*").alias("ct"))
    n = corpus.agg(F.sum("ct").cast("long").alias("nt"))
    per_src = tok.groupBy("source", "term").agg(F.count("*").alias("cs"))
    n_src = per_src.groupBy("source").agg(F.sum("cs").cast("long").alias("ns"))
    ps = F.col("cs") * F.lit(1.0) / F.col("ns")
    pc = F.col("ct") * F.lit(1.0) / F.col("nt")
    return (
        per_src.join(F.broadcast(n_src), "source")
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("source", F.col("ns").alias("n_tokens"))
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum(ps * F.log(ps / pc)), 6).alias("kl"),
        )
        .select("source", "n_tokens", "n_terms", "kl")
    )


# Window and registry are at cap this round; x78 ships library-gated
# like x73/x74/x76/x77.
# x78_source_kl_drift PROMOTED to the scored registry in round 11 (VERDICT r10
# ask #1): its library-era demote call is retired; the entry takes a
# window slot freed by a long-stable relational demotion.


# ----------------------------------------------------------------------
# x85: token-budget quality curriculum — the data-constrained
# selection rule (cf. Muennighoff et al. 2023, "Scaling Data-
# Constrained Language Models": when tokens are the budget, keep the
# highest-quality ones first): rank documents by the corpus unigram-LM
# cross-entropy (x32's signal, lower = better), and select documents
# best-first until a token budget (half the corpus here) is spent.
#
# Scale design: NO global ordered cumsum over the corpus (a
# single-partition window). Instead (1) per-doc scores bucket by their
# rounded value, (2) the running token total lives on the BUCKET
# relation (distinct-score-sized — tiny), (3) only the boundary
# bucket's documents need a per-doc running sum, windowed WITHIN that
# bucket. All arithmetic is exact integers, so both engines select the
# identical set.
# ----------------------------------------------------------------------

_SQL_TOKEN_BUDGET = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
freq AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM freq),
per AS (
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(-SUM(ln(f.cnt * 1.0 / tot.tot)) / COUNT(*), 4) AS xent
    FROM tok t JOIN freq f USING (term) CROSS JOIN tot
    GROUP BY t.doc_id
),
budget AS (SELECT CAST(SUM(n_tokens) // 2 AS BIGINT) AS b FROM per),
buckets AS (
    SELECT xent, CAST(SUM(n_tokens) AS BIGINT) AS btok FROM per GROUP BY xent
),
bcum AS (
    SELECT xent, btok,
           CAST(COALESCE(SUM(btok) OVER (ORDER BY xent
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
    FROM buckets
),
flagged AS (
    SELECT p.doc_id, p.xent, p.n_tokens, b.cum_before, b.btok, g.b AS budget,
           CAST(COALESCE(SUM(p.n_tokens) OVER (PARTITION BY p.xent ORDER BY p.doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS doc_cum
    FROM per p JOIN bcum b USING (xent) CROSS JOIN budget g
)
SELECT doc_id, xent, n_tokens,
       (cum_before + btok <= budget)
       OR (cum_before <= budget AND cum_before + doc_cum <= budget) AS selected
FROM flagged
"""


@query("x85_token_budget_curriculum", oracle=_SQL_TOKEN_BUDGET)
def x85_token_budget_curriculum(spark, sf_dir):
    """Best-quality-first document selection under a token budget
    (half the corpus): documents ordered by x32's unigram cross-entropy
    are taken until the budget is spent — whole score-buckets when they
    fit, a doc_id-ordered prefix of the boundary bucket otherwise.

    Scale shape: the score pass is x32's audited plan; the running
    total is windowed over the BUCKET relation (distinct rounded
    scores — ≪ corpus), and the only per-document window partitions BY
    BUCKET (each partition is one score's docs), so no corpus-sized
    single-partition sort exists anywhere. Every quantity is an exact
    BIGINT, so the selected set is engine-identical."""
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").cast("long").alias("tot"))
    per = (
        tok.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.log(F.col("cnt") * 1.0 / F.col("tot"))) / F.count("*"), 4
            ).alias("xent"),
        )
    )
    per = pin(per)  # feeds budget, buckets, and the final join
    budget = per.agg(F.expr("sum(n_tokens) div 2").cast("long").alias("budget"))
    buckets = per.groupBy("xent").agg(F.sum("n_tokens").cast("long").alias("btok"))
    wb = Window.orderBy("xent").rowsBetween(Window.unboundedPreceding, -1)
    bcum = buckets.select(
        "xent",
        "btok",
        F.coalesce(F.sum("btok").over(wb), F.lit(0)).cast("long").alias("cum_before"),
    )
    wd = (
        Window.partitionBy("xent")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        per.join(F.broadcast(bcum), "xent")
        .crossJoin(F.broadcast(budget))
        .withColumn("doc_cum", F.sum("n_tokens").over(wd).cast("long"))
    )
    sel = (F.col("cum_before") + F.col("btok") <= F.col("budget")) | (
        (F.col("cum_before") <= F.col("budget"))
        & (F.col("cum_before") + F.col("doc_cum") <= F.col("budget"))
    )
    return flagged.select("doc_id", "xent", "n_tokens", sel.alias("selected"))


# ----------------------------------------------------------------------
# x103: per-source quality-threshold calibration — x51's documented
# scale caveat made an operator. x51 buckets by a per-language
# percent_rank window over EVERY document (one window partition per
# language = billions of rows per task at 100 TB); the production shape
# it describes — "first aggregate a distribution per source, then pick
# thresholds from the aggregate" — is implemented here EXACTLY, not
# approximately: the per-doc window moves onto a score HISTOGRAM, so
# the only per-document work is one map-combinable count exchange and
# the window runs over sources × distinct-scores rows (corpus-size-
# independent for bounded score domains). Output: the minimal quality
# score each source must keep to retain ~70 % of its documents, with
# the exact tie split at the threshold (FineWeb/CCNet-style per-source
# calibrated filtering needs kept_at_threshold to subsample ties).
# ----------------------------------------------------------------------
_CAL_KEEP_PERMILLE = 700  # target keep-rate, exact integer arithmetic

_SQL_THRESHOLD_CALIBRATION = f"""
WITH sc AS (
    SELECT source,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS score
    FROM documents
),
hist AS (
    SELECT source, score, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM sc GROUP BY source, score
),
h AS (
    SELECT source, score, cnt,
           CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
           CAST(SUM(cnt) OVER (
               PARTITION BY source ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum
    FROM hist
),
c AS (
    SELECT source, MAX(score) AS threshold_score
    FROM h
    WHERE cum >= (n_docs * {_CAL_KEEP_PERMILLE} + 999) // 1000
    GROUP BY source
)
SELECT h.source,
       h.n_docs,
       (h.n_docs * {_CAL_KEEP_PERMILLE} + 999) // 1000 AS target_kept,
       h.score AS threshold_score,
       h.cum - h.cnt AS kept_above,
       (h.n_docs * {_CAL_KEEP_PERMILLE} + 999) // 1000 - (h.cum - h.cnt)
           AS kept_at_threshold,
       ROUND(CAST((h.n_docs * {_CAL_KEEP_PERMILLE} + 999) // 1000 AS DOUBLE)
             / h.n_docs, 6) AS actual_keep_rate
FROM h JOIN c ON h.source = c.source AND h.score = c.threshold_score
"""


@query("x103_quality_threshold_calibration", oracle=_SQL_THRESHOLD_CALIBRATION)
def x103_quality_threshold_calibration(spark, sf_dir):
    """Per-source quality threshold hitting a 70 % target keep-rate,
    computed EXACTLY from a score histogram: threshold = the highest
    score whose descending cumulative count reaches ceil(0.7·n), plus
    the exact tie split (kept_above strictly better, kept_at_threshold
    to take from the boundary score).

    Scale shape — the answer to x51's documented caveat: the per-doc
    score (distinct-token count) is row-local inside the scan; the only
    full-corpus exchange is one map-side-combinable groupBy(source,
    score) count, after which BOTH windows run over the histogram
    (sources × distinct scores — corpus-size-independent for a bounded
    score domain), never over documents. ceil is exact integer
    arithmetic ((n·700 + 999) DIV 1000); the keep-rate is one double
    division of exact integers — bit-stable on both engines. At 100 TB
    the histogram is kilobytes per source where x51's percent_rank
    window is billions of rows in one task."""
    d = T(spark, sf_dir, "documents")
    score = F.size(F.array_distinct(F.split(F.col("text"), " "))).cast("long")
    hist = (
        d.select("source", score.alias("score"))
        .groupBy("source", "score")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_tot = Window.partitionBy("source")
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    h = hist.select(
        "source",
        "score",
        "cnt",
        F.sum("cnt").over(w_tot).cast("long").alias("n_docs"),
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
    )
    k = F.expr(f"(n_docs * {_CAL_KEEP_PERMILLE} + 999) DIV 1000")
    # first crossing = the highest score whose cum reaches the target;
    # (source, score) rows are unique, so the struct max is a
    # deterministic argmax by score
    crossing = (
        h.filter(F.col("cum") >= k)
        .groupBy("source")
        .agg(F.max(F.struct("score", "cnt", "n_docs", "cum")).alias("s"))
    )
    k_out = F.expr(f"(s.n_docs * {_CAL_KEEP_PERMILLE} + 999) DIV 1000")
    return crossing.select(
        "source",
        F.col("s.n_docs").alias("n_docs"),
        k_out.alias("target_kept"),
        F.col("s.score").alias("threshold_score"),
        (F.col("s.cum") - F.col("s.cnt")).alias("kept_above"),
        (k_out - (F.col("s.cum") - F.col("s.cnt"))).alias("kept_at_threshold"),
        F.round(k_out.cast("double") / F.col("s.n_docs"), 6).alias(
            "actual_keep_rate"
        ),
    )


# Round 10: promoted into the driver registry (window rotation).

# Round-13 rotation (VERDICT r12 ask #1): x42 hash-sample yields its
# registry slot to the promoted x99/x100 — the deterministic-sampling
# operator class stays driver-evidenced by x43 (stratified cap), x44
# (mixture resample), x48 (split assign), x59 (shard assign) and x73
# (temperature mixture); x42 remains full oracle-gated through the
# strict local harness (tests/test_relational_oracle.py iterates the
# library too).
# x103 PROMOTED into the scored registry at the round-14 rotation
# (VERDICT r13 ask #1); x42 stays library-gated (demoted round 13 —
# the hash-sampling class is driver-scored via x43/x44/x48/x59/x73).
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote13  # noqa: E402

_demote13("x42_hash_sample")
del _demote13


# Round-17 demotions (sampling.py's share of the 13 slots freed for
# the VERDICT r16 ask #1 promotions): x35 token packing (token-budget
# class driver-evidenced by x85 token-budget curriculum, r16 row),
# x73 temperature mixture (mixture class covered by x43 stratified cap
# + x44 mixture resample, both staying scored). Both remain
# strict-oracle gated by the local harness.
from advent_of_code_flink_paimon_spark.operators.registry import demote as _demote_r17c  # noqa: E402

_demote_r17c("x35_token_pack")
_demote_r17c("x73_temperature_mixture")
del _demote_r17c
