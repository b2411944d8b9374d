"""Corpus retrieval: lexical keyword search and hybrid rank fusion.

The LLM-pipeline counterpart of a search engine's serving path, used
for corpus exploration, eval-set construction, and retrieval-augmented
sampling: a lexical TF-IDF scorer (the exact-integer cousin of BM25)
and reciprocal-rank fusion (RRF) to combine it with a semantic
(embedding) ranking — the standard hybrid-retrieval recipe.

Cross-engine determinism contract (the module's shared rule with
unigram_rarity_score and tfidf_top_terms): every score is EXACT INT64
— IDF is the scaled-integer inverse document frequency
``(N·10⁶) div df`` instead of ``ln(N/df)`` (monotone, so every
ranking decision a log-space scorer would make is preserved), and RRF
is ``Σ 10⁹ div (k₀ + rank)`` instead of ``Σ 1/(k₀+rank)`` — so a SQL
oracle replays selection AND order bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_rj_spark.operators.text_analysis import normalized_text, whitespace_tokens
from etl_rj_spark.operators.windows import ranked_topk

#: RRF's smoothing constant — the value from the original Cormack et
#: al. TREC paper, which virtually every implementation defaults to.
RRF_K = 60

#: Integer scale for the reciprocal: 1e9 div (k0+rank) keeps ~7
#: significant digits at rank ≤ 1000 — far beyond where rank
#: differences matter — while Σ over any realistic list count stays
#: orders of magnitude under int64.
_RRF_SCALE = 1_000_000_000


def keyword_search_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Lexical top-k: score every document by
    ``Σ_term tf(term, doc) · idf_ppm(term)`` over the normalized
    whitespace tokens, where ``idf_ppm = (N·10⁶) div df`` (N = corpus
    size, df = documents containing the term) — rare terms dominate,
    exactly as ln-IDF would rank. Returns (id, score, rank 1..k),
    rank ties broken by id.

    Scale: the doc side explodes ONLY tokens matching the query terms
    (an ``isin`` filter inside the scan stage — the corpus never
    materializes its full token stream), df comes from one
    map-side-combinable aggregate over that filtered stream, and the
    per-doc score is a second aggregate keyed by (doc, term) → (doc).
    The corpus size N stays IN the lazy plan (a broadcast 1-row
    aggregate — no eager count at build time, and it can never go
    stale against the input). The final ranking is a distributed
    top-k (``ranked_topk``: per-partition heaps + a bounded-by-k rank
    stamp) — with a common query term over 100 TB the match set is
    millions of rows, and a global row_number window would pull every
    one of them through a single task; this never does.
    """
    terms = [t.lower() for t in query_terms]
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(whitespace_tokens(normalized_text(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(terms))
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        tf.groupBy("term")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .join(F.broadcast(n))
        .select(
            "term",
            F.expr("(CAST(__n AS BIGINT) * 1000000) div df").alias("idf_ppm"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("idf_ppm")).alias("score"))
    )
    return ranked_topk(
        scored, [(F.col("score"), False), (F.col(id_col), True)], k
    ).select(id_col, "score", "rank")


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 10,
    k0: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of any number of (id, rank) lists:
    ``score(id) = Σ_lists 10⁹ div (k0 + rank)`` (scaled-integer RRF),
    fused top-k by score desc, id-tiebreak. An id absent from a list
    simply contributes nothing for it — RRF's defining robustness: no
    score calibration between heterogeneous retrievers, only ranks.
    The fused ranking uses the same distributed top-k as
    ``keyword_search_topk`` (no unpartitioned window — the candidate
    union can be arbitrarily large when the input lists are deep).
    """
    contribs = [
        r.select(
            F.col(id_col),
            F.expr(f"CAST({_RRF_SCALE} AS BIGINT) div ({int(k0)} + {rank_col})").alias(
                "__c"
            ),
        )
        for r in rankings
    ]
    all_ = contribs[0]
    for c in contribs[1:]:
        all_ = all_.unionByName(c)
    fused = all_.groupBy(id_col).agg(F.sum("__c").alias("rrf_score"))
    return ranked_topk(
        fused, [(F.col("rrf_score"), False), (F.col(id_col), True)], k
    ).select(id_col, "rrf_score", "rank")


#: BM25 constants as exact rationals: k1 = 6/5 (1.2), b = 3/4 (0.75).
#: With these, the per-term denominator clears to pure integers (see
#: bm25_search_topk) — no float ever enters the score.
_BM25_K1_NUM, _BM25_K1_DEN = 6, 5
_BM25_B_NUM, _BM25_B_DEN = 3, 4


def bm25_search_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k with EXACT INTEGER scoring: with k1 = 6/5 and
    b = 3/4 the textbook per-term score

        idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

    clears (multiply through by 20·avgdl) to

        (idf_ppm · tf · 44 · avgdl) div (20·tf·avgdl + 6·avgdl + 18·dl)

    — every quantity an int64, every division a nonneg integer div, so
    selection AND order replay bit-for-bit on any engine (float BM25
    scores differ in the last ulp across libm's and tie-break
    differently). ``idf_ppm = (N·10⁶) div df`` (the same monotone
    integer IDF as ``keyword_search_topk``); ``avgdl = Σdl div N``
    (floor — part of the contract). Saturation and length
    normalization behave exactly as textbook BM25 at these constants.

    Scale shape: doc lengths come from one scan-stage ``size()``
    aggregate rider; only query-term tokens explode; df/score are two
    map-side-combinable aggregates; the final ranking is the
    distributed ``ranked_topk``. Returns (id, score, rank).
    """
    terms = [t.lower() for t in query_terms]
    # ROW-GRAIN document identity (r11 dupstorm-regime contract): each
    # input ROW is one document. Under a duplicated id (a re-ingested
    # shard) the old id-keyed grouping merged the copies' tf while N
    # still counted them separately — an incoherent corpus model whose
    # scores matched nothing. __rid is plan-internal only (never
    # emitted), so monotonically_increasing_id's run-to-run instability
    # cannot leak into results; on unique ids every aggregate below is
    # value-identical to the old id-keyed form.
    base = docs.select(
        F.col(id_col),
        whitespace_tokens(normalized_text(text_col)).alias("__toks"),
    ).select(
        F.monotonically_increasing_id().alias("__rid"),
        F.col(id_col),
        "__toks",
        F.size("__toks").alias("__dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sumdl"),
    ).select("__n", F.expr("__sumdl div __n").alias("__avgdl"))
    toks = base.select(
        "__rid", F.col(id_col), "__dl", F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy("__rid", id_col, "__dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count_distinct(F.col("__rid")).alias("df"))
        .join(F.broadcast(stats))
        .select(
            "term",
            F.expr("(CAST(__n AS BIGINT) * 1000000) div df").alias("idf_ppm"),
            "__avgdl",
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(
            "__rid",
            F.col(id_col),
            F.expr(
                "(idf_ppm * tf * 44 * __avgdl)"
                " div (20 * tf * __avgdl + 6 * __avgdl + 18 * __dl)"
            ).alias("__term_score"),
        )
        .groupBy("__rid", id_col)
        .agg(F.sum("__term_score").alias("score"))
    )
    return ranked_topk(
        scored, [(F.col("score"), False), (F.col(id_col), True)], k
    ).select(id_col, "score", "rank")


def phrase_match_docs(
    docs: DataFrame,
    phrase_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over the positional index: documents where
    ``phrase_terms`` occur as ADJACENT tokens (in order), with the
    occurrence count — the positional-index query a bag-of-words
    scorer cannot answer. Each term's positions explode ONLY for
    matching tokens (isin inside the scan stage); adjacency is an
    equi-join on (doc, position+offset) — hash-partitionable, never a
    string re-scan. Returns (id, n_occurrences).
    """
    terms = [t.lower() for t in phrase_terms]
    if len(terms) < 2:
        raise ValueError("phrase needs at least two terms")
    pos = docs.select(
        F.col(id_col),
        F.posexplode(whitespace_tokens(normalized_text(text_col))).alias(
            "__p", "__term"
        ),
    ).filter(F.col("__term").isin(terms))
    out = pos.filter(F.col("__term") == terms[0]).select(
        F.col(id_col), F.col("__p").alias("__start")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("__term") == F.lit(t)).select(
            F.col(id_col), (F.col("__p") - i).alias("__start")
        )
        out = out.join(nxt, [id_col, "__start"])
    return out.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_occurrences"))
