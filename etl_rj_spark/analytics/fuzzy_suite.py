"""Oracle-checked queries for fuzzy name matching (operators/fuzzy.py)
— the scale generalization of the reference's exact-match dim lookup,
whose unmapped-client drop (ventas_totales.py:154-158, cartera.py:126)
is the motivating defect.

Misspellings are synthesized in-query (delete one character at a
custkey-derived position from the cleaned name) so both engines see
identical inputs and every query has a known dist-1 true match.
Levenshtein is classic edit distance in both engines; inputs are
lowercased first, so case conventions can't diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import _q, _t
from etl_rj_spark.functions.strings import clean_customer_name
from etl_rj_spark.operators.fuzzy import fuzzy_best_match, fuzzy_dim_lookup

# DuckDB fragment: clean_customer_name (X3) on c_name.
_CLEAN = (
    r"trim(regexp_replace(regexp_replace(lower(trim(c_name)), "
    r"'[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"
)
# delete one char at position (c_custkey % 10) + 2 of the cleaned name
_PERTURB = "substr(cn, 1, c_custkey % 10 + 1) || substr(cn, c_custkey % 10 + 3)"


@_q(
    "fuzzy_name_best_match",
    f"""
    WITH base AS (SELECT c_custkey, {_CLEAN} AS cn FROM customer),
    q AS (
      SELECT c_custkey AS q_custkey, {_PERTURB} AS qn
      FROM base WHERE c_custkey % 7 = 0
    ),
    cand AS (
      SELECT q_custkey, b.c_custkey AS matched_c_custkey,
             levenshtein(qn, b.cn) AS dist
      FROM q CROSS JOIN base b
      WHERE levenshtein(qn, b.cn) <= 2
    )
    SELECT q_custkey, matched_c_custkey, dist
    FROM (
      SELECT q_custkey, matched_c_custkey, dist,
             row_number() OVER (PARTITION BY q_custkey
                                ORDER BY dist, matched_c_custkey) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
    tags=("fuzzy-match", "J2-generalized"),
)
def fuzzy_name_best_match(spark, sf_dir):
    """Best levenshtein match (≤ 2 edits) of misspelled customer names
    against the customer dimension; deterministic min-(dist, id) pick."""
    c = _t(spark, sf_dir, "customer")
    base = c.select("c_custkey", clean_customer_name("c_name").alias("cn"))
    queries = base.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("q_custkey"), F.expr(_PERTURB).alias("qn")
    )
    return fuzzy_best_match(
        queries, c, "q_custkey", "qn", "c_custkey", "c_name", max_dist=2
    )


@_q(
    "fuzzy_rescued_lookup",
    f"""
    WITH base AS (SELECT c_custkey, {_CLEAN} AS cn FROM customer),
    f AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN {_PERTURB} ELSE cn END AS fn
      FROM base
    ),
    exact AS (
      SELECT f.c_custkey, b.c_custkey AS matched_c_custkey,
             0 AS dist, 'exact' AS tier
      FROM f JOIN base b ON f.fn = b.cn
    ),
    -- guard the NOT IN: one NULL in the subquery list makes NOT IN
    -- three-valued-NULL for EVERY row (the whole fuzzy tier silently
    -- vanished on a corpus with one NULL name); NULL fnames carry no
    -- name to match, like the engine (r10 nullmix parity)
    um AS (SELECT c_custkey, fn FROM f
           WHERE fn IS NOT NULL
             AND fn NOT IN (SELECT cn FROM base WHERE cn IS NOT NULL)),
    fz AS (
      SELECT c_custkey, matched_c_custkey, dist, 'fuzzy' AS tier
      FROM (
        SELECT um.c_custkey, b.c_custkey AS matched_c_custkey,
               levenshtein(um.fn, b.cn) AS dist,
               row_number() OVER (PARTITION BY um.c_custkey
                                  ORDER BY levenshtein(um.fn, b.cn),
                                           b.c_custkey) AS rn
        FROM um CROSS JOIN base b
        WHERE levenshtein(um.fn, b.cn) <= 2
      ) WHERE rn = 1
    )
    -- LEFT JOIN back onto the fact feed: the lookup drops NO rows —
    -- a fact with no name (or no match) survives with NULL match
    -- columns, exactly like the engine (r10 nullmix parity)
    SELECT f.c_custkey, m.matched_c_custkey, m.dist, m.tier
    FROM f LEFT JOIN (SELECT * FROM exact UNION ALL SELECT * FROM fz) m
      ON f.c_custkey = m.c_custkey
    """,
    tags=("fuzzy-match", "J1-generalized"),
)
def fuzzy_rescued_lookup(spark, sf_dir):
    """Tiered lookup over a fact feed where every third name carries a
    one-char deletion (wrapped in case/whitespace dirt the cleaner
    strips): exact tier for clean names, fuzzy tier rescues the
    misspelled — zero rows silently dropped."""
    c = _t(spark, sf_dir, "customer")
    base = c.select("c_custkey", clean_customer_name("c_name").alias("cn"))
    facts = base.select(
        "c_custkey",
        F.concat(
            F.lit("  "),
            F.upper(
                F.when(F.col("c_custkey") % 3 == 0, F.expr(_PERTURB)).otherwise(
                    F.col("cn")
                )
            ),
            F.lit(" !"),
        ).alias("fname"),
    )
    out = fuzzy_dim_lookup(facts, c, "fname", "c_custkey", "c_name", max_dist=2)
    return out.select("c_custkey", "matched_c_custkey", "dist", "tier")


@_q(
    "fuzzy_best_match_blocked",
    f"""
    WITH base AS (SELECT c_custkey, {_CLEAN} AS cn FROM customer),
    q AS (
      SELECT c_custkey AS q_custkey,
             substr(cn, 1, c_custkey % 5 + 2) || 'q' || substr(cn, c_custkey % 5 + 4) AS qn
      FROM base WHERE c_custkey % 7 = 0
    ),
    cand AS (
      SELECT q_custkey, b.c_custkey AS matched_c_custkey,
             levenshtein(qn, b.cn) AS dist
      FROM q JOIN base b
        ON substr(qn, length(qn) - 3, 4) = substr(b.cn, length(b.cn) - 3, 4)
      WHERE levenshtein(qn, b.cn) <= 2
    )
    SELECT q_custkey, matched_c_custkey, dist
    FROM (
      SELECT q_custkey, matched_c_custkey, dist,
             row_number() OVER (PARTITION BY q_custkey
                                ORDER BY dist, matched_c_custkey) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
    tags=("fuzzy-match", "J2-generalized", "scale-path"),
)
def fuzzy_best_match_blocked(spark, sf_dir):
    """The SCALE path for fuzzy matching — key blocking via
    ``block_key``: candidates must share a blocking key, turning the
    O(Q×D) cross join (the ×10 sweep measured the brute-force twin at
    3.2e9 levenshteins) into an equi-join with per-block candidate
    lists. The key must fit the DATA and the ERROR MODEL: TPC-H's
    serial names all share one 2-char prefix, so prefix blocking is
    degenerate here (zero pruning — measured, not assumed); the last-4
    digit suffix is ~unique per base name, and this query's error
    model (a substitution in the alphabetic head, position custkey%5+3)
    never touches it — so the suffix key prunes ~10⁴× with zero recall
    loss. Errors that CAN hit the key need multi-pass blocking with
    complementary keys (prefix pass + suffix pass), the standard
    record-linkage posture. The oracle replicates the same key, so the
    driver pins blocked semantics exactly."""
    c = _t(spark, sf_dir, "customer")
    base = c.select("c_custkey", clean_customer_name("c_name").alias("cn"))
    queries = base.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("q_custkey"),
        F.expr(
            "substr(cn, 1, c_custkey % 5 + 2) || 'q' || substr(cn, c_custkey % 5 + 4)"
        ).alias("qn"),
    )
    return fuzzy_best_match(
        queries, c, "q_custkey", "qn", "c_custkey", "c_name",
        max_dist=2,
        block_key=lambda n: F.substring(n, -4, 4),
    )


# shared fragments for the multipass query: substitution at a
# custkey-derived DIGIT position of the serial tail, and the two
# interleaved digit keys (even / odd offsets of the last 9 chars) —
# one substitution corrupts exactly one of them, never both.
_PERTURB_DIGIT = (
    "substr(cn, 1, length(cn) - (c_custkey % 9) - 1) || 'x' || "
    "substr(cn, length(cn) - (c_custkey % 9) + 1)"
)


def _digit_key_sql(col: str, offsets) -> str:
    return " || ".join(f"substr({col}, length({col}) - {8 - o}, 1)" for o in offsets)


_EVEN = (0, 2, 4, 6, 8)
_ODD = (1, 3, 5, 7)


@_q(
    "fuzzy_multipass_rescue",
    f"""
    WITH base AS (SELECT c_custkey, {_CLEAN} AS cn FROM customer),
    q AS (
      SELECT c_custkey AS q_custkey, {_PERTURB_DIGIT} AS qn
      FROM base WHERE c_custkey % 7 = 0
    ),
    cand AS (
      -- UNION of two hash-joinable equi-joins, NOT an OR join (an OR
      -- of equalities degrades to a nested loop: 192 s vs ~4 s at x10)
      SELECT q_custkey, qn, b.c_custkey AS matched_c_custkey, b.cn
      FROM q JOIN base b
        ON {_digit_key_sql('qn', _EVEN)} = {_digit_key_sql('b.cn', _EVEN)}
      UNION
      SELECT q_custkey, qn, b.c_custkey AS matched_c_custkey, b.cn
      FROM q JOIN base b
        ON {_digit_key_sql('qn', _ODD)} = {_digit_key_sql('b.cn', _ODD)}
    ),
    scored AS (
      SELECT q_custkey, matched_c_custkey, levenshtein(qn, cn) AS dist
      FROM cand WHERE levenshtein(qn, cn) <= 2
    )
    SELECT q_custkey, matched_c_custkey, dist
    FROM (
      SELECT q_custkey, matched_c_custkey, dist,
             row_number() OVER (PARTITION BY q_custkey
                                ORDER BY dist, matched_c_custkey) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
    tags=("fuzzy-match", "J2-generalized", "scale-path", "multi-pass"),
)
def fuzzy_multipass_rescue(spark, sf_dir):
    """MULTI-PASS blocking — the posture for errors that CAN corrupt a
    block key: the error model substitutes one DIGIT of the serial
    tail (position custkey%9 from the end), which any single
    fixed-window key may sit on. Two interleaved keys — the even- and
    odd-offset characters of the last 9 — partition the tail so one
    substitution corrupts exactly one key; the union of both passes
    therefore has 100 % recall BY CONSTRUCTION while each pass prunes
    on ~half the digit entropy. Every query finds its original at
    dist 1 (ties on same-position digit neighbors break on min id,
    identically in both engines). The oracle replicates the same two
    keys via an OR join, so the driver pins multipass semantics
    exactly."""
    from etl_rj_spark.operators.fuzzy import fuzzy_best_match_multipass

    c = _t(spark, sf_dir, "customer")
    base = c.select("c_custkey", clean_customer_name("c_name").alias("cn"))
    queries = base.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("q_custkey"), F.expr(_PERTURB_DIGIT).alias("qn")
    )

    def key(offsets):
        return lambda n: F.concat(*[F.substring(n, -(9 - o), 1) for o in offsets])

    return fuzzy_best_match_multipass(
        queries, c, "q_custkey", "qn", "c_custkey", "c_name",
        block_keys=[key(_EVEN), key(_ODD)], max_dist=2,
    )
