"""Deduplication operators for document corpora: exact (hash-groupBy),
MinHash+LSH near-dup, SimHash, and n-gram-Jaccard (inverted index).

Generalizes the reference's key-based incremental dedup (J4/J5,
ventas_totales.py:205-209) and its exact-match-name weakness
(the unmapped-client warnings) to content-level near-duplicate
detection at corpus scale.

Scale design:
- Exact dedup groups on md5(normalized text) — a 32-byte shuffle key
  instead of the full document.
- MinHash+LSH shuffles only (doc_id, band_bucket) pairs; the
  candidate self-join keys on (band, bucket), so true near-dups
  co-locate and the join stays sparse. Signatures and shingle hashing
  are pure expressions (no UDF, no explode of shingles).
- The n-gram inverted index is exact (recall 1 for any τ > 0) but can
  blow up on ubiquitous shingles; ``max_posting_len`` caps posting
  lists for the at-scale variant (capped → approximate, flagged).
- Shingle SETS hash with md5 on oracle-checked paths (reproducible in
  any engine — the DuckDB oracles recompute identical sets and
  Jaccards) and xxhash64 on the at-scale fast paths. MinHash
  SIGNATURES use per-coordinate xxhash64 mixing (``MINHASH_FAMILY``)
  — oracles never recompute signatures, only the pair sets they
  produce, so the family is an internal contract stamped into
  persisted indexes and checked at probe time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_rj_spark.functions.exprs import bind_once
from etl_rj_spark.operators.text_analysis import (
    char_shingles,
    normalized_text,
    shingle_hash,
    whitespace_tokens,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_mapping(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, canonical_id) mapping: canonical = MIN(id) among rows whose
    normalized text hashes equal. ONE shuffle on the 32-hex key — the
    group minimum is a window aggregate over the same partitioning the
    rows already need, not a separate groupBy re-joined back (which
    costs a second shuffle plus the join)."""
    from pyspark.sql import Window

    keyed = df.select(F.col(id_col), F.md5(normalized_text(text_col)).alias("__key"))
    w = Window.partitionBy("__key")
    return keyed.select(
        id_col, F.min(id_col).over(w).alias("canonical_id")
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-content group."""
    mapping = exact_dedup_mapping(df, id_col, text_col)
    keep = mapping.filter(F.col(id_col) == F.col("canonical_id")).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(c: Column | str, shingle_k: int, token_ngrams_n: int | None) -> Column:
    """Shingle set: k-char shingles (default, fine-grained) or token
    n-grams (``token_ngrams_n``) — ~5× fewer shingles per document,
    the standard configuration for corpus-scale minhash."""
    if token_ngrams_n is not None:
        return token_ngrams(c, token_ngrams_n)
    return char_shingles(normalized_text(c), shingle_k)


def shingle_hashes(
    c: Column | str,
    shingle_k: int = 5,
    token_ngrams_n: int | None = None,
    fast: bool = False,
) -> Column:
    """28-bit hashes of the document's shingles. Materialize this as
    its own column before fanning out to the hash family — as a
    subexpression of each of the num_hashes lambdas it would be
    recomputed (md5 per shingle) once per hash function.

    ``fast=True`` swaps the engine-portable md5 hash for xxhash64
    (one JVM intrinsic vs md5 + hex parse per shingle) — use it on
    rows-only/at-scale paths; oracle-checked paths keep md5, the
    cross-engine contract."""
    if fast and token_ngrams_n is not None:
        return _fast_token_ngram_hashes(c, token_ngrams_n)
    sh = _shingles(c, shingle_k, token_ngrams_n)
    if fast:
        return F.transform(sh, lambda x: F.pmod(F.xxhash64(x), F.lit(1 << 28)))
    return F.transform(sh, shingle_hash)


def _fast_token_ngram_hashes(c: Column | str, n: int) -> Column:
    """Token-n-gram hashes WITHOUT building n-gram strings: hash each
    token once (xxhash64 → 28 bits), then combine the n consecutive
    token hashes arithmetically via zip_with over shifted slices —
    ~25% faster than materializing the joined-string grams and hashing
    those (measured at 125k docs), because the per-gram work is three
    int ops instead of a string build + hash. Same 28-bit output
    domain as the string path; different hash values, so ONLY for
    rows-only/bench paths (the oracle contract pins the md5 string
    hashes). pmod after every combine keeps the fold in int64."""
    from etl_rj_spark.operators.text_analysis import normalized_text, whitespace_tokens

    col = c if isinstance(c, Column) else F.col(c)
    toks = whitespace_tokens(normalized_text(col))
    th0 = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 28)))

    # token-hash array bound once (r16, guide §1.2): inlined, the full
    # normalize+split+hash expression appeared in every slice AND every
    # size() — six evaluations per row (3.7× measured at sf0.1), and
    # codegen CSE cannot merge them (each occurrence binds fresh
    # lambda-variable expr-ids)
    def combine(th: Column) -> Column:
        m = F.greatest(F.size(th) - (n - 1), F.lit(0))
        acc = F.slice(th, 1, m)
        for j in range(2, n + 1):
            acc = F.zip_with(
                acc, F.slice(th, j, m), lambda a, b: F.pmod(a * 8191 + b, F.lit(1 << 28))
            )
        return acc

    return bind_once(th0, combine)


def minhash_signature_from_hashes(hashes: Column | str, num_hashes: int = 32) -> Column:
    """num_hashes-wide MinHash signature from precomputed shingle
    hashes. h_i(x) = xxhash64(i, x) — an independently mixed 64-bit
    coordinate per hash index, exact int64 arithmetic.

    (History: the previous affine family ((37+2i)·x + (101+i)) mod P
    had CORRELATED minima over the 28-bit shingle-hash domain — small
    consecutive multipliers made many coordinates elect the same
    argmin shingle, so per-coordinate agreement ran well below the
    true Jaccard and ~0.16 % of jaccard≥0.95 pairs missed every LSH
    band at 16 hashes. Caught by minhash_lsh_pairs_scaled's in-query
    within-base recall contract; a full-width mix per coordinate
    restores the Pr[agree] = J(A,B) minhash property.)

    An EMPTY or NULL hash set yields a NULL signature (r15; formerly an
    array of num_hashes NULL minima — same no-signal meaning, one cell).
    The ``size(h) > 0`` guard doubles as a structural perf barrier: it
    makes this expression reference its input twice, which stops
    CollapseProject from inlining a caller's shingle-hash PROJECTION
    into the signature lambdas — inlined, the whole hashing pass
    re-evaluates once per outer sequence element, i.e. num_hashes× per
    row (measured 47 s vs 2 s at the 312k-doc scaled corpus). Callers
    still should project the hash column in their own select (see
    shingle_hashes docstring); predicate pushdown can additionally copy
    that projection into a pre-filter, which costs one extra hash pass,
    never num_hashes."""
    h = F.col(hashes) if isinstance(hashes, str) else hashes
    return F.when(
        F.size(h) > 0,
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(h, lambda x: F.xxhash64(i, x))),
        ),
    )


def minhash_signature(c: Column | str, shingle_k: int = 5, num_hashes: int = 32) -> Column:
    """Convenience single-expression form (small inputs / tests); for
    bulk use compute ``shingle_hashes`` as a column first."""
    return minhash_signature_from_hashes(shingle_hashes(c, shingle_k), num_hashes)


def lsh_band_buckets(sig_col: Column | str, bands: int, rows_per_band: int) -> Column:
    """Array of (band, bucket) structs: bucket = xxhash64 of the band's
    signature slice. Equal slices → equal buckets, which is the only
    property LSH banding needs; a 64-bit structural hash replaces the
    previous md5-of-joined-string (no per-band string build, an 8-byte
    long through the shuffle instead of a 32-char hex string, and a
    much smaller codegen footprint). A cross-slice collision (~2^-64)
    could only ADD a candidate pair, which the exact-Jaccard
    verification then prunes — output pairs are unaffected."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    entries = []
    for b in range(bands):
        sl = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        entries.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(sl).alias("bucket"))
        )
    return F.array(*entries)


def _check_bands(num_hashes: int, bands: int) -> None:
    """bands must divide num_hashes (r9 review fix): bands > num_hashes
    makes every band slice EMPTY (rows_per_band = 0), so every document
    shares every bucket — a full quadratic cross-product; a
    non-divisible split silently discards the trailing signature
    coordinates, leaving recall quietly below the configured design."""
    if not (0 < bands <= num_hashes and num_hashes % bands == 0):
        raise ValueError(
            f"bands={bands} must be a positive divisor of "
            f"num_hashes={num_hashes}"
        )


def _jaccard_select(withsets: DataFrame) -> DataFrame:
    """(id_a, id_b, jaccard) from a frame carrying ``__set_a``/
    ``__set_b`` — the ONE exact-verify expression every near-dup path
    shares (one place to fix, five consumers). A zero-union pair (both
    documents too short to shingle) has no defined Jaccard → NULL via
    try_divide, which any ``>= τ`` filter drops — never an ANSI
    divide-by-zero."""
    # NOT bind_once'd (r16, measured): the duplicated array_intersect
    # occurrences here are lambda-free and structurally identical, so
    # codegen subexpression elimination already evaluates the intersect
    # once per operator site — and a bind_once wrapper (a higher-order
    # transform, CodegenFallback) measured SLOWER (3.57 s vs 3.26 s on
    # the scaled verify) than letting CSE handle it. bind_once is for
    # duplicates that contain lambda variables, which CSE cannot merge.
    inter = F.size(F.array_intersect("__set_a", "__set_b")).cast("double")
    union = (F.size("__set_a") + F.size("__set_b")).cast("double") - inter
    return withsets.select(
        "id_a", "id_b", F.try_divide(inter, union).alias("jaccard")
    )


def _jaccard_on_sets(
    pairs: DataFrame, sets: DataFrame, threshold: float | None = None
) -> DataFrame:
    """Join (id_a, id_b) pairs to an (id, __set) table on both sides
    and emit the exact Jaccard (see :func:`_jaccard_select`).

    ``threshold`` (r16, guide §2.3/§3.2): pass it when (and ONLY when)
    the caller filters ``jaccard >= threshold`` downstream — the size
    bound it implies (j ≥ τ ⟹ min(|A|,|B|) ≥ τ·max(|A|,|B|), since
    |A∩B| ≤ min and |A∪B| ≥ max) then prunes candidate pairs BEFORE the
    intersect is computed, and Catalyst pushes the cheap size predicate
    into the verify join's condition ahead of the substituted jaccard
    expression (measured −18 % on the scaled verify stage; 2.26 M →
    1.84 M intersects). The τ−1e-9 slack keeps double rounding from
    ever dropping a boundary pair: a too-LOOSE bound only costs work,
    never a row, so composed with the caller's exact ``>= threshold``
    filter the output is unchanged.

    Distinct-pairs contract (r11 dupstorm-regime fix): a corpus whose
    ids are DUPLICATED (a re-ingested shard — routine at 100 TB) fans
    this join out multiplicity² per pair; the result dedup collapses
    that back to one row per (id_a, id_b, jaccard). Deliberately
    placed on the RESULT — near-dup-pair-sized, KBs — never on the
    corpus-sized ``sets`` frame, which would add a full-corpus shuffle
    to every dedup path. Same-id rows with DIFFERENT sets surface as
    two jaccard values for the pair (ambiguity kept visible, not
    hidden)."""
    sa = sets.toDF("id_a", "__set_a")
    sb = sets.toDF("id_b", "__set_b")
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    if threshold is not None:
        joined = joined.filter(
            F.least(F.size("__set_a"), F.size("__set_b")).cast("double")
            >= F.greatest(F.size("__set_a"), F.size("__set_b")).cast("double")
            * F.lit(threshold - 1e-9)
        )
    return _jaccard_select(joined).distinct()


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    token_ngrams_n: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH
    band bucket. The band table is materialized once (lazy
    localCheckpoint — it feeds both sides of the self-join, and
    signatures are the expensive part; r15: ``persist`` would register
    in the session CacheManager and stay pinned until an explicit
    unpersist/clearCache, so repeated library calls accumulated cached
    band tables for the session's lifetime — checkpoint blocks are
    instead freed by the ContextCleaner once the result plan becomes
    unreachable). Documents with EMPTY shingle sets (shorter than the
    shingle window) are excluded: they have no similarity signal, and
    their all-NULL signatures would otherwise collide in every band
    and cross-product quadratically (r9 review fix)."""
    _check_bands(num_hashes, bands)
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col), shingle_hashes(text_col, shingle_k, token_ngrams_n).alias("__h")
    ).filter(F.size("__h") > 0).select(
        F.col(id_col),
        minhash_signature_from_hashes("__h", num_hashes).alias("__sig"),
    )
    exploded = sig.select(
        id_col, F.explode(lsh_band_buckets("__sig", bands, rows_per_band)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket").localCheckpoint(eager=False)
    a = exploded.toDF("id_a", "band", "bucket")
    b = exploded.toDF("id_b", "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    hashed_sets: bool = False,
    token_ngrams_n: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Attach exact shingle-set Jaccard to (id_a, id_b) pairs.

    ``threshold`` is the pass-through to :func:`_jaccard_on_sets`'s
    size-bound prune — set it ONLY when you will filter
    ``jaccard >= threshold`` on the result (below-bound pairs are
    dropped before the intersect instead of after).

    ``hashed_sets=True`` intersects 28-bit shingle-hash sets instead of
    string sets — ~10× cheaper per pair (int equality, int arrays
    through the shuffle) at the cost of a ~1e-4-per-doc hash-collision
    perturbation of the Jaccard value. Use it at corpus scale; keep
    string sets where bit-exact Jaccard is the contract."""
    shingle_col = (
        F.array_distinct(shingle_hashes(text_col, shingle_k, token_ngrams_n))
        if hashed_sets
        else F.array_distinct(_shingles(text_col, shingle_k, token_ngrams_n))
    )
    sets = df.select(F.col(id_col), shingle_col.alias("__set"))
    return _jaccard_on_sets(pairs, sets, threshold)


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    hashed_sets: bool = False,
    token_ngrams_n: int | None = None,
    fast_hash: bool = False,
    shingle_hashes_df: DataFrame | None = None,
    max_bucket_len: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (RAW all-pairs semantics): LSH candidates,
    then exact-Jaccard filter at ``threshold``. Probabilistic recall
    (tune bands/rows to τ); precision exact. ``hashed_sets``/
    ``token_ngrams_n`` → the cheap at-scale configuration (see
    jaccard_on_pairs/_shingles).

    Prefer :func:`near_dup_pairs` (the storm-safe DEFAULT entry point,
    r14): on a corpus carrying an exact-duplicate storm this raw
    operator's pair OUTPUT is inherently quadratic — C(m,2) for an
    m-member identical-content group (the r13 hotkey tree: 7.7e9
    pairs, untimeable) — while the default collapses such groups to
    linear star edges before LSH ever runs.

    ``max_bucket_len`` is the hashed path's quadratic-blow-up guard —
    the LSH twin of the n-gram index's posting-list cap: a degenerate
    (band, bucket) holding m docs emits C(m,2) candidate pairs, so a
    boilerplate-heavy corpus slice (m ~ 10⁶) would alone produce
    ~5·10¹¹ pairs. The cap DROPS buckets with more than
    ``max_bucket_len`` members before the self-join (recall for the
    affected docs degrades toward the remaining bands — approximate,
    so the capped variant is for the at-scale rows-only path; leave
    ``None`` on oracle-checked paths).

    The hashed path shingle-hashes the corpus ONCE and materializes
    (signature, int verification set) in that same pass (an eager
    localCheckpoint — GC-bounded blocks, not a CacheManager-pinned
    persist, r15): the derived columns feed the band self-join (both
    sides) and the two verification joins — without the barrier the
    hashing runs per consumer, and inlined into the signature lambdas
    it runs once per hash function. A caller that needs the hash
    arrays for its own purposes (e.g. an in-query ground-truth
    contract) can pass them pre-computed via ``shingle_hashes_df``
    (columns: ``id_col``, ``__h``; caller owns persistence) so the
    corpus is hashed once across BOTH consumers. ``__h`` values MUST
    lie in the 28-bit shingle-hash domain the engine's
    ``shingle_hashes`` emits (any int32-range value works): the
    verification sets are cast to INT for half-width shuffles (r15,
    ADVICE r15), so a caller-provided 64-bit hash outside int range
    raises CAST_OVERFLOW under ANSI rather than joining."""
    if not hashed_sets:
        if max_bucket_len is not None:
            raise ValueError(
                "max_bucket_len is only implemented on the hashed_sets=True "
                "at-scale path — silently ignoring the quadratic-blow-up "
                "guard would defeat its purpose"
            )
        if fast_hash:
            raise ValueError(
                "fast_hash is only consumed on the hashed_sets=True path — "
                "the md5-string path would silently pay full md5 cost while "
                "the caller believes they bought the xxhash64 fast path"
            )
        if shingle_hashes_df is not None:
            raise ValueError(
                "shingle_hashes_df is only consumed on the hashed_sets=True "
                "path — the md5-string path would silently re-shingle from "
                "text and ignore the caller's hash pass (breaking the "
                "one-hash-pass-feeds-both-consumers contract)"
            )
        pairs = lsh_candidate_pairs(df, id_col, text_col, shingle_k, num_hashes, bands, token_ngrams_n)
        return jaccard_on_pairs(
            pairs, df, id_col, text_col, shingle_k, hashed_sets, token_ngrams_n,
            threshold=threshold,
        ).filter(F.col("jaccard") >= threshold)

    _check_bands(num_hashes, bands)
    rows_per_band = num_hashes // bands
    if shingle_hashes_df is not None:
        base = shingle_hashes_df.select(F.col(id_col), F.col("__h"))
    else:
        base = df.select(
            F.col(id_col),
            shingle_hashes(text_col, shingle_k, token_ngrams_n, fast=fast_hash).alias("__h"),
        )
    # ONE corpus pass computes signature + verification set together,
    # and THAT (not the raw hash array) is the materialization barrier
    # (r15, guide §2.3): the signature is duplicate-insensitive (a min
    # over per-shingle hashes), so it reads identically from __h before
    # dedup, and the 28-bit hash values fit INT exactly — the
    # verification sets shuffle through BOTH _jaccard_on_sets joins at
    # half the bytes of the old long arrays with bit-identical Jaccard
    # (int vs long equality on the same values). The barrier must stay
    # downstream of a plain __h projection: inlining the shingle-hash
    # expression into the num_hashes signature lambdas re-evaluates the
    # hashing once per hash function (measured 47 s vs 2 s at the
    # 312k-doc scaled corpus — the shingle_hashes docstring's warning).
    # localCheckpoint, not persist: blocks are ContextCleaner-freed
    # once the result plan becomes unreachable, never session-pinned.
    prep = base.select(
        F.col(id_col),
        minhash_signature_from_hashes("__h", num_hashes).alias("__sig"),
        F.transform(F.array_distinct("__h"), lambda x: x.cast("int")).alias("__set"),
    )
    if shingle_hashes_df is None:
        prep = prep.localCheckpoint()

    # empty shingle sets (docs shorter than the window) carry no
    # similarity signal and would band-collide everywhere — exclude
    sig = prep.filter(F.size("__set") > 0).select(F.col(id_col), F.col("__sig"))
    exploded = sig.select(
        id_col, F.explode(lsh_band_buckets("__sig", bands, rows_per_band)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    if max_bucket_len is not None:
        # window count per (band, bucket), drop over-cap buckets whole
        # (same hash-partitioning shuffle the self-join needs anyway)
        from pyspark.sql import Window

        wlen = F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
        exploded = exploded.withColumn("__blen", wlen).filter(
            F.col("__blen") <= max_bucket_len
        ).drop("__blen")
    exploded = exploded.localCheckpoint(eager=False)  # GC-bounded, not CacheManager-pinned (r15)
    a = exploded.toDF("id_a", "band", "bucket")
    b = exploded.toDF("id_b", "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sets = prep.select(F.col(id_col), F.col("__set"))
    return _jaccard_on_sets(pairs, sets, threshold).filter(
        F.col("jaccard") >= threshold
    )


def exact_collapse_star_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    raw_fn,
    star_scores: dict,
    content_filter: Column | None = None,
) -> DataFrame:
    """The FAMILY-AGNOSTIC storm-safe near-duplicate tier order
    (VERDICT r14 #2: the r14 ``near_dup_pairs`` posture generalized so
    every near-pair family — MinHash, SimHash, n-gram Jaccard, PPJoin
    prefix, embedding cosine — shares one collapse + star + gate
    implementation instead of re-deriving it per family):

    1. ``content`` = rows passing ``content_filter`` (default: ``key``
       non-NULL) — rows with no content never pair;
    2. exact-collapse: group on ``key`` (an exact-content fingerprint
       — md5 of normalized text for the text families, a hash of the
       canonicalized vector for embeddings), canonical = MIN(id);
    3. count gate: a limit(1)-bounded probe (never a full count) — if
       NO group has a second id, the raw operator runs over the FULL
       input, byte-identical to the opt-out path;
    4. storm path: ``raw_fn`` runs over the per-content
       REPRESENTATIVES only, and each exact group is emitted as
       LINEAR star edges ``(canonical, member, *star_scores)`` —
       group_size−1 rows — never the C(m,2) clique.

    Component equivalence (SCOPED, ADVICE r14): for content the raw
    family CAN pair (shingleable / tokenizable / non-degenerate), the
    star spans exactly the component the raw jaccard-1.0 (hamming-0,
    cosine-1.0) clique would span, so ``dedup_survivors`` keeps the
    identical corpus. For identical content the raw family structurally
    canNOT pair — texts too short to shingle into the family's window,
    empty token streams — the exact tier STILL pairs them: identical
    content is a duplicate relation regardless of whether a similarity
    fingerprint exists for it, so the default DEDUPLICATES such groups
    where raw would keep every copy. That widening is intended and
    pinned by tests/test_operators.py (two identical 3-char docs).

    Lifetime (r15 fix of the r14 persist leak, VERDICT r14 What's
    wrong #1): the storm path ``localCheckpoint``s the mapping instead
    of ``persist``ing it — blocks are freed by the ContextCleaner once
    the returned DataFrame becomes unreachable, never pinned for the
    session's lifetime; the no-storm path caches NOTHING (the old
    persist bought nothing there — the raw path never reused the
    mapping).

    ``star_scores`` maps output score-column name → literal Column
    (e.g. ``{"jaccard": F.lit(1.0)}``); types must match ``raw_fn``'s
    output so the union is exact."""
    if content_filter is None:
        content_filter = key.isNotNull()
    content = df.filter(content_filter)
    from pyspark.sql import Window

    keyed = content.select(F.col(id_col), key.alias("__key"))
    mapping = keyed.select(
        id_col, F.min(id_col).over(Window.partitionBy("__key")).alias("canonical_id")
    )
    # the gate: limit(1)-bounded probe, never a full count
    if mapping.filter(F.col(id_col) != F.col("canonical_id")).limit(1).count() == 0:
        return raw_fn(df)

    # storm path: materialize the mapping ONCE (it feeds the star, the
    # rep semi-join, and lineage truncation); localCheckpoint blocks
    # are GC-bounded, unlike a session-lifetime persist
    mapping = mapping.localCheckpoint()
    dup_edges = mapping.filter(F.col(id_col) != F.col("canonical_id"))
    reps = content.join(
        mapping.filter(F.col(id_col) == F.col("canonical_id")).select(id_col),
        id_col,
        "left_semi",
    )
    # distinct-pairs contract (r11): duplicated input ROWS (same id +
    # content twice — a replayed shard) duplicate mapping rows;
    # collapse on the star output (near-linear-sized), never on the
    # corpus
    star = dup_edges.select(
        F.col("canonical_id").alias("id_a"),
        F.col(id_col).alias("id_b"),
        *[c.alias(n) for n, c in star_scores.items()],
    ).distinct()
    return raw_fn(reps).unionByName(star)


def near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    hashed_sets: bool = False,
    token_ngrams_n: int | None = None,
    fast_hash: bool = False,
    max_bucket_len: int | None = None,
    exact_collapse_first: bool = True,
) -> DataFrame:
    """THE near-duplicate entry point — storm-safe by default
    (VERDICT r13 #5: the r13 hotkey finding promoted from a
    composition the caller must remember into the engine's default
    posture). Since r15 this is a thin binding of the family-agnostic
    :func:`exact_collapse_star_pairs` machinery to the MinHash family.

    Why not raw LSH by default: a corpus carrying an exact-duplicate
    storm (99 % one text — boilerplate, a replayed shard) has an
    inherently quadratic near-dup PAIR OUTPUT — C(124k, 2) ≈ 7.7e9
    pairs at the sf0.1 hotkey tree, where the raw band self-join ran
    >12 min before being killed. The storm-safe tier order bounds
    that: exact-collapse first (one narrow md5-key shuffle), LSH only
    over the per-content representatives, and the exact-duplicate
    groups reported as LINEAR star edges — ``(canonical_id, member,
    1.0)``, group_size−1 rows — instead of the C(m,2) clique.

    Output contract (``id_a < id_b`` in every row):
    - exact tier: one ``(canonical, member, jaccard=1.0)`` edge per
      non-canonical member of each identical-normalized-text group
      (canonical = MIN(id); NULL-text rows never pair — no content,
      no duplicate relation);
    - LSH tier: ``minhash_lsh_dedup_pairs`` over the representatives
      only, same parameters.
    The pair set is COMPONENT-equivalent to the raw output for every
    SHINGLEABLE text (exact-dup groups are jaccard-1.0 cliques; a star
    spans the same component), so :func:`dedup_survivors` keeps the
    identical corpus there. For identical texts too short/empty to
    shingle the exact tier pairs what raw LSH structurally cannot
    (empty shingle sets never band-collide), so the default
    additionally collapses those groups — intended, see
    :func:`exact_collapse_star_pairs` (ADVICE r14 scoping).

    Count-gated (VERDICT r13 #5 "ideally count-gated"): when the
    corpus has NO exact-duplicate group, the representatives ARE the
    corpus, so the raw path runs unchanged — byte-identical output to
    ``minhash_lsh_dedup_pairs`` — and the storm posture costs exactly
    one mapping pass + a limit(1) probe job. ``exact_collapse_first=
    False`` opts out entirely (the raw operator, for callers that
    need all-pairs semantics and accept the quadratic risk)."""
    lsh_kwargs = dict(
        threshold=threshold,
        shingle_k=shingle_k,
        num_hashes=num_hashes,
        bands=bands,
        hashed_sets=hashed_sets,
        token_ngrams_n=token_ngrams_n,
        fast_hash=fast_hash,
        max_bucket_len=max_bucket_len,
    )
    if not exact_collapse_first:
        return minhash_lsh_dedup_pairs(df, id_col, text_col, **lsh_kwargs)
    return exact_collapse_star_pairs(
        df,
        id_col,
        F.md5(normalized_text(text_col)),
        lambda d: minhash_lsh_dedup_pairs(d, id_col, text_col, **lsh_kwargs),
        {"jaccard": F.lit(1.0)},
        content_filter=F.col(text_col).isNotNull(),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index (exact)
# ---------------------------------------------------------------------------

def token_ngrams(c: Column | str, n: int = 3) -> Column:
    """Distinct n-grams of whitespace tokens (joined with single
    spaces) of the normalized text."""
    toks0 = whitespace_tokens(normalized_text(c))

    # token array bound once (r16, guide §1.2): inlined, the
    # normalize+split re-ran inside the slice lambda once per gram
    # position — measured 16× on the sf0.1 corpus gram explode
    def grams(toks: Column) -> Column:
        g = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_distinct(g)

    return bind_once(toks0, grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 3,
    max_posting_len: int | None = None,
    exact_collapse_first: bool = True,
) -> DataFrame:
    """Exact Jaccard-similar pairs via a token-n-gram inverted index:
    candidates share ≥1 n-gram (recall 1 for τ>0), then exact Jaccard.

    ``max_posting_len`` caps posting-list length for the at-scale
    variant (drops ubiquitous n-grams → approximate; None = exact).

    Storm-safe by default since r15 (VERDICT r14 #2): identical texts
    have identical gram sets, so an exact-dup storm is a C(m,2)
    jaccard-1.0 clique under the raw index — the posting cap bounds
    candidate WORK but not that inherent pair OUTPUT. The default
    exact-collapses identical texts (md5 key) into linear
    ``(canonical, member, 1.0)`` star edges and runs the index over
    representatives only — component-equivalent for texts with ≥n
    tokens (see :func:`exact_collapse_star_pairs`).
    ``exact_collapse_first=False`` is the raw all-pairs opt-out."""
    if exact_collapse_first:
        return exact_collapse_star_pairs(
            df,
            id_col,
            F.md5(normalized_text(text_col)),
            lambda d: ngram_jaccard_pairs(
                d, id_col, text_col, threshold, n, max_posting_len,
                exact_collapse_first=False,
            ),
            {"jaccard": F.lit(1.0)},
            content_filter=F.col(text_col).isNotNull(),
        )
    sets = df.select(F.col(id_col), token_ngrams(text_col, n).alias("__set"))
    posting = sets.select(id_col, F.explode("__set").alias("gram"))
    if max_posting_len is not None:
        ok = posting.groupBy("gram").count().filter(F.col("count") <= max_posting_len)
        posting = posting.join(ok.select("gram"), "gram", "left_semi")
    a = posting.toDF("id_a", "gram")
    b = posting.toDF("id_b", "gram")
    pairs = (
        a.join(b, "gram").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").distinct()
    )
    return _jaccard_on_sets(pairs, sets, threshold).filter(
        F.col("jaccard") >= threshold
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    n: int = 3,
    max_posting_len: int | None = None,
) -> DataFrame:
    """ASYMMETRIC containment pairs: (contained, container) where
    |grams(A) ∩ grams(B)| / |grams(A)| ≥ threshold — the quote /
    subset-document detector. Jaccard misses containment by design (a
    paragraph quoted inside a book has tiny Jaccard but containment
    ≈ 1); corpus curation needs both (near-dup AND contained-in).

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (recall 1
    for τ > 0: a contained doc shares every gram), but the pair is
    ORDERED and both directions are tested — A⊂B and B⊂A are distinct
    findings. Self-pairs and exact mutual containment report both
    directions; downstream keeps the larger container.

    ``max_posting_len`` is the same ubiquitous-gram cap (approximate
    at-scale variant; None = exact)."""
    sets = df.select(F.col(id_col), token_ngrams(text_col, n).alias("__set"))
    posting = sets.select(id_col, F.explode("__set").alias("gram"))
    if max_posting_len is not None:
        ok = posting.groupBy("gram").count().filter(F.col("count") <= max_posting_len)
        posting = posting.join(ok.select("gram"), "gram", "left_semi")
    a = posting.toDF("id_a", "gram")
    b = posting.toDF("id_b", "gram")
    pairs = (
        a.join(b, "gram").filter(F.col("id_a") != F.col("id_b")).select("id_a", "id_b").distinct()
    )
    sa = sets.toDF("id_a", "__set_a")
    sb = sets.toDF("id_b", "__set_b")
    inter = F.size(F.array_intersect("__set_a", "__set_b")).cast("double")
    containment = inter / F.size("__set_a").cast("double")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.size("__set_a") > 0)
        .select(
            F.col("id_a").alias("contained_id"),
            F.col("id_b").alias("container_id"),
            containment.alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def _prefix_candidates(sets: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Candidate (id_a, id_b) pairs under PPJoin-style prefix filtering
    (Chaudhuri et al., SSJoin; Xiao et al., PPJoin — public papers).

    Tokens are globally ordered by (document frequency ASC, token ASC);
    each set keeps only its first ``|s| - ceil(τ·|s|) + 1`` tokens in
    that order. Any pair with Jaccard ≥ τ has overlap ≥ ceil(τ·max(|a|,
    |b|)), so it MUST share a prefix token — recall is 1 by theorem,
    and the candidate join touches only the rare prefix tokens instead
    of every posting (a single stop-word no longer makes the whole
    corpus one candidate clique). A small epsilon keeps float ceil from
    rounding the required overlap UP past the true integer (a too-LONG
    prefix only costs work; a too-short one would lose recall).

    The size filter ``τ·|a| ≤ |b| ≤ |a|/τ`` prunes candidates before
    the distinct. Expects ``sets`` = (id, __set) with non-empty
    distinct-token arrays.
    """
    from pyspark.sql import Window

    sz = F.size("__set")
    posting = sets.select(
        F.col(id_col), sz.alias("__sz"), F.explode("__set").alias("gram")
    )
    gram_df = posting.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    # per-DOC window: each doc ranks its own grams by global rarity —
    # partitions are set-sized, never a global sort
    w = Window.partitionBy(id_col).orderBy("__df", "gram")
    prefix_len = F.col("__sz") - F.ceil(
        F.col("__sz") * F.lit(threshold) - F.lit(1e-9)
    ) + F.lit(1)
    prefix = (
        posting.join(gram_df, "gram")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefix_len)
        .select(id_col, "__sz", "gram")
    )
    a = prefix.toDF("id_a", "__sz_a", "gram")
    b = prefix.toDF("id_b", "__sz_b", "gram")
    eps = F.lit(1e-9)
    return (
        a.join(b, "gram")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__sz_b") >= F.col("__sz_a") * F.lit(threshold) - eps)
            & (F.col("__sz_a") >= F.col("__sz_b") * F.lit(threshold) - eps)
        )
        .select("id_a", "id_b")
        .distinct()
    )


def set_similarity_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = 3,
    exact_collapse_first: bool = True,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (≥ threshold) via prefix-filtered
    set-similarity join — same answers as :func:`ngram_jaccard_pairs`
    (identical oracle), different scale posture.

    The any-shared-gram inverted index generates Σ|posting|² candidates:
    one ubiquitous gram (boilerplate headers, stop-word trigrams) turns
    the corpus into a single candidate clique, and the ``max_posting_len``
    cap buys scale only by giving up exactness. Prefix filtering keeps
    recall 1 at scale: candidates must share one of the ~(1-τ)·|s|
    RAREST grams of each set, so posting lists that matter are the
    short ones by construction. Shuffles: gram-frequency aggregate,
    per-doc rank window, candidate join, verify joins — all on keys
    that stay bounded as the corpus grows.

    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Storm-safe by default since r15 (VERDICT r14 #2, same reasoning as
    :func:`ngram_jaccard_pairs` — prefix filtering bounds candidate
    WORK, not the C(m,2) pair OUTPUT of a verbatim clique; identical
    texts share every prefix token). ``exact_collapse_first=False`` is
    the raw opt-out; both paths stay answer-identical to
    ``ngram_jaccard_pairs`` at the same tier.
    """
    if exact_collapse_first:
        return exact_collapse_star_pairs(
            df,
            id_col,
            F.md5(normalized_text(text_col)),
            lambda d: set_similarity_pairs_prefix(
                d, id_col, text_col, threshold, n, exact_collapse_first=False
            ),
            {"jaccard": F.lit(1.0)},
            content_filter=F.col(text_col).isNotNull(),
        )
    sets = (
        df.select(F.col(id_col), token_ngrams(text_col, n).alias("__set"))
        .filter(F.size("__set") > 0)
    )
    pairs = _prefix_candidates(sets, id_col, threshold)
    return _jaccard_on_sets(pairs, sets, threshold).filter(
        F.col("jaccard") >= threshold
    )


def dedup_survivors(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """The deduplicated corpus: group near-dup pairs into connected
    components and keep one representative per component (the min id);
    documents with no near-dup edges survive untouched. This is the
    final step of the pairs → clusters → pruned-corpus dedup flow."""
    from etl_rj_spark.operators.components import connected_components

    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # md5-hex-15 → 60 bits, inside int64


def simhash(c: Column | str) -> Column:
    """60-bit SimHash over whitespace tokens of the normalized text:
    per-bit ±1 votes from each token's 60-bit md5 hash; fingerprint
    bit j set iff the vote sum is positive. Pure expressions."""
    toks = whitespace_tokens(normalized_text(c))
    th0 = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    zero = F.lit(0).cast("long")
    # dynamic shifts aren't expressible with F.shiftleft/right (literal
    # amounts only); test bits with a literal powers-of-two array instead
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])

    # token-hash array bound once (r16, guide §1.2): inlined into the
    # per-bit vote aggregate, the md5-per-token transform re-ran once
    # per fingerprint bit — SIMHASH_BITS× (60×) per document
    def fingerprint(th: Column) -> Column:
        def bit_word(j: Column) -> Column:
            p = F.element_at(powers, j + 1)
            votes = F.aggregate(
                th,
                zero,
                lambda acc, h: acc + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
            )
            return F.when(votes > 0, p).otherwise(zero)

        return F.aggregate(
            F.transform(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)), bit_word),
            zero,
            lambda acc, x: acc + x,
        )

    return bind_once(th0, fingerprint)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    exact_collapse_first: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on 4
    15-bit fingerprint segments (a pair within hamming ≤ 3 of a 60-bit
    hash must agree exactly on ≥1 of the 4 segments — exact recall).

    Storm-safe by default since r15 (VERDICT r14 #2): identical
    normalized texts have identical fingerprints, so an exact-dup
    storm is C(m,2) hamming-0 pairs under the raw operator — the same
    quadratic OUTPUT trap the MinHash family closed in r14, which no
    segment-blocking cap can bound. The default exact-collapses
    identical texts first (md5 key), emits each group as linear
    ``(canonical, member, hamming=0)`` star edges, and runs the raw
    blocked join over representatives only — component-equivalent for
    tokenizable text (see :func:`exact_collapse_star_pairs`).
    ``exact_collapse_first=False`` is the raw all-pairs opt-out."""
    if exact_collapse_first:
        return exact_collapse_star_pairs(
            df,
            id_col,
            F.md5(normalized_text(text_col)),
            lambda d: simhash_near_pairs(
                d, id_col, text_col, max_hamming, exact_collapse_first=False
            ),
            {"hamming": F.lit(0).cast("integer")},
            content_filter=F.col(text_col).isNotNull(),
        )
    fp = df.select(F.col(id_col), simhash(text_col).alias("__fp"))
    segs = F.array(
        *[
            F.struct(
                F.lit(s).alias("seg"),
                (F.shiftright(F.col("__fp"), s * 15) % F.lit(1 << 15)).alias("segval"),
            )
            for s in range(4)
        ]
    )
    exploded = fp.select(id_col, "__fp", F.explode(segs).alias("s")).select(
        id_col, "__fp", "s.seg", "s.segval"
    )
    a = exploded.toDF("id_a", "fp_a", "seg", "segval")
    b = exploded.toDF("id_b", "fp_b", "seg", "segval")
    return (
        a.join(b, ["seg", "segval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# C4-style duplicated-span removal
# ---------------------------------------------------------------------------

def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span_tokens: int = 3
) -> DataFrame:
    """C4-style repeated-span removal: split each document into
    non-overlapping spans of ``span_tokens`` whitespace tokens; a span
    occurring more than once in the corpus survives only at its first
    occurrence (lowest ``(id, position)``); documents are reassembled
    from surviving spans in order.

    Generalizes the reference's row-level dedup (ventas_totales.py:
    205-209) to sub-document granularity, the form used to clean web
    corpora (C4's "three-sentence span" rule).

    Scale: two shuffles — one window partitioned by the span string to
    rank occurrences, one groupBy(id) to reassemble. Span strings are
    short (a few tokens), so the shuffle key stays small; no
    collect-to-driver anywhere. Returns (id, n_spans, n_kept,
    cleaned_text) — ONE ROW PER INPUT DOCUMENT: an empty/NULL text
    yields (0, 0, '') instead of silently vanishing from the output
    (posexplode emits nothing for it, so it must be joined back — r9
    review fix; a pipeline re-joining cleaned_text by id must not lose
    rows).
    """
    from pyspark.sql import Window

    toks0 = whitespace_tokens(normalized_text(text_col))
    k = span_tokens
    # token array bound once (r16, guide §1.2): inlined, the
    # normalize+split re-ran inside the slice lambda once per span
    spans = bind_once(
        toks0,
        lambda toks: F.when(
            F.size(toks) >= 1,
            F.transform(
                F.sequence(F.lit(0), F.ceil(F.size(toks) / F.lit(k)).cast("int") - 1),
                lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    exploded = _fanout_partitions(df).select(
        F.col(id_col), F.posexplode(spans).alias("pos", "span")
    )
    w = Window.partitionBy("span").orderBy(F.col(id_col), F.col("pos"))
    ranked = exploded.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(F.col("__rn") == 1, F.struct("pos", "span"))
    agg = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(kept_struct).alias("n_kept"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["span"]),
            " ",
        ).alias("cleaned_text"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def _fanout_partitions(df: DataFrame) -> DataFrame:
    """Pre-explode parallelism guard for the corpus gram scan: the
    n-gram explode multiplies rows ~100×, but its parallelism is
    whatever the PRE-explode scan had — a compact corpus (one parquet
    row group) runs the entire gram materialization in 1-2 tasks no
    matter how many cores exist (measured 6.7 s → 1.5 s at sf0.1 on
    local[32] from this one change). Round-robin repartition of the
    cheap pre-explode doc rows up to the session's default
    parallelism, ONLY when the scan is under-partitioned — on a real
    100 TB corpus the scan already has more splits than cores and this
    is a no-op (never coalesce/shuffle a big corpus just to hit a
    magic number)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hashed_probe: bool = False,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at
    least one token ``n``-gram with ANY benchmark document — the
    standard train-set hygiene pass before evaluation (the benchmark
    side is the eval set). Returns (id, n_hit_grams).

    Scale: the benchmark side is tiny relative to the corpus, so its
    distinct-gram set is broadcast — the corpus side explodes its
    n-grams and probes the broadcast hash map with NO shuffle of
    corpus data; only the per-doc hit counts aggregate (keys = the
    contaminated subset, normally a sliver of the corpus).

    ``hashed_probe=True`` is the Bloom-style variant for when the
    benchmark gram STRINGS outgrow broadcast (a large eval suite at
    8-gram granularity): phase 1 broadcasts only ``xxhash64(gram)``
    (8 bytes/gram, ~10× smaller than the strings) and probes it from
    the corpus scan; phase 2 exact-verifies the candidate sliver
    against the gram strings with an ordinary shuffle join, which now
    touches only candidates, not the corpus. Hash collisions can only
    add candidates, so after verification the result is byte-identical
    to the exact path — both variants share one oracle.
    """
    c = _fanout_partitions(corpus).select(
        F.col(id_col), F.explode(token_ngrams(text_col, n)).alias("gram")
    )
    b = benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram")).distinct()
    if hashed_probe:
        bh = b.select(F.xxhash64("gram").alias("__gh")).distinct()
        cand = c.withColumn("__gh", F.xxhash64("gram")).join(F.broadcast(bh), "__gh")
        hits = cand.join(b, "gram")  # exact verify: candidates only
    else:
        hits = c.join(F.broadcast(b), "gram")
    return (
        hits.groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hit_grams"))
    )


def bloom_contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bits_per_gram: int = 16,
    expected_grams: int = 1_000_000,
) -> DataFrame:
    """:func:`contaminated_docs` through a BLOCKED-BLOOM probe — the
    third rung of the decontamination scale ladder. Exact broadcast
    ships the benchmark gram strings (~40 B/gram); ``hashed_probe``
    ships 8-byte hashes; this variant compresses the gram set into a
    register-blocked Bloom bitmap at ``bits_per_gram`` (16 default →
    2 B/gram, another 4× smaller — and tunable independently of gram
    length) built ENTIRELY from native expressions, so Catalyst sees
    every step: each gram hashes to one 64-bit block
    (``pmod(xxhash64(gram), num_words)``) and sets two bits in it
    (two independent ``xxhash64`` lanes); a map-side-combinable
    ``bit_or`` aggregate ORs the per-gram masks into a sparse
    (block, word) table — ≤ ``num_words`` rows of 16 B, broadcast to
    the corpus gram scan. The probe is a broadcast-hash equi-join on
    the block id plus a bitwise containment filter
    ``(word & mask) = mask``; a gram whose block is absent or whose
    bits aren't all set is DEFINITELY not in the benchmark, so the
    surviving sliver contains every true hit.

    (Spark's C-side ``BloomFilterAggregate`` exists but is not
    SQL-registered in stock builds — it backs runtime join pruning;
    the blocked construction gives the same asymptotics with public
    expressions only, and is replayable in any engine with xxhash64.)

    Bloom false positives can only ADD candidates, so the exact-verify
    join against the real gram set afterwards makes the output
    byte-identical to the exact path (same argument, and same shared
    oracle, as ``hashed_probe``) while touching only the candidate
    sliver. Undersizing ``expected_grams`` degrades the false-positive
    rate (more verify work), never correctness.
    """
    num_words = max(1, (expected_grams * bits_per_gram) // 64)

    def block_and_mask(df):
        return df.withColumns(
            {
                "__blk": F.expr(f"pmod(xxhash64(gram), CAST({num_words} AS BIGINT))"),
                "__m": F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(gram, 1), 64) AS INT))"
                    " | shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(gram, 2), 64) AS INT))"
                ),
            }
        )

    # the distinct benchmark gram set feeds BOTH the bloom build and
    # the exact-verify join, and is deliberately left LAZY (duplicated
    # subtree) — r16 measured the localCheckpoint dedup and it LOST
    # (interleaved A/B at sf0.1: inline 2.26 s vs checkpointed 3.01 s
    # min-of-3): the two consumers are both broadcast builds, which
    # Spark materializes on concurrent broadcast threads, and the
    # checkpoint barrier serializes them behind one RDD materialization
    # while breaking whole-stage fusion of the bloom aggregate.
    b = benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram")).distinct()
    bloom = (
        block_and_mask(b)
        .groupBy("__blk")
        .agg(F.expr("bit_or(__m)").alias("__word"))
    )
    c = _fanout_partitions(corpus).select(
        F.col(id_col), F.explode(token_ngrams(text_col, n)).alias("gram")
    )
    cand = (
        block_and_mask(c)
        .join(F.broadcast(bloom), "__blk")  # absent block → definitely not present
        .filter(F.expr("(__word & __m) = __m"))
        .select(id_col, "gram")
    )
    # exact verify over candidates only (AQE broadcasts b when small;
    # at eval-suite scale this join moves candidates, not the corpus)
    hits = cand.join(b, "gram")
    return hits.groupBy(id_col).agg(F.count_distinct("gram").alias("n_hit_grams"))


# ---------------------------------------------------------------------------
# Incremental near-dup: persisted index + per-batch probe
# ---------------------------------------------------------------------------

def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    token_ngrams_n: int | None = None,
    hashed_sets: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The persistable near-dup index of a corpus: ``(buckets, sets)``.

    ``buckets`` = (id, band, bucket) rows for candidate generation;
    ``sets`` = (id, __set) shingle sets for exact-Jaccard verification
    (string shingles by default; 28-bit hash sets via ``hashed_sets``
    for corpus scale — see jaccard_on_pairs).

    At 100 TB both are WRITTEN ONCE as tables — buckets bucketed by
    (band, bucket), sets by id — and every incoming batch probes them
    without ever re-shingling the existing corpus: the LLM-layer form
    of K1's key-projection-of-the-existing-table posture
    (sinks/incremental.py, ventas_totales.py:223-262)."""
    _check_bands(num_hashes, bands)
    rows_per_band = num_hashes // bands
    # exclude empty shingle sets: no similarity signal, and all-NULL
    # signatures would band-collide with every other short doc
    sig = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes(text_col, shingle_k, token_ngrams_n).alias("__h"),
    ).filter(F.size("__h") > 0).select(
        "id", minhash_signature_from_hashes("__h", num_hashes).alias("__sig")
    )
    buckets = sig.select(
        "id", F.explode(lsh_band_buckets("__sig", bands, rows_per_band)).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    shingle_col = (
        F.array_distinct(shingle_hashes(text_col, shingle_k, token_ngrams_n))
        if hashed_sets
        else F.array_distinct(_shingles(text_col, shingle_k, token_ngrams_n))
    )
    sets = df.select(F.col(id_col).alias("id"), shingle_col.alias("__set"))
    return buckets, sets


def incremental_near_dup_pairs(
    new_df: DataFrame,
    index_buckets: DataFrame,
    index_sets: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    token_ngrams_n: int | None = None,
    hashed_sets: bool = False,
) -> DataFrame:
    """Near-dup pairs involving a NEW batch against an existing
    corpus index: (new × existing) ∪ (new × new), verified by exact
    Jaccard at ``threshold``. Ids must be disjoint between batch and
    index (append-only corpus ids). Output pairs are normalized
    id_a < id_b.

    Cost shape: the new batch is shingled once; the existing corpus
    contributes only (band, bucket) index rows to the candidate join
    and id-keyed sets to verification — at 100 TB the daily batch
    never triggers a corpus re-scan."""
    nb, ns = minhash_index(
        new_df, id_col, text_col, shingle_k, num_hashes, bands,
        token_ngrams_n, hashed_sets,
    )
    # the plan references nb three times (probe + both self-join
    # sides); the new batch is the SMALL side by construction, so the
    # lazy recompute is cheap — callers with a heavy batch should
    # persist new_df before calling (the operator stays lazy like the
    # rest of the registry)
    ext = (
        nb.toDF("id_n", "band", "bucket")
        .join(index_buckets.toDF("id_e", "band", "bucket"), ["band", "bucket"])
        .select("id_n", "id_e")
    )
    self_ = (
        nb.toDF("id_a", "band", "bucket")
        .join(nb.toDF("id_b", "band", "bucket"), ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    cand = (
        ext.select(
            F.least("id_n", "id_e").alias("id_a"),
            F.greatest("id_n", "id_e").alias("id_b"),
        )
        .unionByName(self_)
        .distinct()
    )
    # Verification fetches each side's shingle set from the index OR
    # the new batch via separate left joins + coalesce — NOT by
    # unioning the two sets tables: a union would discard the index
    # table's (bucketed-by-id) layout and reshuffle the corpus-sized
    # sets relation on every probe. Separate joins keep the index side
    # Exchange-free (candidates, a sliver, shuffle to meet it).
    a_idx = index_sets.toDF("id_a", "__ia")
    a_new = ns.toDF("id_a", "__na")
    b_idx = index_sets.toDF("id_b", "__ib")
    b_new = ns.toDF("id_b", "__nb")
    verified = (
        cand.join(a_idx, "id_a", "left")
        .join(a_new, "id_a", "left")
        .join(b_idx, "id_b", "left")
        .join(b_new, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("__ia", "__na").alias("__set_a"),
            F.coalesce("__ib", "__nb").alias("__set_b"),
        )
    )
    # threshold-implied size bound before the intersect (r16, same
    # prune as _jaccard_on_sets: j ≥ τ ⟹ min|set| ≥ τ·max|set|, with
    # 1e-9 slack so rounding can only keep extra rows — the exact
    # >= threshold filter below makes the output identical)
    verified = verified.filter(
        F.least(F.size("__set_a"), F.size("__set_b")).cast("double")
        >= F.greatest(F.size("__set_a"), F.size("__set_b")).cast("double")
        * F.lit(threshold - 1e-9)
    )
    return _jaccard_select(verified).filter(F.col("jaccard") >= threshold)


#: Version tag of minhash_signature_from_hashes' hash family. BUMP THIS
#: whenever the signature arithmetic changes: a persisted index probed
#: by a different family yields structurally valid but meaningless
#: (band, bucket) matches — recall silently collapses instead of
#: erroring. (Exactly that hazard occurred in round 5 when the affine
#: family was replaced by xxhash64 mixing.)
MINHASH_FAMILY = "xxhash64-per-coordinate-v2"


def persist_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    table_prefix: str,
    num_buckets: int = 8,
    path_prefix: str | None = None,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    token_ngrams_n: int | None = None,
    hashed_sets: bool = False,
) -> tuple[str, str]:
    """Write the corpus near-dup index as bucketed+sorted tables:
    ``{prefix}_buckets`` bucketed by (band, bucket) and
    ``{prefix}_sets`` bucketed by (id) — the physical layout under
    which every later probe join reads the index with ZERO Exchange
    (the probe batch, tiny by construction, shuffles to meet the
    index's bucketing; the corpus-sized index never moves again).

    A third table ``{prefix}_meta`` records the minhash parameters and
    hash-family version; ``probe_minhash_index`` refuses to probe with
    mismatched parameters rather than silently returning near-zero
    recall. Returns (buckets, sets) table names."""
    from etl_rj_spark.sinks.bucketed import write_bucketed

    buckets, sets = minhash_index(
        df, id_col, text_col, shingle_k, num_hashes, bands,
        token_ngrams_n, hashed_sets,
    )
    bt, st = f"{table_prefix}_buckets", f"{table_prefix}_sets"
    write_bucketed(
        buckets, bt, ["band", "bucket"], num_buckets,
        path=f"{path_prefix}/{bt}" if path_prefix else None,
    )
    write_bucketed(
        sets, st, ["id"], num_buckets,
        path=f"{path_prefix}/{st}" if path_prefix else None,
    )
    mt = f"{table_prefix}_meta"
    meta = df.sparkSession.createDataFrame(
        [(shingle_k, num_hashes, bands, token_ngrams_n, hashed_sets, MINHASH_FAMILY)],
        "shingle_k int, num_hashes int, bands int, token_ngrams_n int, "
        "hashed_sets boolean, family string",
    )
    writer = meta.write.mode("overwrite").format("parquet")
    if path_prefix:
        writer = writer.option("path", f"{path_prefix}/{mt}")
    writer.saveAsTable(mt)
    return bt, st


def probe_minhash_index(
    spark,
    new_df: DataFrame,
    table_prefix: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    token_ngrams_n: int | None = None,
    hashed_sets: bool = False,
) -> DataFrame:
    """Near-dup pairs of a new batch against a PERSISTED bucketed index
    (``persist_minhash_index``), from any session — the incremental
    daily-batch entry point: the corpus contributes only catalog reads
    of its two index tables, never a re-shingle or a re-shuffle.
    Raises ``ValueError`` if the probe parameters or the code's hash
    family don't match what the index was built with."""
    try:
        meta = spark.table(f"{table_prefix}_meta").first()
    except Exception as ex:  # noqa: BLE001 — any catalog failure
        raise ValueError(
            f"{table_prefix}: no readable {table_prefix}_meta table — "
            "re-persist the index with persist_minhash_index (indexes "
            "without a params stamp cannot be probed safely)"
        ) from ex
    if meta is None:  # table exists but holds no row (interrupted persist)
        raise ValueError(
            f"{table_prefix}: {table_prefix}_meta is empty — the persist "
            "was interrupted; re-persist the index with persist_minhash_index"
        )
    want = (shingle_k, num_hashes, bands, token_ngrams_n, hashed_sets, MINHASH_FAMILY)
    got = (
        meta["shingle_k"], meta["num_hashes"], meta["bands"],
        meta["token_ngrams_n"], meta["hashed_sets"], meta["family"],
    )
    if got != want:
        raise ValueError(
            f"{table_prefix}: index was built with (shingle_k, num_hashes, "
            f"bands, token_ngrams_n, hashed_sets, family) = {got}, probe "
            f"requested {want} — mismatched parameters return near-zero "
            "recall silently; re-persist or match the parameters"
        )
    return incremental_near_dup_pairs(
        new_df,
        spark.table(f"{table_prefix}_buckets"),
        spark.table(f"{table_prefix}_sets"),
        id_col,
        text_col,
        threshold=threshold,
        shingle_k=shingle_k,
        num_hashes=num_hashes,
        bands=bands,
        token_ngrams_n=token_ngrams_n,
        hashed_sets=hashed_sets,
    )
