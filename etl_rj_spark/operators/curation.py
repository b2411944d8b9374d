"""Corpus-curation operators for training-data pipelines: deterministic
train/test splitting and keep-latest versioning.

- ``hash_split``: assignment by md5 of the key — stable across runs,
  engines, partitionings and cluster sizes (never ``rand()``: a split
  that changes when the cluster re-runs poisons every downstream
  train/eval comparison). The md5-hex construction is the same
  engine-portable contract the dedup operators use.
- ``keep_latest``: one row per key, newest by a version/timestamp
  column with a unique tiebreaker — the standard "current version of
  every document" view over an append-only corpus (generalizes the
  reference's snapshot + MAX(FechaCarga) pattern to per-key latest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the key's string
    form (12 hex digits = 48 bits, no modulo bias worth caring about)."""
    col = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")
    return (h % buckets).cast("int")


def hash_split(
    df: DataFrame,
    key: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Attach a 'train'/'val'/'test' assignment: bucket < train_pct →
    train, < train_pct+val_pct → val, else test."""
    b = split_bucket(key)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """One row per key tuple: the last by ``order_by`` (descending,
    which must end in a unique tiebreaker for determinism). One shuffle
    on the keys; at scale prefer the sink pre-partitioned by the keys."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key: str,
    pct_by_stratum: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Deterministic per-stratum downsampling (class rebalancing for
    training corpora): keep a hash-stable ``pct`` of each stratum —
    never ``rand()``, so the sample is identical across runs, engines,
    and partitionings, and re-running a pipeline stage cannot shift
    the training distribution. A pure filter: no shuffle."""
    thresh = F.lit(default_pct)
    for stratum, pct in pct_by_stratum.items():
        thresh = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(thresh)
    return df.filter(split_bucket(key) < thresh)


def hash_ranked_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    caps: dict[str, int],
) -> DataFrame:
    """Resample to a target source mix: keep at most ``caps[group]``
    rows per group, chosen by md5-hash rank of the key — a
    deterministic stand-in for random sampling that is stable across
    runs, engines, and partitionings. This is the "data mixture"
    step of a training pipeline (downsample over-represented sources
    to a prescribed budget).

    Scale: one shuffle (window by group). Per-group hash ranking
    assumes groups fit a partition after AQE splits; for billions of
    rows per group, swap row_number for the two-pass quantile cut on
    the same hash (threshold = approx cap/count percentile) — same
    contract, no single-partition rank.

    ORACLE CONTRACT (ADVICE r9): exact-row comparison against a SQL
    oracle assumes ``key_col`` values are UNIQUE within each group.
    The duplicate-key tiebreak below is ``xxhash64(struct(*))`` —
    deterministic and stable across runs/partitionings, but Spark's
    xxhash64 is not replayable in DuckDB, so when duplicate keys
    straddle a cap boundary the engine's (deterministic) survivor set
    can differ from any oracle's pick. The registered resample
    queries key on unique ids (``doc_id``), which the oracles'
    row_number over ``md5(key)`` then reproduces exactly.
    """
    # content-hash tiebreak (r9 review fix): duplicate key values share
    # one md5, and an untied row_number would pick the survivor at the
    # cap boundary by partition arrival order — breaking the module's
    # identical-across-runs contract. The struct hash is deterministic
    # row content, so selection never depends on scheduling.
    tiebreak = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), tiebreak
    )
    cap = F.lit(None).cast("int")
    for g, c in caps.items():
        cap = F.when(F.col(group_col) == g, F.lit(c)).otherwise(cap)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__cap", cap)
        .filter(F.col("__rk") <= F.coalesce(F.col("__cap"), F.lit(2**31 - 1)))
        .drop("__rk", "__cap")
    )


def hash_threshold_resample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    caps: dict[str, int],
) -> DataFrame:
    """``hash_ranked_resample``'s documented scale path — IDENTICAL
    output, but the per-group rank never touches the whole group:

    1. one map-side-combinable aggregate yields per-group row counts;
    2. rows pre-filter on their md5-hash FRACTION against a
       Chernoff-padded threshold (cap + 10·√cap + 25)/n — the cap
       smallest hashes of a group all fall under it except with
       cryptographically negligible probability, so the sliver
       contains the exact answer;
    3. ``row_number`` trims the sliver to exactly ``cap`` in the same
       md5 order as the exact operator.

    The window therefore sorts ~cap·(1+ε) rows per group instead of n
    — on a 10⁹-row group with a 10⁵ cap that is a 10⁴× smaller sort,
    and the only full-data passes are the count and the scan-stage
    hash filter. Groups without a cap are kept whole, as in
    ``hash_ranked_resample``. Equality with the exact operator is
    pinned by tests and by sharing its oracle."""
    cap = F.lit(None).cast("int")
    for g, c in caps.items():
        cap = F.when(F.col(group_col) == g, F.lit(c)).otherwise(cap)
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .withColumn("__cap", cap)
        .withColumn(
            "__frac",
            F.least(
                F.lit(1.0),
                (F.col("__cap") + 10.0 * F.sqrt(F.col("__cap")) + 25.0) / F.col("__n"),
            ),
        )
        .select(group_col, "__cap", "__frac")
    )
    # 13 hex digits = 52 bits: exact in a double, and the numeric order
    # of the prefix is consistent with the md5 hex string order the
    # trim (and hash_ranked_resample) sorts by
    hash_frac = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    # a NULL group never matches the counts join — route it with the
    # capless rows, matching hash_ranked_resample (cap NULL → keep)
    null_grouped = df.filter(F.col(group_col).isNull())
    joined = df.filter(F.col(group_col).isNotNull()).join(F.broadcast(counts), group_col)
    # capless groups are kept whole and never enter the window — only
    # the capped slivers pay for a (tiny) per-group sort
    capless = joined.filter(F.col("__cap").isNull()).select(*df.columns)
    # NULL key_col → NULL md5 → NULL hash_frac: coalesce to -1 so the
    # row always enters the sliver, where the NULLS-FIRST trim ranks
    # it exactly as hash_ranked_resample's window does — without this
    # a NULL-key row in a capped group silently VANISHED from the
    # threshold path while the exact operator kept it (r9 review fix)
    sliver = joined.filter(
        F.col("__cap").isNotNull()
        & (F.coalesce(hash_frac, F.lit(-1.0)) < F.col("__frac"))
    )
    # same md5 + content-hash order as hash_ranked_resample (the two
    # operators must stay row-identical, ties included)
    tiebreak = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), tiebreak
    )
    trimmed = (
        sliver.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__cap"))
        .select(*df.columns)
    )
    return trimmed.unionByName(capless).unionByName(null_grouped)


def weighted_sample_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "0",
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement, ``k`` rows
    per group (Efraimidis–Spirakis A-ES): each row draws a
    hash-uniform ``u ∈ (0, 1]`` from ``md5(id ‖ ':' ‖ seed)`` and
    ranks by ``key = ln(u) / w`` descending — the log-space form of
    A-ES's ``u^(1/w)`` — so inclusion probability scales with the
    weight (quality score, length, upvotes, …) while the sample stays
    identical across runs, engines and partitionings (never
    ``rand()``; the module's determinism contract). Completes the
    sampling family: ``stratified_sample`` (unweighted pct),
    ``hash_ranked_resample`` (unweighted cap), this (weighted cap).

    Rows with NULL or non-positive weight carry zero probability mass
    and are excluded. The key is ROUNDED TO 9 dp before ranking, with
    ``id_col`` as tiebreak: a last-ulp ``ln`` difference between
    engines cannot flip an order decision, so a SQL oracle replaying
    the formula selects the identical sample (same rationale as the
    scaled-integer rarity contract in unigram_rarity_score).

    Scale: one shuffle (window by group). For billion-row groups the
    same Chernoff-sliver upgrade as ``hash_threshold_resample``
    applies — pre-filter on key above a padded per-group threshold,
    then rank the sliver; the top-k by a hash-derived key never needs
    the whole group sorted.

    Returns the input columns plus ``sample_rank`` (1..k).
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))), 1, 13
            ),
            16,
            10,
        )
        .cast("double")
    )
    # 13 hex digits = 52 bits: exact in a double; +1 keeps u > 0 so ln is finite
    u = (h + F.lit(1.0)) / F.lit(float(16**13 + 1))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    w = Window.partitionBy(group_col).orderBy(F.col("__aes_key").desc(), F.col(id_col))
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__aes_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__aes_key")
    )


def weighted_draws(
    items: DataFrame,
    keys: DataFrame,
    item_col: str,
    weight_col: str,
    key_col: str,
    k: int,
    seed: str = "0",
) -> DataFrame:
    """``k`` WITH-replacement draws from the items' weight
    distribution per key row — inverse-transform sampling on an
    INTEGER CDF: each item covers ``[cum_prev, cum)`` of ``[0, W)``
    (W = total integer weight), each (key, slot) hashes to a uniform
    integer position in ``[0, W)``, and the covering interval is the
    draw — so ``P(item) = w/W`` exactly, with no floats anywhere
    (md5-derived position mod W; the ≤2⁵² hash range makes modulo
    bias ≤ W/2⁵², unobservable). The negative-sampling primitive of
    word2vec/recommender training (draw popularity-weighted items per
    example), and the with-replacement complement of
    :func:`weighted_sample_by_group`'s without-replacement A-ES.

    Scale: the CDF is one window cumsum over the item catalog
    (catalog-sized, usually broadcastable); draws are
    ``keys × k`` rows from an in-row ``sequence`` explode; the
    interval lookup is a broadcast range join — the big side (draws)
    never shuffles. Deterministic across runs/engines/partitionings;
    ``seed`` varies the draw set. Returns (key, slot 1..k, item).

    Weights must be positive integers (cast yours up: ppm-scale a
    float weight); NULL/non-positive rows carry no mass.
    """
    w_int = F.col(weight_col).cast("bigint")
    cat = items.select(F.col(item_col), w_int.alias("__w")).filter(F.col("__w") > 0)
    cw = Window.orderBy(F.col(item_col)).rowsBetween(Window.unboundedPreceding, 0)
    cdf = cat.select(
        item_col,
        (F.sum("__w").over(cw) - F.col("__w")).alias("__lo"),
        F.sum("__w").over(cw).alias("__hi"),
    )
    total = cdf.agg(F.max("__hi").alias("__W"))
    draws = (
        keys.select(F.col(key_col))
        .select(key_col, F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("slot"))
        .crossJoin(F.broadcast(total))
        .select(
            key_col,
            "slot",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col(key_col).cast("string"),
                                F.col("slot").cast("string"),
                                F.lit(seed),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.col("__W"),
            ).alias("__pos"),
        )
    )
    return draws.join(
        F.broadcast(cdf),
        (F.col("__pos") >= F.col("__lo")) & (F.col("__pos") < F.col("__hi")),
    ).select(key_col, "slot", item_col)


def match_distribution_resample(
    df: DataFrame,
    reference: DataFrame,
    bin_col: str,
    key_col: str,
) -> DataFrame:
    """Deterministically THIN ``df`` so the distribution of ``bin_col``
    matches the ``reference`` corpus's (both sides pre-binned by the
    caller: length decile, domain, language, …) — the
    target-distribution curation step (match a pretraining mix to a
    reference corpus's length/domain profile) as a pure filter.

    Per-bin keep probability ``p(b) ∝ ref_frac(b) / cur_frac(b)``,
    normalized so the MOST under-represented bin keeps 100 % — the
    maximum-retention thinning whose expected output distribution
    equals the reference's exactly. Selection is hash-deterministic
    (``md5(key)`` fraction vs ``p(b)``, both sides of the comparison
    reproducible to the bit: p is int64-count arithmetic in one fixed
    op order rounded to 9 dp; the hash fraction is a 52-bit-exact
    double), so re-runs, engines and partitionings agree row-for-row
    — never ``rand()``, the module contract.

    Scale: two map-side-combinable count aggregates (bins ≪ rows)
    broadcast back as a KB map; the corpus-sized side is filtered in
    the scan stage and never shuffles. Bins present in ``df`` but
    absent from the reference keep nothing (ratio 0); a NULL bin
    likewise matches no reference bin and keeps nothing (unlike
    ``temperature_mix_resample``'s null-group passthrough, a row
    whose bin is unknown has no place in a target distribution —
    deliberate, and mirrored by the oracle); bins absent from ``df``
    cannot be conjured — this matches shapes by thinning only. Zero
    bin overlap (max ratio 0) keeps nothing rather than dividing by
    zero (try_divide).
    """
    cur = df.groupBy(F.col(bin_col).alias("__b")).agg(F.count(F.lit(1)).alias("__cn"))
    ref = reference.groupBy(F.col(bin_col).alias("__b")).agg(
        F.count(F.lit(1)).alias("__rn")
    )
    # ratio(b) = ref_frac/cur_frac = (rn * cur_total) / (cn * ref_total);
    # normalize by the max ratio so the scarcest bin keeps everything.
    # Totals are per-side scalars; (rn/cn) ordering is total-free, so
    # compute ratios as rn/cn and divide by max(rn/cn) — the totals
    # cancel. Fixed op order + 9-dp round = cross-engine determinism.
    joined = cur.join(ref, "__b", "left").select(
        "__b",
        (F.coalesce(F.col("__rn"), F.lit(0)).cast("double") / F.col("__cn").cast("double")
         ).alias("__ratio"),
    )
    mx = joined.agg(F.max("__ratio").alias("__mx"))
    probs = F.broadcast(
        joined.crossJoin(F.broadcast(mx)).select(
            "__b",
            F.round(F.try_divide(F.col("__ratio"), F.col("__mx")), 9).alias("__p"),
        )
    )
    hash_frac = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    return (
        df.join(probs, df[bin_col] == probs["__b"], "left")
        .filter(hash_frac < F.coalesce(F.col("__p"), F.lit(0.0)))
        .drop("__b", "__p")
    )


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    size: int,
    stride: int,
) -> DataFrame:
    """Fixed-size overlapping character windows over a text column —
    the context-window preparation step of a training pipeline (each
    document becomes chunks of up to ``size`` chars starting every
    ``stride`` chars; the tail chunk may be short; empty/NULL text
    yields zero chunks).

    Chunk count per doc: ``1 + ceil((len - size) / stride)`` for
    ``len > size``, else ``1`` (``0`` for empty/NULL). All counting is
    exact int64 (``div``, never float division), so a boundary-length
    document can't gain or lose a chunk to a ulp.

    Output: ``(id_col, chunk_idx, chunk_start, chunk_text)`` with
    ``chunk_start`` the 0-based char offset.

    Scale: pure narrow expression work — ``sequence`` + ``transform``
    + ``inline`` in the scan stage, no shuffle, no UDF; the ~len/stride
    output rows per doc are generated executor-side, so a 100 TB corpus
    chunks at scan throughput and the fan-out never converges on the
    driver.
    """
    if not 0 < stride <= size:
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    txt = F.col(text_col).cast("string")
    tagged = df.withColumn("__len", F.length(txt))
    n_chunks = (
        F.when(txt.isNull() | (F.col("__len") == 0), F.lit(0))
        .when(F.col("__len") <= size, F.lit(1))
        .otherwise(F.expr(f"(__len - {size} + {stride - 1}) div {stride}") + F.lit(1))
        .cast("int")
    )
    mk = lambda i: F.struct(  # noqa: E731
        i.cast("int").alias("chunk_idx"),
        (i.cast("long") * stride).alias("chunk_start"),
        F.substr(txt, i.cast("int") * stride + 1, F.lit(size)).alias("chunk_text"),
    )
    # sequence(0, -1) would yield a DESCENDING [0, -1]; gate on n > 0.
    empty = F.array().cast("array<struct<chunk_idx:int,chunk_start:bigint,chunk_text:string>>")
    chunks = F.when(
        n_chunks > 0, F.transform(F.sequence(F.lit(0), n_chunks - 1), mk)
    ).otherwise(empty)
    return tagged.select(id_col, F.inline(chunks))


def epoch_upsample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Fractional epoch re-weighting of a training mix — the UPSAMPLING
    twin of ``hash_ranked_resample`` (which only caps). A group with
    weight ``w`` contributes ``floor(w)`` full copies of every row plus
    one extra copy for the deterministic ``frac(w)``-fraction of rows
    (so src×2.3 ≈ 2.3 epochs); ``w < 1`` degenerates to pure hash-
    threshold downsampling. Output adds an ``epoch`` column (0-based
    copy index), so downstream shuffling/packing can tell copies apart.

    Determinism: the fractional membership test compares a 52-bit
    md5-derived integer against a precomputed integer threshold —
    stable across runs, engines, partitionings (never ``rand()``,
    same rationale as ``hash_split``). A NULL key cannot hash, so it
    never earns the fractional extra copy but STILL contributes its
    group's ``floor(w)`` guaranteed copies (a NULL-keyed row must not
    vanish from a ×2 group — mirrors ``hash_threshold_resample``'s
    NULL passthrough).

    Scale: pure scan-stage expression work (when-chain weights +
    sequence/inline fan-out) — no shuffle, no driver loop; output
    volume is Σ w_g·|g| by construction.
    """
    hmax = 16 ** 13  # 52 bits
    copies = F.lit(None).cast("int")
    extra_thresh = F.lit(None).cast("long")
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}: {w}")
        copies = F.when(F.col(group_col) == g, F.lit(int(w))).otherwise(copies)
        extra_thresh = F.when(
            F.col(group_col) == g, F.lit(int((w - int(w)) * hmax))
        ).otherwise(extra_thresh)
    copies = F.coalesce(copies, F.lit(int(default_weight)))
    extra_thresh = F.coalesce(
        extra_thresh, F.lit(int((default_weight - int(default_weight)) * hmax))
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":up"))), 1, 13),
        16, 10,
    ).cast("long")
    extra = F.when(h.isNotNull() & (h < extra_thresh), F.lit(1)).otherwise(F.lit(0))
    n = (copies + extra).alias("__n")
    epochs = F.when(
        n > 0, F.sequence(F.lit(0), n - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.select("*", F.explode(epochs).alias("epoch"))


def split_leakage_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    threshold: float = 0.7,
    n: int = 3,
) -> DataFrame:
    """Train/test LEAKAGE audit: exact near-dup pairs whose members sit
    in DIFFERENT splits — the within-corpus counterpart of benchmark
    decontamination (a test document whose near-copy is in train
    inflates eval silently; hash splits assign near-dups independently,
    so this failure mode is the default, not the exception).

    Pairs come from the prefix-filtered exact set-similarity join
    (recall 1 — an audit that can miss leakage is worse than none);
    same-split near-dups are NOT reported (they are dedup's problem,
    not leakage). Returns (id_a, id_b, split_a, split_b, jaccard),
    id_a < id_b. Scale: the split join adds two id-keyed hash joins on
    the (small) surviving pair set; everything heavy is the audited
    pair production itself.
    """
    from etl_rj_spark.operators.text_dedup import set_similarity_pairs_prefix

    # exact_collapse_first=False — deliberately RAW (r15): the storm-
    # safe default reports an exact-dup group as star edges through its
    # canonical only, so a cross-split pair between two NON-canonical
    # members would vanish from the audit. Leakage recall beats output
    # linearity here; this audit is the documented raw-semantics caller.
    pairs = set_similarity_pairs_prefix(
        df.select(F.col(id_col), F.col(text_col)), id_col, text_col, threshold, n,
        exact_collapse_first=False,
    )
    # DISTINCT (id, split) mapping: a split is a function of the id
    # (hash_split), so duplicated rows of one id carry one split — the
    # distinct keeps the pair join-back from fanning duplicated ids out
    # multiplicity² (r11 dupstorm fix). Narrow two-column shuffle; the
    # heavy work stays the audited pair production itself.
    s = df.select(F.col(id_col), F.col(split_col)).distinct()
    sa = s.toDF("id_a", "split_a")
    sb = s.toDF("id_b", "split_b")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    margin: float = 0.0,
) -> DataFrame:
    """Preference-pair mining for DPO/RLHF-style training data: per
    group (prompt), pair the BEST-scored candidate against the WORST,
    gated on a minimum score margin — low-contrast pairs teach a
    reward model nothing and drown the signal.

    Deterministic winner selection: chosen = first by (score DESC,
    id ASC), rejected = first by (score ASC, id ASC); a group emits at
    most ONE pair and only when chosen ≠ rejected AND
    chosen_score − rejected_score ≥ margin (single-candidate and
    flat-scored groups drop silently — they carry no preference).
    Top-k variants are the same shape with rank ≤ k on both windows.

    Scale: two row_number windows over the same group partitioning —
    one shuffle on the group key, map-side WindowGroupLimit prunes to
    a handful of rows per group before the shuffle.
    """
    w_best = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    w_worst = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col)
    )
    ranked = df.select(
        F.col(group_col), F.col(id_col), F.col(score_col),
        F.row_number().over(w_best).alias("__rb"),
        F.row_number().over(w_worst).alias("__rw"),
    )
    best = ranked.filter(F.col("__rb") == 1).select(
        group_col,
        F.col(id_col).alias("chosen_id"),
        F.col(score_col).alias("chosen_score"),
    )
    worst = ranked.filter(F.col("__rw") == 1).select(
        group_col,
        F.col(id_col).alias("rejected_id"),
        F.col(score_col).alias("rejected_score"),
    )
    return (
        best.join(worst, group_col)
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .filter(
            F.col("chosen_score") - F.col("rejected_score") >= F.lit(float(margin))
        )
        .select(
            group_col, "chosen_id", "rejected_id", "chosen_score", "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias("score_margin"),
        )
    )


def temperature_mix_resample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    temperature: int = 2,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual √-mix):
    thin each source so its share moves from ``n_b`` toward
    ``n_b^(1/T)`` — big corpora stop drowning small ones, without the
    small ones being upsampled. Per-source keep probability
    ``p(b) ∝ n_b^(1/T) / n_b`` normalized so the scarcest source
    keeps 100 % (maximum-retention thinning; expected output shares
    ∝ n^(1/T) exactly).

    ``temperature`` must be a power of two: n^(1/T) is computed as a
    chain of IEEE-correctly-rounded ``sqrt`` steps (pow() is NOT
    correctly-rounded-guaranteed across libm implementations — the
    same reason the decay operator uses λ=½). Selection is the
    module's hash-deterministic rule (md5 fraction vs 9-dp p), so
    re-runs, engines and partitionings agree row-for-row.

    NULL-source rows pass through untouched (no mix weight to apply —
    the null-group convention of the resamplers). Scale: one KB count
    aggregate broadcast back; the corpus side filters in the scan
    stage and never shuffles.
    """
    t = int(temperature)
    if t < 2 or (t & (t - 1)) != 0:
        raise ValueError(
            f"temperature must be a power of two >= 2 (got {temperature}): "
            "n^(1/T) is computed by repeated correctly-rounded sqrt"
        )
    counts = (
        df.filter(F.col(source_col).isNotNull())
        .groupBy(F.col(source_col).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = F.col("__n").cast("double")
    steps = t.bit_length() - 1
    for _ in range(steps):
        w = F.sqrt(w)
    ratios = counts.select("__b", (w / F.col("__n").cast("double")).alias("__ratio"))
    mx = ratios.agg(F.max("__ratio").alias("__mx"))
    probs = F.broadcast(
        ratios.crossJoin(F.broadcast(mx)).select(
            "__b", F.round(F.col("__ratio") / F.col("__mx"), 9).alias("__p")
        )
    )
    hash_frac = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    kept = (
        df.filter(F.col(source_col).isNotNull())
        .join(probs, F.col(source_col) == F.col("__b"))
        .filter(hash_frac < F.col("__p"))
        .drop("__b", "__p")
    )
    return kept.unionByName(df.filter(F.col(source_col).isNull()))


def golden_record_merge(
    df: DataFrame,
    cluster_key: Column,
    id_col: str,
    size_col: str,
    mode_col: str,
    set_col: str,
) -> DataFrame:
    """Master-data golden-record construction: collapse each duplicate
    cluster to ONE synthesized record whose fields follow per-field
    survivorship policies (the step after dedup DETECTION — near-dup
    pipelines find the clusters, this decides what the surviving row
    says):

    - ``survivor_id``   — id of the largest member (``size_col`` max,
      ties to the LOWEST id): completeness-wins survivorship;
    - ``mode_value``    — most frequent ``mode_col`` value in the
      cluster (ties to the lexicographically smallest): consensus-wins;
    - ``all_sources``   — sorted distinct ``set_col`` values joined
      with ',': provenance union;
    - ``n_members``, ``total_size`` — cluster accounting.

    Two aggregations at different grains — (cluster) and
    (cluster, mode_col) — both shuffle on the same leading key, and the
    mode side reduces to ≤ |values| rows per cluster before its window.
    The survivor argmax is a max-of-struct (size, -id), not a window
    over raw rows, so the cluster-grain agg is one map-side-combinable
    pass. Output key is ``cluster_key`` verbatim (caller picks a
    compact key — md5 prefix keys keep the shuffle rows narrow).
    """
    from pyspark.sql import Window

    base = df.select(
        cluster_key.alias("__key"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(size_col).cast("long").alias("__size"),
        F.col(mode_col).cast("string").alias("__mode"),
        F.col(set_col).cast("string").alias("__src"),
    )
    per_cluster = base.groupBy("__key").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("__size").alias("total_size"),
        (-F.max(F.struct(F.col("__size"), (-F.col("__id")).alias("__neg")))["__neg"]).alias(
            "survivor_id"
        ),
        F.array_join(F.array_sort(F.collect_set("__src")), ",").alias("all_sources"),
    )
    mode_w = Window.partitionBy("__key").orderBy(F.desc("__cnt"), F.asc("__mode"))
    modes = (
        base.groupBy("__key", "__mode")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn("__rn", F.row_number().over(mode_w))
        .filter(F.col("__rn") == 1)
        .select("__key", F.col("__mode").alias("mode_value"))
    )
    return per_cluster.join(modes, "__key").withColumnRenamed("__key", "cluster_key")


def stratified_split_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: list[tuple[str, int]],
    salt: str = "split",
) -> DataFrame:
    """Exact stratified train/val/test assignment: each stratum is
    split into parts whose sizes are the LARGEST-REMAINDER (Hamilton)
    apportionment of its row count over integer ``weights`` — so the
    per-stratum split sizes are exactly right (a Bernoulli split is
    only right in expectation; at 20 strata × 3 parts the drift is
    visible in every eval), and membership is a deterministic function
    of (id, salt): rows rank within their stratum by md5 hash and the
    rank-interval decides the part.

    Scale: the apportionment runs on the per-stratum COUNTS (a
    vocabulary-grain frame, rows = strata × parts, KB); the only
    corpus-sized work is one partitionBy(stratum) rank window — the
    partitioned-window shape every per-group operation already pays.
    Returns df + (split_rank, split). Weights must sum to ≤ 10⁶ or
    any convenient base — only ratios matter.
    """
    from etl_rj_spark.operators.aggregates import prorate_largest_remainder

    wtot = sum(w for _, w in weights)
    counts = df.groupBy(F.col(stratum_col)).agg(F.count(F.lit(1)).alias("__n"))
    parts = counts.select(
        stratum_col, "__n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ord"), F.lit(name).alias("part"),
                    F.lit(int(w)).alias("w"),
                )
                for i, (name, w) in enumerate(weights)
            ])
        ).alias("__p"),
    ).select(
        stratum_col, "__n",
        F.col("__p.ord").alias("__ord"),
        F.col("__p.part").alias("__part"),
        F.col("__p.w").cast("long").alias("__w"),
    )
    sized = prorate_largest_remainder(
        parts, [stratum_col], "__w", "__n", tiebreak_cols=["__ord"], out_col="__sz"
    )
    w_cum = Window.partitionBy(stratum_col).orderBy("__ord")
    # rename the stratum key on the bounds side: both frames descend
    # from ``df``, so joining on same-named columns silently resolves
    # to a trivially-true self-reference
    bounds = sized.select(
        F.col(stratum_col).alias("__stratum"), "__part",
        F.sum("__sz").over(w_cum.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__lo"),
        F.sum("__sz").over(w_cum.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__hi"),
    ).withColumn("__lo", F.coalesce(F.col("__lo"), F.lit(0)))
    w_rank = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))),
        F.col(id_col),
    )
    ranked = df.withColumn("split_rank", F.row_number().over(w_rank))
    return (
        ranked.join(
            F.broadcast(bounds),
            # null-safe: a NULL stratum is a legitimate stratum (groupBy
            # and the rank window both treat NULLs as one group — a
            # null-unsafe equality would silently drop its rows here)
            F.col(stratum_col).eqNullSafe(F.col("__stratum"))
            & (F.col("split_rank") > F.col("__lo"))
            & (F.col("split_rank") <= F.col("__hi")),
        )
        .select(*df.columns, "split_rank", F.col("__part").alias("split"))
    )
