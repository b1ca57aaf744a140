"""Similarity & near-duplicate detection primitives (SURVEY.md §7
phase 4): shingling, MinHash, SimHash, n-gram Jaccard, embedding
cosine — designed partition-parallel for 100 TB (explode → hash-agg;
no driver-side state, no global sorts).

Cross-engine determinism: every hash routes through md5 (identical in
Spark and DuckDB) — Spark converts hex→int with ``conv``, the DuckDB
oracles with ``CAST('0x'||… AS BIGINT)`` (see queries/llmdata.py).
Engine-native hashes (xxhash64, DuckDB ``hash``) are deliberately NOT
used anywhere an oracle sees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import track_persist
from .text import ws_tokens

# MinHash parameters — shared with the oracle SQL generator.
# 31-bit universe: h < P, a,b < P, so a*h+b < 2^62 (no int64 overflow)
# and (a*h + b) % P genuinely permutes (wraps) the hash space.
MINHASH_PERMS = 16
MINHASH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31-1
MINHASH_HEX_DIGITS = 7  # 28-bit base hash, < P


def minhash_coeffs(num_perm: int = MINHASH_PERMS) -> list[tuple[int, int]]:
    """Deterministic (a, b) permutation coefficients from a fixed LCG —
    reproducible in any engine, no RNG dependency."""
    x, out = 42, []
    for _ in range(num_perm):
        x = (1103515245 * x + 12345) % MINHASH_PRIME
        a = x or 1
        x = (1103515245 * x + 12345) % MINHASH_PRIME
        out.append((a, x))
    return out


def md5_long(c: Column, n_hex: int = MINHASH_HEX_DIGITS) -> Column:
    """First ``n_hex`` hex digits of md5 as a non-negative long
    (≤ 15 digits → fits in 60 bits)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, n_hex), 16, 10).cast("long")


def word_shingles(text: str | Column, k: int) -> Column:
    """Array of word k-grams (space-joined). size<k texts yield their
    full token string as a single shingle so short docs still compare.

    PERF: the tokenization expression is captured inside the transform
    lambda and re-evaluated per position — quadratic per document. Use
    :func:`exploded_shingles` (which materializes the token array as a
    column first) anywhere throughput matters; this Column form is for
    short-text/ad-hoc use.
    """
    toks = ws_tokens(text)
    return _shingles_from_tokens(toks, k)


def _shingles_from_tokens(toks: Column, k: int) -> Column:
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(grams)


def exploded_shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) pairs, distinct per doc — the fan-out stage every
    sketch shares. At scale this is the only wide row-multiplier; all
    downstream steps are hash aggregations on id or shingle.

    Tokenizes into a materialized column first so the per-position
    slice lambda is O(k), not O(tokens) — 6× faster than inlining the
    tokenizer into the transform.
    """
    toks = docs.select(F.col(id_col), ws_tokens(text_col).alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.explode(_shingles_from_tokens(F.col("__toks"), k)).alias("shingle"),
    )


def minhash_signature(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3,
    num_perm: int = MINHASH_PERMS,
) -> DataFrame:
    """One row per doc: ``sig_0..sig_{n-1}`` minhash components.

    min((a_j * h + b_j) mod P) over the doc's shingle set — a plain
    groupBy with N min-aggregates: partial-aggregated map-side, single
    shuffle on the doc id.
    """
    sh = exploded_shingles(docs, id_col, text_col, k)
    return minhash_signature_from_shingles(sh, id_col, num_perm)


def minhash_signature_from_shingles(
    sh: DataFrame, id_col: str, num_perm: int = MINHASH_PERMS
) -> DataFrame:
    """Minhash signature over an existing (id, shingle) frame — lets a
    caller that also needs the exploded shingles (e.g. exact-Jaccard
    verification) tokenize/shingle ONCE, persist that frame, and derive
    the signature from it instead of re-running the fan-out."""
    h = md5_long(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"sig_{j}")
        for j, (a, b) in enumerate(minhash_coeffs(num_perm))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def banded_keys(
    sig: DataFrame, id_col: str, num_perm: int = MINHASH_PERMS, bands: int = 4
) -> DataFrame:
    """(id, band_idx, band_key) rows for a signature frame — the narrow
    representation every LSH join runs on. The band join carries ONLY
    these three columns; the 2×num_perm signature columns rejoin AFTER
    pair dedup, so the wide rows never ride the (potentially skewed)
    bucket-join shuffle."""
    r = num_perm // bands
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "-", *[F.col(f"sig_{b * r + i}") for i in range(r)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_entries).alias("band")).select(
        F.col(id_col),
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def lsh_band_pairs(
    sig: DataFrame,
    id_col: str,
    num_perm: int = MINHASH_PERMS,
    bands: int = 4,
    cache: bool = True,
) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band (id_a < id_b), with the
    matching-component count for a Jaccard estimate.

    Banding: signature split into ``bands`` contiguous groups; band key
    is the concatenated components. Bands explode into rows so ONE
    self-equi-join on (band_idx, band_key) covers all bands — a plan
    with per-band joins re-evaluates the whole signature pipeline per
    band per side. Signatures are persisted (they're tiny relative to
    the corpus; at 100 TB you'd checkpoint them to a table anyway).
    Bucket skew is handled by AQE's skew-join splitting.
    """
    if cache:
        sig = track_persist(sig)
    banded = banded_keys(sig, id_col, num_perm, bands)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sig_{j}").alias(f"a_sig_{j}") for j in range(num_perm)],
    )
    sig_b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sig_{j}").alias(f"b_sig_{j}") for j in range(num_perm)],
    )
    matches = sum(
        (F.col(f"a_sig_{j}") == F.col(f"b_sig_{j}")).cast("int") for j in range(num_perm)
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            matches.alias("n_matching"),
            (matches.cast("double") / num_perm).alias("jaccard_est"),
        )
    )


def simhash32(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash fingerprint per doc from the distinct token set.

    Classic sign-of-weighted-bit-sums construction: explode tokens,
    one groupBy with 32 sum aggregates (±1 per bit), recombine. All
    JVM-side integer arithmetic.
    """
    # rebalance an under-split scan before the tokenize+explode fan-out
    # (guide §2.5 — the sf0.1 documents file is one split, so the
    # 32-aggregate map side ran on one core); adaptive, skipped by
    # well-partitioned inputs
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(ws_tokens(text_col))).alias("tok"),
    )
    h = md5_long(F.col("tok"), 8)  # 32 bits
    aggs = [
        F.sum(((h.bitwiseAND(F.lit(1 << b)) != 0).cast("int") * 2 - 1)).alias(f"s_{b}")
        for b in range(32)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = sum(
        F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(32)
    )
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, k: int = 5, threshold: float = 0.4
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Shingle-inverted-index join: pairs only materialize for docs
    sharing a shingle. Exact but quadratic in bucket size — the LSH
    variant is the 100 TB path; this is the precision baseline.
    """
    sh = exploded_shingles(docs, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        # sa/sb are one row PER DOC (unbounded) — no broadcast hint; the
        # join keys are the pair ids the candidates are already keyed by,
        # so the planner shuffles or broadcasts as actual sizes dictate
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# ---------------------------------------------------------------------------
# Embedding cosine similarity (fixed-point dot products → deterministic)
# ---------------------------------------------------------------------------

# Quantize components at 2^-20: x*2^20 is EXACT in binary floating point
# (pure exponent shift), so floor() yields identical integers in every
# engine — unlike float→decimal casts, whose rounding is engine-defined.
FIXED_POINT_SCALE = 1 << 20


def fixed_point(x: Column) -> Column:
    return F.floor(x.cast("double") * FIXED_POINT_SCALE).cast("long")


def _fx_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of fixed-point-quantized vectors.
    |component| < 1 → products < 2^40; 64-dim sums ≪ 2^63."""
    prods = F.zip_with(a, b, lambda x, y: fixed_point(x) * fixed_point(y))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


def fx_dot(a: Column, b: Column) -> Column:
    """Public exact fixed-point dot (see _fx_dot). Precompute
    ``fx_dot(v, v)`` ONCE per vector and divide by
    ``sqrt(na * nb)`` at pair time — inside a pairwise join,
    ``cosine_against`` re-derives both norms per PAIR (3x the array
    work), which is the difference between O(pairs) and O(3*pairs)
    higher-order-function evaluations."""
    return _fx_dot(a, b)


def cosine_against(query_vec: Column, vec: Column) -> Column:
    """cosine(query, vec) with deterministic cross-engine arithmetic:
    integer dot/norms, then the same double expression order."""
    dot = _fx_dot(vec, query_vec).cast("double")
    na = _fx_dot(vec, vec).cast("double")
    nb = _fx_dot(query_vec, query_vec).cast("double")
    return dot / F.sqrt(na * nb)


def random_hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """±1 hyperplane components from md5 — computed driver-side in
    Python and emitted as literals into the plan (and into oracle SQL),
    so no cross-engine hashing is involved."""
    import hashlib

    signs = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"hyperplane-{j}-{i}".encode()).digest()[0]
            row.append(1 if h % 2 == 0 else -1)
        signs.append(row)
    return signs


def hyperplane_projections(vec: Column, signs: list[list[int]]) -> list[Column]:
    """Exact fixed-point projection of ``vec`` onto each sign vector."""
    projs = []
    for row in signs:
        sv = F.array(*[F.lit(s).cast("long") for s in row])
        prods = F.zip_with(sv, vec, lambda s, v: s * fixed_point(v))
        projs.append(F.aggregate(prods, F.lit(0).cast("long"), lambda a, x: a + x))
    return projs


def lsh_cosine_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int = 4,
    planes_per_table: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Approximate near-dup pairs: multi-table random-hyperplane LSH for
    candidate generation, exact fixed-point cosine refine.

    Few planes per table keeps recall up (collision prob (1-θ/π)^p per
    table), multiple tables union candidates; the exact refine keeps
    precision at 1. All stages are joins/aggregations on small keys —
    the 100 TB pattern where brute-force O(n²) cosine is impossible.
    """
    signs = random_hyperplane_signs(n_tables * planes_per_table, dim)
    projs = hyperplane_projections(F.col(vec_col), signs)
    bucket_cols = []
    for t in range(n_tables):
        bits = [
            F.when(projs[t * planes_per_table + p] > 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(planes_per_table)
        ]
        bucket_cols.append(sum(bits).cast("int").alias(f"bucket_{t}"))
    # Persisted once; read three times (bucket explode + two vector
    # rejoins). Buckets are computed in this single narrow pass — the
    # old per-table join loop re-evaluated this subtree 8× (2 sides ×
    # 4 tables).
    bucketed = track_persist(
        emb.select(F.col(id_col), F.col(vec_col), *bucket_cols)
    )

    # All tables in ONE self-equi-join: explode (table_idx, bucket)
    # entries into rows, join on the composite key carrying only ids —
    # vectors rejoin after pair dedup so dim floats never ride the
    # bucket shuffle.
    table_entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_idx"), F.col(f"bucket_{t}").alias("bucket")
            )
            for t in range(n_tables)
        ]
    )
    tabled = bucketed.select(F.col(id_col), F.explode(table_entries).alias("e")).select(
        F.col(id_col),
        F.col("e.table_idx").alias("table_idx"),
        F.col("e.bucket").alias("bucket"),
    )
    a, b = tabled.alias("a"), tabled.alias("b")
    pairs = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    va = bucketed.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = bucketed.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = pairs.join(va, "id_a").join(vb, "id_b")

    dot = _fx_dot(F.col("va"), F.col("vb")).cast("double")
    na = _fx_dot(F.col("va"), F.col("va")).cast("double")
    nb = _fx_dot(F.col("vb"), F.col("vb")).cast("double")
    cos = dot / F.sqrt(na * nb)
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def del1_variants(s: Column) -> Column:
    """The string plus every single-character deletion of it — the
    deletion-neighborhood blocking key set for edit-distance-1 joins:
    two strings within one edit (insert/delete/substitute at equal
    length ±1) share at least one variant, so an equi-join on variants
    finds every candidate without the O(n²) all-pairs compare. ~len(s)
    keys per row; refine survivors with an exact levenshtein."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def fuzzy_del1_pairs(
    df: DataFrame, id_col: str, str_col: str, max_dist: int = 1
) -> DataFrame:
    """Distinct (id_a, id_b, dist) pairs with levenshtein ≤ max_dist,
    found via deletion-neighborhood blocking + exact refine. The join
    carries (id, variant) only; strings rejoin for the refine. At 100 TB
    the variant explosion is ~avg-len× the input — bounded, unlike the
    quadratic it replaces; variant-key skew (short common strings)
    splits under AQE like any hot hash key."""
    v = df.select(
        F.col(id_col), F.explode(del1_variants(F.col(str_col))).alias("variant")
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(b, ["variant"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = df.select(F.col(id_col).alias("id_a"), F.col(str_col).alias("__sa"))
    sb = df.select(F.col(id_col).alias("id_b"), F.col(str_col).alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("__sa", "__sb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def simhash_hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 1,
    fp_bits: int = 32,
) -> DataFrame:
    """All id pairs (id_a < id_b) whose fingerprints differ in at most
    ``max_hamming`` bits — fingerprint-contracted pigeonhole banding.

    ``max_hamming + 1`` contiguous bit-spans: two fingerprints within
    the radius must agree on at least one span (pigeonhole), so an
    equi-join on exploded (band_idx, band_key) rows over the DISTINCT
    fingerprint table is exhaustive; exact ``bit_count(xor)`` refines.
    Duplicate-heavy corpora collapse many ids onto few fingerprints, so
    candidates generate in contracted space and doc pairs re-expand
    through keyed membership joins — the only large product is the
    output itself (measured 190 s → 9 s at the local sf1).
    """
    if fp_bits > 63:
        raise ValueError("fp_bits must fit a non-negative signed long (<= 63)")
    # Eager checkpoint, not lazy persist (r17, the r16 race-kill
    # class): the final union's single action launches its subquery
    # jobs concurrently, and FIVE consumers read this frame (fps
    # distinct, ma/mb membership, s1/s2 within-join) — on a cold cache
    # each re-ran the 32-aggregate simhash groupBy. Narrow frame (id +
    # one long), the safe side of the r16 wide-payload counter-case.
    from ..caching import track_local_checkpoint

    sig = track_local_checkpoint(
        sig.select(F.col(id_col), F.col(fp_col).alias("__fp"))
    )
    pieces = max_hamming + 1
    width = fp_bits // pieces
    fps = sig.select("__fp").distinct()
    bands = []
    for b in range(pieces):
        start = b * width
        w = width if b < pieces - 1 else fp_bits - start
        # integer bit extraction (shiftright + pmod) — float division
        # would corrupt band keys above 2^53
        bands.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.pmod(F.shiftright(F.col("__fp"), start), F.lit(1 << w)).alias(
                    "band_key"
                ),
            )
        )
    banded = fps.select("__fp", F.explode(F.array(*bands)).alias("b")).select(
        "__fp",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
    )
    fa, fb = banded.alias("fa"), banded.alias("fb")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("bigint")
    fpairs = (
        fa.join(
            fb,
            (F.col("fa.band_idx") == F.col("fb.band_idx"))
            & (F.col("fa.band_key") == F.col("fb.band_key"))
            & (F.col("fa.__fp") < F.col("fb.__fp")),
        )
        .groupBy(F.col("fa.__fp").alias("sh_a"), F.col("fb.__fp").alias("sh_b"))
        .agg(F.count(F.lit(1)).alias("_nb"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("sh_a", "sh_b", "hamming")
    )
    ma = sig.select(F.col("__fp").alias("sh_a"), F.col(id_col).alias("id_x"))
    mb = sig.select(F.col("__fp").alias("sh_b"), F.col(id_col).alias("id_y"))
    cross = fpairs.join(ma, "sh_a").join(mb, "sh_b").select(
        F.least("id_x", "id_y").alias("id_a"),
        F.greatest("id_x", "id_y").alias("id_b"),
        "hamming",
    )
    s1, s2 = sig.alias("s1"), sig.alias("s2")
    within = (
        s1.join(
            s2,
            (F.col("s1.__fp") == F.col("s2.__fp"))
            & (F.col(f"s1.{id_col}") < F.col(f"s2.{id_col}")),
        )
        .select(
            F.col(f"s1.{id_col}").alias("id_a"),
            F.col(f"s2.{id_col}").alias("id_b"),
            F.lit(0).cast("bigint").alias("hamming"),
        )
    )
    return within.unionByName(cross)


def prefix_filter_postings(
    w: DataFrame,
    threshold: float,
    id_col: str = "rep",
    term_col: str = "term",
    weight_col: str = "w",
    df_col: str = "df",
) -> DataFrame:
    """Exact prefix filtering (AllPairs / L2AP bound) for thresholded
    cosine over sparse postings: returns the subset of ``w``'s
    (id, term) postings whose self-join is guaranteed to touch every
    pair with cosine >= ``threshold``.

    Terms get a single global order — commonest first, ``(df DESC,
    term DESC)`` — and each document DROPS the head of its posting
    list holding (just under) ``t`` of its squared-L2 mass, keeping
    the rare-term remainder.  Exactness: if two documents share NO
    kept posting, every shared term lies in both dropped heads, so by
    Cauchy-Schwarz over the two heads ``cos <= sqrt(headA_sq/nrmA_sq)
    * sqrt(headB_sq/nrmB_sq) < sqrt(t)*sqrt(t) = t`` — any pair at or
    above the threshold shares a kept posting, making the reduced
    self-join an exact candidate generator.  (An earlier version cut
    at ``t^2``, which the same argument shows is needlessly
    conservative — it proves ``cos < t^2``; cutting at ``t`` drops
    strictly more mass and stays exact.)  Power-law high-df terms
    ("of the" bigrams) carry near-zero idf weight, so they fall out
    of every prefix: per-term candidate generation is bounded by the
    rare-term posting lists instead of growing as sum(df^2) over
    stopword lists — the property that keeps the join alive at 100 TB.

    The cut is evaluated in double arithmetic against
    ``threshold * (1 - 1e-9)``: the margin strictly exceeds double
    summation rounding, so prefixes only ever get conservatively
    LONGER — exactness is never at risk, only a few extra candidates.
    """
    from pyspark.sql import Window

    w2 = F.col(weight_col).cast("double") * F.col(weight_col).cast("double")
    rev = (
        Window.partitionBy(id_col)
        .orderBy(F.col(df_col).desc(), F.col(term_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    whole = Window.partitionBy(id_col)
    cut = float(threshold) * (1.0 - 1e-9)
    return (
        w.withColumn("__tail_sq", F.sum(w2).over(rev))
        .withColumn("__nrm_sq", F.sum(w2).over(whole))
        .filter(F.col("__tail_sq") >= F.lit(cut) * F.col("__nrm_sq"))
        .drop("__tail_sq", "__nrm_sq")
    )
