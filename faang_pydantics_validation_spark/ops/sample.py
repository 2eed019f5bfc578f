"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a per-partition RNG stream: the selected rows
change with partitioning, task retries, and resumed runs. A 100 TB corpus
feeding a training run needs the OPPOSITE — a sample that is a pure
function of each row's key, so reruns, resumes, and two clusters of
different sizes all select the SAME rows, and membership is auditable
row-by-row after the fact.

Everything here filters on ``u(key) = hash(key, salt) / 2^bits`` — a
uniform [0, 1) score per key:

* ``hash_fn='xxhash64'`` (default) — JVM codegen'd, the production path.
* ``hash_fn='md5'`` — top 60 bits of md5, bit-reproducible in DuckDB/
  any engine with md5 (same recipe as ops.dedup._hash64); used by parity
  tests and cross-engine audits.

Scale shape: ``sample_fraction`` / ``stratified_sample`` are pure
row-local filters — zero shuffle, fully pushdown-friendly (the filter
sits directly on the scan). ``sample_n_per_stratum`` is two-phase:
a broadcast of per-stratum counts turns the exact-N window into a
hash-prefilter (row-local, drops ~1 - oversample*n/count of each
stratum) followed by a window over the tiny survivor set — the full
table never sorts, and hot strata cost the same as cold ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _hash64

#: 2^60 — the md5 path keeps the top 60 bits; 2^53 for xxhash64 (exact
#: double mantissa; 2^64 is a multiple, so pmod stays perfectly uniform).
_MD5_DENOM = float(1 << 60)
_XX_DENOM = float(1 << 53)


def uniform_score(key: Column, salt: str = "", hash_fn: str = "xxhash64") -> Column:
    """Uniform [0, 1) double, a pure function of (key, salt).

    Different salts give independent samples over the same keys — e.g.
    a 1% eval split (salt='eval') disjoint-by-construction from a 10%
    train split (salt='train') requires comparing the two scores, while
    the SAME salt at growing fractions gives NESTED samples (the 1%
    sample is a subset of the 10% sample — stable train-set growth).
    """
    salted = F.concat(key.cast("string"), F.lit(f"\x1f{salt}")) if salt else key.cast("string")
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(salted), F.lit(1 << 53)) / F.lit(_XX_DENOM)
    if hash_fn == "md5":
        return _hash64(salted, None, "md5") / F.lit(_MD5_DENOM)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows with u(key) < fraction.

    Row-local filter, no shuffle; repeated runs (any partitioning, any
    cluster size) keep the identical row set.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(uniform_score(F.col(key_col), salt, hash_fn) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~fractions[s]
    of its rows (``default_fraction`` for strata not in the dict) — the
    standard rebalancing move (downsample boilerplate languages, keep all
    of the rare ones). The fraction map becomes a literal CASE chain, so
    this stays a row-local filter with zero shuffle at any stratum skew.
    """
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    frac: Column = F.lit(float(default_fraction))
    for s, f_ in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == s, F.lit(float(f_))).otherwise(frac)
    return df.filter(uniform_score(F.col(key_col), salt, hash_fn) < frac)


def sample_n_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    salt: str = "",
    hash_fn: str = "xxhash64",
    oversample: float = 4.0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically:
    the n smallest u(key) scores win (ties broken by key).

    Naive exact-N is a window sort over the FULL table partitioned by
    stratum — a hot stratum (one language at 40% of a 100 TB corpus)
    sorts on one reducer. Instead:

    1. per-stratum counts (partial+final agg, bounded by #strata),
    2. broadcast counts and hash-PREFILTER each stratum to expected
       ``oversample * n`` rows (row-local — this is where the table
       shrinks, at scan speed, identically on any cluster),
    3. exact top-n window over the tiny survivor set.

    The prefilter keeps u < min(1, oversample*n/count); the chance a
    stratum underflows below n survivors is Chernoff-small (< e^-n at
    oversample=4) and shrinks with n; raise ``oversample`` for paranoia —
    strata with count <= oversample*n skip the prefilter entirely
    (threshold saturates at 1).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    u = uniform_score(F.col(key_col), salt, hash_fn)
    counts = df.groupBy(F.col(strata_col).alias("__stratum")).agg(
        F.count(F.lit(1)).alias("__stratum_n")
    )
    pre = (
        df.withColumn("__u", u)
        .join(F.broadcast(counts), F.col(strata_col) == F.col("__stratum"))
        .filter(
            F.col("__u")
            < F.least(F.lit(1.0), F.lit(float(oversample * n)) / F.col("__stratum_n"))
        )
    )
    w = Window.partitionBy(strata_col).orderBy(F.col("__u"), F.col(key_col))
    return (
        pre.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__u", "__rk", "__stratum", "__stratum_n")
    )


def mixture_plan(
    counts: dict[str, int],
    weights: dict[str, float],
    total: int | None = None,
    *,
    max_epochs: int = 1,
) -> dict[str, float]:
    """Pure arithmetic: per-source sampling RATE (may exceed 1.0 =
    upsampling epochs) that realizes a target mixture.

    ``weights`` are the desired output PROPORTIONS (normalized here);
    ``counts`` the available rows per source. With ``total=None`` the
    plan maximizes output size without exceeding ``max_epochs`` passes
    over any source: total = min over s of count_s * max_epochs / w_s.
    With an explicit ``total``, rates are w_s * total / count_s, capped
    at ``max_epochs`` (a capped source falls short of its target and
    the realized mixture shifts — callers detect it by rate ==
    max_epochs).

    Driver-side math over one row per source — the DataFrame side
    (:func:`mixture_sample`) stays a row-local filter.
    """
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    missing = set(weights) - set(counts)
    if missing:
        raise ValueError(f"weights name sources absent from counts: {missing}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {s: w / wsum for s, w in weights.items() if w > 0}
    if total is None:
        total = min(counts[s] * max_epochs / w for s, w in norm.items())
    return {
        s: min(float(max_epochs), w * total / counts[s])
        for s, w in norm.items()
        if counts[s] > 0
    }


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_col: str,
    *,
    total: int | None = None,
    max_epochs: int = 1,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic corpus-mixture sampler: resample a multi-source
    table toward target proportions (the Pile/Llama-style mixture
    recipe), with optional upsampling of small sources by repeating
    them for multiple EPOCHS (rate 2.4 = every row twice + a 40%
    subsample the third time). Appends an ``epoch`` int column (0-based
    copy index); sources not named in ``weights`` are dropped.

    Two-phase like :func:`sample_n_per_stratum`: (1) ONE tiny
    count-per-source aggregation feeds :func:`mixture_plan` on the
    driver; (2) the sample itself is a row-local literal-map lookup +
    ``explode(sequence(...))`` + hash filter — zero shuffle, scan-fused,
    identical row set on any cluster size or resume. Epoch copies use
    per-epoch salts, so each partial epoch is an independent uniform
    subsample (and nested across growing rates, same salt discipline as
    :func:`uniform_score`).
    """
    counts = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(source_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    plan = mixture_plan(counts, weights, total, max_epochs=max_epochs)
    if not plan:
        return df.filter(F.lit(False)).withColumn("epoch", F.lit(0))
    rate_map = F.create_map(
        *[x for s, r in plan.items() for x in (F.lit(s), F.lit(float(r)))]
    )
    rate = rate_map[F.col(source_col)]
    # candidate epochs 0..ceil(rate)-1; epoch e survives when the
    # row's e-salted uniform score clears the remaining partial rate
    candidates = F.sequence(F.lit(0), F.ceil(rate).cast("int") - 1)
    out = (
        df.withColumn("__rate", rate)
        .filter(F.col("__rate").isNotNull())
        .withColumn("epoch", F.explode(candidates))
    )
    # guard: per-epoch threshold = clamp(rate - epoch, 0, 1)
    thresh = F.least(F.lit(1.0), F.col("__rate") - F.col("epoch"))
    scores = [
        (e, uniform_score(F.col(key_col), f"{salt}\x1fepoch{e}", hash_fn))
        for e in range(int(-(-max(plan.values()) // 1)))
    ]
    u = F.lit(1.0)
    for e, sc in reversed(scores):
        u = F.when(F.col("epoch") == e, sc).otherwise(u)
    return out.filter(u < thresh).drop("__rate")
