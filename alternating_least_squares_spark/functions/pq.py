"""Product-quantization ANN (IVF-PQ) — the memory-compression scale
path for similarity search.

Third ANN strategy next to the hyperplane LSH (:mod:`.similarity`) and
IVF-Flat (:mod:`.ivf`), and the one that changes the 100 TB economics:
candidate *scoring* never touches the full vectors. A 64-dim float64
embedding is 512 bytes; its PQ code is ``m`` small ints (``m=4`` here,
so ≈4 bytes in memory, tens of bytes as Spark ints) — the shuffled
candidate stream shrinks by two orders of magnitude, which is exactly
why FAISS serves billion-vector indexes from RAM (Jégou, Douze,
Schmid, "Product quantization for nearest neighbor search", TPAMI
2011 — public paper, public technique).

Shape of the computation, all built-in expressions (no Python in the
per-row path):

1. **train** — split the space into ``m`` subspaces of ``dim/m``
   dims; per subspace, a driver-side Lloyd loop on a BOUNDED sample
   (``MAX_TRAIN_ROWS``, FAISS-style — codebook quality needs a few
   thousand vectors, not the corpus) learns ``k_sub`` code centroids.
   Codebooks are tiny (``m*k_sub*dim/m`` floats) and ride the plan as
   literal arrays — no broadcast exchange, no shuffle.
2. **encode** — one narrow pass: each corpus vector becomes
   ``codes[m]``, the per-subspace argmin-distance centroid index.
3. **probe** — coarse IVF with LITERAL centroids (trained by the same
   driver-side Lloyd loop): list assignment and query probing are
   argmin/top-n expressions over inlined centroid arrays — pure
   codegen, no model broadcast, no nested-loop join anywhere in the
   plan (:mod:`.ivf` keeps the MLlib KMeans variant as the s03
   surface).
4. **ADC scan** — per query, a lookup table
   ``lut[i*k_sub+j] = <q_i, c_ij>`` (``m*k_sub`` doubles, built once
   per query by the same literal-codebook expressions); a candidate's
   approximate inner product is ``Σ_i lut[i*k_sub + codes[i]]`` — an
   array lookup-sum over the *codes*, never the vectors.
5. **rerank** — only the top ``rerank`` ADC survivors per query join
   back to the full embeddings for exact cosine; window top-k.

At 100 TB: steps 2 and 4 are the hot path and both are narrow
whole-stage-codegen over int arrays; the only wide ops are the probe
equi-join (fan-in ``n_probe/n_centroids`` of the corpus, as IVF-Flat)
and the final rerank join, whose left side is ``≤ rerank`` rows per
query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from alternating_least_squares_spark.functions.similarity import cosine

Codebooks = list[list[list[float]]]  # [m][k_sub][dim/m]


def _sub(vec: Column, i: int, d_sub: int) -> Column:
    """Subvector i (1-based slice), cast to double."""
    return F.transform(
        F.slice(vec, i * d_sub + 1, d_sub), lambda x: x.cast("double")
    )


def _lit_vec(values: list[float]) -> Column:
    # ONE ArrayType Literal node, not len(values) scalar Literals
    return F.lit([float(v) for v in values])


def _lit_mat(centroids: list[list[float]]) -> Column:
    return F.array(*[_lit_vec(c) for c in centroids])


def _dists_to(sub: Column, centroids: list[list[float]]) -> Column:
    """array<double>: squared distance from ``sub`` to EVERY centroid,
    via one ``transform`` over a 2-D centroid literal. One lambda trio
    per call site regardless of k — building a per-centroid aggregate
    each (k x 3 lambdas) made driver-side plan CONSTRUCTION, not
    execution, the dominant cost of the whole query."""
    return F.transform(
        _lit_mat(centroids),
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _dots_to(sub: Column, centroids: list[list[float]]) -> Column:
    """array<double>: inner product of ``sub`` with every centroid."""
    return F.transform(
        _lit_mat(centroids),
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


# Codebook training sample cap: 10k rows x 64 float64 = ~5 MB on the
# driver — two orders of magnitude below any broadcast/driver limit,
# and far more than 16-centroid subspace quantizers need.
MAX_TRAIN_ROWS = 10_000


def collect_train_sample(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str | None = None,
    max_train_rows: int = MAX_TRAIN_ROWS,
):
    """One distributed fetch of the bounded training sample as a numpy
    array — shared by the coarse quantizer and the codebooks so a
    combined training pass pays ONE job, not one per trainer. Ordered
    by ``id_col`` when given (TakeOrderedAndProject: per-partition
    top-k + driver merge, never a full sort shuffle) for a
    deterministic sample; arbitrary otherwise."""
    import numpy as np

    if id_col is not None:
        train = emb.orderBy(id_col).limit(max_train_rows)
    else:
        train = emb.limit(max_train_rows)
    train = train.select(F.col(vec_col).cast("array<double>").alias("_v"))
    x = np.array([r["_v"] for r in train.collect()], dtype=np.float64)
    if x.size == 0:
        raise ValueError("collect_train_sample: empty training set")
    return x


def train_pq_codebooks(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k_sub: int = 16,
    seed: int = 42,
    id_col: str | None = None,
    max_train_rows: int = MAX_TRAIN_ROWS,
    max_iter: int = 15,
    sample=None,
) -> Codebooks:
    """Per-subspace codebooks via driver-side Lloyd iterations on a
    BOUNDED sample — the FAISS recipe (codebooks train on ~100k
    vectors in memory regardless of corpus size). One distributed
    sample fetch (or a caller-shared ``sample`` array) replaces m
    MLlib KMeans fits: each fit is a multi-job distributed program
    with seconds of fixed overhead, absurd for a 16x16-float
    codebook. Like the IVF coarse quantizer, codebooks only partition
    space — capped iterations, no convergence needed. Returns plain
    nested lists so encode/LUT build can inline them as literals.

    Codebooks are ALWAYS ``k_sub`` entries (padded with repeats on a
    degenerate tiny sample): the LUT layout indexes ``i*k_sub + code``
    so the stride must be exact; encode's argmin ties to the lowest
    index, so padding never wins a code."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    import numpy as np

    d_sub = dim // m
    x = (
        sample
        if sample is not None
        else collect_train_sample(emb, vec_col, id_col, max_train_rows)
    )
    rng = np.random.default_rng(seed)
    return [
        _lloyd(
            x[:, i * d_sub : (i + 1) * d_sub], k_sub, rng, max_iter,
            pad_to=k_sub,
        )
        for i in range(m)
    ]


def _lloyd(
    xs, k: int, rng, max_iter: int, pad_to: int | None = None
) -> list[list[float]]:
    """Driver-side k-means++ + Lloyd on an in-memory sample.

    k-means++ seeding: each next center drawn ∝ distance² to the
    nearest chosen one — the standard fix for random-init's poor
    quantization (Arthur & Vassilvitskii 2007). Driver-side cost is
    k passes over ≤ MAX_TRAIN_ROWS rows: negligible.

    Returns min(k, |sample|) centroids; ``pad_to`` pads with repeats
    of the first centroid up to that count — ONLY for consumers whose
    indexing needs a fixed stride (the codebook LUT). Never pad a
    probed structure: a padded duplicate ties the real centroid's
    distance and can consume a probe slot that should have gone to a
    real list."""
    import numpy as np

    k_eff = min(k, xs.shape[0])
    first = int(rng.integers(xs.shape[0]))
    chosen = [first]
    d2min = ((xs - xs[first]) ** 2).sum(axis=1)
    for _ in range(1, k_eff):
        total = float(d2min.sum())
        if total <= 0.0:
            nxt = int(rng.integers(xs.shape[0]))
        else:
            nxt = int(rng.choice(xs.shape[0], p=d2min / total))
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((xs - xs[nxt]) ** 2).sum(axis=1))
    cents = xs[chosen].copy()
    for _ in range(max_iter):
        # squared-distance assign + mean update (plain Lloyd)
        d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k_eff):
            mask = assign == j
            if mask.any():
                cents[j] = xs[mask].mean(axis=0)
    if pad_to is not None and k_eff < pad_to:
        cents = np.vstack([cents] + [cents[:1]] * (pad_to - k_eff))
    return [[float(v) for v in c] for c in cents]


def train_coarse_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str | None = None,
    max_train_rows: int = MAX_TRAIN_ROWS,
    max_iter: int = 15,
    sample=None,
) -> list[list[float]]:
    """Full-dimension coarse-quantizer centroids via the same bounded
    driver-side Lloyd loop as the codebooks — returned as plain lists
    so the assign/probe expressions inline them as literals (no MLlib
    model, no broadcast, no nested-loop join in the plan). Returns
    min(n_centroids, |sample|) centroids, UNPADDED: a padded duplicate
    would tie a real centroid's distance in probe_lists_lit and steal
    a probe slot from a real inverted list (nothing downstream needs a
    fixed list count)."""
    import numpy as np

    x = (
        sample
        if sample is not None
        else collect_train_sample(emb, vec_col, id_col, max_train_rows)
    )
    return _lloyd(x, n_centroids, np.random.default_rng(seed), max_iter)


def _full_dists(vec: Column, centroids: list[list[float]]) -> Column:
    return _dists_to(F.transform(vec, lambda x: x.cast("double")), centroids)


def assign_lists_lit(
    df: DataFrame, centroids: list[list[float]], vec_col: str
) -> DataFrame:
    """Append ``list_id`` = nearest literal centroid. Narrow codegen
    (argmin over an inlined distance array), ties to lowest index."""
    d = _full_dists(F.col(vec_col), centroids)
    return df.withColumn(
        "list_id", (F.array_position(d, F.array_min(d)) - 1).cast("int")
    )


def probe_lists_lit(
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    n_probe: int,
) -> DataFrame:
    """(query_id, list_id, _q) for each query's ``n_probe`` nearest
    lists: sort an inlined (distance, id) struct array, slice, explode
    — per-row codegen, no join against a centroid table at all."""
    d = _full_dists(F.col(vec_col), centroids)
    ranked = F.array_sort(
        F.zip_with(
            d,
            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
            lambda dist, i: F.struct(
                dist.alias("d"), i.cast("int").alias("list_id")
            ),
        )
    )
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_q"),
        F.explode(F.slice(ranked, 1, n_probe)).alias("_probe"),
    ).select("query_id", F.col("_probe.list_id").alias("list_id"), "_q")


def encode_pq(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Narrow encode pass: (id, *keep, codes array<int>). ``codes[i]``
    is the argmin-distance centroid of subspace i — computed as
    ``array_position(dists, array_min(dists)) - 1`` over literal
    centroids, ties to the lowest index (deterministic). ``keep``
    carries extra columns (e.g. an inverted-list id) through the same
    projection so callers never need a self-join to reattach them."""
    m = len(codebooks)
    k_sub = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    code_cols = []
    for i in range(m):
        dists = _dists_to(_sub(F.col(vec_col), i, d_sub), codebooks[i])
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return emb.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.array(*code_cols).alias("codes"),
    )


def query_lut(
    queries: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, _lut array<double>) where
    ``_lut[i*k_sub + j] = <q_i, c_ij>`` — the ADC lookup table, one
    flat literal-codebook expression per query row."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    # flatten of per-subspace dot arrays lands exactly at the
    # lut[i*k_sub + j] layout adc_score indexes into
    lut = F.flatten(
        F.array(
            *[
                _dots_to(_sub(F.col(vec_col), i, d_sub), codebooks[i])
                for i in range(m)
            ]
        )
    )
    return queries.select(
        F.col(id_col).alias("query_id"), lut.alias("_lut")
    )


def adc_score(codes: Column, lut: Column, k_sub: int) -> Column:
    """Approximate inner product: ``Σ_i lut[i*k_sub + codes[i]]``.
    Pure array lookups — the full vectors are never touched."""
    return F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.size(codes) - 1),
            lambda code, i: F.element_at(
                lut, (i * k_sub + code + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    k_sub: int = 16,
    rerank: int = 32,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ top-k: coarse-probe → ADC scan over codes → exact-cosine
    rerank of the top ``rerank`` survivors. Returns
    (query_id, neighbor_id, cosine, rank) — same contract as
    :func:`~alternating_least_squares_spark.functions.ivf.ivf_topk`,
    so recall is directly comparable. Reported cosines are EXACT
    (approximation only prunes candidates, never fabricates scores)."""
    # ONE sample fetch feeds both trainers (the collects were the
    # dominant cost of the whole query before sharing)
    x = collect_train_sample(emb, vec_col, id_col)
    coarse = train_coarse_centroids(
        emb, vec_col, n_centroids, seed, sample=x
    )
    books = train_pq_codebooks(
        emb, vec_col, dim, m, k_sub, seed, sample=x
    )

    full = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_e")
    )
    corpus = assign_lists_lit(full, coarse, "_e")
    # The candidate stream carries ONLY (list_id, neighbor_id, codes),
    # built in ONE narrow projection over the assigned corpus: this is
    # the memory win — full vectors stay behind until the rerank join.
    corpus_codes = encode_pq(
        corpus, books, "neighbor_id", "_e", keep=("list_id",)
    )

    probes = probe_lists_lit(queries, coarse, id_col, vec_col, n_probe)
    luts = query_lut(queries, books, id_col, vec_col)
    # (query_id, neighbor_id) pairs are unique by construction: each
    # corpus vector lives in exactly ONE inverted list and probe_lists
    # emits each (query, list) once — no dedup needed.
    cand = (
        probes.select("query_id", "list_id")
        .join(luts, "query_id")
        .join(corpus_codes, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc_score(F.col("codes"), F.col("_lut"), k_sub).alias("_adc"),
        )
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("_adc"), F.asc("neighbor_id")
    )
    survivors = cand.withColumn("_rk", F.row_number().over(w_adc)).filter(
        F.col("_rk") <= rerank
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    scored = (
        survivors.select("query_id", "neighbor_id")
        .join(q, "query_id")
        .join(full, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_q"), F.col("_e")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)
