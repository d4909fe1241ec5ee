"""IVF (inverted-file) approximate nearest neighbor — the k-means-cell
counterpart to the random-hyperplane LSH in plans/similarity_queries.py.

Build: deterministic centroid init (evenly strided ids) + fixed Lloyd
iterations, structured the way k-means actually scales on Spark (it is how
MLlib's KMeans is shaped):

    assign:  centroids are k x dim doubles — collected to the driver and
             embedded as LITERALS, so assignment is a narrow projection over
             the corpus scan (argmin of k squared distances). No join, no
             shuffle, no per-row Python.
    update:  groupBy(cell) with one SUM column per dimension — partial
             aggregation map-side, the shuffle carries k x (dim+1) doubles
             total. No collect_list, no per-cell array state.

Search: queries probe their ``nprobe`` nearest cells (same literal argmin);
candidates are the corpus rows in those cells (equi-join on cell id — the
ONLY corpus shuffle in the whole operator), then exact cosine rank.

At a billion vectors: k ~ sqrt(n) centroids still fit the driver/broadcast
comfortably for dim<=1024; the per-iteration cost is one corpus scan + a
k-row shuffle. Ties (equidistant centroids) break to the lowest cell id, so
the index is bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


# All vector math is unrolled to fixed-length element_at chains: Catalyst
# evaluates higher-order-function lambdas interpreted per element (no
# codegen); unrolling keeps the scan inside whole-stage codegen. Left-
# associated addition preserves sequential fold order for reproducibility.
# Chains are built as SQL text and parsed engine-side — a dim-length Column
# chain costs one py4j round-trip per operator node (seconds of driver time
# per plan build); parsing the text costs milliseconds. Helpers take column
# NAMES, not Columns (see plans/similarity_queries.py for the same pattern).


def adaptive_cell_count(n: int, kmin: int = 16, kmax: int = 1024) -> int:
    """Scale-adaptive cell count: k = clamp(2^(floor(bitlen(n)/2)), kmin, kmax)
    — the power-of-two ~sqrt(n), in exact integer arithmetic so an independent
    engine derives the identical k from the same row count (DuckDB:
    ``1 << (LENGTH(BIN(n)) // 2)``; no libm, no float boundary).

    Why sqrt: assignment cost is n*k and within-cell pair cost (SemDeDup) is
    ~n^2/k; k ~ sqrt(n) balances both at n^1.5 — a FIXED k leaves the pair
    term O(n^2), the saturation cliff class the adaptive SimHash banding
    removed. Above kmax (n > ~2^20) the literal centroid matrix should move
    from a parsed SQL literal to a broadcast centroid table — the knob is the
    centroid transport, the plan shape (narrow argmin assign + cell equi-join)
    is unchanged."""
    if n <= 0:
        return kmin
    return min(kmax, max(kmin, 1 << (n.bit_length() // 2)))


def adaptive_nprobe(k: int) -> int:
    """nprobe = max(2, k // 8): holds the probed-cell FRACTION (~1/8) constant
    as k scales, so recall does not collapse when the corpus (and therefore k)
    grows. DuckDB twin: ``GREATEST(2, k // 8)``."""
    return max(2, k // 8)


def _dot(a: str, b: str, dim: int) -> Column:
    return F.expr(
        " + ".join(
            f"(element_at({a}, {i}) * element_at({b}, {i}))" for i in range(1, dim + 1)
        )
    )


def _norm(c: str, dim: int) -> Column:
    return F.expr(
        "sqrt("
        + " + ".join(
            f"(element_at({c}, {i}) * element_at({c}, {i}))" for i in range(1, dim + 1)
        )
        + ")"
    )


def _dists_expr(e: Column, centroids: list[list[float]]) -> Column:
    """Array of squared distances to every centroid. Deliberately a nested
    higher-order-function expression over a 2-D literal array, NOT an
    unrolled chain: k x dim unrolled terms (16x64 here) blow up codegen
    compilation time across the many small k-means jobs; the compact HOF
    expression compiles instantly and its interpreted evaluation is cheap at
    k*dim ops per row. The centroid matrix literal is built as SQL TEXT and
    parsed engine-side: F.lit on a k*dim nested Python list marshals every
    element through py4j (~1s per call for 16x64 — measured), while parsing
    the equivalent array(array(...)) literal text costs milliseconds.
    repr(float) round-trips exactly, so the parsed doubles are bit-identical
    to the Python values."""
    C = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids
        )
        + ")"
    )
    return F.transform(
        C,
        lambda c: F.aggregate(
            F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def _cell_expr(e: Column, centroids: list[list[float]]) -> Column:
    """argmin over literal centroids; array_position returns the FIRST match,
    so equidistant ties resolve to the lowest cell id."""
    dists = _dists_expr(e, centroids)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("long")


# k*dim product above which the literal+interpreted-HOF assignment saturates.
# Measured at sf10 (5M vectors, the adaptive-k 1024 clamp binding, k*dim =
# 65,536): a single executor task sat minutes-deep in ZipWith.eval — the
# nested-HOF argmin is evaluated INTERPRETED per element, so per-row cost is
# k*dim boxed operations. 256 cells x 64 dims (= sf0.1's derived k) is the
# last scale where the interpreted path's per-row cost stays inside the
# job-overhead noise floor; above it the Arrow-batched kernel takes over.
_VEC_ASSIGN_THRESHOLD = 256 * 64


def assign_cells(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """vectors(id, e) -> (id, e, cell): a narrow projection (no shuffle).

    Two physical strategies, bit-identical results AND identical contract
    (pinned by tests/test_ivf.py): below _VEC_ASSIGN_THRESHOLD the argmin
    runs as a Catalyst expression over the literal centroid matrix (zero
    Python, fine for small k); above it — the adaptive k has grown past
    ~256 cells — the same argmin runs as a NumPy kernel over Arrow batches
    (_assign_cells_np), whose per-dimension accumulation order reproduces
    the HOF fold exactly, so the switch is invisible to the oracle. A
    pre-existing 'cell' column raises on BOTH paths (withColumn would
    silently clobber it on one path and Arrow would reject it on the
    other — the error must not depend on corpus size)."""
    if "cell" in vectors.columns:
        raise ValueError("input already has a 'cell' column")
    if len(centroids) * len(centroids[0]) > _VEC_ASSIGN_THRESHOLD:
        return _assign_cells_np(vectors, centroids)
    return vectors.withColumn("cell", _cell_expr(F.col("e"), centroids))


def _assign_cells_np(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Arrow-batched nearest-centroid assignment: the 'beyond the literal'
    transport the module docstring promises for large k. The centroid
    matrix rides to the workers inside the function closure (k x dim
    doubles — broadcast-sized by construction); each Arrow batch computes
    all k squared distances VECTORIZED over rows but SEQUENTIALLY over
    dimensions:

        d := (x_0-c_0)^2; d := d + (x_i-c_i)^2  (i ascending)

    which is element-for-element the same IEEE operation order as the HOF
    path's F.aggregate fold (and the DuckDB oracle's list_sum) — so the
    assignment is bit-identical across all three, not merely close.
    np.argmin returns the FIRST minimum, matching array_position's
    tie-to-lowest-cell rule. Cost: k*dim flops per row at NumPy speed
    (~100x the interpreted HOF), no join, no shuffle, no giant literal in
    the plan (at k=1024 the literal alone was a 1.3 MB expression every
    consumer re-analyzed)."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    in_names = [f.name for f in vectors.schema.fields]

    def kernel(batches):
        for b in batches:
            e_col = b.column(b.schema.get_field_index("e"))
            n = len(e_col)
            if n == 0:
                continue
            # list<double> with uniform lengths: flatten -> (n, dim)
            flat = e_col.flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, dim)
            d = np.square(X[:, 0:1] - C[None, :, 0])
            for i in range(1, dim):
                t = X[:, i : i + 1] - C[None, :, i]
                d += np.square(t)
            cells = np.argmin(d, axis=1).astype(np.int64)
            # pass EVERY input column through untouched (same contract as
            # the withColumn literal path — no size-dependent schema flip)
            yield pa.record_batch(
                [b.column(j) for j in range(b.num_columns)]
                + [pa.array(cells, pa.int64())],
                names=list(b.schema.names) + ["cell"],
            )

    out_schema = T.StructType(
        list(vectors.schema.fields) + [T.StructField("cell", T.LongType())]
    )
    assert "cell" not in in_names  # assign_cells guards both paths
    return vectors.mapInArrow(kernel, schema=out_schema)


def build_ivf_index(
    vectors: DataFrame, k: int | None = 16, iterations: int = 2,
    train_per_centroid: int = 256,
) -> tuple[DataFrame, list[list[float]]]:
    """vectors: (id: long, e: array<double>). Returns (assignments(id, e, cell),
    centroids as a k x dim Python list). Deterministic end-to-end.
    ``k=None`` derives the scale-adaptive cell count from the corpus row
    count (adaptive_cell_count — power-of-two ~sqrt(n)).

    TRAINING SAMPLE: Lloyd iterations run over a deterministic strided
    sample of ~``train_per_centroid * k`` vectors (FAISS's default trains
    on 256 points per centroid), not the full corpus — at 100 TB a
    full-corpus scan per k-means round is the build's dominant cost and
    adds nothing to centroid quality. The stride is exact integer
    arithmetic (``id % tstride = 0`` over contiguous ids), so an
    independent engine (the DuckDB oracle) reproduces the same sample and
    therefore the same centroids bit-for-bit. Corpora smaller than the
    target train on everything (tstride clamps to 1 — small-SF results
    are unchanged). Seeds and the FINAL assignment still cover the full
    corpus.

    The corpus is cached for the build: the count, seed collect, and each
    Lloyd iteration are separate jobs that would otherwise re-scan and
    re-decode the parquet every time — the standard iterative-Spark setup
    (MLlib KMeans does the same)."""
    vectors = vectors.cache()
    n = vectors.count()
    if k is None:
        k = adaptive_cell_count(n)
    stride = max(1, n // k)
    init_ids = [i * stride for i in range(k)]
    seed_rows = (
        vectors.filter(F.col("id").isin(init_ids)).orderBy("id").select("e").collect()
    )
    centroids = [list(r.e) for r in seed_rows]
    dim = len(centroids[0])
    tstride = max(1, n // (k * train_per_centroid))
    train = (
        vectors if tstride == 1 else vectors.filter(F.col("id") % tstride == 0)
    )

    for _ in range(iterations):
        assigned = assign_cells(train, centroids)
        # Per-cell componentwise sums via posexplode -> (cell, pos) aggregate:
        # two expressions regardless of dim (a dim-wide agg column list made
        # every iteration's plan analysis the dominant cost). The shuffle
        # carries k*dim partial rows — tiny at any corpus size.
        #
        # The sum runs in SCALED INT64 (round(val * 1e9)), not double: double
        # addition is order-dependent across shuffle partials, which would
        # make the centroids run-dependent and unmatchable by an independent
        # reimplementation (the DuckDB oracle in plans/operator_queries.py
        # rebuilds this exact k-means). Integer addition is associative, so
        # the centroid is bit-identical however Spark pairs the partials.
        # Range check: |val| <= ~1 here, so one element is <= ~1e9 and int64
        # holds ~9e18 — room for ~1e9 rows per cell per dimension; beyond
        # that widen to sum(decimal(38,0)) partials.
        stats = (
            assigned.select("cell", F.posexplode("e").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.round(F.col("val") * 1_000_000_000).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in stats:
            sums.setdefault(int(r.cell), [0] * dim)[int(r.pos)] = int(r.s)
            counts[int(r.cell)] = int(r.n)
        centroids = [
            [(sums[c][i] / 1e9) / counts[c] for i in range(dim)]
            if c in counts
            else centroids[c]  # empty cell keeps its previous centroid
            for c in range(len(centroids))
        ]

    # Cache the FINAL assignment, not just the input vectors: assign_cells
    # is an interpreted-HOF argmin over k centroids, so with adaptive
    # k ~ sqrt(n) an uncached return recomputes n*k*dim ops on every
    # consumer action (measured: knn_ivf 4.8 s -> 33 s at sf1/k=128 when
    # left lazy). The cached frame IS the persisted IVF index a production
    # pipeline stores. It is materialized HERE (count) so the build-scoped
    # input-vectors cache can be released before returning — otherwise
    # every distinct corpus pins its vector cache for the whole session.
    assignments = assign_cells(vectors, centroids).cache()
    assignments.count()
    vectors.unpersist()
    return assignments, centroids


def probe_cells_expr(
    e: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The nprobe nearest cell ids for a query vector column: squared
    distances against the literal centroid matrix, (distance, cell) structs
    sorted (ties to lowest cell id via the struct order), first nprobe
    kept. Shared by ivf_search and the composed IVF-PQ search."""
    dists = _dists_expr(e, centroids)
    return F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("cell")),
                )
            ),
            lambda s: s.cell.cast("long"),
        ),
        1,
        nprobe,
    )


def ivf_search(
    assignments: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    top_k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """queries: (qid, qe). Probe the nprobe nearest cells per query; exact
    cosine rank within candidates. Returns (query_id, neighbor_id, cos_sim, rn)."""
    probe_cells = probe_cells_expr(F.col("qe"), centroids, nprobe)
    dim = len(centroids[0])
    # Norms are computed ONCE per vector scan-side (before the candidate
    # join), not per candidate pair — a query probing c candidates would
    # otherwise recompute its 64-term norm c times. Same arithmetic on the
    # same values, so results are bit-identical.
    qcells = queries.withColumn("qnrm", _norm("qe", dim)).select(
        "qid", "qe", "qnrm", F.explode(probe_cells).alias("cell")
    )
    corpus = assignments.withColumn("cnrm", _norm("e", dim))
    # queries x nprobe rows are tiny at any scale — broadcast them so the
    # candidate equi-join is a map-side hash probe over the corpus scan, not
    # a corpus shuffle (the ONLY potential corpus shuffle in the operator).
    cands = corpus.join(F.broadcast(qcells), "cell").filter(
        F.col("id") != F.col("qid")
    )
    scored = cands.select(
        F.col("qid").alias("query_id"),
        F.col("id").alias("neighbor_id"),
        F.round(
            _dot("qe", "e", dim) / (F.col("qnrm") * F.col("cnrm")),
            4,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= top_k)
    )
