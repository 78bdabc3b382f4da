"""Semantic deduplication over embeddings (SemDeDup shape: Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" — cluster the embedding space, then drop
near-identical members WITHIN each cluster).

This is the third dedup family next to lexical near-dup (MinHash/
SimHash/Jaccard) and exact hashing: it catches paraphrases and
re-encodings that share no surface n-grams but embed to almost the
same point.

Spark-first shape (every stage bounded / bucketed):

1. **centroids** train DRIVER-SIDE with seeded Lloyd's on a
   hash-selected bounded sample (identical pattern to PQ codebook
   training, ``build_pq_index``): at 100 TB the driver sees at most
   ``max_train_rows`` vectors.
2. **assignment** is ONE columnar projection — squared distance to
   each broadcast-literal centroid via ``F.transform`` + argmin; no
   shuffle, no Python.
3. **within-cluster pairs**: self-join ON the cluster id (shuffle
   keyed by cluster — candidate count is Σ|cluster|², never N²).
   ``num_clusters`` DERIVES from the corpus size when not given
   (~N / TARGET_CLUSTER_SIZE, floor 16 — the SemDeDup paper runs
   O(100k) clusters at web scale), so the expected candidate volume
   is ~N·TARGET_CLUSTER_SIZE — linear, whatever the corpus size.
   A pathological mega-cluster (mass of near-identical embeddings)
   is additionally SALTED into ≤ ``max_pair_cluster_size`` cells
   (pairs form within a cell only — the same bounded-recall trade
   the LSH banding tiers make), so the per-key candidate bound
   holds even under adversarial skew. Cosine is computed on
   pre-normalized vectors, so the pair predicate is one dot product.
4. **canonicalization**: pairs above threshold feed the existing
   ``connected_components`` operator; the keeper of each semantic
   cluster is the min id (content-defined, deterministic) — SemDeDup
   keeps one representative per duplicate group; which one is a free
   policy choice, and min-id is the partitioning-independent one.

Deterministic end-to-end: seeded centroid sample + seeded Lloyd's,
columnar assignment, min-id keepers — no partitioning sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tfm_semisup_spark.operators.components import connected_components


# Adaptive num_clusters targets this expected cluster size: with
# k = max(16, N / TARGET_CLUSTER_SIZE) the within-cluster candidate
# volume is E[Σ|c|²] ≈ N · TARGET_CLUSTER_SIZE — linear in N. The
# r1-r3 fixed default (16) made it N²/16: quadratic at any scale
# (VERDICT r3 #1, the PQ-train_mod latent-default bug class).
TARGET_CLUSTER_SIZE = 1_000
MAX_CLUSTERS = 131_072  # SemDeDup paper: O(100k) clusters at web scale

# Driver-side Lloyd's cost is sample_rows × k × dim per iteration; past
# a few thousand clusters the O(100k-row) sample matrix times k stops
# fitting a driver core's budget — semantic_dedup then trains with the
# DISTRIBUTED pyspark.ml KMeans instead (same seeded determinism, same
# downstream assignment/pair tiers).
DRIVER_TRAIN_MAX_CLUSTERS = 4_096


def resolve_num_clusters(approx_n: int) -> int:
    """k for a corpus of ~approx_n vectors: ~N/TARGET_CLUSTER_SIZE,
    clamped to [16, MAX_CLUSTERS]."""
    return max(16, min(MAX_CLUSTERS, int(approx_n) // TARGET_CLUSTER_SIZE))


def assign_clusters_mllib(
    embeddings: DataFrame,
    array_col: str = "embedding",
    num_clusters: int = 16,
    seed: int = 42,
    out_col: str = "sem_cluster",
    return_model: bool = False,
):
    """DISTRIBUTED train+assign for cluster counts past
    DRIVER_TRAIN_MAX_CLUSTERS: pyspark.ml KMeans (map-side partial
    aggregation per iteration — the corpus never concentrates
    anywhere), assignment via model.transform. The literal-array
    ``assign_clusters`` projection is the faster path for SMALL k
    (pure codegen, no ml Vector conversion) but its expression size
    grows k×dim — past a few thousand centroids the JVM-side model
    broadcast is the only shape that scales. Same output contract:
    input columns + ``out_col`` int cluster id, seeded deterministic."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn(
        "__features", array_to_vector(F.col(array_col).cast("array<double>"))
    )
    model = KMeans(
        k=num_clusters, seed=seed, featuresCol="__features", predictionCol=out_col
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    return (assigned, model) if return_model else assigned


#: faiss-style training-sample bound: ~this many sample points per
#: centroid suffice for stable k-means codebooks (faiss warns below
#: ~39/centroid and subsamples above 256/centroid; 64 sits in-band).
#: Without it the trainer pulls min(N, max_train_rows) rows however
#: small k is, and driver Lloyd's cost — sample x k x dim x iters —
#: grows super-linearly with the corpus until the 100k cap (measured:
#: 33 s of the ANN miner's 52 s at a 20k x k=141 corpus; 64/centroid
#: trains on 9k rows for the same recall).
MAX_POINTS_PER_CENTROID = 64


def train_semantic_centroids(
    embeddings: DataFrame,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int | None = None,
    seed: int = 42,
    max_train_rows: int = 100_000,
    approx_n: int | None = None,
    max_points_per_centroid: int = MAX_POINTS_PER_CENTROID,
):
    """Driver-side seeded Lloyd's on a hash-mod bounded sample (the
    faiss-style training shape shared with build_pq_index); returns a
    numpy (num_clusters, dim) array. ``num_clusters=None`` derives the
    cluster count from the corpus size (``resolve_num_clusters``).
    Pass ``approx_n`` when the caller already aggregated it — the
    corpus-size probe is a full scan job, and semantic_dedup was
    paying it twice per call. The sample is additionally capped at
    ``max_points_per_centroid * num_clusters`` (see the constant)."""
    from tfm_semisup_spark.operators.similarity import (
        _lloyd,
        collect_train_sample,
    )

    if approx_n is None:
        approx_n = embeddings.agg(
            F.approx_count_distinct(id_col).alias("n")
        ).head()["n"]
    if num_clusters is None:
        num_clusters = resolve_num_clusters(approx_n)
    max_train_rows = min(
        max_train_rows, max_points_per_centroid * int(num_clusters)
    )
    train_mod = max(1, -(-int(approx_n) // max_train_rows))
    train = embeddings
    if train_mod > 1:
        train = train.where(F.abs(F.xxhash64(F.col(id_col))) % train_mod == 0)
    # Arrow sample collect (r15, guide §4.3) — same rows, same order,
    # so the trained centroids are bit-equal to the pickled-collect form
    sample = collect_train_sample(train, id_col, array_col, max_train_rows)
    return _lloyd(sample, num_clusters, seed)


def assign_clusters(
    embeddings: DataFrame,
    centroids,
    array_col: str = "embedding",
    out_col: str = "sem_cluster",
) -> DataFrame:
    """Nearest-centroid assignment as one vectorized Arrow pass
    (mapInPandas): numpy broadcasts the (batch x k x dim) distance
    tensor and argmins it — the same sanctioned kernel boundary as
    build_pq_index's encode, and for the same measured reason: the
    previous literal-array + transform/zip_with projection evaluated
    INTERPRETED (HOFs are excluded from whole-stage codegen) and
    re-evaluated the array cast once per centroid reference, ~k*dim*2
    interpreted ops per row. Narrow op: no shuffle, parallelism =
    input partitions; the centroid matrix ships inside the closure
    (tiny). Deterministic: numpy argmin takes the first minimum,
    matching the old fold's first-occurrence semantics."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    fields = embeddings.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += f", {out_col} int"

    def assign_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pdf.index.astype("int32")})
                continue
            V = np.stack(pdf[array_col].to_numpy()).astype(np.float64)
            d2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            yield pdf.assign(**{out_col: d2.argmin(axis=1).astype("int32")})

    return embeddings.mapInPandas(assign_batches, schema=out_schema)


def unit_normalize(
    embeddings: DataFrame,
    array_col: str = "embedding",
    out_col: str = "u",
) -> DataFrame:
    """Row-wise L2 normalization as one vectorized Arrow pass; rows
    with zero norm are DROPPED (no direction — the same exclusion the
    Spark-side ``where(__n > 0)`` applied). Output = input columns
    minus ``array_col`` plus ``out_col`` (array<double>).

    Exists because the declarative form is an interpreted-HOF trap:
    ``withColumn("__n", <norm>)`` followed by
    ``F.transform(arr, v / __n)`` lets CollapseProject inline the
    dim-term norm INTO the per-element division lambda, and
    interpreted HOF evaluation (HOFs are excluded from whole-stage
    codegen) re-runs it once per element — O(dim²) interpreted ops
    per row (measured: ~1.3 s for 2000 x 64-dim rows on one split;
    at corpus scale this is the dominant cost of the scan).
    Deterministic under any partitioning: all math is row-local."""
    import numpy as np

    fields = [f for f in embeddings.schema.fields if f.name != array_col]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += f"{', ' if fields else ''}{out_col} array<double>"
    keep = [f.name for f in fields]

    def normalize_batches(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf[keep].assign(**{out_col: pd.Series([], dtype=object)})
                continue
            V = np.stack(pdf[array_col].to_numpy()).astype(np.float64)
            n = np.sqrt((V * V).sum(axis=1))
            mask = n > 0
            U = V[mask] / n[mask][:, None]
            out = pdf.loc[mask, keep].reset_index(drop=True)
            # dtype=object keeps the column a LIST column even when the
            # mask drops every row — a bare empty list infers float64
            # and Arrow refuses the list<double> conversion
            yield out.assign(
                **{out_col: pd.Series([row.tolist() for row in U], dtype=object)}
            )

    return embeddings.mapInPandas(normalize_batches, schema=out_schema)


def assign_and_unit(
    embeddings: DataFrame,
    centroids,
    array_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fused nearest-centroid assignment + L2 normalization in ONE
    Arrow pass (r14, guide §4.1): ``semantic_dedup`` previously ran
    ``assign_clusters`` and ``unit_normalize`` as two mapInPandas
    passes, each materialized by its own checkpoint — every embedding
    crossed the Python boundary twice and was written twice. This
    kernel emits (id, sem_cluster, u) directly; assignment argmins the
    RAW vectors and u divides by the float64 norm exactly as the two
    separate kernels did, so both outputs are bit-identical.
    Zero-norm rows keep their cluster with ``u`` NULL (the pair tier
    filters them, the final verdict join still sees every row)."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in embeddings.schema.fields
    )[id_col]
    out_schema = f"id {id_type}, sem_cluster int, u array<double>"
    narrow = embeddings.select(
        F.col(id_col).alias("id"), F.col(array_col).cast("array<double>").alias("v")
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "sem_cluster": pd.Series([], dtype="int32"),
                        "u": pd.Series([], dtype=object),
                    }
                )
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            cl = d2.argmin(axis=1).astype("int32")
            n = np.sqrt((V * V).sum(axis=1))
            u = [
                (V[i] / n[i]).tolist() if n[i] > 0 else None
                for i in range(len(n))
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].reset_index(drop=True),
                    "sem_cluster": cl,
                    "u": pd.Series(u, dtype=object),
                }
            )

    return narrow.mapInPandas(batches, schema=out_schema)


def probe_buckets(
    embeddings: DataFrame,
    centroids,
    array_col: str = "embedding",
    n_probe: int = 1,
    out_col: str = "probe_buckets",
) -> DataFrame:
    """Top-``n_probe`` nearest centroids per row as an ``array<int>``
    column — the multi-probe sibling of ``assign_clusters``, one
    vectorized Arrow pass over the same (batch x k x dim) distance
    tensor. Replaces the r10 probe-list stage of the ANN hard-negative
    miner (anchors x broadcast centroid-table cross join + interpreted
    zip_with distance + window rank): same candidate buckets, no
    interpreted per-centroid expression, no window shuffle, no k-row
    driver DataFrame build (VERDICT r10 #4). Deterministic: stable
    argsort on d2, so ties resolve to the LOWER bucket index — the
    (__d2, cand_bucket) ordering the window version used."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    m = max(1, min(int(n_probe), len(cent)))
    fields = embeddings.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    out_schema += f", {out_col} array<int>"

    def probe_batches(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pd.Series([], dtype=object)})
                continue
            V = np.stack(pdf[array_col].to_numpy()).astype(np.float64)
            d2 = ((V[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2, axis=1, kind="stable")[:, :m].astype("int32")
            yield pdf.assign(**{out_col: [row.tolist() for row in order]})

    return embeddings.mapInPandas(probe_batches, schema=out_schema)


def with_salted_cells(
    unit: DataFrame,
    max_pair_cluster_size: int,
    id_col: str = "id",
    cluster_col: str = "c",
    out_col: str = "cell",
) -> DataFrame:
    """Split clusters larger than ``max_pair_cluster_size`` into salt
    cells of at most that expected size: cell = (cluster, salt) where
    salt = xxhash64(id) % ceil(|cluster|/cap) (0 for small clusters).
    Pairs then form within a CELL, bounding every join key's candidate
    contribution at ~cap² — the same bounded-recall trade the LSH
    banding tiers make for adversarial skew (a planted mega-cluster of
    near-identical vectors no longer yields one quadratic join key).
    Cluster sizes are one tiny aggregate (k rows) broadcast back."""
    sizes = unit.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("__csz"))
    n_cells = F.ceil(F.col("__csz") / F.lit(max_pair_cluster_size)).cast("long")
    salt = F.when(
        F.col("__csz") > max_pair_cluster_size,
        F.abs(F.xxhash64(F.col(id_col))) % n_cells,
    ).otherwise(F.lit(0))
    return (
        unit.join(F.broadcast(sizes), cluster_col)
        .withColumn(out_col, F.struct(F.col(cluster_col), salt.alias("__salt")))
        .drop("__csz")
    )


#: pair-index block budget inside one cell of the Arrow pair kernel —
#: bounds the (ia, ib, acc) temporaries at ~4M pairs (~100 MB peak)
#: whatever the cell size; cells themselves are capped at
#: max_pair_cluster_size rows by the salting tier.
_PAIR_BLOCK_PAIRS = 4_000_000


def _cell_pair_blocks(m: int, max_pairs: int = _PAIR_BLOCK_PAIRS):
    """Yield (ia, ib) index arrays covering every i < j pair of an
    m-row cell, at most ~max_pairs pairs per block."""
    import numpy as np

    i = 0
    while i < m - 1:
        j, cnt = i, 0
        while j < m - 1 and cnt + (m - 1 - j) <= max_pairs:
            cnt += m - 1 - j
            j += 1
        if j == i:  # one anchor row alone exceeds the budget: take it
            j = i + 1
        idx = np.arange(i, j)
        ia = np.repeat(idx, m - 1 - idx)
        ib = np.concatenate([np.arange(x + 1, m) for x in idx])
        yield ia, ib
        i = j


def _pairs_kernel(
    celled: DataFrame, threshold: float, dim: int
) -> DataFrame:
    """Within-cell candidate pairs + exact dot verify as ONE Arrow
    applyInPandas kernel (r15, guide §4.2 — VERDICT r14 item 2): the
    cell self-join evaluated the flat 64-term codegen dot once per
    candidate pair at ~40 µs/pair (profiled: 123 k pairs ≈ 10 s of CPU
    at sf0.1, the single hottest expression of the operator); numpy
    runs the identical arithmetic at vector speed.

    BIT-EQUAL to the join + ``dot_fixed`` form: rows are sorted by id
    (so emitted pairs carry doc_a < doc_b exactly like the join
    predicate), and the dot accumulates per DIMENSION —
    ``acc = u[:,0]·v[:,0]; acc += u[:,d]·v[:,d]`` — which is the same
    left-associative float64 sum the flat codegen expression computes,
    term by term. The threshold compares the raw double exactly as the
    join's WHERE did; rounding stays in Spark on the surviving rows.
    Pinned against the join form in tests/test_r15_opt_shapes.py.

    Emits (doc_a, doc_b, cos) with cos UNROUNDED."""
    import numpy as np
    import pandas as pd

    flat = celled.select(
        "id",
        "u",
        F.col("cell")[celled.schema["cell"].dataType.names[0]].alias("__c"),
        F.col("cell")["__salt"].alias("__s"),
    )

    def one_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        U = np.stack(pdf["u"].to_numpy())[order].astype(np.float64)
        outs = []
        for ia, ib in _cell_pair_blocks(m):
            acc = U[ia, 0] * U[ib, 0]
            for d in range(1, dim):
                acc += U[ia, d] * U[ib, d]
            keep = acc >= threshold
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "doc_a": ids[ia[keep]],
                            "doc_b": ids[ib[keep]],
                            "cos": acc[keep],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return flat.groupBy("__c", "__s").applyInPandas(
        one_cell, schema="doc_a long, doc_b long, cos double"
    )


def semantic_dup_pairs(
    assigned: DataFrame,
    threshold: float = 0.95,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "sem_cluster",
    dim: int | None = None,
    max_pair_cluster_size: int = 10_000,
) -> DataFrame:
    """(doc_a, doc_b, cos_sim) for same-cluster pairs with cosine ≥
    threshold, a < b. Vectors are L2-normalized in the projection, so
    the join predicate is one dot product on the pair.

    Zero-norm embeddings carry no direction, so cosine to them is
    undefined: they are EXCLUDED from the pair tier explicitly (the
    pre-fix behavior dropped them via silent NULL propagation —
    ADVICE r3). They still flow through ``semantic_dedup``'s output
    with keep=true.

    Clusters larger than ``max_pair_cluster_size`` are salted into
    bounded cells (``with_salted_cells``) so no single join key goes
    quadratic.

    The normalized projection is materialized (localCheckpoint) before
    the self-join: both join sides and every downstream consumer then
    scan (id, cluster, unit-vector) rows instead of re-evaluating —
    and re-CODEGENING — the wide centroid-literal assignment
    expression per side (measured at sf0.1: pairs 12.3s -> ~1s)."""
    from tfm_semisup_spark.operators.lineage import truncate

    if dim is None:
        first = assigned.select(F.size(F.col(array_col)).alias("d")).head()
        if first is None:
            # empty input: no pairs, and no dim to build the dot product
            # with — return the empty result with the contract schema
            # instead of a TypeError (ADVICE r3)
            return assigned.sparkSession.createDataFrame(
                [], "doc_a long, doc_b long, cos_sim double"
            )
        dim = first["d"]
    # normalization runs in the shared Arrow kernel — the declarative
    # withColumn(norm) + transform(v / __n) form re-evaluated the
    # dim-term norm per element under interpreted HOF evaluation (see
    # unit_normalize docstring); zero-norm rows drop inside the kernel
    unit = truncate(
        unit_normalize(
            assigned.select(
                F.col(id_col).alias("id"),
                F.col(cluster_col).alias("c"),
                F.col(array_col).cast("array<double>").alias("__arr"),
            ),
            "__arr",
            out_col="u",
        )
    )
    celled = with_salted_cells(unit, max_pair_cluster_size)
    # cosine on unit vectors == plain dot product, evaluated by the
    # vectorized Arrow pair kernel (r15, _pairs_kernel — bit-equal to
    # the former cell self-join + flat codegen dot, which cost ~40 µs
    # per candidate pair); rounding applies on the surviving rows only
    from tfm_semisup_spark.operators.lineage import release

    out = truncate(
        _pairs_kernel(celled, threshold, dim).select(
            "doc_a", "doc_b", F.round("cos", 6).alias("cos_sim")
        )
    )
    release(unit)
    return out


def _pairs_from_unit(
    unit: DataFrame,
    threshold: float,
    dim: int,
    max_pair_cluster_size: int = 10_000,
) -> DataFrame:
    """The pair tier of ``semantic_dup_pairs`` over an ALREADY
    normalized + materialized (id, c, u) frame (r14 fused path): salt,
    self-join within cells, exact dot verify. Does NOT release
    ``unit`` — the caller still reads it for the verdict join."""
    from tfm_semisup_spark.operators.lineage import truncate

    celled = with_salted_cells(unit, max_pair_cluster_size)
    # r15: vectorized Arrow pair kernel replaces the cell self-join +
    # per-pair flat codegen dot (bit-equal; see _pairs_kernel)
    return truncate(
        _pairs_kernel(celled, threshold, dim).select(
            "doc_a", "doc_b", F.round("cos", 6).alias("cos_sim")
        )
    )


#: target rows per task for the Arrow assignment kernel's repartition —
#: the kernel is row-local (k×dim flops/row), so task sizing is about
#: amortizing Arrow batch + task-launch overhead, not bytes; 1024 rows
#: keeps a task ≥ a few ms of work at bench dims while the adaptive
#: width below still reaches full parallelism once the corpus outgrows
#: cores × 1024 rows (any real corpus).
_ASSIGN_ROWS_PER_TASK = 1_024


def adaptive_partitions(spark, approx_n: int) -> int:
    """Scale-adaptive repartition width: ~N/_ASSIGN_ROWS_PER_TASK
    tasks, clamped to [1, defaultParallelism] (r15, guide §2 — derive
    partitioning from input size, not a constant tuned for either
    local mode or the cluster). At corpus scale this saturates to
    defaultParallelism — exactly the previous constant — while a
    bench-SF input no longer pays 32-task scheduling per tiny stage."""
    dp = spark.sparkContext.defaultParallelism
    return max(1, min(dp, -(-int(approx_n) // _ASSIGN_ROWS_PER_TASK)))


def semantic_dedup(
    embeddings: DataFrame,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    num_clusters: int | None = None,
    threshold: float = 0.95,
    seed: int = 42,
    max_train_rows: int = 100_000,
    dim: int | None = None,
    max_pair_cluster_size: int = 10_000,
    approx_n: int | None = None,
) -> DataFrame:
    """Full SemDeDup pass: returns (id, sem_cluster, component, keep)
    for every input row — ``keep`` is false exactly for non-canonical
    members of a semantic duplicate group (canonical = min id via
    connected components over the above-threshold pair graph).

    ``num_clusters=None`` (the default) DERIVES the cluster count from
    the corpus size (resolve_num_clusters: ~N/TARGET_CLUSTER_SIZE,
    floor 16) so the within-cluster candidate volume stays ~linear in
    N; past DRIVER_TRAIN_MAX_CLUSTERS the centroids train with the
    distributed MLlib KMeans instead of driver-side Lloyd's. Pass an
    explicit ``num_clusters`` to pin either behavior. ``dim`` skips the
    one-row probe when the caller already knows it (e.g. from
    io.embedding_dim — zero Spark jobs)."""
    from tfm_semisup_spark.operators.lineage import truncate

    # r15: callers that know the corpus size (e.g. from the parquet
    # footer — io.table_row_count, zero jobs) pass ``approx_n`` and
    # skip the N-estimate scan job entirely; otherwise the r14 HLL
    # estimate on the RAW frame (partition-order-independent).
    if approx_n is None:
        approx_n = embeddings.agg(
            F.approx_count_distinct(id_col).alias("n")
        ).head()["n"]
    # single-file scans arrive as one split: spread the Arrow
    # assignment kernel, the checkpoint blocks and the pair join's
    # build across the cluster (same gotcha as the shingle tiers).
    # Width is scale-adaptive (r15): full parallelism at corpus scale,
    # no 32-task scheduling tax on a bench-SF input.
    embeddings = embeddings.repartition(
        adaptive_partitions(embeddings.sparkSession, approx_n), id_col
    )
    if num_clusters is None:
        num_clusters = resolve_num_clusters(approx_n)
    # materialize the assignment once: it is consumed by both the pair
    # tier and the final join. Driver-trained branch (r14, guide §4.1):
    # assignment + normalization FUSED into one Arrow pass and ONE
    # checkpoint of (id, sem_cluster, u) — previously two kernels, two
    # full materializations of the vectors.
    from tfm_semisup_spark.operators.lineage import release

    if num_clusters > DRIVER_TRAIN_MAX_CLUSTERS:
        assigned = truncate(
            assign_clusters_mllib(embeddings, array_col, num_clusters, seed)
        )
        pairs = semantic_dup_pairs(
            assigned,
            threshold,
            array_col,
            id_col,
            dim=dim,
            max_pair_cluster_size=max_pair_cluster_size,
        )
        ids = assigned.select(F.col(id_col).alias("id"), "sem_cluster")
    else:
        centroids = train_semantic_centroids(
            embeddings, array_col, id_col, num_clusters, seed, max_train_rows,
            approx_n=approx_n,
        )
        assigned = truncate(
            assign_and_unit(embeddings, centroids, array_col, id_col)
        )
        if dim is None:
            first = assigned.where(F.col("u").isNotNull()).select(
                F.size("u").alias("d")
            ).head()
            dim = first["d"] if first is not None else None
        if dim is None:  # no directional vectors at all: no pairs
            pairs = assigned.sparkSession.createDataFrame(
                [], "doc_a long, doc_b long, cos_sim double"
            )
        else:
            pairs = _pairs_from_unit(
                assigned.where(F.col("u").isNotNull()).select(
                    "id", F.col("sem_cluster").alias("c"), "u"
                ),
                threshold,
                dim,
                max_pair_cluster_size,
            )
        ids = assigned.select("id", "sem_cluster")
    # only nodes WITH a near-dup edge; pairs is a checkpoint scan in
    # every branch, so components can count/collect it directly (r15)
    comp = connected_components(pairs, pairs_materialized=True)
    # materialize the final per-row verdicts, then release every
    # intermediate checkpoint (assignment, pair list) eagerly
    out = truncate(
        ids.join(comp, F.col("id") == comp["node"], "left")
        .select(
            "id",
            "sem_cluster",
            F.coalesce("component", F.col("id")).alias("component"),
            (F.coalesce("component", F.col("id")) == F.col("id")).alias("keep"),
        )
    )
    release(assigned)
    release(pairs)
    return out
