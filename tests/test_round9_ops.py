"""Round-9 additions: the exact-integer power-iteration PCA projection
(`embedding_pca_project`) that consumes the covariance summary, and the
hash-stability contract of the reworked `embedding_covariance`."""

from __future__ import annotations

import numpy as np

from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.catalog import (
    load_table,
)
from near_real_time_data_warehouse_with_hybridjoin_for_retail_analytics_spark.operators import (
    similarity,
)


def _grid_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.floor(x * similarity.CENTROID_Q).astype(np.int64)
    return ids, q


def test_covariance_output_is_pure_int64(spark, sf_dir):
    """The round-8 driver hash mismatch lived in the divided double /
    wide-decimal output surface; the round-9 contract is that every
    output column is int or long — hash-stable across engines by
    construction."""
    out = similarity.embedding_covariance(spark, sf_dir)
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {
        "dim_i": "int",
        "dim_j": "int",
        "sum_prod_q": "bigint",
        "sum_q_i": "bigint",
        "sum_q_j": "bigint",
        "n_vectors": "bigint",
    }


def test_power_iteration_matches_lapack_direction(spark, sf_dir):
    """The grid power iteration converges to LAPACK's dominant
    eigenvector of the same integer covariance numerator: |cos| ≥
    0.999 (requantization caps the step error at O(d/G))."""
    _, q = _grid_corpus(spark, sf_dir)
    n = len(q)
    c = (n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))).astype(
        np.float64
    )
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]

    v, n2, s = similarity.pca_component(spark, sf_dir)
    assert n2 == n
    assert s == [int(x) for x in q.sum(axis=0)]
    va = np.array(v, dtype=np.float64)
    cos = float(va @ top) / (np.linalg.norm(va) * np.linalg.norm(top))
    assert abs(cos) >= 0.999


def test_pca_variance_explained_dominates_axes(spark, sf_dir):
    """Variance along the trained direction ≈ λ_max (Rayleigh quotient
    within 1e-4 relative) and ≥ the variance along every coordinate
    axis — the 'this is actually the principal component' gate."""
    _, q = _grid_corpus(spark, sf_dir)
    n = len(q)
    c = (n * (q.T @ q) - np.outer(q.sum(axis=0), q.sum(axis=0))).astype(
        np.float64
    )
    lam = np.linalg.eigvalsh(c)[-1]
    v, _, _ = similarity.pca_component(spark, sf_dir)
    va = np.array(v, dtype=np.float64)
    rayleigh = float(va @ c @ va) / float(va @ va)
    assert rayleigh >= float(np.diag(c).max())
    assert abs(rayleigh - lam) <= 1e-4 * abs(lam)


def test_pca_projection_matches_numpy_truth(spark, sf_dir):
    """proj_num = n·⟨q,v⟩ − ⟨s,v⟩ exactly, vs an object-dtype (exact
    Python int) recomputation with the same trained vector."""
    ids, q = _grid_corpus(spark, sf_dir)
    n = len(q)
    v, n2, s = similarity.pca_component(spark, sf_dir)
    sv = sum(int(si) * int(vi) for si, vi in zip(s, v))
    expect = {
        int(i): n * sum(int(a) * int(b) for a, b in zip(row, v)) - sv
        for i, row in zip(ids, q)
    }
    out = {
        r["vec_id"]: r["proj_num"]
        for r in similarity.embedding_pca_project(spark, sf_dir).collect()
    }
    assert out == expect


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (0, 5), (10**25, 3),
             (-(10**25), 3)]
    for a, b in cases:
        got = similarity._trunc_div(a, b)
        want = duckdb.sql(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        assert got == int(want), (a, b)


def test_power_by_squaring_is_pure_and_sign_fixed():
    rng = np.random.RandomState(7)
    a = rng.randint(-50, 50, size=(6, 4)).astype(np.int64)
    c = [[int(x) for x in row] for row in (a.T @ a)]  # PSD int matrix
    # pure function: rerun from the same matrix is bit-identical
    v1 = similarity._power_by_squaring(c)
    v2 = similarity._power_by_squaring(c)
    assert v1 == v2
    mx = max(abs(x) for x in v1)
    k = min(i for i in range(len(v1)) if abs(v1[i]) == mx)
    assert v1[k] > 0
    # and it finds LAPACK's dominant direction on this small case too
    top = np.linalg.eigh(np.array(c, dtype=np.float64))[1][:, -1]
    va = np.array(v1, dtype=np.float64)
    cos = abs(float(va @ top)) / (np.linalg.norm(va) * np.linalg.norm(top))
    assert cos >= 0.999
