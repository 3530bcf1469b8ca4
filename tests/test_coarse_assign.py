"""Unit tests for the two-level coarse-quantizer assignment hand-off
(similarity._coarse_model / _assign_cells) — the path that replaces the
dense n x k distance matrix past _HIER_MAX_DENSE_CELLS and removed the
old 2048-cell nlist cap."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_httpd_log_spark.operators.similarity import (
    _HIER_MAX_DENSE_CELLS,
    _assign_cells,
    _coarse_model,
    _d2_matrix,
    _quantize_floor_form,
)


def _mk(n, k, dim=16, seed=7, spread=6.0):
    rng = np.random.RandomState(seed)
    cen = rng.randn(k, dim) * spread
    mat = cen[rng.randint(0, k, n)] + rng.randn(n, dim) * 0.5
    ids = np.arange(k, dtype=np.int32)
    return mat, ids, cen


def test_small_k_stays_dense_exact():
    mat, ids, cen = _mk(500, _HIER_MAX_DENSE_CELLS)
    assert _coarse_model(cen) is None
    got = _assign_cells(mat, ids, cen, None)
    want = ids[_quantize_floor_form(_d2_matrix(mat, cen), 6).argmin(axis=1)]
    assert (got == want).all()


def test_coarse_model_builds_past_threshold():
    _, _, cen = _mk(10, 256)
    model = _coarse_model(cen)
    assert model is not None
    sup, members = model
    # every centroid appears exactly once across the member table
    flat = members[members >= 0]
    assert sorted(flat.tolist()) == list(range(256))
    assert sup.shape[1] == cen.shape[1]


def test_coarse_assignment_mostly_agrees_with_dense():
    """On cluster-structured data (the regime an IVF index exists for)
    the pruned assignment should agree with the dense argmin nearly
    always; the misses are far-from-every-centroid outliers whose cell
    is arbitrary anyway."""
    mat, ids, cen = _mk(4000, 512)
    model = _coarse_model(cen)
    got = _assign_cells(mat, ids, cen, model)
    want = ids[_quantize_floor_form(_d2_matrix(mat, cen), 6).argmin(axis=1)]
    agree = (got == want).mean()
    assert agree > 0.97, agree


def test_coarse_assignment_batch_shape_invariant():
    """Per-row independence: splitting the batch arbitrarily must give
    identical assignments (the partition-invariance contract)."""
    mat, ids, cen = _mk(1000, 300)
    model = _coarse_model(cen)
    whole = _assign_cells(mat, ids, cen, model)
    parts = np.concatenate(
        [_assign_cells(mat[s], ids, cen, model) for s in (slice(0, 137), slice(137, 700), slice(700, 1000))]
    )
    assert (whole == parts).all()


def test_probe_lists_ordered_and_distinct():
    mat, ids, cen = _mk(800, 512)
    model = _coarse_model(cen)
    probes = _assign_cells(mat, ids, cen, model, nprobe=6)
    assert probes.shape == (800, 6)
    # first probe is at least as close as the 2-super nearest-cell
    # assignment (probes search 3 super-cells, so they can only improve)
    near = _assign_cells(mat, ids, cen, model)
    d_probe0 = ((mat - cen[probes[:, 0]]) ** 2).sum(axis=1)
    d_near = ((mat - cen[near]) ** 2).sum(axis=1)
    assert (d_probe0 <= d_near + 1e-9).all()
    # dense-path probe lists are distinct cells; coarse path may repeat
    # only when a row runs out of candidates (not the case here)
    for row in probes[:50]:
        assert len(set(row.tolist())) == 6


def test_probe_lists_match_dense_topk_on_dense_path():
    mat, ids, cen = _mk(300, 32)
    got = _assign_cells(mat, ids, cen, None, nprobe=4)
    d2 = _quantize_floor_form(_d2_matrix(mat, cen), 6)
    want = ids[np.argsort(d2, axis=1, kind="stable")[:, :4]]
    assert (got == want).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
