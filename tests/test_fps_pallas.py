"""Pallas FPS kernel vs the XLA reference (interpret mode on CPU; the
compiled kernel is exercised on the real chip by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recondet3d.ops.fps_pallas import furthest_point_sample_pallas
from recondet3d.ops.sampling import furthest_point_sample_xla


@pytest.mark.parametrize("n,k,n_valid", [(500, 32, 500), (1000, 64, 700), (130, 17, 100)])
def test_pallas_fps_matches_xla(n, k, n_valid):
    rng = np.random.default_rng(n)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    mask = jnp.asarray(np.arange(n) < n_valid)
    interp = jax.default_backend() != "tpu"
    a = np.asarray(furthest_point_sample_pallas(pts, k, mask, interpret=interp))
    b = np.asarray(furthest_point_sample_xla(pts, k, mask))
    np.testing.assert_array_equal(a, b)
    assert np.all(a < n_valid)


def test_pallas_fps_multiblock_tournament(monkeypatch):
    """Exercise the two-level tournament (multiple blocks AND groups) in
    interpret mode by shrinking the block size: 24 blocks -> 3 groups.
    Catches group-AABB pruning, pad-block init, gmax refresh, and the
    two-phase argmax tie-breaking, which N<=1000 single-block tests
    never reach."""
    import recondet3d.ops.fps_pallas as fp

    monkeypatch.setattr(fp, "_BLOCK_ROWS", 8)  # 8 * 128 = 1024 pts/block
    fp.furthest_point_sample_pallas._clear_cache()
    try:
        rng = np.random.default_rng(7)
        n, k, n_valid = 24 * 1024 - 200, 65, 20000
        pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 10)
        mask = jnp.asarray(np.arange(n) < n_valid)
        interp = jax.default_backend() != "tpu"
        a = np.asarray(
            fp.furthest_point_sample_pallas(pts, k, mask, interpret=interp)
        )
        b = np.asarray(furthest_point_sample_xla(pts, k, mask))
        np.testing.assert_array_equal(a, b)
        assert np.all(a < n_valid)
    finally:
        fp.furthest_point_sample_pallas._clear_cache()
