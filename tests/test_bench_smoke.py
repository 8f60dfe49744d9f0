"""Plumbing smoke test for bench.py's measurement modes (tiny shapes on
CPU): serial vs pipelined schedules and raw vs anchored compositions must
all produce finite throughput numbers through the exact code paths the
real-chip bench runs."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture()
def small_bench(monkeypatch):
    import bench
    from recondet3d.models.da3 import build_da3
    from recondet3d.models.detect import ReconstructionBackbone, ResDet3D
    from recondet3d.models.refine import SparseRefinement

    monkeypatch.setattr(bench, "N_CAMS", 2)
    monkeypatch.setattr(bench, "IMG_H", 56)
    monkeypatch.setattr(bench, "IMG_W", 84)
    monkeypatch.setenv("RECONDET3D_BENCH_NOISE", "1")
    monkeypatch.setenv("RECONDET3D_BENCH_REPS", "2")
    monkeypatch.delenv("RECONDET3D_BENCH_CKPT", raising=False)

    def tiny_pipeline(dtype, preset=None, freeze_da3=True):
        da3 = build_da3("da3-small", dtype=jnp.float32, attn_impl="xla")
        refinement = SparseRefinement(
            max_voxels=512, occ_max_voxels=1024,
            stage_caps=(512, 384, 256, 192),
        )
        backbone = ReconstructionBackbone(
            da3=da3, refinement=refinement, process_res=56,
            filter_range=(-30.0, -30.0, -5.0, 30.0, 30.0, 5.0),
            bq_anchor_points=64, num_points=128,
            voxel_pre_reduce=0.5, pre_reduce_cap=4096,
            freeze_da3=freeze_da3,
        )
        return ResDet3D(reconstruction_backbone=backbone)

    monkeypatch.setattr(bench, "build_pipeline", tiny_pipeline)

    def tiny_anchor(c2l, ph, pw, batch=1):
        rng = np.random.default_rng(0)
        d = rng.uniform(1.0, 8.0, (batch, 2, ph, pw)).astype(np.float32)
        d[:, :, ::3] = 0.0  # holes exercise the validity mask
        return d

    monkeypatch.setattr(bench, "make_anchor_depth", tiny_anchor)
    return bench


@pytest.mark.parametrize("schedule", ["serial", "pipelined"])
@pytest.mark.parametrize("composition", ["raw", "anchored"])
def test_bench_measure_modes(small_bench, schedule, composition):
    res = small_bench.measure(
        "da3-small", "cpu", iters=1, schedule=schedule, composition=composition
    )
    assert np.isfinite(res["fps"]) and res["fps"] > 0
    assert res["schedule"] == schedule
    assert res["composition"] == composition


def test_bench_composition_both_reports_raw(small_bench):
    res = small_bench.measure(
        "da3-small", "cpu", iters=1, schedule="serial", composition="both"
    )
    assert res["composition"] == "anchored"
