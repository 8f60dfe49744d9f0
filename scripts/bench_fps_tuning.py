#!/usr/bin/env python
"""Sweep the FPS kernel's tuning knobs at production pipeline shapes.

The two production calls are anchor-FPS (25k from the ~393k pre-reduced
cloud) and FPS-40k (from the ~425k-cap ball-query union); both clouds
follow the reference depth distribution (assets/bench_sample). Sweeps
block_rows (pruning granularity), group (tournament fan-in) and
sel_per_step (grid-step batching).

Measured (v5e, 2026-08; anchors N=393k/K=25k, fps40k N=425k/K=40k).
NOTE: the numbers below were taken with the old script-local timeit
which under-subtracted the tunnel sync by one ~24 ms round trip —
true per-call times are ~24 ms lower across the board (the constant
bias does not change the ranking; scripts/_timing.py):

  br=256 g=8 s=8 (default):  42.8 / 66.3   <- best
  br=512 g=8 s=8:            47.2 / 73.3
  br=128 g=8 s=8|16:         50.2-50.4 / 81.4 (one 225 ms outlier run)
  br=64  g=8 s=8:            59.5 / 96.5
  group=16 or sel=16:        always equal or worse than g=8 s=8

The pre-existing default (256, 8, 8) stands. The selected set was
identical across block layouts at these shapes.

Usage: python scripts/bench_fps_tuning.py [iters]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp

from recondet3d.ops.fps_pallas import furthest_point_sample_pallas

from _timing import timeit as _timeit  # noqa: E402


def timeit(name, fn, *args, iters=5):
    out, _ = _timeit(name, fn, *args, iters=iters, width=52)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    ref = np.load(
        os.path.join(REPO, "assets", "bench_sample", "reference_points.npz")
    )["points"].astype(np.float32)

    cases = [("anchors", 393216, 25000), ("fps40k", 425088, 40000)]
    clouds = {}
    for name, n, k in cases:
        pts = ref[rng.integers(0, len(ref), n)] + rng.normal(
            0, 0.05, (n, 3)
        ).astype(np.float32)
        clouds[name] = (jnp.asarray(pts), jnp.ones((n,), bool), k)

    base = None
    for br in (64, 128, 256, 512):
        for grp in (2, 4, 8, 16):
            for sel in (8, 16):
                if (grp, sel) != (8, 8) and br not in (64, 128, 256):
                    continue
                if grp in (2, 4) and br != 256:
                    continue
                for name, n, k in cases:
                    p, m, kk = clouds[name]
                    f = jax.jit(
                        lambda p, m, kk=kk, br=br, grp=grp, sel=sel:
                        furthest_point_sample_pallas(
                            p, kk, m, block_rows=br, group=grp,
                            sel_per_step=sel,
                        )
                    )
                    out = timeit(
                        f"{name} N={n} K={k} br={br} g={grp} s={sel}",
                        f, p, m, iters=iters,
                    )
                    if base is None:
                        base = np.asarray(jax.device_get(out))
                    elif name == "anchors" and br != 64:
                        cur = np.asarray(jax.device_get(out))
                        same = np.array_equal(np.sort(base), np.sort(cur))
                        print(f"  selection set equal to br=64: {same}",
                              flush=True)
                        if not same:
                            # tie-breaking may differ across block layouts
                            diff = np.setdiff1d(base, cur).size
                            print(f"  (differs in {diff} of {k})", flush=True)


if __name__ == "__main__":
    main()
