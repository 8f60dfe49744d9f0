#!/usr/bin/env python
"""Compare cell-sort materialization strategies at the pipeline shape.

The point pipeline pays for THREE sorted structures per scene (FPS's
bucket sort, BQ's grid sort, compact_points). bench_bq_sweep measured
argsort + 3-4 row gathers at 393k points = 11.2 ms — and the gathers,
not the argsort, dominate (random row access prices per element,
~7-12 ns). voxel_pre_reduce avoids gathers by carrying payloads through
``lax.sort`` directly; this sweep quantifies that choice for the other
call sites.

Usage: python scripts/bench_sort_strategies.py [iters]
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

import _timing  # noqa: E402

N = 393216


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    pts = rng.uniform(-54, 54, (N, 3)).astype(np.float32)
    val = rng.random(N) < 0.25
    p = jnp.asarray(pts)
    m = jnp.asarray(val)

    def cells(p, m):
        G = 64
        rc = jnp.clip(jnp.floor((p[:, :2] + 54.0) / 1.7).astype(jnp.int32),
                      0, G - 1)
        return jnp.where(m, rc[:, 0] * G + rc[:, 1], G * G)

    def argsort_gather(p, m):
        key = cells(p, m)
        order = jnp.argsort(key, stable=True).astype(jnp.int32)
        return p[order], m[order], order, key[order]

    def argsort_only(p, m):
        key = cells(p, m)
        return jnp.argsort(key, stable=True).astype(jnp.int32)

    def payload_sort(p, m):
        key = cells(p, m)
        iota = jnp.arange(N, dtype=jnp.int32)
        skey, x, y, z, sv, order = jax.lax.sort(
            (key, p[:, 0], p[:, 1], p[:, 2], m.astype(jnp.int32), iota),
            num_keys=1)
        return jnp.stack([x, y, z], -1), sv.astype(bool), order, skey

    def pair_sort_then_gather(p, m):
        key = cells(p, m)
        iota = jnp.arange(N, dtype=jnp.int32)
        skey, order = jax.lax.sort((key, iota), num_keys=1)
        return p[order], m[order], order, skey

    for name, fn in [("argsort only (no gathers)", argsort_only),
                     ("argsort + 3 row gathers", argsort_gather),
                     ("pair lax.sort + gathers", pair_sort_then_gather),
                     ("payload lax.sort (6 operands)", payload_sort)]:
        dt = _timing.timeit_scan(None, jax.jit(fn), p, m, repeats=8,
                                 iters=iters)
        print(f"{name:34s} {dt:7.2f} ms", flush=True)

    out_a = [np.asarray(x) for x in jax.jit(argsort_gather)(p, m)]
    out_p = [np.asarray(x) for x in jax.jit(payload_sort)(p, m)]
    same = all((a == b).all() for a, b in zip(out_a, out_p))
    print(f"payload == argsort+gather: {same}", flush=True)


if __name__ == "__main__":
    main()
