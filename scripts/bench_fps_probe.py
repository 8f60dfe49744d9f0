#!/usr/bin/env python
"""Dissect the FPS kernel's per-selection cost at production shape.

Runs the production kernel plus ablated variants (each removing one
per-selection component) at the e2e pipeline shape (40k from ~425k).
The ablations break correctness — they exist only to attribute time:

  baseline      production kernel (fps_pallas)
  no_extract    selected-point coords read as constants (skips the 3
                vector->SMEM-scalar reductions per selection)
  no_write      skip the output RMW write per selection
  no_bookkeep   skip bmax/barg refresh after block updates (2 vector->
                scalar reductions per updated block)

Usage: python scripts/bench_fps_probe.py [iters]
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import recondet3d.ops.fps_pallas as fp

_DISPATCH_MS = 24.0
_LANES = 128


def make_variant(*, no_extract=False, no_write=False, no_bookkeep=False,
                 double_extract=False, double_argmax=False,
                 double_sweep=False):
    def kernel(start_ref, aabb_ref, pts_hbm, dist_hbm, idx_ref, pts_ref,
               dist_ref, last_ref, coord_ref, bmax_ref, barg_ref, gmax_ref,
               sem, *, rows, block_rows, group, sel_per_step):
        i = pl.program_id(0)
        big = jnp.int32(rows * _LANES)
        n_blocks = rows // block_rows
        n_groups = -(-n_blocks // group)

        def block_iota(b):
            r = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (block_rows, _LANES), 1)
            return (b * block_rows + r) * _LANES + c

        def block_slice(b):
            return pl.ds(pl.multiple_of(b * block_rows, block_rows), block_rows)

        def extract_coords(pos):
            if no_extract:
                coord_ref[0] = 1.0
                coord_ref[1] = 1.0
                coord_ref[2] = 1.0
                return
            if double_extract:
                _extract_once(pos)
            _extract_once(pos)

        def _extract_once(pos):
            row = pos // _LANES
            base8 = (row // 8) * 8
            sl = pl.ds(pl.multiple_of(base8, 8), 8)
            ii = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
            sel = (((ii + base8) * _LANES + jj) == pos).astype(jnp.float32)
            coord_ref[0] = jnp.sum(pts_ref[0, sl, :] * sel)
            coord_ref[1] = jnp.sum(pts_ref[1, sl, :] * sel)
            coord_ref[2] = jnp.sum(pts_ref[2, sl, :] * sel)

        def write_idx(k, val):
            if no_write:
                last_ref[0] = val
                return
            base8 = ((k // _LANES) // 8) * 8
            sl = pl.ds(pl.multiple_of(base8, 8), 8)
            ii = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
            flat = (ii + base8) * _LANES + jj
            idx_ref[sl, :] = jnp.where(flat == k, val, idx_ref[sl, :])

        def aabb_lb2(base, px, py, pz):
            dx = jnp.maximum(
                jnp.maximum(aabb_ref[base + 0] - px, px - aabb_ref[base + 1]), 0.0
            )
            dy = jnp.maximum(
                jnp.maximum(aabb_ref[base + 2] - py, py - aabb_ref[base + 3]), 0.0
            )
            dz = jnp.maximum(
                jnp.maximum(aabb_ref[base + 4] - pz, pz - aabb_ref[base + 5]), 0.0
            )
            return dx * dx + dy * dy + dz * dz

        def group_refresh(g):
            base = g * group

            def m_body(j, acc):
                return jnp.maximum(acc, bmax_ref[base + j])

            gmax_ref[g] = jax.lax.fori_loop(0, group, m_body, -jnp.inf)

        def select_next(i_sel):
            px = coord_ref[0]
            py = coord_ref[1]
            pz = coord_ref[2]

            def update_block(b):
                lb2 = aabb_lb2(b * 8, px, py, pz)

                @pl.when(lb2 < bmax_ref[b])
                def _():
                    sl = block_slice(b)
                    ddx = pts_ref[0, sl, :] - px
                    ddy = pts_ref[1, sl, :] - py
                    ddz = pts_ref[2, sl, :] - pz
                    nd = jnp.minimum(
                        dist_ref[sl, :], ddx * ddx + ddy * ddy + ddz * ddz
                    )
                    dist_ref[sl, :] = nd
                    if not no_bookkeep:
                        m = jnp.max(nd)
                        bmax_ref[b] = m
                        barg_ref[b] = jnp.min(
                            jnp.where(nd == m, block_iota(b), big)
                        )

            def sweep_group(g, _):
                glb2 = aabb_lb2((n_blocks + g) * 8, px, py, pz)

                @pl.when(glb2 < gmax_ref[g])
                def _():
                    def member(j, _):
                        b = g * group + j

                        @pl.when(b < n_blocks)
                        def _():
                            update_block(b)

                        return 0

                    jax.lax.fori_loop(0, group, member, 0)
                    group_refresh(g)

                return 0

            jax.lax.fori_loop(0, n_groups, sweep_group, 0)
            if double_sweep:
                jax.lax.fori_loop(0, n_groups, sweep_group, 0)

            def gbest_body(g, acc):
                best, gwin = acc
                m = gmax_ref[g]
                take = m > best
                return jnp.where(take, m, best), jnp.where(take, g, gwin)

            gbest, gwin = jax.lax.fori_loop(
                0, n_groups, gbest_body, (-jnp.inf, jnp.int32(0))
            )
            if double_argmax:
                gbest, gwin = jax.lax.fori_loop(
                    0, n_groups, gbest_body, (-jnp.inf, jnp.int32(0))
                )

            def pick_body(j, acc):
                b = gwin * group + j
                take = (bmax_ref[b] == gbest) & (acc == big)
                return jnp.where(take, barg_ref[b], acc)

            nxt = jax.lax.fori_loop(0, group, pick_body, big)
            write_idx(i_sel, nxt)
            last_ref[0] = nxt
            extract_coords(nxt)

        @pl.when(i == 0)
        def _():
            cp1 = pltpu.make_async_copy(pts_hbm, pts_ref, sem.at[0])
            cp2 = pltpu.make_async_copy(dist_hbm, dist_ref, sem.at[1])
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()

            def init_body(b, _):
                sl = block_slice(b)
                d = dist_ref[sl, :]
                m = jnp.max(d)
                bmax_ref[b] = m
                barg_ref[b] = jnp.min(jnp.where(d == m, block_iota(b), big))
                return 0

            jax.lax.fori_loop(0, n_blocks, init_body, 0)

            def pad_body(b, _):
                bmax_ref[b] = -jnp.inf
                barg_ref[b] = big
                return 0

            jax.lax.fori_loop(n_blocks, n_groups * group, pad_body, 0)

            def ginit_body(g, _):
                group_refresh(g)
                return 0

            jax.lax.fori_loop(0, n_groups, ginit_body, 0)

            first = start_ref[0]
            idx_ref[:] = jnp.zeros_like(idx_ref)
            write_idx(0, first)
            last_ref[0] = first
            extract_coords(first)
            for t in range(1, sel_per_step):
                select_next(t)

        @pl.when(i > 0)
        def _():
            for t in range(sel_per_step):
                select_next(i * sel_per_step + t)

    return kernel


def run_variant(kernel_fn, points, num_samples, block_rows=256, group=8,
                sel_per_step=8):
    N = points.shape[0]
    per_block = block_rows * _LANES
    pad = (-N) % per_block
    rows = (N + pad) // _LANES
    n_blocks = rows // block_rows

    pts_f = points.astype(jnp.float32)
    valid = jnp.ones((N,), bool)

    G = 16
    lo = jnp.min(pts_f[:, :2], axis=0)
    hi = jnp.max(pts_f[:, :2], axis=0)
    cell = jnp.maximum((hi - lo) / G, 1e-6)
    rc = jnp.clip(
        jnp.floor((pts_f[:, :2] - lo) / cell).astype(jnp.int32), 0, G - 1
    )
    pcell = rc[:, 0] * G + rc[:, 1]
    order = jnp.argsort(pcell, stable=True).astype(jnp.int32)
    spts = pts_f[order]
    start = jnp.argmax(order == 0).astype(jnp.int32)[None]

    pts = jnp.pad(spts, ((0, pad), (0, 0)))
    planes = pts.T.reshape(3, rows, _LANES)
    dist0 = jnp.full((N + pad,), 1e10, jnp.float32).at[N:].set(-jnp.inf)
    dist0 = dist0.reshape(rows, _LANES)

    pv = jnp.pad(valid, (0, pad)).reshape(n_blocks, per_block, 1)
    pb = pts.reshape(n_blocks, per_block, 3)
    blo = jnp.min(jnp.where(pv, pb, jnp.inf), axis=1)
    bhi = jnp.max(jnp.where(pv, pb, -jnp.inf), axis=1)
    n_groups = -(-n_blocks // group)
    gpad = n_groups * group - n_blocks
    glo = jnp.min(
        jnp.pad(blo, ((0, gpad), (0, 0)), constant_values=jnp.inf).reshape(
            n_groups, group, 3), axis=1)
    ghi = jnp.max(
        jnp.pad(bhi, ((0, gpad), (0, 0)), constant_values=-jnp.inf).reshape(
            n_groups, group, 3), axis=1)
    lo6 = jnp.concatenate([blo, glo])
    hi6 = jnp.concatenate([bhi, ghi])
    aabb = jnp.stack(
        [lo6[:, 0], hi6[:, 0], lo6[:, 1], hi6[:, 1], lo6[:, 2], hi6[:, 2]],
        axis=1)
    aabb = jnp.concatenate(
        [aabb, jnp.zeros((n_blocks + n_groups, 2), jnp.float32)], axis=1
    ).reshape(-1)

    kpad = (-num_samples) % (_LANES * 8)
    krows = (num_samples + kpad) // _LANES
    vmem_bytes = (4 * rows * _LANES * 4) + (num_samples + kpad) * 4 + (4 << 20)

    out = pl.pallas_call(
        functools.partial(kernel_fn, rows=rows, block_rows=block_rows,
                          group=group, sel_per_step=sel_per_step),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(-(-num_samples // sel_per_step),),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((krows, _LANES), lambda i, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((3, rows, _LANES), jnp.float32),
                pltpu.VMEM((rows, _LANES), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((3,), jnp.float32),
                pltpu.SMEM((n_groups * group,), jnp.float32),
                pltpu.SMEM((n_groups * group,), jnp.int32),
                pltpu.SMEM((n_groups,), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((krows, _LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, 120 * 1024 * 1024)),
        ),
    )(start, aabb, planes, dist0)
    return out.reshape(-1)[:num_samples]


def sync(o):
    float(np.asarray(jax.device_get(o)).ravel()[0])


def timeit(name, fn, *args, iters=5):
    for _ in range(2):
        out = fn(*args)
        sync(out.sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(out.sum())
    dt = max(0.0, (time.time() - t0) / iters * 1000 - _DISPATCH_MS)
    print(f"{name:30s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    K = 40000
    n_in = 425088
    rng = np.random.default_rng(0)
    ref = np.load(os.path.join(REPO, "assets", "bench_sample",
                               "reference_points.npz"))["points"].astype(np.float32)
    idx = rng.integers(0, len(ref), n_in)
    pts = jnp.asarray(ref[idx] + rng.normal(0, 0.05, (n_in, 3)).astype(np.float32))

    f_prod = jax.jit(lambda p: fp.furthest_point_sample_pallas(p, K))
    t0 = timeit("production kernel", f_prod, pts, iters=iters)

    variants = [
        ("baseline copy", {}),
        ("double_extract", dict(double_extract=True)),
        ("double_argmax", dict(double_argmax=True)),
        ("double_sweep", dict(double_sweep=True)),
        ("no_write", dict(no_write=True)),
    ]
    for name, kw in variants:
        k = make_variant(**kw)
        f = jax.jit(lambda p, k=k: run_variant(k, p, K))
        timeit(name, f, pts, iters=iters)


if __name__ == "__main__":
    main()
