"""Shared chip-timing helpers for the profiling/sweep scripts.

Over the axon tunnel every host->device dispatch + scalar sync costs a
fixed ~24 ms (CLAUDE.md measurement notes). Correct per-op timing
therefore needs (a) ONE jitted reduction of the whole output pytree to
ONE scalar — reducing leaves separately pays the round trip per leaf —
and (b) subtracting TWO round trips per iteration (the op call and the
reducer call). Earlier script-local timeits reduced per leaf and
subtracted one round trip, biasing every number +24 ms per output leaf;
sweeps ranked variants correctly (constant bias) but absolute ms were
inflated.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

DISPATCH_MS = 24.0

_reduce = jax.jit(
    lambda o: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x).astype(jnp.float32), o, jnp.float32(0.0)
    )
)


def sync(o):
    float(np.asarray(jax.device_get(_reduce(o))))


_null = jax.jit(lambda s: s + 1.0)
_overhead_ms = None


def overhead_ms():
    """Measured per-iteration overhead of the fn-call + reducer-call sync
    path on a ~zero-cost op. The two dispatches partially pipeline over
    the tunnel, so a constant 2x24 ms over-subtracts; measure instead."""
    global _overhead_ms
    if _overhead_ms is None:
        s = jnp.float32(0.0)
        for _ in range(3):
            sync(_null(s))
        t0 = time.time()
        for _ in range(10):
            sync(_null(s))
        _overhead_ms = (time.time() - t0) / 10 * 1000
    return _overhead_ms


def timeit_scan(name, fn, *args, repeats=32, iters=5, width=34):
    """Times fn amortized over an in-jit lax.scan of `repeats` calls.

    For ops cheaper than the ~24 ms tunnel overhead, timeit's min-minus-
    overhead floors to 0; here one dispatch covers `repeats` sequential
    executions. fn's FIRST arg must be a float array: each iteration
    perturbs it with a fold-proof always-zero term derived from the
    carry (so XLA can neither hoist the op out of the loop nor CSE the
    iterations) and folds the output back into the carry."""

    @jax.jit
    def rep(s, *a):
        def body(c, _):
            a0 = a[0] + jnp.where(c > 1e30, 1.0, 0.0).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            red = jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x).astype(jnp.float32),
                out, jnp.float32(0.0),
            )
            return c + red, None
        s, _ = jax.lax.scan(body, s, None, length=repeats)
        return s

    s0 = jnp.float32(0.0)
    for _ in range(2):
        sync(rep(s0, *args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        sync(rep(s0, *args))
        ts.append(time.time() - t0)
    oh = overhead_ms()
    dt = max(0.0, min(ts) * 1000 - oh) / repeats
    mean = max(0.0, sum(ts) / len(ts) * 1000 - oh) / repeats
    if name:
        tail = f"  (mean {mean:8.3f})" if mean > 1.25 * dt + 0.05 else ""
        print(f"{name:{width}s} {dt:8.3f} ms{tail}", flush=True)
    return dt


def flops_of(fn, *args):
    """XLA's own FLOP count for a jitted fn at these args (None if the
    backend can't report it)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


V5E_BF16_PEAK = 197e12


def timeit(name, fn, *args, iters=5, width=34, mfu=False):
    """Times fn via the scalar-sync path; reports the MIN over iters.

    The tunnel-shared chip shows heavy run-to-run interference (the same
    op has measured 1.4 ms and 57 ms minutes apart); the min is the only
    stable statistic. Also prints the mean when it strays >25% from the
    min so noisy runs are visible. mfu=True appends XLA-counted TFLOP and
    % of v5e bf16 peak (fn must be a jax.jit wrapper)."""
    for _ in range(2):  # compile + donation-setup warmups
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    oh = overhead_ms()
    dt = max(0.0, min(ts) * 1000 - oh)
    mean = max(0.0, sum(ts) / len(ts) * 1000 - oh)
    if name:
        tail = f"  (mean {mean:8.2f})" if mean > 1.25 * dt + 0.5 else ""
        if mfu:
            fl = flops_of(fn, *args)
            if fl and dt > 0:
                tail += (f"  {fl/1e12:6.2f} TFLOP"
                         f"  {fl/(dt*1e-3)/V5E_BF16_PEAK*100:5.1f}% peak")
        print(f"{name:{width}s} {dt:8.2f} ms{tail}", flush=True)
    return fn(*args), dt
