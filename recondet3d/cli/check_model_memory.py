"""Model memory breakdown after build (reference:
tools/check_model_memory.py:17 — per-component VRAM after constructing
the detector; here param counts/bytes per subtree + HBM stats)."""

from __future__ import annotations

import argparse


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from recondet3d.cli.train import build_model_from_cfg
    from recondet3d.core.config import load_py_config
    from recondet3d.utils.profiling import device_memory_snapshot

    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args(argv)
    cfg = load_py_config(args.config)
    model = build_model_from_cfg(cfg)

    img = jnp.zeros((1, 6, 900, 1600, 3))
    c2l = jnp.broadcast_to(jnp.eye(4), (1, 6, 4, 4))
    variables = jax.jit(lambda r: model.init(r, img, c2l))(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    def count(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        b = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
        return n, b

    params = variables["params"]
    print(f"{'component':<40}{'params':>14}{'bytes':>14}")
    for name, sub in sorted(params.items()):
        if isinstance(sub, dict):
            for sub_name, subsub in sorted(sub.items()):
                n, b = count(subsub)
                print(f"{name + '/' + sub_name:<40}{n:>14,}{b / 2**20:>12.1f}Mi")
        else:
            n, b = count(sub)
            print(f"{name:<40}{n:>14,}{b / 2**20:>12.1f}Mi")
    n, b = count(params)
    print(f"{'TOTAL':<40}{n:>14,}{b / 2**20:>12.1f}Mi")
    for dev, stats in device_memory_snapshot().items():
        print(dev, stats)
    return 0


if __name__ == "__main__":
    main()
