"""Flash attention kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recondet3d.ops import attention_xla, flash_attention


def _rand(shape, seed=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype=dtype)


@pytest.mark.parametrize("n,d", [(128, 64), (256, 64), (200, 32)])
def test_flash_matches_xla(n, d):
    q = _rand((2, 3, n, d), 0)
    k = _rand((2, 3, n, d), 1)
    v = _rand((2, 3, n, d), 2)
    ref = attention_xla(q, k, v)
    got = flash_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_kv_len_masking():
    n = 256
    q = _rand((1, 2, n, 64), 3)
    k = _rand((1, 2, n, 64), 4)
    v = _rand((1, 2, n, 64), 5)
    kv_len = jnp.array([150], jnp.int32)
    ref = attention_xla(q[:, :, :150], k[:, :, :150], v[:, :, :150])
    got = flash_attention(q, k, v, kv_len=kv_len, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :150], np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_flash_non_multiple_lengths():
    # 1297 tokens (504x504 / 14 patch + 1 cls) is the production local length
    n = 130
    q = _rand((1, 1, n, 64), 6)
    k = _rand((1, 1, n, 64), 7)
    v = _rand((1, 1, n, 64), 8)
    ref = attention_xla(q, k, v)
    got = flash_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_grad_matches_xla():
    q = _rand((1, 2, 128, 64), 9)
    k = _rand((1, 2, 128, 64), 10)
    v = _rand((1, 2, 128, 64), 11)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, impl="pallas") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_flash_grad_kv_len_and_padding():
    """Backward parity with masking AND non-block-multiple lengths: padded
    rows/columns must contribute exactly zero gradient."""
    n = 200  # pads to 256 inside the kernel
    q = _rand((2, 2, n, 64), 12)
    k = _rand((2, 2, n, 64), 13)
    v = _rand((2, 2, n, 64), 14)
    kv_len = jnp.array([150, 200], jnp.int32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv_len=kv_len, impl="pallas")
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        out = attention_xla(q, k, v, kv_len=kv_len)
        return jnp.sum(jnp.sin(out))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name}",
        )
    # masked-out KV rows get exactly zero grad
    dk, dv = np.asarray(g1[1]), np.asarray(g1[2])
    assert np.all(dk[0, :, 150:] == 0) and np.all(dv[0, :, 150:] == 0)


def test_flash_grad_fwd_bwd_block_mismatch():
    """The backward must accept ANY (block_q_bwd, block_k_bwd), not just
    ones whose padded length matches the forward's: lse arrives at the
    FORWARD's padded length and is re-padded inside the backward.
    Regression: with fwd block_q=256 (pads 260->512) and bwd blocks 128
    (pads 260->384) the old code raised at the lse reshape — the exact
    failure mode of the post-_auto_blocks default training path."""
    n = 260
    q = _rand((1, 2, n, 64), 15)
    k = _rand((1, 2, n, 64), 16)
    v = _rand((1, 2, n, 64), 17)

    def loss(bqb, bkb):
        def f(q, k, v):
            out = flash_attention(q, k, v, impl="pallas", block_q=256,
                                  block_q_bwd=bqb, block_k_bwd=bkb)
            return jnp.sum(out ** 2)
        return f

    g_mismatch = jax.grad(loss(128, 128), argnums=(0, 1, 2))(q, k, v)
    g_match = jax.grad(loss(256, 256), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_mismatch, g_match, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name}",
        )


def test_rope_tables_match_rope_2d():
    """Precomputed-table rope (the per-block fast path in the ViT) is
    bit-for-bit the same math as the closed-form rope_2d."""
    import numpy as np

    from recondet3d.models.da3.layers import (
        apply_rope_tables, rope_2d, rope_tables,
    )

    rng = jax.random.PRNGKey(3)
    B, H, N, D = 2, 4, 57, 64
    t = jax.random.normal(rng, (B, H, N, D), jnp.float32)
    pos = jax.random.randint(jax.random.PRNGKey(4), (B, N, 2), 0, 37)
    ref = rope_2d(t, pos, 100.0)
    cos, sin = rope_tables(pos, D, 100.0)  # (B, N, D)
    got = apply_rope_tables(t, cos[:, None], sin[:, None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
