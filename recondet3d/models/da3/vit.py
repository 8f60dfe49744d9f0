"""DINOv2 vision transformer with alternating per-view / cross-view attention.

Re-implementation of the reference backbone
(reference: depth_anything_3/model/dinov2/vision_transformer.py:83-456 and
dinov2.py:22-65): camera token injected at slot 0 from ``alt_start``,
QK-norm from ``qknorm_start``, 2D RoPE from ``rope_start``, reference-view
reorder for S >= 3 views, and ``cat_token`` output (last-local || current
features -> 2x width).

TPU design notes:
- local attention batches views into the batch dim ((B*S, N, C)); global
  attention concatenates views into one sequence ((B, S*N, C)) — both are
  single flash-attention calls on the Pallas kernel, no loops.
- reference-view reorder is a gather with traced indices (pure function of
  the class tokens), fully jittable; the S < 3 skip is a static shape
  decision like the reference's THRESH_FOR_REF_SELECTION.
- pos-embed bicubic interpolation reproduces the torch scale-factor kludge
  exactly (utils/interpolation.py).
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from recondet3d.models.da3.layers import Block, LayerNormFp32, PatchEmbed, rope_tables
from recondet3d.utils.constants import THRESH_FOR_REF_SELECTION
from recondet3d.utils.interpolation import resize_2d

__all__ = [
    "DinoViT",
    "VIT_PRESETS",
    "select_reference_view",
    "reorder_by_reference",
    "restore_original_order",
]

VIT_PRESETS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


def _normalize_metric(m, axis=1, eps=1e-8):
    mn = jnp.min(m, axis=axis, keepdims=True)
    mx = jnp.max(m, axis=axis, keepdims=True)
    return (m - mn) / (mx - mn + eps)


def select_reference_view(x: jnp.ndarray, strategy: str = "saddle_balanced") -> jnp.ndarray:
    """Pick a reference view per batch from class tokens.

    x: (B, S, N, C). Returns (B,) int32. Mirrors the reference strategies
    (reference: model/reference_view_selector.py:29-113)."""
    B, S, N, C = x.shape
    if S <= 1 or strategy == "first":
        return jnp.zeros((B,), jnp.int32)
    if strategy == "middle":
        return jnp.full((B,), S // 2, jnp.int32)

    cls = x[:, :, 0].astype(jnp.float32)
    feat = cls / jnp.linalg.norm(cls, axis=-1, keepdims=True)

    if strategy == "saddle_balanced":
        sim = jnp.einsum("bsc,btc->bst", feat, feat)
        sim_no_diag = sim - jnp.eye(S)[None]
        sim_score = jnp.sum(sim_no_diag, axis=-1) / (S - 1)
        feat_norm = jnp.linalg.norm(cls, axis=-1)
        feat_var = jnp.var(feat, axis=-1)
        score = (
            jnp.abs(_normalize_metric(sim_score) - 0.5)
            + jnp.abs(_normalize_metric(feat_norm) - 0.5)
            + jnp.abs(_normalize_metric(feat_var) - 0.5)
        )
        return jnp.argmin(score, axis=1).astype(jnp.int32)

    if strategy == "saddle_sim_range":
        sim = jnp.einsum("bsc,btc->bst", feat, feat)
        sim_no_diag = sim - jnp.eye(S)[None]
        rng = jnp.max(sim_no_diag, axis=-1) - jnp.min(sim_no_diag, axis=-1)
        return jnp.argmax(rng, axis=1).astype(jnp.int32)

    raise ValueError(f"unknown ref view strategy {strategy!r}")


def _reorder_indices(b_idx: jnp.ndarray, S: int) -> jnp.ndarray:
    """(B, S) gather indices placing view b_idx first, others in order."""
    B = b_idx.shape[0]
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    idx = jnp.where((pos > 0) & (pos <= b_idx[:, None]), pos - 1, pos)
    return idx.at[:, 0].set(b_idx)


def _restore_indices(b_idx: jnp.ndarray, S: int) -> jnp.ndarray:
    B = b_idx.shape[0]
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    idx = jnp.where(pos < b_idx[:, None], pos + 1, pos)
    return jnp.where(pos == b_idx[:, None], 0, idx)


def _gather_views(x, idx):
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def reorder_by_reference(x, b_idx):
    return _gather_views(x, _reorder_indices(b_idx, x.shape[1]))


def restore_original_order(x, b_idx):
    return _gather_views(x, _restore_indices(b_idx, x.shape[1]))


class DinoViT(nn.Module):
    """Multi-view DINOv2 trunk returning features at ``out_layers``."""

    name_preset: str = "vits"
    out_layers: Sequence[int] = (5, 7, 9, 11)
    alt_start: int = -1
    qknorm_start: int = -1
    rope_start: int = -1
    rope_freq: float = 100.0
    cat_token: bool = True
    patch_size: int = 14
    img_size: int = 518
    num_register_tokens: int = 0
    interpolate_offset: float = 0.1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # 'block' recomputes everything inside each block on the backward
    # (minimum memory); 'dots' saves every GEMM output and recomputes only
    # the cheap elementwise/norm glue (jax.checkpoint_policies
    # .dots_with_no_batch_dims_saveable) — more live memory, less
    # recompute. Swept on-chip by scripts/measure_train_step.py.
    remat_policy: str = "block"

    def setup(self):
        p = VIT_PRESETS[self.name_preset]
        self.embed_dim = p["embed_dim"]
        self.depth = p["depth"]
        self.num_heads = p["num_heads"]
        ffn = "swiglufused" if self.name_preset == "vitg" else "mlp"
        # Fine-tuning memory: with gradients flowing through the trunk the
        # per-block activations (~10 tensors x B*S*N*C) exceed v5e HBM at
        # production shapes; block-granular rematerialization trades one
        # extra forward for O(depth) -> O(1) live activations. The lifted
        # transform preserves the "blocks_i" param layout.
        # prevent_cse MUST be True here: the blocks run in a python loop
        # (not lax.scan), and with False XLA's CSE merges the recomputed
        # forward back into the saved one, silently undoing the remat —
        # caught by the flagship multichip HBM assertion (unfrozen peak
        # measured 76.6 GB/device with CSE vs fitting with barriers).
        if self.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat_policy == "dots" else None
            )
            rblock = nn.remat(Block, prevent_cse=True, policy=policy)
            if self.remat_policy == "global":
                # remat only the global-attention blocks: their flash
                # working set spans all S*N tokens in one sequence, while
                # the local blocks run at N tokens x (B*S) batch — saving
                # the local activations costs the same HBM but removes
                # their recompute from the backward
                def block_cls_for(i):
                    is_global = (
                        self.alt_start != -1 and i >= self.alt_start
                        and i % 2 == 1
                    )
                    return rblock if is_global else Block
            elif self.remat_policy == "attn":
                # attention-only: FFN + norm activations stay saved,
                # QKV/flash recompute on the backward (Block.remat_attn)
                def block_cls_for(i):
                    return functools.partial(Block, remat_attn=True)
            else:
                def block_cls_for(i):
                    return rblock
        else:
            def block_cls_for(i):
                return Block

        self.patch_embed = PatchEmbed(
            patch_size=self.patch_size, embed_dim=self.embed_dim, dtype=self.dtype
        )
        num_patches = (self.img_size // self.patch_size) ** 2
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        if self.alt_start != -1:
            self.camera_token = self.param(
                "camera_token", nn.initializers.normal(1.0), (1, 2, self.embed_dim), jnp.float32
            )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, num_patches + 1, self.embed_dim), jnp.float32
        )
        self.blocks = [
            block_cls_for(i)(
                num_heads=self.num_heads,
                mlp_ratio=4.0,
                init_values=1.0,
                qk_norm=(self.qknorm_start != -1 and i >= self.qknorm_start),
                use_rope=(self.rope_start != -1 and i >= self.rope_start),
                rope_freq=self.rope_freq,
                ffn_layer=ffn,
                ln_eps=1e-6,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = LayerNormFp32(epsilon=1e-5, name="norm")

    def _interp_pos_embed(self, n_tokens: int, height: int, width: int) -> jnp.ndarray:
        """Bicubic pos-embed resize with the torch scale-factor kludge
        (reference: vision_transformer.py:220-254; row-major (y, x) grid)."""
        N = self.pos_embed.shape[1] - 1
        if n_tokens - 1 == N and width == height:
            return self.pos_embed
        M = int(math.sqrt(N))
        gh, gw = height // self.patch_size, width // self.patch_size
        cls_pe = self.pos_embed[:, :1]
        patch_pe = self.pos_embed[:, 1:].reshape(1, M, M, self.embed_dim)
        if self.interpolate_offset:
            scale = (
                float(gh + self.interpolate_offset) / M,
                float(gw + self.interpolate_offset) / M,
            )
        else:
            scale = None
        patch_pe = resize_2d(patch_pe, (gh, gw), mode="bicubic", scale=scale)
        patch_pe = patch_pe.reshape(1, gh * gw, self.embed_dim)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)

    def __call__(
        self,
        x: jnp.ndarray,
        cam_token: Optional[jnp.ndarray] = None,
        export_feat_layers: Sequence[int] = (),
        ref_view_strategy: str = "saddle_balanced",
    ):
        """x: (B, S, H, W, 3). Returns (feats, aux_feats):
        feats = list over out_layers of (patch_tokens (B,S,Np,C'), camera_token (B,S,C'));
        aux_feats = list of normed patch tokens for export_feat_layers."""
        B, S, H, W, _ = x.shape
        ph, pw = H // self.patch_size, W // self.patch_size
        n_patches = ph * pw

        tokens = self.patch_embed(x.reshape(B * S, H, W, 3).astype(self.dtype))
        cls = jnp.broadcast_to(self.cls_token, (B * S, 1, self.embed_dim)).astype(self.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        pe = self._interp_pos_embed(tokens.shape[1], H, W)
        tokens = tokens + pe.astype(self.dtype)
        xt = tokens.reshape(B, S, n_patches + 1, self.embed_dim)

        # RoPE positions: patches get (y, x) + 1; special token (0, 0);
        # global attention uses all-ones patch positions (pos_nodiff).
        use_rope = self.rope_start != -1
        if use_rope:
            yy, xx = jnp.meshgrid(jnp.arange(ph), jnp.arange(pw), indexing="ij")
            patch_pos = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)  # (Np, 2)
            special = jnp.zeros((1, 2), jnp.int32)
            l_pos1 = jnp.concatenate([special, patch_pos + 1], axis=0)  # (N, 2)
            g_pos1 = jnp.concatenate([special, jnp.ones_like(patch_pos)], axis=0)
            # every rope block shares one local and one global position
            # grid, so the (cos, sin) tables are computed ONCE here and
            # applied per block — measured ~0.4 ms/block cheaper than the
            # closed-form rope_2d at giant global shapes (bench_qk_prep)
            D = self.embed_dim // self.num_heads
            l_tabs = tuple(
                t[None, None] for t in rope_tables(l_pos1, D, self.rope_freq)
            )  # (1, 1, N, D) — broadcast over (B*S, heads)
            g1 = tuple(rope_tables(g_pos1, D, self.rope_freq))
            g_tabs = tuple(
                jnp.tile(t[None], (S, 1, 1)).reshape(1, 1, S * (n_patches + 1), D)
                for t in g1
            )
        else:
            l_tabs = g_tabs = None

        do_reorder = self.alt_start != -1 and S >= THRESH_FOR_REF_SELECTION
        b_idx = None
        local_x = xt
        outputs: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        aux_outputs: List[jnp.ndarray] = []

        for i, blk in enumerate(self.blocks):
            if do_reorder and i == self.alt_start - 1:
                b_idx = select_reference_view(xt, strategy=ref_view_strategy)
                xt = reorder_by_reference(xt, b_idx)
                local_x = reorder_by_reference(local_x, b_idx)

            if self.alt_start != -1 and i == self.alt_start:
                if cam_token is not None:
                    ct = cam_token.astype(self.dtype)
                else:
                    ref = jnp.broadcast_to(self.camera_token[:, :1], (B, 1, self.embed_dim))
                    src = jnp.broadcast_to(self.camera_token[:, 1:], (B, S - 1, self.embed_dim))
                    ct = jnp.concatenate([ref, src], axis=1).astype(self.dtype)
                xt = xt.at[:, :, 0].set(ct)

            rope_on = use_rope and i >= self.rope_start
            if self.alt_start != -1 and i >= self.alt_start and i % 2 == 1:
                g = xt.reshape(B, S * (n_patches + 1), self.embed_dim)
                g = blk(g, rope_tabs=g_tabs if rope_on else None)
                xt = g.reshape(B, S, n_patches + 1, self.embed_dim)
            else:
                l = xt.reshape(B * S, n_patches + 1, self.embed_dim)
                l = blk(l, rope_tabs=l_tabs if rope_on else None)
                xt = l.reshape(B, S, n_patches + 1, self.embed_dim)
                local_x = xt

            if i in self.out_layers:
                out_x = jnp.concatenate([local_x, xt], axis=-1) if self.cat_token else xt
                if do_reorder and b_idx is not None:
                    out_x = restore_original_order(out_x, b_idx)
                outputs.append((out_x[:, :, 0], out_x))
            if i in export_feat_layers:
                aux_outputs.append(xt)

        # Final norm: on cat_token outputs only the current-feature half is
        # normed (reference: vision_transformer.py:383-394).
        feats = []
        for cam_tok, out_x in outputs:
            if out_x.shape[-1] == self.embed_dim:
                normed = self.norm(out_x)
            else:
                normed = jnp.concatenate(
                    [out_x[..., : self.embed_dim], self.norm(out_x[..., self.embed_dim:])],
                    axis=-1,
                )
            patch_tokens = normed[..., 1 + self.num_register_tokens :, :]
            feats.append((patch_tokens, cam_tok))
        aux = [self.norm(a)[..., 1 + self.num_register_tokens :, :] for a in aux_outputs]
        return feats, aux
