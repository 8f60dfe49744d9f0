"""DPT dense-prediction heads (main + sky), channels-last, fp32.

Re-implementation of the reference heads (reference:
depth_anything_3/model/dpt.py:31-458, dualdpt.py:30-488, gsdpt.py:24-172):
4-scale token->conv pyramid, refinenet top-down fusion, exp/expp1
activations, optional 1-channel sky head; DualDPT adds a fully independent
auxiliary (ray) pyramid; GSDPT adds an image-merger and 38-channel raw
gaussian output.

TPU notes: heads always run fp32 (the reference disables autocast for the
heads — da3.py:139-148); all interpolations go through the matmul-based
``resize_2d`` with torch-exact align_corners=True bilinear semantics; the
reference's ``chunk_size=8`` frame chunking is a CUDA memory workaround we
do not need (XLA already schedules the fused pyramid within HBM).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from recondet3d.utils.interpolation import resize_2d

__all__ = ["DPT", "DualDPT", "GSDPT", "create_uv_grid", "position_grid_to_embed"]


# -----------------------------------------------------------------------------
# Activations (reference: dpt.py:_apply_activation_single, head_utils.py)
# -----------------------------------------------------------------------------

def apply_activation(x, activation: str):
    a = activation.lower()
    if a == "exp":
        return jnp.exp(x)
    if a == "expp1":
        return jnp.exp(x) + 1
    if a == "expm1":
        return jnp.expm1(x)
    if a == "relu":
        return jax.nn.relu(x)
    if a == "sigmoid":
        return jax.nn.sigmoid(x)
    if a == "softplus":
        return jax.nn.softplus(x)
    if a == "tanh":
        return jnp.tanh(x)
    return x


def activate_head_gs(fmap, activation="norm_exp", conf_activation="expp1", conf_dim=1):
    """fmap: (B, H, W, C) -> (pts3d, conf) (reference: head_utils.py:activate_head_gs)."""
    xyz = fmap[..., :-conf_dim]
    conf = fmap[..., -1] if conf_dim == 1 else fmap[..., -conf_dim:]
    if activation == "norm_exp":
        d = jnp.clip(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8, None)
        pts3d = xyz / d * jnp.expm1(d)
    elif activation == "norm":
        pts3d = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    else:
        pts3d = apply_activation(xyz, activation)
    if conf_activation == "expp1":
        conf_out = 1 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    else:
        conf_out = apply_activation(conf, conf_activation)
    return pts3d, conf_out


def create_uv_grid(width: int, height: int, aspect_ratio: Optional[float] = None) -> np.ndarray:
    """(height, width, 2) normalized UV grid (reference: head_utils.py:create_uv_grid)."""
    if aspect_ratio is None:
        aspect_ratio = float(width) / float(height)
    diag = (aspect_ratio ** 2 + 1.0) ** 0.5
    span_x, span_y = aspect_ratio / diag, 1.0 / diag
    xs = np.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    ys = np.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height)
    uu, vv = np.meshgrid(xs, ys)  # (height, width)
    return np.stack([uu, vv], axis=-1).astype(np.float32)


def position_grid_to_embed(pos_grid: np.ndarray, embed_dim: int, omega_0: float = 100.0) -> np.ndarray:
    """(H, W, 2) -> (H, W, embed_dim) sincos embedding (reference: head_utils.py)."""
    H, W, _ = pos_grid.shape
    flat = pos_grid.reshape(-1, 2)

    def sincos(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
        omega = 1.0 / omega_0 ** omega
        out = np.einsum("m,d->md", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate([sincos(flat[:, 0]), sincos(flat[:, 1])], axis=-1)
    return emb.reshape(H, W, embed_dim).astype(np.float32)


def _interp(x, size):
    """bilinear align_corners=True (reference custom_interpolate default)."""
    return resize_2d(x, size, mode="bilinear", align_corners=True)


# -----------------------------------------------------------------------------
# Building blocks
# -----------------------------------------------------------------------------

class StridedDeconv(nn.Module):
    """ConvTranspose2d with kernel == stride, as exact depth-to-space einsum.

    Kernel kept in torch layout (in, out, k, k) so checkpoint import is a
    straight copy."""

    out_channels: int
    kernel: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c, self.out_channels, k, k),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        t = jnp.einsum("bhwc,coyx->bhywxo", x, w.astype(x.dtype))
        B, H, _, W, _, O = t.shape
        return t.reshape(B, H * k, W * k, O) + b.astype(x.dtype)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = jax.nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    has_residual: bool = True

    @nn.compact
    def __call__(self, x, lateral=None, size: Optional[Tuple[int, int]] = None):
        y = x
        if self.has_residual and lateral is not None:
            y = y + ResidualConvUnit(self.features, name="resConfUnit1")(lateral)
        y = ResidualConvUnit(self.features, name="resConfUnit2")(y)
        if size is None:
            size = (y.shape[-3] * 2, y.shape[-2] * 2)
        y = _interp(y, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(y)


class _HeadConv2(nn.Module):
    """conv3 -> [LN] -> relu -> conv1 (the reference output_conv2 stacks)."""

    mid: int
    out: int
    use_ln: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (3, 3), padding=1, name="conv_a")(x)
        if self.use_ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = jax.nn.relu(x)
        return nn.Conv(self.out, (1, 1), name="conv_b")(x)


class _DPTCommon(nn.Module):
    """Shared stage-projection + fusion machinery."""

    dim_in: int
    output_dim: int
    features: int
    out_channels: Sequence[int]
    patch_size: int = 14
    pos_embed: bool = False
    down_ratio: int = 1
    norm_type: str = "idt"

    def _norm_tokens(self, toks: List[jnp.ndarray]) -> List[jnp.ndarray]:
        if self.norm_type == "layer":
            norm = nn.LayerNorm(epsilon=1e-5, name="norm")
            return [norm(t) for t in toks]
        return toks

    def _stages(self, feats: List[jnp.ndarray], ph: int, pw: int, W: int, H: int):
        """Project + resize the 4 token maps to the fusion pyramid scales."""
        resized = []
        for si in range(4):
            x = feats[si]  # (B*S, Np, C)
            B = x.shape[0]
            x = x.reshape(B, ph, pw, self.dim_in)
            x = nn.Conv(self.out_channels[si], (1, 1), name=f"projects_{si}")(x)
            if self.pos_embed:
                x = self._add_pos_embed(x, W, H)
            if si == 0:
                x = StridedDeconv(self.out_channels[0], 4, name="resize_layers_0")(x)
            elif si == 1:
                x = StridedDeconv(self.out_channels[1], 2, name="resize_layers_1")(x)
            elif si == 3:
                x = nn.Conv(
                    self.out_channels[3], (3, 3), strides=2, padding=1, name="resize_layers_3"
                )(x)
            resized.append(x)
        return resized

    def _rn_layers(self, resized):
        return [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn")(r)
            for i, r in enumerate(resized)
        ]

    def _add_pos_embed(self, x, W, H, ratio=0.1):
        ph, pw = x.shape[-3], x.shape[-2]
        pe = create_uv_grid(pw, ph, aspect_ratio=W / H)
        pe = position_grid_to_embed(pe, x.shape[-1]) * ratio
        return x + jnp.asarray(pe, dtype=x.dtype)[None]


class DPT(_DPTCommon):
    """Main head (+conf if output_dim > 1) + optional sky head.

    Returns dict with keys {head_name, head_name_conf?, sky?}; shapes
    (B, S, H', W') with H' = ph*patch/down_ratio (reference: dpt.py:159-300).
    """

    activation: str = "exp"
    conf_activation: str = "expp1"
    head_name: str = "depth"
    use_sky_head: bool = True
    sky_name: str = "sky"
    sky_activation: str = "relu"
    use_ln_for_heads: bool = False

    @nn.compact
    def __call__(self, feats, H: int, W: int, patch_start_idx: int = 0) -> Dict[str, jnp.ndarray]:
        B, S, N, C = feats[0][0].shape
        tok = [f[0].reshape(B * S, N, C).astype(jnp.float32)[:, patch_start_idx:] for f in feats]
        tok = self._norm_tokens(tok)
        ph, pw = H // self.patch_size, W // self.patch_size

        resized = self._stages(tok, ph, pw, W, H)
        rn = self._rn_layers(resized)
        out = FeatureFusionBlock(self.features, has_residual=False, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        out = FeatureFusionBlock(self.features, name="refinenet3")(out, rn[2], size=rn[1].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet2")(out, rn[1], size=rn[0].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet1")(out, rn[0])

        h_out = int(ph * self.patch_size / self.down_ratio)
        w_out = int(pw * self.patch_size / self.down_ratio)
        fused = nn.Conv(self.features // 2, (3, 3), padding=1, name="output_conv1")(out)
        fused = _interp(fused, (h_out, w_out))
        if self.pos_embed:
            fused = self._add_pos_embed(fused, W, H)

        logits = _HeadConv2(32, self.output_dim, self.use_ln_for_heads, name="output_conv2")(fused)
        outs: Dict[str, jnp.ndarray] = {}
        if self.output_dim > 1:
            pred = apply_activation(logits[..., :-1], self.activation)
            conf = apply_activation(logits[..., -1], self.conf_activation)
            outs[self.head_name] = pred.squeeze(-1).reshape(B, S, h_out, w_out)
            outs[f"{self.head_name}_conf"] = conf.reshape(B, S, h_out, w_out)
        else:
            pred = apply_activation(logits, self.activation)
            outs[self.head_name] = pred.squeeze(-1).reshape(B, S, h_out, w_out)
        if self.use_sky_head:
            sky = _HeadConv2(32, 1, self.use_ln_for_heads, name="sky_output_conv2")(fused)
            outs[self.sky_name] = apply_activation(sky, self.sky_activation).squeeze(-1).reshape(
                B, S, h_out, w_out
            )
        return outs


class DualDPT(_DPTCommon):
    """DPT with an independent auxiliary pyramid: returns depth+conf and
    ray+ray_conf (aux stays at the refinenet1 scale — reference dualdpt.py:243-258
    does not upsample the aux branch)."""

    activation: str = "exp"
    conf_activation: str = "expp1"
    head_names: Tuple[str, str] = ("depth", "ray")
    aux_pyramid_levels: int = 4
    aux_out1_conv_num: int = 5
    # the reference DualDPT always layer-norms tokens (dualdpt.py:79)
    norm_type: str = "layer"
    # and defaults the UV pos-embed ON (dualdpt.py:54)
    pos_embed: bool = True

    @nn.compact
    def __call__(self, feats, H: int, W: int, patch_start_idx: int = 0) -> Dict[str, jnp.ndarray]:
        B, S, N, C = feats[0][0].shape
        tok = [f[0].reshape(B * S, N, C).astype(jnp.float32)[:, patch_start_idx:] for f in feats]
        tok = self._norm_tokens(tok)
        ph, pw = H // self.patch_size, W // self.patch_size
        head_main, head_aux = self.head_names

        resized = self._stages(tok, ph, pw, W, H)
        rn = self._rn_layers(resized)

        out = FeatureFusionBlock(self.features, has_residual=False, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        aux = FeatureFusionBlock(self.features, has_residual=False, name="refinenet4_aux")(
            rn[3], size=rn[2].shape[1:3]
        )
        out = FeatureFusionBlock(self.features, name="refinenet3")(out, rn[2], size=rn[1].shape[1:3])
        aux = FeatureFusionBlock(self.features, name="refinenet3_aux")(aux, rn[2], size=rn[1].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet2")(out, rn[1], size=rn[0].shape[1:3])
        aux = FeatureFusionBlock(self.features, name="refinenet2_aux")(aux, rn[1], size=rn[0].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet1")(out, rn[0])
        aux = FeatureFusionBlock(self.features, name="refinenet1_aux")(aux, rn[0])

        out = nn.Conv(self.features // 2, (3, 3), padding=1, name="output_conv1")(out)
        # only the last aux level is used downstream; earlier levels exist in
        # the reference but are dead weight at inference
        aux = self._aux_out1(aux, self.aux_pyramid_levels - 1)

        h_out = int(ph * self.patch_size / self.down_ratio)
        w_out = int(pw * self.patch_size / self.down_ratio)
        fused_main = _interp(out, (h_out, w_out))
        if self.pos_embed:
            fused_main = self._add_pos_embed(fused_main, W, H)

        main_logits = _HeadConv2(32, self.output_dim, False, name="output_conv2")(fused_main)
        main_pred = apply_activation(main_logits[..., :-1], self.activation)
        main_conf = apply_activation(main_logits[..., -1], self.conf_activation)

        last_aux = aux
        if self.pos_embed:
            last_aux = self._add_pos_embed(last_aux, W, H)
        aux_logits = _HeadConv2(
            32, 7, True, name=f"output_conv2_aux_{self.aux_pyramid_levels - 1}"
        )(last_aux)
        aux_pred = aux_logits[..., :-1]
        aux_conf = apply_activation(aux_logits[..., -1], self.conf_activation)

        ah, aw = aux_pred.shape[1:3]
        return {
            head_main: main_pred.squeeze(-1).reshape(B, S, h_out, w_out),
            f"{head_main}_conf": main_conf.reshape(B, S, h_out, w_out),
            head_aux: aux_pred.reshape(B, S, ah, aw, 6),
            f"{head_aux}_conf": aux_conf.reshape(B, S, ah, aw),
        }

    def _aux_out1(self, x, level_idx: int):
        f = self.features
        n = self.aux_out1_conv_num
        chans = {5: [f // 2, f, f // 2, f, f // 2], 3: [f // 2, f, f // 2], 1: [f // 2]}[n]
        for j, c in enumerate(chans):
            x = nn.Conv(c, (3, 3), padding=1, name=f"output_conv1_aux_{level_idx}_{j}")(x)
        return x


class GSDPT(_DPTCommon):
    """Gaussian-splat head: DPT trunk + image merger -> 38ch raw gaussians
    (reference: gsdpt.py:24-140)."""

    activation: str = "linear"
    conf_activation: str = "sigmoid"
    conf_dim: int = 1
    head_name: str = "raw_gs"
    # GSDPT defaults pos_embed=True in the reference
    pos_embed: bool = True

    @nn.compact
    def __call__(self, feats, H: int, W: int, images=None, patch_start_idx: int = 0):
        B, S, N, C = feats[0][0].shape
        tok = [f[0].reshape(B * S, N, C).astype(jnp.float32)[:, patch_start_idx:] for f in feats]
        tok = self._norm_tokens(tok)
        ph, pw = H // self.patch_size, W // self.patch_size

        resized = self._stages(tok, ph, pw, W, H)
        rn = self._rn_layers(resized)
        out = FeatureFusionBlock(self.features, has_residual=False, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        out = FeatureFusionBlock(self.features, name="refinenet3")(out, rn[2], size=rn[1].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet2")(out, rn[1], size=rn[0].shape[1:3])
        out = FeatureFusionBlock(self.features, name="refinenet1")(out, rn[0])
        out = nn.Conv(self.features // 2, (3, 3), padding=1, name="output_conv1")(out)

        h_out = int(ph * self.patch_size / self.down_ratio)
        w_out = int(pw * self.patch_size / self.down_ratio)
        fused = _interp(out, (h_out, w_out))

        # inject RGB: images (B, S, H, W, 3) in [0, 1]
        imgs = images.reshape(B * S, H, W, 3).astype(jnp.float32)
        m = self.features // 2
        y = nn.Conv(m // 4, (3, 3), padding=1, name="images_merger_0")(imgs)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(m // 2, (3, 3), padding=1, name="images_merger_2")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Conv(m, (3, 3), padding=1, name="images_merger_4")(y)
        y = jax.nn.gelu(y, approximate=False)
        fused = fused + y

        if self.pos_embed:
            fused = self._add_pos_embed(fused, W, H)

        logits = _HeadConv2(32, self.output_dim, False, name="output_conv2")(fused)
        pred, conf = activate_head_gs(
            logits, self.activation, self.conf_activation, self.conf_dim
        )
        return {
            self.head_name: pred.reshape(B, S, h_out, w_out, -1),
            f"{self.head_name}_conf": conf.reshape(B, S, h_out, w_out),
        }
