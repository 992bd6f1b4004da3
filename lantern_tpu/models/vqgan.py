"""VQ-GAN image codec (LlamaGen VQ-8/VQ-16 family) in JAX, NHWC layout.

Reference: models/base_models/llamagen/vq_model.py (taming-transformers
VQModel).  Encoder/decoder are conv towers with GroupNorm+swish ResNet blocks
and a single-head attention block at the lowest resolution; the quantizer is
an (optionally L2-normalized) nearest-neighbor codebook.

TPU notes: convolutions run in NHWC with HWIO kernels (XLA's native TPU
layout); the codebook lookup for ``decode_code`` is a plain gather; the
nearest-code search in ``encode`` is a single [BHW, C] x [C, N] matmul on the
MXU.  Weight loaders transpose once from torch NCHW on the host.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VQGANConfig:
    codebook_size: int = 16384
    codebook_dim: int = 8
    l2_norm: bool = True
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    in_channels: int = 3
    out_channels: int = 3
    # encoder levels (by index) that get attention blocks.  LlamaGen puts
    # attention at the lowest resolution only; taming configs specify pixel
    # resolutions (see ``chameleon_vq_config``).
    attn_levels: Tuple[int, ...] = (-1,)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    def enc_attn(self, level: int) -> bool:
        n = len(self.ch_mult)
        return level in tuple(a % n for a in self.attn_levels)



def vq16_config(**kw) -> VQGANConfig:
    return VQGANConfig(ch_mult=(1, 1, 2, 2, 4), **kw)


def vq8_config(**kw) -> VQGANConfig:
    return VQGANConfig(ch_mult=(1, 2, 2, 4), **kw)


def chameleon_vq_config(
    resolution: int = 512,
    attn_resolutions: Tuple[int, ...] = (32,),
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4),
    **kw,
) -> VQGANConfig:
    """Chameleon / Anole / Lumina VQ-GAN (chameleon_vae_ori/vqgan.py):
    codebook 8192x256, un-normalized codes, attention at the taming config's
    pixel resolutions."""
    levels = []
    curr = resolution
    for i in range(len(ch_mult)):
        if curr in attn_resolutions:
            levels.append(i)
        if i != len(ch_mult) - 1:
            curr //= 2
    kw.setdefault("codebook_size", 8192)
    kw.setdefault("codebook_dim", 256)
    kw.setdefault("l2_norm", False)
    return VQGANConfig(ch_mult=tuple(ch_mult), attn_levels=tuple(levels), **kw)


# ---------------------------------------------------------------------------
# primitive layers (params are dicts of arrays)
# ---------------------------------------------------------------------------

def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def group_norm(p: dict, x: jnp.ndarray, groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups).astype(jnp.float32)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return (xg.reshape(B, H, W, C) * p["scale"] + p["bias"]).astype(x.dtype)


def swish(x):
    return x * jax.nn.sigmoid(x)


def resnet_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def attn_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x)
    q = conv2d(p["q"], h).reshape(B, H * W, C)
    k = conv2d(p["k"], h).reshape(B, H * W, C)
    v = conv2d(p["v"], h).reshape(B, H * W, C)
    w = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w * (C ** -0.5), axis=-1).astype(x.dtype)
    h = jnp.einsum("bij,bjc->bic", w, v).reshape(B, H, W, C)
    return x + conv2d(p["proj_out"], h)


def downsample(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    # torch pads (left 0, right 1, top 0, bottom 1)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


def upsample(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p["conv"], x)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(rng, kh, kw, cin, cout):
    fan = kh * kw * cin
    w = jax.random.normal(rng, (kh, kw, cin, cout)) * (1.0 / np.sqrt(fan))
    return {"w": w, "b": jnp.zeros((cout,))}


def _gn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _res_init(rng, cin, cout):
    r = jax.random.split(rng, 3)
    p = {
        "norm1": _gn_init(cin), "conv1": _conv_init(r[0], 3, 3, cin, cout),
        "norm2": _gn_init(cout), "conv2": _conv_init(r[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(r[2], 1, 1, cin, cout)
    return p


def _attn_init(rng, c):
    r = jax.random.split(rng, 4)
    return {
        "norm": _gn_init(c),
        "q": _conv_init(r[0], 1, 1, c, c), "k": _conv_init(r[1], 1, 1, c, c),
        "v": _conv_init(r[2], 1, 1, c, c), "proj_out": _conv_init(r[3], 1, 1, c, c),
    }


def init_vqgan_params(rng: jax.Array, cfg: VQGANConfig) -> dict:
    ks = iter(jax.random.split(rng, 256))
    nr = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)

    # encoder
    enc = {"conv_in": _conv_init(next(ks), 3, 3, cfg.in_channels, cfg.ch)}
    blocks = []
    for i in range(nr):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            blk["res"].append(_res_init(next(ks), cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(_attn_init(next(ks), cin))
        if i != nr - 1:
            blk["downsample"] = {"conv": _conv_init(next(ks), 3, 3, cin, cin)}
        blocks.append(blk)
    enc["blocks"] = blocks
    bi = cfg.ch * cfg.ch_mult[-1]
    enc["mid"] = [_res_init(next(ks), bi, bi), _attn_init(next(ks), bi),
                  _res_init(next(ks), bi, bi)]
    enc["norm_out"] = _gn_init(bi)
    enc["conv_out"] = _conv_init(next(ks), 3, 3, bi, cfg.z_channels)

    # decoder
    dec = {"conv_in": _conv_init(next(ks), 3, 3, cfg.z_channels, bi)}
    dec["mid"] = [_res_init(next(ks), bi, bi), _attn_init(next(ks), bi),
                  _res_init(next(ks), bi, bi)]
    blocks = []
    cin = bi
    for i in reversed(range(nr)):
        cout = cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            blk["res"].append(_res_init(next(ks), cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(_attn_init(next(ks), cin))
        if i != 0:
            blk["upsample"] = {"conv": _conv_init(next(ks), 3, 3, cin, cin)}
        blocks.append(blk)
    dec["blocks"] = blocks
    dec["norm_out"] = _gn_init(cin)
    dec["conv_out"] = _conv_init(next(ks), 3, 3, cin, cfg.out_channels)

    codebook = jax.random.uniform(
        next(ks), (cfg.codebook_size, cfg.codebook_dim),
        minval=-1.0 / cfg.codebook_size, maxval=1.0 / cfg.codebook_size,
    )
    if cfg.l2_norm:
        codebook = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv_init(next(ks), 1, 1, cfg.z_channels, cfg.codebook_dim),
        "post_quant_conv": _conv_init(next(ks), 1, 1, cfg.codebook_dim, cfg.z_channels),
        "codebook": codebook,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _tower(blocks, mid, x, up: bool):
    if not up:
        for blk in blocks:
            for i, r in enumerate(blk["res"]):
                x = resnet_block(r, x)
                if blk["attn"]:
                    x = attn_block(blk["attn"][i], x)
            if "downsample" in blk:
                x = downsample(blk["downsample"], x)
        for i, m in enumerate(mid):
            x = attn_block(m, x) if i == 1 else resnet_block(m, x)
    else:
        for i, m in enumerate(mid):
            x = attn_block(m, x) if i == 1 else resnet_block(m, x)
        for blk in blocks:
            for i, r in enumerate(blk["res"]):
                x = resnet_block(r, x)
                if blk["attn"]:
                    x = attn_block(blk["attn"][i], x)
            if "upsample" in blk:
                x = upsample(blk["upsample"], x)
    return x


def _norm_codebook(params, cfg: VQGANConfig) -> jnp.ndarray:
    cb = params["codebook"]
    if cfg.l2_norm:
        cb = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-12)
    return cb


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, cfg: VQGANConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, H, W, 3] in [-1, 1] -> codes [B, (H/f)*(W/f)] int32."""
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], images)
    h = _tower(enc["blocks"], enc["mid"], h, up=False)
    h = conv2d(enc["conv_out"], swish(group_norm(enc["norm_out"], h)))
    z = conv2d(params["quant_conv"], h)                       # [B, h, w, d]
    B, hh, ww, d = z.shape
    zf = z.reshape(-1, d)
    if cfg.l2_norm:
        zf = zf / jnp.maximum(jnp.linalg.norm(zf, axis=-1, keepdims=True), 1e-12)
    cb = _norm_codebook(params, cfg)
    d2 = (
        jnp.sum(zf * zf, axis=1, keepdims=True)
        + jnp.sum(cb * cb, axis=1)[None, :]
        - 2.0 * zf @ cb.T
    )
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return idx.reshape(B, hh * ww)


@partial(jax.jit, static_argnames=("cfg", "grid"))
def decode_code(params: dict, cfg: VQGANConfig, codes: jnp.ndarray, grid) -> jnp.ndarray:
    """codes [B, h*w] int32 -> images [B, h*f, w*f, 3].

    ``grid`` is the latent grid: an int (square) or an (h, w) tuple —
    Lumina-mGPT generates flexible-resolution rectangular grids."""
    gh, gw = (grid, grid) if isinstance(grid, int) else grid
    cb = _norm_codebook(params, cfg)
    z = cb[codes].reshape(codes.shape[0], gh, gw, cfg.codebook_dim)
    z = conv2d(params["post_quant_conv"], z)
    dec = params["decoder"]
    h = conv2d(dec["conv_in"], z)
    h = _tower(dec["blocks"], dec["mid"], h, up=True)
    return conv2d(dec["conv_out"], swish(group_norm(dec["norm_out"], h)))


# ---------------------------------------------------------------------------
# torch checkpoint loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(sd: dict, cfg: VQGANConfig) -> dict:
    """Map a torch VQModel state_dict (numpy arrays, NCHW conv kernels) to
    our NHWC param tree.  Key layout follows vq_model.py module names."""

    def conv(prefix):
        return {
            "w": jnp.asarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))),
            "b": jnp.asarray(sd[prefix + ".bias"]),
        }

    def gn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def res(prefix, cin, cout):
        p = {"norm1": gn(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": gn(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if cin != cout:
            p["nin_shortcut"] = conv(prefix + ".nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": gn(prefix + ".norm"), "q": conv(prefix + ".q"),
                "k": conv(prefix + ".k"), "v": conv(prefix + ".v"),
                "proj_out": conv(prefix + ".proj_out")}

    nr = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)

    enc = {"conv_in": conv("encoder.conv_in")}
    blocks = []
    for i in range(nr):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            blk["res"].append(res(f"encoder.conv_blocks.{i}.res.{j}", cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(attn(f"encoder.conv_blocks.{i}.attn.{j}"))
        if i != nr - 1:
            blk["downsample"] = {"conv": conv(f"encoder.conv_blocks.{i}.downsample.conv")}
        blocks.append(blk)
    enc["blocks"] = blocks
    bi = cfg.ch * cfg.ch_mult[-1]
    enc["mid"] = [res("encoder.mid.0", bi, bi), attn("encoder.mid.1"),
                  res("encoder.mid.2", bi, bi)]
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec = {"conv_in": conv("decoder.conv_in")}
    dec["mid"] = [res("decoder.mid.0", bi, bi), attn("decoder.mid.1"),
                  res("decoder.mid.2", bi, bi)]
    blocks = []
    cin = bi
    for bidx, i in enumerate(reversed(range(nr))):
        cout = cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            blk["res"].append(res(f"decoder.conv_blocks.{bidx}.res.{j}", cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(attn(f"decoder.conv_blocks.{bidx}.attn.{j}"))
        if i != 0:
            blk["upsample"] = {"conv": conv(f"decoder.conv_blocks.{bidx}.upsample.conv")}
        blocks.append(blk)
    dec["blocks"] = blocks
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "codebook": jnp.asarray(sd["quantize.embedding.weight"]),
    }


def load_taming_state_dict(sd: dict, cfg: VQGANConfig) -> dict:
    """Map a taming-transformers VQModel state_dict (Chameleon/Anole/Lumina
    tokenizer, chameleon_vae_ori/vqgan.py) to our NHWC param tree.

    Name layout: ``encoder.down.{i}.block.{j}``, ``encoder.mid.block_1`` /
    ``attn_1`` / ``block_2``, ``decoder.up.{i}...`` where decoder level i is
    stored in *fine-to-coarse* index order (our decoder blocks run
    coarse->fine, so block j maps to ``up.{n-1-j}``).
    """

    def conv(prefix):
        return {
            "w": jnp.asarray(np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))),
            "b": jnp.asarray(sd[prefix + ".bias"]),
        }

    def gn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def res(prefix, cin, cout):
        p = {"norm1": gn(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": gn(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if cin != cout:
            p["nin_shortcut"] = conv(prefix + ".nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": gn(prefix + ".norm"), "q": conv(prefix + ".q"),
                "k": conv(prefix + ".k"), "v": conv(prefix + ".v"),
                "proj_out": conv(prefix + ".proj_out")}

    nr = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)

    enc = {"conv_in": conv("encoder.conv_in")}
    blocks = []
    for i in range(nr):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            blk["res"].append(res(f"encoder.down.{i}.block.{j}", cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(attn(f"encoder.down.{i}.attn.{j}"))
        if i != nr - 1:
            blk["downsample"] = {"conv": conv(f"encoder.down.{i}.downsample.conv")}
        blocks.append(blk)
    enc["blocks"] = blocks
    bi = cfg.ch * cfg.ch_mult[-1]
    enc["mid"] = [res("encoder.mid.block_1", bi, bi), attn("encoder.mid.attn_1"),
                  res("encoder.mid.block_2", bi, bi)]
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec = {"conv_in": conv("decoder.conv_in")}
    dec["mid"] = [res("decoder.mid.block_1", bi, bi), attn("decoder.mid.attn_1"),
                  res("decoder.mid.block_2", bi, bi)]
    blocks = []
    cin = bi
    for i in reversed(range(nr)):
        cout = cfg.ch * cfg.ch_mult[i]
        blk = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            blk["res"].append(res(f"decoder.up.{i}.block.{j}", cin, cout))
            cin = cout
            if cfg.enc_attn(i):
                blk["attn"].append(attn(f"decoder.up.{i}.attn.{j}"))
        if i != 0:
            blk["upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
        blocks.append(blk)
    dec["blocks"] = blocks
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "codebook": jnp.asarray(sd["quantize.embedding.weight"]),
    }


def random_taming_state_dict(cfg: VQGANConfig, seed: int = 0) -> dict:
    """Random numpy state dict in the exact taming-transformers naming
    ``load_taming_state_dict`` consumes — the synthetic-checkpoint
    counterpart for full-size loader rehearsals (no public VQGAN weights in
    a zero-egress environment; scripts/rehearse_full_ckpt.py)."""
    rng = np.random.default_rng(seed)
    sd: dict = {}

    def conv(prefix, cout, cin, k):
        sd[prefix + ".weight"] = (rng.standard_normal((cout, cin, k, k))
                                  * 0.02).astype(np.float32)
        sd[prefix + ".bias"] = np.zeros((cout,), np.float32)

    def gn(prefix, c):
        sd[prefix + ".weight"] = np.ones((c,), np.float32)
        sd[prefix + ".bias"] = np.zeros((c,), np.float32)

    def res(prefix, cin, cout):
        gn(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cout, cin, 3)
        gn(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout, 3)
        if cin != cout:
            conv(prefix + ".nin_shortcut", cout, cin, 1)

    def attn(prefix, c):
        gn(prefix + ".norm", c)
        for nm in ("q", "k", "v", "proj_out"):
            conv(prefix + "." + nm, c, c, 1)

    nr = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)
    conv("encoder.conv_in", cfg.ch, cfg.in_channels, 3)
    for i in range(nr):
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", cin, cout)
            cin = cout
            if cfg.enc_attn(i):
                attn(f"encoder.down.{i}.attn.{j}", cout)
        if i != nr - 1:
            conv(f"encoder.down.{i}.downsample.conv", cout, cout, 3)
    bi = cfg.ch * cfg.ch_mult[-1]
    res("encoder.mid.block_1", bi, bi)
    attn("encoder.mid.attn_1", bi)
    res("encoder.mid.block_2", bi, bi)
    gn("encoder.norm_out", bi)
    conv("encoder.conv_out", cfg.z_channels, bi, 3)

    conv("decoder.conv_in", bi, cfg.z_channels, 3)
    res("decoder.mid.block_1", bi, bi)
    attn("decoder.mid.attn_1", bi)
    res("decoder.mid.block_2", bi, bi)
    cin = bi
    for i in reversed(range(nr)):
        cout = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", cin, cout)
            cin = cout
            if cfg.enc_attn(i):
                attn(f"decoder.up.{i}.attn.{j}", cout)
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", cout, cout, 3)
    gn("decoder.norm_out", cin)
    conv("decoder.conv_out", cfg.out_channels, cin, 3)
    conv("quant_conv", cfg.codebook_dim, cfg.z_channels, 1)
    conv("post_quant_conv", cfg.z_channels, cfg.codebook_dim, 1)
    sd["quantize.embedding.weight"] = (
        rng.standard_normal((cfg.codebook_size, cfg.codebook_dim))
        .astype(np.float32))
    return sd
