"""FID Inception-V3 (pool3, 2048-d) in JAX — the pinned FID backbone.

The reference measures FID through clean-fid (eval_fid_clip.py:29-39,
173-195), whose feature network is the TF "inception-2015-12-05" graph.  The
standard PyTorch port of that exact graph is pytorch-fid's
``pt_inception-2015-12-05-6726825d.pth``: torchvision Inception-V3 layout
with the FID-specific deltas (avg-pool branches with
count_include_pad=False, and Mixed_7c's pool branch replaced by a MAX pool —
TF bug-compatibility).  This module implements that architecture
functionally in JAX and loads that canonical state dict, so FID computed
here matches clean-fid up to the TF-vs-PyTorch port noise (~1e-3 on FID).

Zero-egress note: no weights ship in this environment.  The architecture is
structurally pinned instead — ``expected_state_dict_shapes()`` enumerates the
exact tensor set of the canonical checkpoint and ``params_from_torch``
asserts full coverage, so when the standard .pth file is supplied the
features are exact by construction (test_evals pins key census, spatial
trace, and the clean resize against PIL).

Input contract: uint8/float RGB in [0, 255], NHWC, any size; ``clean_resize``
applies clean-fid's float bicubic resize to 299x299 (resize.py "clean"
mode: per-channel PIL 'F'-mode bicubic); the network normalizes to [-1, 1].
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# architecture table: (qualified conv name, in_ch, out_ch, (kh, kw))
# ---------------------------------------------------------------------------


def _inception_a(name: str, inc: int, pool: int) -> List[Tuple[str, int, int, tuple]]:
    return [
        (f"{name}.branch1x1", inc, 64, (1, 1)),
        (f"{name}.branch5x5_1", inc, 48, (1, 1)),
        (f"{name}.branch5x5_2", 48, 64, (5, 5)),
        (f"{name}.branch3x3dbl_1", inc, 64, (1, 1)),
        (f"{name}.branch3x3dbl_2", 64, 96, (3, 3)),
        (f"{name}.branch3x3dbl_3", 96, 96, (3, 3)),
        (f"{name}.branch_pool", inc, pool, (1, 1)),
    ]


def _inception_b(name: str, inc: int):
    return [
        (f"{name}.branch3x3", inc, 384, (3, 3)),
        (f"{name}.branch3x3dbl_1", inc, 64, (1, 1)),
        (f"{name}.branch3x3dbl_2", 64, 96, (3, 3)),
        (f"{name}.branch3x3dbl_3", 96, 96, (3, 3)),
    ]


def _inception_c(name: str, inc: int, c7: int):
    return [
        (f"{name}.branch1x1", inc, 192, (1, 1)),
        (f"{name}.branch7x7_1", inc, c7, (1, 1)),
        (f"{name}.branch7x7_2", c7, c7, (1, 7)),
        (f"{name}.branch7x7_3", c7, 192, (7, 1)),
        (f"{name}.branch7x7dbl_1", inc, c7, (1, 1)),
        (f"{name}.branch7x7dbl_2", c7, c7, (7, 1)),
        (f"{name}.branch7x7dbl_3", c7, c7, (1, 7)),
        (f"{name}.branch7x7dbl_4", c7, c7, (7, 1)),
        (f"{name}.branch7x7dbl_5", c7, 192, (1, 7)),
        (f"{name}.branch_pool", inc, 192, (1, 1)),
    ]


def _inception_d(name: str, inc: int):
    return [
        (f"{name}.branch3x3_1", inc, 192, (1, 1)),
        (f"{name}.branch3x3_2", 192, 320, (3, 3)),
        (f"{name}.branch7x7x3_1", inc, 192, (1, 1)),
        (f"{name}.branch7x7x3_2", 192, 192, (1, 7)),
        (f"{name}.branch7x7x3_3", 192, 192, (7, 1)),
        (f"{name}.branch7x7x3_4", 192, 192, (3, 3)),
    ]


def _inception_e(name: str, inc: int):
    return [
        (f"{name}.branch1x1", inc, 320, (1, 1)),
        (f"{name}.branch3x3_1", inc, 384, (1, 1)),
        (f"{name}.branch3x3_2a", 384, 384, (1, 3)),
        (f"{name}.branch3x3_2b", 384, 384, (3, 1)),
        (f"{name}.branch3x3dbl_1", inc, 448, (1, 1)),
        (f"{name}.branch3x3dbl_2", 448, 384, (3, 3)),
        (f"{name}.branch3x3dbl_3a", 384, 384, (1, 3)),
        (f"{name}.branch3x3dbl_3b", 384, 384, (3, 1)),
        (f"{name}.branch_pool", inc, 192, (1, 1)),
    ]


def conv_table() -> List[Tuple[str, int, int, tuple]]:
    t = [
        ("Conv2d_1a_3x3", 3, 32, (3, 3)),
        ("Conv2d_2a_3x3", 32, 32, (3, 3)),
        ("Conv2d_2b_3x3", 32, 64, (3, 3)),
        ("Conv2d_3b_1x1", 64, 80, (1, 1)),
        ("Conv2d_4a_3x3", 80, 192, (3, 3)),
    ]
    t += _inception_a("Mixed_5b", 192, 32)
    t += _inception_a("Mixed_5c", 256, 64)
    t += _inception_a("Mixed_5d", 288, 64)
    t += _inception_b("Mixed_6a", 288)
    t += _inception_c("Mixed_6b", 768, 128)
    t += _inception_c("Mixed_6c", 768, 160)
    t += _inception_c("Mixed_6d", 768, 160)
    t += _inception_c("Mixed_6e", 768, 192)
    t += _inception_d("Mixed_7a", 768)
    t += _inception_e("Mixed_7b", 1280)
    t += _inception_e("Mixed_7c", 2048)
    return t


def expected_state_dict_shapes() -> Dict[str, tuple]:
    """Exact (name -> shape) census of the canonical pt_inception checkpoint
    tensors this port consumes (fc/AuxLogits are unused for pool3)."""
    out: Dict[str, tuple] = {}
    for name, ci, co, (kh, kw) in conv_table():
        out[f"{name}.conv.weight"] = (co, ci, kh, kw)
        for p in ("weight", "bias", "running_mean", "running_var"):
            out[f"{name}.bn.{p}"] = (co,)
    return out


def params_from_torch(sd: Dict[str, np.ndarray], strict: bool = True) -> dict:
    """Canonical pt_inception (or torchvision inception_v3) state dict ->
    params pytree.  Conv kernels transpose OIHW -> HWIO."""
    exp = expected_state_dict_shapes()
    missing = [k for k in exp if k not in sd]
    if missing:
        raise ValueError(f"state dict missing {len(missing)} tensors, "
                         f"e.g. {missing[:4]}")
    params = {}
    for name, ci, co, _k in conv_table():
        w = np.asarray(sd[f"{name}.conv.weight"], np.float32)
        if strict and w.shape != exp[f"{name}.conv.weight"]:
            raise ValueError(f"{name}: conv shape {w.shape} != "
                             f"{exp[f'{name}.conv.weight']}")
        params[name] = {
            "w": w.transpose(2, 3, 1, 0),               # OIHW -> HWIO
            "g": np.asarray(sd[f"{name}.bn.weight"], np.float32),
            "b": np.asarray(sd[f"{name}.bn.bias"], np.float32),
            "m": np.asarray(sd[f"{name}.bn.running_mean"], np.float32),
            "v": np.asarray(sd[f"{name}.bn.running_var"], np.float32),
        }
    return params


def init_random_params(seed: int = 0) -> dict:
    """Random weights with the canonical shapes (architecture tests).
    He-scaled convs + unit BN stats so activations neither vanish nor blow
    up through the 94-conv depth (a collapsed net would hide wiring bugs)."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, s in expected_state_dict_shapes().items():
        if k.endswith("conv.weight"):
            fan_in = s[1] * s[2] * s[3]
            sd[k] = rng.normal(scale=np.sqrt(2.0 / fan_in),
                               size=s).astype(np.float32)
        elif k.endswith(("bn.weight",)):
            sd[k] = np.ones(s, np.float32)
        elif k.endswith("running_var"):
            sd[k] = np.full(s, 2.0, np.float32)   # ~He-conv output variance
        else:
            sd[k] = np.zeros(s, np.float32)
    return params_from_torch(sd)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

BN_EPS = 1e-3


def _conv_bn(p, x, stride=1, padding=(0, 0)):
    import jax
    import jax.numpy as jnp

    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = (y - p["m"]) * jax.lax.rsqrt(p["v"] + BN_EPS) * p["g"] + p["b"]
    return jax.nn.relu(y)


def _pool(x, kind: str, k=3, stride=1, pad=1):
    """3x3 pooling; avg uses count_include_pad=False (the FID deltas)."""
    import jax
    import jax.numpy as jnp

    dims = (1, k, k, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, dims, strides, padding)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return s / n


def _cat(*xs):
    import jax.numpy as jnp

    return jnp.concatenate(xs, axis=-1)


def _block_a(P, n, x):
    b1 = _conv_bn(P[f"{n}.branch1x1"], x)
    b5 = _conv_bn(P[f"{n}.branch5x5_2"],
                  _conv_bn(P[f"{n}.branch5x5_1"], x), padding=(2, 2))
    b3 = _conv_bn(P[f"{n}.branch3x3dbl_1"], x)
    b3 = _conv_bn(P[f"{n}.branch3x3dbl_2"], b3, padding=(1, 1))
    b3 = _conv_bn(P[f"{n}.branch3x3dbl_3"], b3, padding=(1, 1))
    bp = _conv_bn(P[f"{n}.branch_pool"], _pool(x, "avg"))
    return _cat(b1, b5, b3, bp)


def _block_b(P, n, x):
    b3 = _conv_bn(P[f"{n}.branch3x3"], x, stride=2)
    bd = _conv_bn(P[f"{n}.branch3x3dbl_1"], x)
    bd = _conv_bn(P[f"{n}.branch3x3dbl_2"], bd, padding=(1, 1))
    bd = _conv_bn(P[f"{n}.branch3x3dbl_3"], bd, stride=2)
    bp = _pool(x, "max", stride=2, pad=0)
    return _cat(b3, bd, bp)


def _block_c(P, n, x):
    b1 = _conv_bn(P[f"{n}.branch1x1"], x)
    b7 = _conv_bn(P[f"{n}.branch7x7_1"], x)
    b7 = _conv_bn(P[f"{n}.branch7x7_2"], b7, padding=(0, 3))
    b7 = _conv_bn(P[f"{n}.branch7x7_3"], b7, padding=(3, 0))
    bd = _conv_bn(P[f"{n}.branch7x7dbl_1"], x)
    bd = _conv_bn(P[f"{n}.branch7x7dbl_2"], bd, padding=(3, 0))
    bd = _conv_bn(P[f"{n}.branch7x7dbl_3"], bd, padding=(0, 3))
    bd = _conv_bn(P[f"{n}.branch7x7dbl_4"], bd, padding=(3, 0))
    bd = _conv_bn(P[f"{n}.branch7x7dbl_5"], bd, padding=(0, 3))
    bp = _conv_bn(P[f"{n}.branch_pool"], _pool(x, "avg"))
    return _cat(b1, b7, bd, bp)


def _block_d(P, n, x):
    b3 = _conv_bn(P[f"{n}.branch3x3_2"],
                  _conv_bn(P[f"{n}.branch3x3_1"], x), stride=2)
    b7 = _conv_bn(P[f"{n}.branch7x7x3_1"], x)
    b7 = _conv_bn(P[f"{n}.branch7x7x3_2"], b7, padding=(0, 3))
    b7 = _conv_bn(P[f"{n}.branch7x7x3_3"], b7, padding=(3, 0))
    b7 = _conv_bn(P[f"{n}.branch7x7x3_4"], b7, stride=2)
    bp = _pool(x, "max", stride=2, pad=0)
    return _cat(b3, b7, bp)


def _block_e(P, n, x, pool_kind: str):
    b1 = _conv_bn(P[f"{n}.branch1x1"], x)
    b3 = _conv_bn(P[f"{n}.branch3x3_1"], x)
    b3 = _cat(_conv_bn(P[f"{n}.branch3x3_2a"], b3, padding=(0, 1)),
              _conv_bn(P[f"{n}.branch3x3_2b"], b3, padding=(1, 0)))
    bd = _conv_bn(P[f"{n}.branch3x3dbl_1"], x)
    bd = _conv_bn(P[f"{n}.branch3x3dbl_2"], bd, padding=(1, 1))
    bd = _cat(_conv_bn(P[f"{n}.branch3x3dbl_3a"], bd, padding=(0, 1)),
              _conv_bn(P[f"{n}.branch3x3dbl_3b"], bd, padding=(1, 0)))
    # Mixed_7c's pool branch is a MAX pool in the FID network (pytorch-fid
    # FIDInceptionE_2 — TF bug-compatibility); Mixed_7b keeps avg
    bp = _conv_bn(P[f"{n}.branch_pool"], _pool(x, pool_kind))
    return _cat(b1, b3, bd, bp)


def pool3_features(params: dict, images) -> "jnp.ndarray":
    """[N, 299, 299, 3] float RGB in [0, 255] -> [N, 2048] pool3 features."""
    import jax.numpy as jnp

    x = (jnp.asarray(images, jnp.float32) - 127.5) / 127.5
    P = params
    x = _conv_bn(P["Conv2d_1a_3x3"], x, stride=2)           # 149
    x = _conv_bn(P["Conv2d_2a_3x3"], x)                     # 147
    x = _conv_bn(P["Conv2d_2b_3x3"], x, padding=(1, 1))     # 147
    x = _pool(x, "max", stride=2, pad=0)                    # 73
    x = _conv_bn(P["Conv2d_3b_1x1"], x)
    x = _conv_bn(P["Conv2d_4a_3x3"], x)                     # 71
    x = _pool(x, "max", stride=2, pad=0)                    # 35
    x = _block_a(P, "Mixed_5b", x)
    x = _block_a(P, "Mixed_5c", x)
    x = _block_a(P, "Mixed_5d", x)
    x = _block_b(P, "Mixed_6a", x)                          # 17
    x = _block_c(P, "Mixed_6b", x)
    x = _block_c(P, "Mixed_6c", x)
    x = _block_c(P, "Mixed_6d", x)
    x = _block_c(P, "Mixed_6e", x)
    x = _block_d(P, "Mixed_7a", x)                          # 8
    x = _block_e(P, "Mixed_7b", x, "avg")
    x = _block_e(P, "Mixed_7c", x, "max")                   # 8x8x2048
    return jnp.mean(x, axis=(1, 2))


def spatial_trace(params: dict, size: int = 299):
    """Spatial dims after each stage (architecture pin for tests)."""
    import jax
    import jax.numpy as jnp

    dims = []
    x = jnp.zeros((1, size, size, 3), jnp.float32)

    def probe(y):
        dims.append(tuple(y.shape[1:]))
        return y

    x = probe(_conv_bn(params["Conv2d_1a_3x3"], x, stride=2))
    x = probe(_conv_bn(params["Conv2d_2a_3x3"], x))
    x = probe(_conv_bn(params["Conv2d_2b_3x3"], x, padding=(1, 1)))
    x = probe(_pool(x, "max", stride=2, pad=0))
    x = probe(_conv_bn(params["Conv2d_3b_1x1"], x))
    x = probe(_conv_bn(params["Conv2d_4a_3x3"], x))
    x = probe(_pool(x, "max", stride=2, pad=0))
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = probe(_block_a(params, n, x))
    x = probe(_block_b(params, "Mixed_6a", x))
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = probe(_block_c(params, n, x))
    x = probe(_block_d(params, "Mixed_7a", x))
    x = probe(_block_e(params, "Mixed_7b", x, "avg"))
    x = probe(_block_e(params, "Mixed_7c", x, "max"))
    return dims


# ---------------------------------------------------------------------------
# clean-fid resize + extractor
# ---------------------------------------------------------------------------


def clean_resize(img: np.ndarray, size: int = 299) -> np.ndarray:
    """clean-fid's "clean" resize: float32 per-channel PIL 'F'-mode bicubic
    (cleanfid/resize.py make_resizer("PIL", False, "bicubic")).  This IS the
    documented fix clean-fid contributes over naive tensor resizing."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    chans = [
        np.asarray(Image.fromarray(img[..., c], mode="F").resize(
            (size, size), resample=Image.BICUBIC))
        for c in range(img.shape[-1])
    ]
    return np.stack(chans, axis=-1)


class InceptionExtractor:
    """features.py-compatible FID feature extractor (jit-compiled, CPU or
    TPU).  ``weights`` = path to the canonical pt_inception .pth / a .npz
    with the same keys; None = random weights (shape/selftest only)."""

    def __init__(self, weights: str | None = None):
        import jax

        if weights is None:
            self.params = init_random_params()
        elif weights.endswith(".npz"):
            with np.load(weights) as z:
                self.params = params_from_torch({k: z[k] for k in z.files})
        else:
            import torch

            sd = torch.load(weights, map_location="cpu", weights_only=True)
            self.params = params_from_torch(
                {k: v.numpy() for k, v in sd.items()
                 if not k.startswith(("fc.", "AuxLogits."))})
        self._fwd = jax.jit(pool3_features)

    def image_features(self, images: np.ndarray, batch: int = 32) -> np.ndarray:
        out = []
        for lo in range(0, len(images), batch):
            blk = np.stack([clean_resize(im) for im in images[lo: lo + batch]])
            out.append(np.asarray(self._fwd(self.params, blk)))
        return np.concatenate(out, axis=0)
