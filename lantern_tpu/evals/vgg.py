"""VGG16 fc2 features in JAX — the pinned precision/recall backbone.

The reference's improved-precision-recall manifold runs torchvision VGG16
and takes ``classifier[:4]`` outputs (fc2, 4096-d, pre-ReLU) over 224x224
images normalized with the ImageNet mean/std after a bilinear resize
(eval_prec_recall.py:44-77, 134-160, 307-313).  This module implements that
extraction functionally and loads the canonical torchvision ``vgg16``
state dict; ``expected_state_dict_shapes()`` pins the exact tensor census
(zero-egress: no weights ship here, the instrument is pinned structurally
and becomes exact when the standard .pth is supplied).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torchvision vgg16 "features" conv indices and channel plan; "M" = maxpool
_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
         512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def conv_layout():
    """[(state-dict index, in_ch, out_ch)] mirroring torchvision vgg16."""
    out, idx, cin = [], 0, 3
    for item in _PLAN:
        if item == "M":
            idx += 1
            continue
        out.append((idx, cin, item))
        cin = item
        idx += 2              # conv + relu
    return out


def expected_state_dict_shapes() -> Dict[str, tuple]:
    exp: Dict[str, tuple] = {}
    for idx, cin, cout in conv_layout():
        exp[f"features.{idx}.weight"] = (cout, cin, 3, 3)
        exp[f"features.{idx}.bias"] = (cout,)
    exp["classifier.0.weight"] = (4096, 512 * 7 * 7)
    exp["classifier.0.bias"] = (4096,)
    exp["classifier.3.weight"] = (4096, 4096)
    exp["classifier.3.bias"] = (4096,)
    return exp


def params_from_torch(sd: Dict[str, np.ndarray]) -> dict:
    exp = expected_state_dict_shapes()
    missing = [k for k in exp if k not in sd]
    if missing:
        raise ValueError(f"vgg16 state dict missing {missing[:4]} "
                         f"(+{max(0, len(missing) - 4)} more)")
    p = {"convs": [], "fc": []}
    for idx, _ci, _co in conv_layout():
        w = np.asarray(sd[f"features.{idx}.weight"], np.float32)
        p["convs"].append({
            "w": w.transpose(2, 3, 1, 0),        # OIHW -> HWIO
            "b": np.asarray(sd[f"features.{idx}.bias"], np.float32),
        })
    for i in (0, 3):
        p["fc"].append({
            "w": np.asarray(sd[f"classifier.{i}.weight"], np.float32).T,
            "b": np.asarray(sd[f"classifier.{i}.bias"], np.float32),
        })
    return p


def init_random_params(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for k, s in expected_state_dict_shapes().items():
        fan_in = int(np.prod(s[1:])) if len(s) > 1 else s[0]
        sd[k] = (rng.normal(scale=np.sqrt(2.0 / fan_in), size=s)
                 .astype(np.float32) if len(s) > 1
                 else np.zeros(s, np.float32))
    return params_from_torch(sd)


def fc2_features(params: dict, images) -> "jnp.ndarray":
    """[N, 224, 224, 3] float RGB in [0, 1] -> [N, 4096] fc2 features
    (torchvision layout: classifier[:4] output, pre-ReLU)."""
    import jax
    import jax.numpy as jnp

    x = (jnp.asarray(images, jnp.float32) - IMAGENET_MEAN) / IMAGENET_STD
    ci = 0
    for item in _PLAN:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, 0), (0, 0), (0, 0)))
            continue
        c = params["convs"][ci]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(c["w"]), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        x = jax.nn.relu(x)
        ci += 1
    # torch flattens NCHW: [N, 512, 7, 7] -> 512*7*7; match that order
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc"][0]["w"] + params["fc"][0]["b"])
    return x @ params["fc"][1]["w"] + params["fc"][1]["b"]


class VGGExtractor:
    """features.py-compatible extractor; ``weights`` = torchvision vgg16
    .pth (or same-key .npz); None = random weights (tests)."""

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
                {k: np.asarray(v) for k, v in sd.items()})
        self._fwd = jax.jit(fc2_features)

    def image_features(self, images: np.ndarray, batch: int = 32) -> np.ndarray:
        from PIL import Image

        out = []
        for lo in range(0, len(images), batch):
            blk = []
            for im in images[lo: lo + batch]:
                pil = Image.fromarray(np.asarray(im, np.uint8))
                # reference transform: bilinear Resize([224, 224]) then
                # ToTensor (eval_prec_recall.py:309-310)
                blk.append(np.asarray(
                    pil.resize((224, 224), Image.BILINEAR), np.float32) / 255.0)
            out.append(np.asarray(self._fwd(self.params, np.stack(blk))))
        return np.concatenate(out, axis=0)
