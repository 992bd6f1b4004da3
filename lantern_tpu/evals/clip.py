"""OpenAI-CLIP ViT towers in JAX — the pinned CLIP-score / HPSv2.1 backbones.

The reference scores CLIP similarity with the OpenAI ``clip`` package's
ViT-B/32 (eval_fid_clip.py:120-160: bicubic-resize + center-crop + CLIP
mean/std, "A photo depicts " token splice, cosine similarity) and HPS with
the ``hpsv2`` package's v2.1 checkpoint — an OpenCLIP ViT-H/14 fine-tune
scored as the diagonal of normalized image @ text.T (eval_hpsv2.py:17-58).

This module implements both towers functionally in JAX and pins each
backbone the way evals/inception.py and evals/vgg.py pin theirs:
``expected_state_dict_shapes(geom)`` is the exact tensor census of the
canonical checkpoint (OpenAI/OpenCLIP state-dict naming — the two lineages
share it), so the instrument is structurally exact in this zero-egress
environment and numerically exact the moment the public weights are
supplied.  Geometry table:

- ``VIT_B32``  — OpenAI CLIP ViT-B/32 (QuickGELU), the CLIP-score backbone.
- ``VIT_H14``  — OpenCLIP ViT-H/14 (plain GELU), the HPSv2.1 backbone; the
  HPS_v2.1 .pt stores the same keys under ``state_dict`` (and inside a
  wrapping module in some releases — ``params_from_openai`` strips both).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict

import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPGeom:
    vision_width: int
    vision_layers: int
    vision_heads: int
    patch: int
    image_size: int
    embed_dim: int
    text_width: int
    text_layers: int
    text_heads: int
    vocab: int = 49408
    ctx: int = 77
    quick_gelu: bool = True     # OpenAI checkpoints; OpenCLIP uses plain GELU

    @property
    def grid(self) -> int:
        return self.image_size // self.patch


VIT_B32 = CLIPGeom(vision_width=768, vision_layers=12, vision_heads=12,
                   patch=32, image_size=224, embed_dim=512,
                   text_width=512, text_layers=12, text_heads=8,
                   quick_gelu=True)
# HPSv2.1 backbone: OpenCLIP ViT-H-14 (laion2B lineage)
VIT_H14 = CLIPGeom(vision_width=1280, vision_layers=32, vision_heads=16,
                   patch=14, image_size=224, embed_dim=1024,
                   text_width=1024, text_layers=24, text_heads=16,
                   quick_gelu=False)


def _block_shapes(prefix: str, width: int) -> Dict[str, tuple]:
    return {
        f"{prefix}.ln_1.weight": (width,),
        f"{prefix}.ln_1.bias": (width,),
        f"{prefix}.attn.in_proj_weight": (3 * width, width),
        f"{prefix}.attn.in_proj_bias": (3 * width,),
        f"{prefix}.attn.out_proj.weight": (width, width),
        f"{prefix}.attn.out_proj.bias": (width,),
        f"{prefix}.ln_2.weight": (width,),
        f"{prefix}.ln_2.bias": (width,),
        f"{prefix}.mlp.c_fc.weight": (4 * width, width),
        f"{prefix}.mlp.c_fc.bias": (4 * width,),
        f"{prefix}.mlp.c_proj.weight": (width, 4 * width),
        f"{prefix}.mlp.c_proj.bias": (width,),
    }


def expected_state_dict_shapes(geom: CLIPGeom = VIT_B32) -> Dict[str, tuple]:
    """Tensor census of the canonical checkpoint (OpenAI/OpenCLIP naming)."""
    g = geom
    exp: Dict[str, tuple] = {
        "visual.class_embedding": (g.vision_width,),
        "visual.positional_embedding": (g.grid * g.grid + 1, g.vision_width),
        "visual.conv1.weight": (g.vision_width, 3, g.patch, g.patch),
        "visual.ln_pre.weight": (g.vision_width,),
        "visual.ln_pre.bias": (g.vision_width,),
        "visual.ln_post.weight": (g.vision_width,),
        "visual.ln_post.bias": (g.vision_width,),
        "visual.proj": (g.vision_width, g.embed_dim),
        "token_embedding.weight": (g.vocab, g.text_width),
        "positional_embedding": (g.ctx, g.text_width),
        "ln_final.weight": (g.text_width,),
        "ln_final.bias": (g.text_width,),
        "text_projection": (g.text_width, g.embed_dim),
        "logit_scale": (),
    }
    for i in range(g.vision_layers):
        exp.update(_block_shapes(f"visual.transformer.resblocks.{i}",
                                 g.vision_width))
    for i in range(g.text_layers):
        exp.update(_block_shapes(f"transformer.resblocks.{i}", g.text_width))
    return exp


def _unwrap(sd: dict) -> dict:
    """Strip hpsv2 / lightning wrappers: {'state_dict': ...} and a uniform
    leading 'module.' or 'model.' key prefix."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    for pre in ("module.", "model."):
        if sd and all(k.startswith(pre) for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items()}
    return sd


def _block_params(sd, prefix: str) -> dict:
    g = lambda k: np.asarray(sd[f"{prefix}.{k}"], np.float32)  # noqa: E731
    return {
        "ln_1": (g("ln_1.weight"), g("ln_1.bias")),
        "qkv_w": g("attn.in_proj_weight").T,       # [W, 3W]
        "qkv_b": g("attn.in_proj_bias"),
        "out_w": g("attn.out_proj.weight").T,
        "out_b": g("attn.out_proj.bias"),
        "ln_2": (g("ln_2.weight"), g("ln_2.bias")),
        "fc_w": g("mlp.c_fc.weight").T,
        "fc_b": g("mlp.c_fc.bias"),
        "proj_w": g("mlp.c_proj.weight").T,
        "proj_b": g("mlp.c_proj.bias"),
    }


def params_from_openai(sd: Dict[str, np.ndarray],
                       geom: CLIPGeom = VIT_B32) -> dict:
    sd = _unwrap(sd)
    exp = expected_state_dict_shapes(geom)
    missing = [k for k in exp if k not in sd]
    if missing:
        raise ValueError(
            f"CLIP state dict missing {missing[:4]} "
            f"(+{max(0, len(missing) - 4)} more) for geometry {geom}")
    bad = [k for k, s in exp.items() if tuple(np.shape(sd[k])) != s]
    if bad:
        raise ValueError(f"CLIP census mismatch at {bad[:4]}: "
                         f"{[tuple(np.shape(sd[k])) for k in bad[:4]]}")
    a = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    return {
        "v_cls": a("visual.class_embedding"),
        "v_pos": a("visual.positional_embedding"),
        # conv patch-embed as a matmul: OIHW -> [patch*patch*3, width]
        "v_patch": a("visual.conv1.weight").transpose(2, 3, 1, 0).reshape(
            -1, geom.vision_width),
        "v_ln_pre": (a("visual.ln_pre.weight"), a("visual.ln_pre.bias")),
        "v_blocks": [_block_params(sd, f"visual.transformer.resblocks.{i}")
                     for i in range(geom.vision_layers)],
        "v_ln_post": (a("visual.ln_post.weight"), a("visual.ln_post.bias")),
        "v_proj": a("visual.proj"),
        "t_tok": a("token_embedding.weight"),
        "t_pos": a("positional_embedding"),
        "t_blocks": [_block_params(sd, f"transformer.resblocks.{i}")
                     for i in range(geom.text_layers)],
        "t_ln": (a("ln_final.weight"), a("ln_final.bias")),
        "t_proj": a("text_projection"),
        "logit_scale": float(np.asarray(sd["logit_scale"])),
    }


def hf_to_openai(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """transformers-CLIPModel state dict -> OpenAI/OpenCLIP naming (the
    census format above).  Lets the pinned extractor consume local HF CLIP
    dirs, the loading style the reference's eval flow assumes."""
    a = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    out: Dict[str, np.ndarray] = {
        "visual.class_embedding": a("vision_model.embeddings.class_embedding"),
        "visual.positional_embedding":
            a("vision_model.embeddings.position_embedding.weight"),
        "visual.conv1.weight":
            a("vision_model.embeddings.patch_embedding.weight"),
        "visual.ln_pre.weight": a("vision_model.pre_layrnorm.weight"),
        "visual.ln_pre.bias": a("vision_model.pre_layrnorm.bias"),
        "visual.ln_post.weight": a("vision_model.post_layernorm.weight"),
        "visual.ln_post.bias": a("vision_model.post_layernorm.bias"),
        "visual.proj": a("visual_projection.weight").T,
        "token_embedding.weight": a("text_model.embeddings.token_embedding.weight"),
        "positional_embedding":
            a("text_model.embeddings.position_embedding.weight"),
        "ln_final.weight": a("text_model.final_layer_norm.weight"),
        "ln_final.bias": a("text_model.final_layer_norm.bias"),
        "text_projection": a("text_projection.weight").T,
        "logit_scale": a("logit_scale"),
    }

    def blocks(src, dst):
        i = 0
        while f"{src}.{i}.self_attn.q_proj.weight" in sd:
            p, q = f"{src}.{i}", f"{dst}.{i}"
            out[f"{q}.attn.in_proj_weight"] = np.concatenate(
                [a(f"{p}.self_attn.{x}_proj.weight") for x in "qkv"], axis=0)
            out[f"{q}.attn.in_proj_bias"] = np.concatenate(
                [a(f"{p}.self_attn.{x}_proj.bias") for x in "qkv"], axis=0)
            out[f"{q}.attn.out_proj.weight"] = a(f"{p}.self_attn.out_proj.weight")
            out[f"{q}.attn.out_proj.bias"] = a(f"{p}.self_attn.out_proj.bias")
            out[f"{q}.ln_1.weight"] = a(f"{p}.layer_norm1.weight")
            out[f"{q}.ln_1.bias"] = a(f"{p}.layer_norm1.bias")
            out[f"{q}.ln_2.weight"] = a(f"{p}.layer_norm2.weight")
            out[f"{q}.ln_2.bias"] = a(f"{p}.layer_norm2.bias")
            out[f"{q}.mlp.c_fc.weight"] = a(f"{p}.mlp.fc1.weight")
            out[f"{q}.mlp.c_fc.bias"] = a(f"{p}.mlp.fc1.bias")
            out[f"{q}.mlp.c_proj.weight"] = a(f"{p}.mlp.fc2.weight")
            out[f"{q}.mlp.c_proj.bias"] = a(f"{p}.mlp.fc2.bias")
            i += 1

    blocks("vision_model.encoder.layers", "visual.transformer.resblocks")
    blocks("text_model.encoder.layers", "transformer.resblocks")
    return out


def init_random_params(geom: CLIPGeom = VIT_B32, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for k, s in expected_state_dict_shapes(geom).items():
        scale = 0.02 if len(s) != 1 else 1.0
        sd[k] = (rng.normal(scale=scale, size=s).astype(np.float32)
                 if ("bias" not in k and not k.endswith(".bias"))
                 else np.zeros(s, np.float32))
        if k.endswith("ln_1.weight") or k.endswith("ln_2.weight") or \
                k.endswith(("ln_pre.weight", "ln_post.weight",
                            "ln_final.weight")):
            sd[k] = np.ones(s, np.float32)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07))
    return params_from_openai(sd, geom)


def _ln(x, wb, eps=1e-5):
    import jax.numpy as jnp

    w, b = wb
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _gelu(x, quick: bool):
    import jax

    return x * jax.nn.sigmoid(1.702 * x) if quick else jax.nn.gelu(
        x, approximate=False)


def _attn(x, blk, heads: int, mask=None):
    import jax
    import jax.numpy as jnp

    N, T, W = x.shape
    hd = W // heads
    qkv = x @ jnp.asarray(blk["qkv_w"]) + blk["qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
    att = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)
    if mask is not None:
        att = att + mask
    att = jax.nn.softmax(att, axis=-1)
    y = (att @ v).transpose(0, 2, 1, 3).reshape(N, T, W)
    return y @ jnp.asarray(blk["out_w"]) + blk["out_b"]


def _tower(x, blocks, heads: int, quick: bool, mask=None):
    import jax.numpy as jnp

    for blk in blocks:
        x = x + _attn(_ln(x, blk["ln_1"]), blk, heads, mask)
        h = _ln(x, blk["ln_2"]) @ jnp.asarray(blk["fc_w"]) + blk["fc_b"]
        x = x + (_gelu(h, quick) @ jnp.asarray(blk["proj_w"]) + blk["proj_b"])
    return x


def encode_image(params: dict, images, geom: CLIPGeom = VIT_B32):
    """[N, 224, 224, 3] float RGB in [0, 1] -> [N, embed_dim] (unnormalized;
    preprocessing = CLIP mean/std here, resize/crop is the caller's —
    ``preprocess_images`` below matches the reference pipeline)."""
    import jax.numpy as jnp

    g = geom
    x = (jnp.asarray(images, jnp.float32) - CLIP_MEAN) / CLIP_STD
    N = x.shape[0]
    # patchify: [N, gh, p, gw, p, 3] -> [N, gh*gw, p*p*3] matching OIHW conv
    x = x.reshape(N, g.grid, g.patch, g.grid, g.patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, g.grid * g.grid, -1)
    x = x @ jnp.asarray(params["v_patch"])
    cls = jnp.broadcast_to(params["v_cls"][None, None], (N, 1, g.vision_width))
    x = jnp.concatenate([cls, x], axis=1) + params["v_pos"][None]
    x = _ln(x, params["v_ln_pre"])
    x = _tower(x, params["v_blocks"], g.vision_heads, g.quick_gelu)
    x = _ln(x[:, 0], params["v_ln_post"])
    return x @ jnp.asarray(params["v_proj"])


def encode_text(params: dict, tokens, geom: CLIPGeom = VIT_B32):
    """[N, 77] int32 CLIP-BPE ids -> [N, embed_dim] (unnormalized).  Feature
    row = the EOT position (argmax of ids, OpenAI convention)."""
    import jax.numpy as jnp

    g = geom
    toks = jnp.asarray(tokens, jnp.int32)
    x = jnp.asarray(params["t_tok"])[toks] + params["t_pos"][None]
    mask = jnp.where(jnp.tril(jnp.ones((g.ctx, g.ctx), bool)), 0.0, -jnp.inf)
    x = _tower(x, params["t_blocks"], g.text_heads, g.quick_gelu, mask)
    x = _ln(x, params["t_ln"])
    eot = jnp.argmax(toks, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ jnp.asarray(params["t_proj"])


def cosine_scores(img_feats, txt_feats):
    """Row-wise cosine similarity (the reference's CLIP-score similarity,
    eval_fid_clip.py:158-160, and hpsv2's diagonal score)."""
    import jax.numpy as jnp

    a = img_feats / jnp.linalg.norm(img_feats, axis=-1, keepdims=True)
    b = txt_feats / jnp.linalg.norm(txt_feats, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


def preprocess_images(images: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8/float [N, H, W, 3] -> [N, size, size, 3] float in [0, 1] via
    bicubic shorter-side resize + center crop (the OpenAI ``clip``
    preprocessor the reference applies, eval_fid_clip.py:140-141)."""
    from PIL import Image

    out = np.empty((len(images), size, size, 3), np.float32)
    for i, im in enumerate(np.asarray(images)):
        if im.dtype != np.uint8:
            im = np.clip(im * 255.0 if im.max() <= 1.0 else im,
                         0, 255).astype(np.uint8)
        pil = Image.fromarray(im)
        w, h = pil.size
        s = size / min(w, h)
        pil = pil.resize((max(size, int(round(w * s))),
                          max(size, int(round(h * s)))), Image.BICUBIC)
        w, h = pil.size
        left, top = (w - size) // 2, (h - size) // 2
        pil = pil.crop((left, top, left + size, top + size))
        out[i] = np.asarray(pil, np.float32) / 255.0
    return out


def load_any(weights: str | None, geom: CLIPGeom = VIT_B32) -> dict:
    """Load pinned-census params from any common on-disk form: an
    OpenAI/OpenCLIP torch ``.pt`` (incl. the HPS_v2.1 release format), a
    same-key ``.npz``, a transformers CLIPModel directory, or None for
    random weights with the pinned census (tests / structural runs)."""
    if weights is None:
        return init_random_params(geom)
    if os.path.isdir(weights):
        sd = {}
        st = [f for f in os.listdir(weights) if f.endswith(".safetensors")]
        if st:
            from safetensors.numpy import load_file

            for f in st:
                sd.update(load_file(os.path.join(weights, f)))
        else:
            import torch

            sd = torch.load(os.path.join(weights, "pytorch_model.bin"),
                            map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in sd.items()}
        if any(k.startswith("vision_model.") for k in sd):
            sd = hf_to_openai(sd)
        return params_from_openai(sd, geom)
    if weights.endswith(".npz"):
        with np.load(weights) as z:
            sd = {k: z[k] for k in z.files}
        if any(k.startswith("vision_model.") for k in sd):
            sd = hf_to_openai(sd)
        return params_from_openai(sd, geom)
    import torch

    sd = torch.load(weights, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in _unwrap(sd).items()}
    if any(k.startswith("vision_model.") for k in sd):
        sd = hf_to_openai(sd)
    return params_from_openai(sd, geom)


class CLIPExtractor:
    """features.py-compatible extractor over the pinned JAX CLIP.

    ``weights``: any ``load_any`` form; None = random weights with the
    pinned census (tests / structural runs).
    ``tokenizer``: a callable texts -> [N, 77] int ids (evals.clip_bpe).
    """

    def __init__(self, weights: str | None = None,
                 geom: CLIPGeom = VIT_B32, tokenizer=None, batch: int = 32):
        import jax

        self.params = load_any(weights, geom)
        self.geom = geom
        self.tokenizer = tokenizer
        self.batch = batch
        self._img = jax.jit(lambda p, x: encode_image(p, x, geom))
        self._txt = jax.jit(lambda p, t: encode_text(p, t, geom))

    def image_features(self, images: np.ndarray,
                       batch: int | None = None) -> np.ndarray:
        b = batch or self.batch
        x = preprocess_images(images, self.geom.image_size)
        outs = [np.asarray(self._img(self.params, x[i:i + b]))
                for i in range(0, len(x), b)]
        return np.concatenate(outs) if outs else np.zeros(
            (0, self.geom.embed_dim), np.float32)

    def text_features(self, texts, batch: int | None = None) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("text scoring needs a tokenizer "
                             "(evals.clip_bpe.ClipTokenizer)")
        b = batch or self.batch
        toks = np.asarray(self.tokenizer(list(texts)), np.int32)
        outs = [np.asarray(self._txt(self.params, toks[i:i + b]))
                for i in range(0, len(toks), b)]
        return np.concatenate(outs) if outs else np.zeros(
            (0, self.geom.embed_dim), np.float32)
