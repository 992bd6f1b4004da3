"""Image loading and pluggable feature extraction for offline metrics.

The reference extracts features with torchvision VGG16 / cleanfid InceptionV3
/ OpenAI CLIP (eval_prec_recall.py:52, eval_fid_clip.py:169-196). Those
networks need downloaded weights; this environment is zero-egress, so
extraction is pluggable:

- ``npz``   : precomputed features (``features`` array, optional ``radii``) —
              mirrors the reference's ``fname_precalc`` flow.
- ``hf``    : any local HuggingFace CLIP-style checkpoint directory
              (``CLIPModel``); used for CLIP score, HPSv2-style scoring, and
              as an FID feature extractor (cleanfid's ``clip_vit_b_32`` mode).
- ``torch`` : torchvision VGG16/InceptionV3 when torchvision is installed
              (reference-faithful path on an eval host).

Image preprocessing matches the reference: center-crop to the long edge,
Lanczos resize (eval_fid_clip.py:41-80).
"""

from __future__ import annotations

import glob
import os
import re
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def natural_sort(paths: Sequence[str]) -> List[str]:
    def key(p):
        return [int(c) if c.isdigit() else c.lower() for c in re.split(r"([0-9]+)", p)]

    return sorted(paths, key=key)


def list_images(path: str, exts=("png", "jpg", "jpeg")) -> List[str]:
    if os.path.isfile(path):
        return [path]
    files: List[str] = []
    for e in exts:
        files += glob.glob(os.path.join(path, f"*.{e}"))
        files += glob.glob(os.path.join(path, "**", f"*.{e}"), recursive=True)
    return natural_sort(sorted(set(files)))


def load_image(path: str, resize: Optional[int] = None) -> np.ndarray:
    """PIL load -> center-crop long edge -> lanczos resize -> uint8 HWC."""
    img = Image.open(path).convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w - s) // 2 + s, (h - s) // 2 + s))
    if resize is not None:
        img = img.resize((resize, resize), Image.LANCZOS)
    return np.asarray(img, dtype=np.uint8)


def load_images(paths: Sequence[str], resize: Optional[int] = None) -> np.ndarray:
    return np.stack([load_image(p, resize) for p in paths])


# ---------------------------------------------------------------------------
# Extractors
# ---------------------------------------------------------------------------


class HFClipExtractor:
    """Feature/similarity extractor over a *local* HF CLIP checkpoint."""

    def __init__(self, model_dir: str, device: str = "cpu",
                 prepend: str = "A photo depicts "):
        import torch
        from transformers import CLIPModel, CLIPProcessor

        self.torch = torch
        self.model = CLIPModel.from_pretrained(model_dir).eval().to(device)
        self.processor = CLIPProcessor.from_pretrained(model_dir)
        self.device = device
        self.prepend = prepend

    def image_features(self, images: np.ndarray, batch: int = 64) -> np.ndarray:
        outs = []
        with self.torch.no_grad():
            for i in range(0, len(images), batch):
                inp = self.processor(images=list(images[i : i + batch]),
                                     return_tensors="pt").to(self.device)
                outs.append(self.model.get_image_features(**inp).cpu().numpy())
        return np.concatenate(outs)

    def text_features(self, texts: Sequence[str], batch: int = 64) -> np.ndarray:
        # "A photo depicts " prepend per the reference (eval_fid_clip.py:144-146,
        # following https://arxiv.org/abs/2104.08718)
        texts = [self.prepend + t for t in texts]
        outs = []
        with self.torch.no_grad():
            for i in range(0, len(texts), batch):
                inp = self.processor(text=list(texts[i : i + batch]),
                                     return_tensors="pt", padding=True,
                                     truncation=True).to(self.device)
                outs.append(self.model.get_text_features(**inp).cpu().numpy())
        return np.concatenate(outs)


class TorchvisionExtractor:
    """VGG16-fc2 (precision/recall) or InceptionV3-pool (FID) features."""

    def __init__(self, arch: str = "vgg16", device: str = "cpu"):
        import torch
        import torchvision.models as tvm

        self.torch = torch
        self.device = device
        if arch == "vgg16":
            vgg = tvm.vgg16(weights="IMAGENET1K_V1").eval().to(device)
            # fc2 features, as the reference's IPR (eval_prec_recall.py:52-63
            # uses classifier[:4] = fc1 -> ReLU -> Dropout -> fc2, NO
            # trailing ReLU — keeping it would zero negative fc2 components
            # and change every distance/radius)
            self.net = torch.nn.Sequential(
                vgg.features, vgg.avgpool, torch.nn.Flatten(),
                *list(vgg.classifier.children())[:4],
            )
            self.size = 224
        elif arch == "inception":
            net = tvm.inception_v3(weights="IMAGENET1K_V1", aux_logits=True)
            net.fc = torch.nn.Identity()
            self.net = net.eval().to(device)
            self.size = 299
        else:
            raise ValueError(arch)

    def image_features(self, images: np.ndarray, batch: int = 32) -> np.ndarray:
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        outs = []
        with self.torch.no_grad():
            for i in range(0, len(images), batch):
                x = images[i : i + batch].astype(np.float32) / 255.0
                x = (x - mean) / std
                t = self.torch.from_numpy(x.transpose(0, 3, 1, 2)).to(self.device)
                t = self.torch.nn.functional.interpolate(
                    t, size=(self.size, self.size), mode="bilinear",
                    align_corners=False)
                outs.append(self.net(t).cpu().numpy())
        return np.concatenate(outs)


def load_npz_features(path: str):
    z = np.load(path)
    feats = z["features"] if "features" in z.files else z[z.files[0]]
    radii = z["radii"] if "radii" in z.files else None
    return feats, radii


def extract_dir_features(
    image_dir: str,
    extractor,
    resize: Optional[int] = None,
    how_many: Optional[int] = None,
    batch: int = 64,
) -> np.ndarray:
    """Features for every image in a directory (or a precomputed .npz)."""
    if image_dir.endswith(".npz"):
        feats = load_npz_features(image_dir)[0]
        return feats[:how_many] if how_many is not None else feats
    paths = list_images(image_dir)
    if how_many is not None:
        paths = paths[:how_many]
    if not paths:
        raise FileNotFoundError(f"no images under {image_dir}")
    feats = []
    for i in range(0, len(paths), batch):
        imgs = load_images(paths[i : i + batch], resize=resize)
        feats.append(extractor.image_features(imgs))
    return np.concatenate(feats)


def make_extractor(kind: str, model_dir: Optional[str] = None,
                   device: str = "cpu"):
    if kind == "hf_clip":
        if not model_dir:
            raise ValueError("hf_clip extractor needs --clip-model-dir")
        return HFClipExtractor(model_dir, device=device)
    if kind == "fid_inception":
        # the pinned FID backbone: first-party JAX port of the clean-fid /
        # pytorch-fid Inception-V3 pool3 network (evals/inception.py);
        # model_dir = path to the canonical pt_inception-2015-12-05 .pth
        from .inception import InceptionExtractor

        return InceptionExtractor(weights=model_dir)
    if kind == "vgg16_jax":
        # the pinned precision/recall backbone: torchvision-vgg16 fc2
        # features (evals/vgg.py); model_dir = path to the canonical .pth
        from .vgg import VGGExtractor

        return VGGExtractor(weights=model_dir)
    if kind == "clip_b32":
        # the pinned CLIP-score / clip-FID backbone: first-party JAX
        # OpenAI-CLIP ViT-B/32 (evals/clip.py); model_dir = OpenAI .pt /
        # .npz / HF CLIPModel dir
        from .clip import VIT_B32, CLIPExtractor

        return CLIPExtractor(weights=model_dir, geom=VIT_B32)
    if kind == "hps_v21":
        # the pinned HPSv2.1 backbone: OpenCLIP ViT-H/14 census
        # (evals/clip.py); model_dir = the HPS_v2.1 .pt (or .npz)
        from .clip import VIT_H14, CLIPExtractor

        return CLIPExtractor(weights=model_dir, geom=VIT_H14)
    if kind in ("vgg16", "inception"):
        return TorchvisionExtractor(kind, device=device)
    raise ValueError(f"unknown extractor {kind}")
