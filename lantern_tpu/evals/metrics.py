"""Pure-math image-quality metrics over feature sets.

Framework-agnostic numpy implementations of the three metric families the
reference evaluates generated images with (reference entrypoints:
eval_fid_clip.py:120-229, eval_prec_recall.py:95-270, eval_hpsv2.py:17-58):

- **Frechet distance (FID)** between the Gaussian fits of two feature sets.
- **Improved precision / recall**: k-NN-radius manifold estimation
  (Kynkäänniemi et al. 2019) plus the per-sample *realism* score.
- **CLIP-style score**: mean cosine similarity between paired image/text
  embeddings.

Feature *extraction* (Inception/VGG/CLIP networks) is deliberately decoupled
— see ``features.py`` — so the math is testable with synthetic features and
works with any embedding source, including precomputed ``.npz`` files.
All pairwise-distance work is blocked to bound memory at ``block**2`` floats.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class Manifold(NamedTuple):
    """A feature set plus each feature's k-NN radius (manifold estimate)."""

    features: np.ndarray  # [N, D] float
    radii: np.ndarray  # [N] float


# ---------------------------------------------------------------------------
# Frechet distance
# ---------------------------------------------------------------------------


def gaussian_stats(features: np.ndarray):
    """Mean and covariance of a feature set (rows = samples)."""
    feats = np.asarray(features, dtype=np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FD(N(mu1,S1), N(mu2,S2)) = |mu1-mu2|^2 + Tr(S1 + S2 - 2 (S1 S2)^1/2).

    The matrix square root is taken via scipy's ``sqrtm``; if the product is
    near-singular, a small diagonal offset is added (the standard FID
    stabilisation).
    """
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1, dtype=np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, dtype=np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, dtype=np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, dtype=np.float64))

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    mu1, s1 = gaussian_stats(feats_a)
    mu2, s2 = gaussian_stats(feats_b)
    return frechet_distance(mu1, s1, mu2, s2)


# ---------------------------------------------------------------------------
# Improved precision / recall (k-NN manifolds)
# ---------------------------------------------------------------------------


def pairwise_distances(
    x: np.ndarray, y: Optional[np.ndarray] = None, block: int = 2048
) -> np.ndarray:
    """Euclidean distance matrix [len(x), len(y)], blocked over rows."""
    x = np.asarray(x, dtype=np.float64)
    y = x if y is None else np.asarray(y, dtype=np.float64)
    y_sq = (y * y).sum(axis=1)
    out = np.empty((x.shape[0], y.shape[0]), dtype=np.float64)
    for i in range(0, x.shape[0], block):
        xb = x[i : i + block]
        d2 = (xb * xb).sum(axis=1)[:, None] + y_sq[None, :] - 2.0 * xb @ y.T
        out[i : i + block] = np.sqrt(np.maximum(d2, 0.0))
    return out


def knn_radii(features: np.ndarray, k: int = 3, block: int = 2048) -> np.ndarray:
    """Distance to each sample's k-th nearest *other* sample.

    Matches the reference's ``distances2radii`` (eval_prec_recall.py:132-144):
    the self-distance 0 occupies one slot, so the k-th neighbour is the
    (k+1)-th order statistic of the full row.
    """
    feats = np.asarray(features, dtype=np.float64)
    n = feats.shape[0]
    if k >= n:
        raise ValueError(f"k={k} must be < number of samples {n}")
    radii = np.empty(n, dtype=np.float64)
    for i in range(0, n, block):
        d = pairwise_distances(feats[i : i + block], feats, block=block)
        radii[i : i + block] = np.partition(d, k, axis=1)[:, k]
    return radii


def manifold(features: np.ndarray, k: int = 3) -> Manifold:
    feats = np.asarray(features, dtype=np.float64)
    return Manifold(feats, knn_radii(feats, k=k))


def manifold_coverage(ref: Manifold, feats_subject: np.ndarray,
                      block: int = 2048) -> float:
    """Fraction of subject features inside >=1 reference k-NN ball.

    ``precision = coverage(manifold(real), fake)``;
    ``recall   = coverage(manifold(fake), real)``
    (reference eval_prec_recall.py:146-160).
    """
    feats = np.asarray(feats_subject, dtype=np.float64)
    hits = 0
    for i in range(0, feats.shape[0], block):
        d = pairwise_distances(ref.features, feats[i : i + block], block=block)
        hits += int((d < ref.radii[:, None]).any(axis=0).sum())
    return hits / max(1, feats.shape[0])


class PrecisionRecall(NamedTuple):
    precision: float
    recall: float


def precision_recall(
    ref_features: np.ndarray, fake_features: np.ndarray, k: int = 3
) -> PrecisionRecall:
    ref_m = manifold(ref_features, k=k)
    fake_m = manifold(fake_features, k=k)
    return PrecisionRecall(
        precision=manifold_coverage(ref_m, fake_m.features),
        recall=manifold_coverage(fake_m, ref_m.features),
    )


def realism(ref: Manifold, feat: np.ndarray) -> float:
    """Max over reference samples of radius / distance (clipped at median
    radius to ignore sparse-outlier balls) — eval_prec_recall.py:261-270."""
    feat = np.asarray(feat, dtype=np.float64).reshape(1, -1)
    dists = pairwise_distances(ref.features, feat)[:, 0]
    mask = ref.radii < np.median(ref.radii)
    if not mask.any():
        # degenerate manifold (e.g. duplicate refs -> majority-zero radii):
        # fall back to all reference balls rather than crashing on an
        # empty reduction
        mask = np.ones_like(mask)
    ratios = ref.radii[mask] / np.maximum(dists[mask], 1e-12)
    return float(ratios.max())


# ---------------------------------------------------------------------------
# CLIP-style scores
# ---------------------------------------------------------------------------


def clip_score_from_embeddings(
    image_embs: np.ndarray, text_embs: np.ndarray
) -> float:
    """Mean cosine similarity of paired (image, text) embedding rows."""
    a = np.asarray(image_embs, dtype=np.float64)
    b = np.asarray(text_embs, dtype=np.float64)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return float((a * b).sum(axis=1).mean())


def hps_from_embeddings(image_embs: np.ndarray, text_embs: np.ndarray,
                        logit_scale: float = 100.0) -> np.ndarray:
    """HPSv2-style per-pair preference scores: scaled cosine similarity.

    HPSv2 is a CLIP-H model finetuned on human preferences; its ``score`` is
    ``logit_scale * cos(img, txt)`` per pair (reference eval_hpsv2.py:17-58
    via the hpsv2 package). Given embeddings from any such checkpoint this
    reproduces the scoring step.
    """
    a = np.asarray(image_embs, dtype=np.float64)
    b = np.asarray(text_embs, dtype=np.float64)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return logit_scale * (a * b).sum(axis=1)
