"""eval_prec_recall task: improved precision & recall via k-NN manifolds.

Reference: entrypoints/eval_prec_recall.py (Kynkäänniemi et al. harness,
VGG16-fc2 features). Same surface: ``--ref_dir --fake_dir --k
--num_samples --fname_precalc``; precomputed-manifold save/load is the
``.npz`` flow. Metric math in lantern_tpu.evals.metrics; features pluggable
(torchvision VGG16 on an eval host, local HF CLIP, or precomputed .npz).
"""

from __future__ import annotations

import argparse

import numpy as np

from lantern_tpu.evals import features as F
from lantern_tpu.evals import metrics as M


def build_parser():
    p = argparse.ArgumentParser("eval_prec_recall")
    p.add_argument("--ref_dir", required=True,
                   help="real images dir, or manifold/features .npz")
    p.add_argument("--fake_dir", default=None,
                   help="generated images dir or features .npz "
                        "(omit with --fname_precalc to only save the manifold)")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--num_samples", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--fname_precalc", default="",
                   help="save the reference manifold to this .npz and exit")
    p.add_argument("--feature-extractor", default="vgg16",
                   choices=["vgg16", "vgg16_jax", "hf_clip"],
                   help="vgg16_jax = the pinned backbone (first-party JAX "
                        "port of torchvision vgg16 fc2, evals/vgg.py); pass "
                        "the canonical vgg16 .pth via --vgg-ckpt")
    p.add_argument("--clip-model-dir", default=None)
    p.add_argument("--vgg-ckpt", default=None,
                   help="torchvision vgg16 .pth for --feature-extractor "
                        "vgg16_jax")
    p.add_argument("--eval_res", type=int, default=224)
    p.add_argument("--device", default="cpu")
    return p


def _manifold_from(path, args, extractor):
    if path.endswith(".npz"):
        feats, radii = F.load_npz_features(path)
        feats = feats[: args.num_samples]
        if radii is not None and len(radii) >= len(feats):
            return M.Manifold(np.asarray(feats, np.float64),
                              np.asarray(radii[: len(feats)], np.float64))
        return M.manifold(feats, k=args.k)
    feats = F.extract_dir_features(path, extractor, resize=args.eval_res,
                                   how_many=args.num_samples,
                                   batch=args.batch_size)
    return M.manifold(feats, k=args.k)


def main(argv=None):
    args = build_parser().parse_args(argv)
    extractor = None
    needs_net = not args.ref_dir.endswith(".npz") or (
        args.fake_dir is not None and not args.fake_dir.endswith(".npz"))
    if needs_net:
        if args.feature_extractor == "vgg16_jax" and args.vgg_ckpt is None:
            raise SystemExit("vgg16_jax needs --vgg-ckpt (the canonical "
                             "torchvision vgg16 .pth; random weights are "
                             "test-only)")
        extractor = F.make_extractor(
            args.feature_extractor,
            model_dir=(args.vgg_ckpt
                       if args.feature_extractor == "vgg16_jax"
                       else args.clip_model_dir),
            device=args.device)

    ref_m = _manifold_from(args.ref_dir, args, extractor)
    if args.fname_precalc:
        np.savez_compressed(args.fname_precalc, features=ref_m.features,
                            radii=ref_m.radii)
        print(f"manifold saved to {args.fname_precalc}")
        return 0

    if not args.fake_dir:
        raise SystemExit("--fake_dir required (or use --fname_precalc)")
    fake_m = _manifold_from(args.fake_dir, args, extractor)
    precision = M.manifold_coverage(ref_m, fake_m.features)
    recall = M.manifold_coverage(fake_m, ref_m.features)
    print(f"precision: {precision}")
    print(f"recall: {recall}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
