"""eval_hpsv2 task: HPSv2-style human-preference score for generated images.

Reference: entrypoints/eval_hpsv2.py — walks an image dir, matches each
``prompt_<idx>.png`` / ``image_<idx>.png`` / ``<idx>.png`` to its prompt row,
and averages ``hpsv2.score(img, prompt, v2.1)``. HPSv2 is a CLIP-H model
finetuned on human preference; its score is logit_scale * cos(img, txt).
This implementation scores with any local HF CLIP-style checkpoint (pass the
converted HPSv2 weights for exact parity, or any CLIP for a proxy score);
falls back to the ``hpsv2`` package when installed.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re

import numpy as np

from lantern_tpu.evals import features as F
from lantern_tpu.evals import metrics as M


def build_parser():
    p = argparse.ArgumentParser("eval_hpsv2")
    p.add_argument("--image_path", required=True)
    p.add_argument("--prompt_path", required=True, help=".tsv/.csv/.json prompts")
    p.add_argument("--clip-model-dir", default=None,
                   help="(legacy hf_clip backbone) local HF checkpoint of "
                        "HPSv2 (or any CLIP) weights")
    p.add_argument("--model", default=None,
                   help="pinned backbone weights: the HPS_v2.1 .pt release "
                        "(or same-key .npz / HF dir) — OpenCLIP ViT-H/14 "
                        "census, evals/clip.py VIT_H14")
    p.add_argument("--merges", default=None,
                   help="CLIP BPE merges file (bpe_simple_vocab_16e6.txt.gz) "
                        "for the pinned backbone's tokenizer")
    p.add_argument("--backbone", default="pinned",
                   choices=["pinned", "hf_clip"],
                   help="pinned = first-party JAX ViT-H/14 with the HPSv2.1 "
                        "census (default); hf_clip = any local HF CLIP dir "
                        "(proxy score, not comparable to published HPS)")
    p.add_argument("--use-hpsv2-package", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--device", default="cpu")
    return p


def load_prompts(path):
    if path.endswith(".tsv"):
        with open(path) as f:
            return [r["Prompt"] for r in csv.DictReader(f, delimiter="\t")]
    if path.endswith(".csv"):
        with open(path) as f:
            return [r["Prompt"] for r in csv.DictReader(f)]
    if path.endswith(".json"):
        with open(path) as f:
            caps = json.load(f)
        return [c[0] if isinstance(c, list) else c for c in caps]
    raise ValueError("Prompt file should be .tsv, .csv or .json")


def match_index(fname: str):
    # reference filename conventions (eval_hpsv2.py:44-52)
    m = re.search(r"(?:prompt|image)_(\d{1,4})\.(?:png|jpe?g)", fname)
    if m:
        return int(m.group(1))
    m = re.search(r"(\d{1,6})\.(?:png|jpe?g)", fname)
    return int(m.group(1)) if m else None


def main(argv=None):
    args = build_parser().parse_args(argv)
    prompts = load_prompts(args.prompt_path)
    paths = F.list_images(args.image_path)
    pairs = [(p, prompts[i]) for p in paths
             if (i := match_index(os.path.basename(p))) is not None
             and i < len(prompts)]
    if not pairs:
        raise SystemExit(f"no scoreable images under {args.image_path}")

    if args.use_hpsv2_package:
        import hpsv2
        from PIL import Image

        scores = [float(np.asarray(
            hpsv2.score(Image.open(p), t, hps_version="v2.1")).reshape(-1)[0])
            for p, t in pairs]
    elif args.backbone == "pinned":
        # the reference scores with HPSv2.1 specifically (eval_hpsv2.py:
        # 17-58): an OpenCLIP ViT-H/14 fine-tune.  The pinned first-party
        # JAX backbone (evals/clip.py VIT_H14) carries that exact census;
        # supply the HPS_v2.1 .pt for numbers comparable to published HPS.
        from lantern_tpu.evals.clip import VIT_H14, CLIPExtractor
        from lantern_tpu.evals.clip_bpe import ClipTokenizer

        if not args.model or not args.merges:
            raise SystemExit(
                "eval_hpsv2 --backbone pinned needs --model (the HPS_v2.1 "
                ".pt / .npz, OpenCLIP ViT-H/14 census) and --merges (the "
                "CLIP BPE merges file); or use --backbone hf_clip / "
                "--use-hpsv2-package")
        tok = ClipTokenizer(args.merges)
        ex = CLIPExtractor(weights=args.model, geom=VIT_H14, tokenizer=tok,
                           batch=args.batch_size)
        embs = []
        for i in range(0, len(pairs), args.batch_size):
            chunk = F.load_images([p for p, _ in pairs[i:i + args.batch_size]])
            embs.append(ex.image_features(chunk))
        img_embs = np.concatenate(embs, axis=0)
        txt_embs = ex.text_features([t for _, t in pairs])
        scores = M.hps_from_embeddings(img_embs, txt_embs).tolist()
    else:
        if not args.clip_model_dir:
            raise SystemExit(
                "eval_hpsv2 --backbone hf_clip needs --clip-model-dir "
                "(local HPSv2/CLIP HF checkpoint)")
        ex = F.HFClipExtractor(args.clip_model_dir, device=args.device,
                               prepend="")
        # load per batch: decoding tens of thousands of images up front
        # would hold an N x 224 x 224 x 3 array in RAM for nothing
        embs = []
        for i in range(0, len(pairs), args.batch_size):
            chunk = F.load_images([p for p, _ in pairs[i:i + args.batch_size]],
                                  resize=224)
            embs.append(ex.image_features(chunk, batch=args.batch_size))
        img_embs = np.concatenate(embs, axis=0)
        txt_embs = ex.text_features([t for _, t in pairs],
                                    batch=args.batch_size)
        scores = M.hps_from_embeddings(img_embs, txt_embs).tolist()

    print("Image Path:", args.image_path)
    print(float(np.mean(scores)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
