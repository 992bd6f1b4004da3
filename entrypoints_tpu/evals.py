"""Dispatcher for the offline image-quality eval tasks.

FID / CLIP-score / precision-recall / HPSv2 (reference:
entrypoints/eval_fid_clip.py, eval_prec_recall.py, eval_hpsv2.py).
The metric math is first-party (lantern_tpu.evals.metrics) and runs
anywhere; feature extraction networks are pluggable — precomputed .npz,
a local HF CLIP checkpoint, or torchvision nets on an eval host.
"""

from __future__ import annotations


def run(task: str, extra_args):
    if task == "eval_fid_clip":
        from entrypoints_tpu.eval_fid_clip import main as m
    elif task == "eval_prec_recall":
        from entrypoints_tpu.eval_prec_recall import main as m
    elif task == "eval_hpsv2":
        from entrypoints_tpu.eval_hpsv2 import main as m
    else:
        raise SystemExit(f"unknown eval task {task}")
    return m(extra_args)
