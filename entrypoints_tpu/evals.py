"""Offline image-quality evaluation tasks (FID/CLIP, precision/recall, HPSv2).

These are offline torch-CPU metrics over generated image directories
(reference: entrypoints/eval_fid_clip.py, eval_prec_recall.py,
eval_hpsv2.py).  They need eval-only dependencies (clean-fid, clip,
hpsv2) that are not part of the TPU runtime image; each runs when its
dependency is importable and explains what to install otherwise.
"""

from __future__ import annotations

DEPS = {
    "eval_fid_clip": ["cleanfid", "clip"],
    "eval_prec_recall": ["torchvision"],
    "eval_hpsv2": ["hpsv2"],
}


def run(task: str, extra_args):
    missing = []
    for dep in DEPS.get(task, []):
        try:
            __import__(dep)
        except ImportError:
            missing.append(dep)
    if missing:
        print(
            f"{task}: missing eval dependencies {missing}. These offline "
            f"metrics run on a CPU eval host with `pip install {' '.join(missing)}`; "
            f"they are not part of the TPU decode path."
        )
        return 1
    if task == "eval_prec_recall":
        from entrypoints_tpu.eval_prec_recall import main as m

        return m(extra_args)
    raise NotImplementedError(task)
