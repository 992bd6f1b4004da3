"""generate_codebook task: VQ-codebook nearest-latent distance tables.

Reference: entrypoints/generate_codebook.py — loads the model family's VQ
codebook, computes all-pairs L2 top-(V-1) neighbor indices, saves uint16
``top_{V-1}_indices.npy`` under the save path.
"""

from __future__ import annotations

import os


def add_args(p):
    p.add_argument("--model", default="llamagen",
                   choices=["llamagen", "anole", "lumina_mgpt", "random"])
    p.add_argument("--vq-path", default=None, help="VQ checkpoint (.pt)")
    p.add_argument("--save-path", default="vq_distances")
    p.add_argument("--codebook-size", type=int, default=16384)
    p.add_argument("--codebook-dim", type=int, default=8)
    p.add_argument("--k", type=int, default=None,
                   help="neighbors to keep (default V-1)")
    p.add_argument("--l2-normalize", action="store_true",
                   help="measure distances in the l2-normalized codebook "
                        "space.  The reference uses the RAW embedding matrix "
                        "for every family (generate_codebook.py:54-56) even "
                        "though LlamaGen's runtime VQ quantizes normalized "
                        "codes — default stays reference-faithful; this "
                        "flag matches the runtime metric instead")


def run(args):
    import jax
    import numpy as np

    from lantern_tpu.ops.vq_distance import nearest_latents, save_table

    if args.model == "random" or args.vq_path is None:
        rng = np.random.default_rng(0)
        codebook = rng.normal(size=(args.codebook_size, args.codebook_dim)).astype(np.float32)
    else:
        from lantern_tpu.utils.checkpoint import load_torch_file

        sd = load_torch_file(args.vq_path)
        key = "quantize.embedding.weight"
        if key not in sd:
            cands = [k for k in sd if k.endswith("embedding.weight")]
            if not cands:
                raise KeyError(f"no codebook in {args.vq_path}; keys: {list(sd)[:5]}")
            key = cands[0]
        codebook = sd[key]

    table = nearest_latents(codebook, k=args.k,
                           l2_normalize=getattr(args, "l2_normalize", False))
    os.makedirs(args.save_path, exist_ok=True)
    out = os.path.join(args.save_path, f"top_{table.shape[1]}_indices.npy")
    save_table(out, table)
    print(f"saved {out} shape={table.shape}")
    return 0
