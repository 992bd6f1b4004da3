"""extract_code task: images (+captions) -> VQ codes (+ caption embeddings).

Reference: entrypoints/extract_code.py — encode training images through the
family VQ-GAN, and for LlamaGen additionally embed captions through T5.
Output: one .npz per image with ``codes`` [T] (and ``caption_emb``
[120, 2048] + ``caption_mask`` when captions are given), the input format of
generate_train_data --codes-dir.
"""

from __future__ import annotations

import json
import os


def add_args(p):
    p.add_argument("--model", default="llamagen",
                   choices=["llamagen", "anole", "lumina_mgpt"])
    p.add_argument("--images-dir", required=True)
    p.add_argument("--captions-json", default=None,
                   help="MSCOCO-style {file_name -> caption} or annotations json")
    p.add_argument("--vq-path", default=None)
    p.add_argument("--t5-dir", default=None)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--save-dir", default="data/extracted_codes")
    p.add_argument("--limit", type=int, default=10 ** 9)


def load_captions(path):
    if path is None:
        return {}
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and "annotations" in data:
        images = {im["id"]: im["file_name"] for im in data.get("images", [])}
        return {images.get(a["image_id"], str(a["image_id"])): a["caption"]
                for a in data["annotations"]}
    return dict(data)


def run(args):
    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from lantern_tpu.models import vqgan

    if args.model == "llamagen":
        vq_cfg = vqgan.vq16_config()
    else:
        vq_cfg = vqgan.chameleon_vq_config()
    if args.vq_path:
        from lantern_tpu.utils.checkpoint import load_torch_file

        sd = load_torch_file(args.vq_path)
        loader = (vqgan.load_torch_state_dict if args.model == "llamagen"
                  else vqgan.load_taming_state_dict)
        vq_params = loader(sd, vq_cfg)
    else:
        import jax

        vq_params = vqgan.init_vqgan_params(jax.random.key(0), vq_cfg)
        print("warning: random VQ weights (no --vq-path)")

    captions = load_captions(args.captions_json)
    t5 = None
    if captions:
        if args.t5_dir:
            from lantern_tpu.utils.t5 import T5Embedder

            t5 = T5Embedder(args.t5_dir)
        else:
            from lantern_tpu.utils.t5 import RandomT5

            t5 = RandomT5()

    os.makedirs(args.save_dir, exist_ok=True)
    names = sorted(
        f for f in os.listdir(args.images_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )[: args.limit]
    for i, name in enumerate(names):
        img = Image.open(os.path.join(args.images_dir, name)).convert("RGB")
        s = args.image_size
        # center-crop the long edge before resizing (reference extraction
        # semantics; a bare (s, s) resize distorts non-square images)
        w, h = img.size
        short = min(w, h)
        img = img.crop(((w - short) // 2, (h - short) // 2,
                        (w - short) // 2 + short, (h - short) // 2 + short))
        img = img.resize((s, s), Image.LANCZOS)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0
        codes = vqgan.encode(vq_params, vq_cfg, jnp.asarray(arr[None]))
        out = {"codes": np.asarray(codes[0], np.int32)}
        if name in captions and t5 is not None:
            emb, mask = t5.get_text_embeddings([captions[name]])
            out["caption_emb"] = np.asarray(emb[0], np.float32)
            out["caption_mask"] = np.asarray(mask[0], np.int64)
        np.savez_compressed(
            os.path.join(args.save_dir, os.path.splitext(name)[0] + ".npz"),
            **out,
        )
    print(f"extracted {len(names)} images to {args.save_dir}")
    return 0
