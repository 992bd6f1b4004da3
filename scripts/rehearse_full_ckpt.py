"""Full-size synthetic-checkpoint rehearsal (loader / layout / memory risk).

Loaders and the Meta->HF converter are golden-tested at tiny sizes, but the
reference's primary usage is ``from_pretrained -> generate -> decode_ids``
over a real 7B checkpoint (README.md:143-242).  No public weights ship in
this zero-egress environment, so this script writes a RANDOM-weight
Lumina-mGPT-7B-class checkpoint in the exact on-disk formats the loaders
consume — sharded bf16 safetensors + index json, the tokenizers-format BPE
json (full 65536 vocab with the IMGIMG naming scheme), and a taming-format
VQGAN .ckpt — then flows it through the real
``ChameleonSession.from_pretrained -> generate -> decode_generated`` path at
full scale, and separately through the Meta-``consolidated.*.pth`` converter
path (``utils.checkpoint.meta_chameleon_to_hf``).

Phases (``--phase all|write|load|meta``):
  write  build the checkpoint dir (~14 GB, CPU only)
  load   from_pretrained + int8 quantize + one small-grid image on the
         accelerator + VQ decode + tokenizer round-trip
  meta   full-size Meta-format shards -> converter -> loader census

Usage: python scripts/rehearse_full_ckpt.py --dir /tmp/lumina7b_rehearsal
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def note(m):
    print(f"[rehearse +{time.perf_counter() - T0:6.1f}s] {m}", flush=True)


def model_config(max_seq_len=512):
    from lantern_tpu import configs

    return configs.chameleon_7b_config(max_seq_len=max_seq_len,
                                       swin_norm=True)


def write_checkpoint(out_dir: str, mp: int = 4, seed: int = 0):
    """Sharded bf16 safetensors in the HF Chameleon naming
    ``chameleon_params_from_torch`` consumes, incl. the Lumina MP-replicated
    QK-norm layout (one [mp*head_dim] row per layer, rank rows tiled over
    heads — modeling_lumina_mgpt_kv.py:292-315)."""
    import torch
    from safetensors.torch import save_file

    cfg = model_config()
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    V, hd = cfg.vocab_size, cfg.head_dim
    os.makedirs(out_dir, exist_ok=True)
    gen = torch.Generator().manual_seed(seed)

    def rand(*shape, scale=0.02):
        return (torch.randn(*shape, generator=gen) * scale).to(torch.bfloat16)

    index = {"metadata": {"total_size": 0}, "weight_map": {}}
    n_shards = 8
    per = (L + n_shards - 1) // n_shards
    for s in range(n_shards):
        shard = {}
        for l in range(s * per, min((s + 1) * per, L)):
            p = f"model.layers.{l}."
            shard[p + "input_layernorm.weight"] = rand(H, scale=1.0)
            shard[p + "self_attn.q_proj.weight"] = rand(H, H)
            shard[p + "self_attn.k_proj.weight"] = rand(H, H)
            shard[p + "self_attn.v_proj.weight"] = rand(H, H)
            shard[p + "self_attn.o_proj.weight"] = rand(H, H)
            shard[p + "self_attn.q_norm.weight"] = rand(mp * hd, scale=1.0)
            shard[p + "self_attn.q_norm.bias"] = rand(mp * hd, scale=0.0)
            shard[p + "self_attn.k_norm.weight"] = rand(mp * hd, scale=1.0)
            shard[p + "self_attn.k_norm.bias"] = rand(mp * hd, scale=0.0)
            shard[p + "post_attention_layernorm.weight"] = rand(H, scale=1.0)
            shard[p + "mlp.gate_proj.weight"] = rand(I, H)
            shard[p + "mlp.up_proj.weight"] = rand(I, H)
            shard[p + "mlp.down_proj.weight"] = rand(H, I)
        if s == n_shards - 1:
            shard["model.embed_tokens.weight"] = rand(V, H)
            shard["model.norm.weight"] = rand(H, scale=1.0)
            shard["lm_head.weight"] = rand(V, H)
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file(shard, os.path.join(out_dir, fname))
        for k, v in shard.items():
            index["weight_map"][k] = fname
            index["metadata"]["total_size"] += v.numel() * 2
        note(f"shard {s + 1}/{n_shards} written "
             f"({sum(v.numel() for v in shard.values()) / 1e9:.2f} B params)")
        del shard
        gc.collect()
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"architectures": ["ChameleonXLLMXForConditionalGeneration"],
                   "hidden_size": H, "num_hidden_layers": L,
                   "intermediate_size": I, "vocab_size": V,
                   "model_type": "chameleon", "torch_dtype": "bfloat16"}, f)
    note(f"index + config written; total "
         f"{index['metadata']['total_size'] / 2 ** 30:.1f} GiB")


def write_tokenizer(out_dir: str):
    """Full-vocab tokenizers-format json at the Lumina layout
    (``<ckpt>/chameleon/tokenizer/text_tokenizer.json``): specials, text
    pieces, and IMGIMG<digits-as-A..J>Z names for all 8192 VQ codes at the
    contiguous IMAGE_TOKEN_OFFSET the sessions assume."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    from lantern_tpu.models.chameleon import IMAGE_TOKEN_OFFSET

    vocab = {"<s>": 0, "</s>": 1, "<pad>": 2, "<racm3:break>": 3}
    digits = {str(i): chr(ord("A") + i) for i in range(10)}

    def img_name(code):
        return "IMGIMG" + "".join(digits[c] for c in str(code)) + "Z"

    for c in range(8192):
        vocab[img_name(c)] = IMAGE_TOKEN_OFFSET + c
    nxt = IMAGE_TOKEN_OFFSET + 8192
    vocab["<eoss>"] = nxt
    vocab["<reserved08706>"] = nxt + 1
    for ch in "abcdefghijklmnopqrstuvwxyz0123456789.,!?' ":
        if ch.strip():
            vocab.setdefault(ch, len(vocab))
    # pad the map to the model vocab with reserved names
    i = 0
    while len(vocab) < 65536:
        vocab[f"<filler{i:05d}>"] = len(vocab)
        i += 1
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    d = os.path.join(out_dir, "chameleon", "tokenizer")
    os.makedirs(d, exist_ok=True)
    tok.save(os.path.join(d, "text_tokenizer.json"))
    note("tokenizer json written (65536 vocab, 8192 IMGIMG names)")


def write_vqgan(out_dir: str, seed: int = 0):
    """Taming-format VQGAN .ckpt at the real Chameleon geometry (codebook
    8192x256, 512px, f16) with random weights, via the repo's own param
    census (vqgan.load_taming_state_dict key set)."""
    import numpy as np
    import torch

    from lantern_tpu.models import vqgan

    cfg = vqgan.chameleon_vq_config()
    # derive the exact key census by asking the loader what it needs:
    # build params once with random init, then save in taming naming
    sd = vqgan.random_taming_state_dict(cfg, seed=seed)
    path = os.path.join(out_dir, "chameleon_vqgan.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)
    note(f"VQGAN ckpt written ({sum(v.size for v in sd.values()) / 1e6:.0f}M "
         "params)")
    return path


def phase_load(ckpt_dir: str, grid: int, quant: str):
    import jax
    import numpy as np

    from lantern_tpu.engine.session import ChameleonSession
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.quant import quantize_params

    cfg = model_config(max_seq_len=64 + grid * (grid + 1) + 16)
    t = time.perf_counter()
    sess = ChameleonSession.from_pretrained(
        ckpt_dir, cfg, vq_path=os.path.join(ckpt_dir, "chameleon_vqgan.ckpt"),
        family="lumina", grid=(grid, grid))
    note(f"from_pretrained: {time.perf_counter() - t:.1f}s "
         "(sharded bf16 safetensors + tokenizer + VQGAN)")
    assert sess.tokenizer is not None, "tokenizer not found under ckpt dir"
    ids = sess.tokenizer.encode("a photo of a cat", bos=True)
    assert len(ids) >= 3, ids
    note(f"tokenizer round-trip ok ({len(ids)} ids)")

    cpu = jax.devices("cpu")[0]
    if quant == "int8":
        t = time.perf_counter()
        with jax.default_device(cpu):
            sess.params = quantize_params(tfm.fuse_params(sess.params))
        note(f"fuse+quantize int8: {time.perf_counter() - t:.1f}s")
    dev = jax.devices()[0]
    t = time.perf_counter()
    sess.params = jax.device_put(sess.params, dev)
    jax.block_until_ready(jax.tree.leaves(sess.params)[0])
    note(f"params on {dev.platform}: {time.perf_counter() - t:.1f}s")
    try:
        stats = dev.memory_stats()
        note(f"device memory in use: "
             f"{stats['bytes_in_use'] / 2 ** 30:.2f} GiB of "
             f"{stats.get('bytes_limit', 0) / 2 ** 30:.2f} GiB")
    except Exception:  # noqa: BLE001 — memory_stats is backend-optional
        pass

    t = time.perf_counter()
    toks, st = sess.generate("a photo of a cat", mode="ar", seed=3,
                             kv_quant=True, grid=(grid, grid))
    note(f"generate (AR, {len(toks)} tokens, grid {grid}x{grid}): "
         f"{time.perf_counter() - t:.1f}s incl. compile")
    img = sess.decode_generated(toks, grid=(grid, grid))
    note(f"decode_generated -> image {img.shape} dtype {img.dtype}")
    assert img.shape == (grid * 16, grid * 16, 3)
    note("PHASE load OK")


def phase_meta(tmp_dir: str):
    """Full-size Meta-format converter rehearsal: consolidated shards ->
    meta_chameleon_to_hf -> chameleon_params_from_torch census."""
    import numpy as np

    from lantern_tpu.utils import checkpoint as ckpt

    cfg = model_config()
    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    V, hd = cfg.vocab_size, cfg.head_dim
    mp = 2
    rng = np.random.default_rng(0)

    def r(*s, scale=0.02):
        return (rng.standard_normal(s) * scale).astype(np.float32)

    shards = []
    for m in range(mp):
        # Meta sharding axes (convert_chameleon_weights_to_hf.py:292-299):
        # tok_embeddings is ParallelEmbedding — HIDDEN-sharded (cat dim=1);
        # output is ColumnParallel — vocab-sharded (cat dim=0)
        sh = {"tok_embeddings.weight": r(V, H // mp),
              "norm.weight": r(H, scale=1.0),
              "output.weight": r(V // mp, H)}
        for l in range(L):
            p = f"layers.{l}."
            sh[p + "attention.wq.weight"] = r(H // mp, H)
            sh[p + "attention.wk.weight"] = r(H // mp, H)
            sh[p + "attention.wv.weight"] = r(H // mp, H)
            sh[p + "attention.wo.weight"] = r(H, H // mp)
            sh[p + "attention.q_normalization.weight"] = r(hd, scale=1.0)
            sh[p + "attention.q_normalization.bias"] = r(hd, scale=0.0)
            sh[p + "attention.k_normalization.weight"] = r(hd, scale=1.0)
            sh[p + "attention.k_normalization.bias"] = r(hd, scale=0.0)
            sh[p + "attention_norm.weight"] = r(H, scale=1.0)
            sh[p + "ffn_norm.weight"] = r(H, scale=1.0)
            sh[p + "feed_forward.w1.weight"] = r(I // mp, H)
            sh[p + "feed_forward.w2.weight"] = r(H, I // mp)
            sh[p + "feed_forward.w3.weight"] = r(I // mp, H)
        shards.append(sh)
        note(f"meta shard {m + 1}/{mp} built in RAM "
             f"({sum(v.size for v in sh.values()) / 1e9:.2f}B params)")
    t = time.perf_counter()
    hf = ckpt.meta_chameleon_to_hf(shards, num_layers=L, n_heads=cfg.num_heads,
                                   dim=H, n_kv_heads=cfg.num_kv_heads)
    note(f"meta->hf converted {len(hf)} tensors "
         f"in {time.perf_counter() - t:.1f}s")
    del shards
    gc.collect()
    t = time.perf_counter()
    params = ckpt.chameleon_params_from_torch(hf, cfg)
    note(f"hf->params loaded in {time.perf_counter() - t:.1f}s")
    assert params["embed"].shape == (V, H)
    assert params["layers"]["wq"].shape == (L, H, H)
    assert params["layers"]["q_norm_w"].shape == (L, cfg.num_heads, hd)
    note("PHASE meta OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/lumina7b_rehearsal")
    ap.add_argument("--phase", default="all",
                    choices=["all", "write", "load", "meta"])
    ap.add_argument("--grid", type=int, default=8)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    args = ap.parse_args()

    if args.phase in ("all", "write"):
        write_checkpoint(args.dir)
        write_tokenizer(args.dir)
        write_vqgan(args.dir)
    if args.phase in ("all", "meta"):
        phase_meta(args.dir)
    if args.phase in ("all", "load"):
        phase_load(args.dir, args.grid, args.quant)
    note("rehearsal complete")


if __name__ == "__main__":
    main()
