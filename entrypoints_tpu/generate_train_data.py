"""generate_train_data task: base-model traces -> drafter training samples.

Reference: entrypoints/generate_train_data.py — run the base model teacher-
forced over token sequences with hidden-state output and dump per-sample
training files.  Two sources:
- ``--self-generate``: sample sequences from the base model itself (true
  self-distillation; reference does this via a separate generation pass)
- ``--codes-dir``: pre-extracted VQ codes (extract_code output)

Output format (one .npz per sample; see train/drafter_train.py docstring):
tokens (drafter-shifted), hidden, target (next hidden), loss_mask.
"""

from __future__ import annotations

import os


def add_args(p):
    p.add_argument("--model", default="llamagen")
    p.add_argument("--model-size", default="XL")
    p.add_argument("--base-path", default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--codes-dir", default=None, help=".npz files with 'codes'")
    p.add_argument("--t5-dir", default=None,
                   help="local T5 checkpoint (real captions; without it the "
                        "session falls back to hash-seeded pseudo-embeddings)")
    p.add_argument("--self-generate", action="store_true")
    p.add_argument("--prompts", default="a corgi|a red car|a mountain lake")
    p.add_argument("--num-samples", type=int, default=8)
    p.add_argument("--save-dir", default="data/drafter_train")
    p.add_argument("--cfg", type=float, default=7.5)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--slots", type=int, default=1,
                   help="batched self-generation: R rollouts share every "
                        "weight stream (ar.generate_many; the reference's "
                        "vLLM data-gen role)")


def run(args):
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.engine.session import LlamaGenSession
    from lantern_tpu.kv import KVCache
    from lantern_tpu.models import transformer as tfm

    cfg = configs.llamagen_config(args.model_size, "t2i")
    if args.random_weights or args.base_path is None:
        sess = LlamaGenSession.random(cfg, None, with_vq=False)
    else:
        sess = LlamaGenSession.from_pretrained(
            args.base_path, cfg, t5_dir=getattr(args, "t5_dir", None))
    params = sess.params
    rope = tfm.make_rope_tables(cfg)
    Tc = cfg.cls_token_num

    # params as a jit ARGUMENT: a closed-over weight pytree lowers as MLIR
    # constants (host readback over the remote tunnel, duplicated per shape)
    @jax.jit
    def teacher_forward(params, cond, tokens, prefix_valid):
        """cond [1, Tc, Dc], tokens [1, T] -> hidden [1, Tc + T, H]."""
        embeds = jnp.concatenate(
            [tfm.cond_embed(params, cfg, cond), tfm.token_embed(params, tokens)],
            axis=1,
        )
        T = embeds.shape[1]
        kv = KVCache.create(cfg, 1, max_len=T)
        # caption pads must be masked exactly as AR/spec inference masks
        # them, or teacher hiddens skew from what the drafter will consume
        block = (jnp.tril(jnp.ones((T, T), bool))[None]
                 & prefix_valid[:, None, :T])
        res = tfm.forward(params, cfg, embeds, kv, jnp.arange(T), rope,
                          block_mask=block)
        return res.hidden

    os.makedirs(args.save_dir, exist_ok=True)

    if args.codes_dir:
        from lantern_tpu.utils.t5 import flip_for_left_padding

        sources = sorted(glob.glob(os.path.join(args.codes_dir, "*.npz")))[: args.num_samples]
        items = []
        for s in sources:
            z = np.load(s)
            if "caption_emb" in z:
                # apply the inference-time layout (session._cond_pair):
                # valid rows flipped to the right, pad rows zeroed
                emb = z["caption_emb"][None]
                mask = (z["caption_mask"][None] if "caption_mask" in z
                        else np.ones(emb.shape[:2], bool))
                emb, mask = flip_for_left_padding(emb, mask)
                items.append((z["codes"].reshape(-1), (emb[0], mask[0])))
            else:
                items.append((z["codes"].reshape(-1), None))
    else:
        # self-generate with the (vanilla AR) base model
        prompts = [p.strip() for p in args.prompts.split("|")]
        items = []
        slots = max(1, getattr(args, "slots", 1))
        if slots > 1:
            # batched rollouts: R requests per dispatch share the weight
            # streams (ar.generate_many)
            from lantern_tpu.engine import ar
            from lantern_tpu.ops.sampling import LogitsWarp

            warp = LogitsWarp(temperature=args.temperature, top_k=args.top_k,
                              top_p=1.0)
            for lo in range(0, args.num_samples, slots):
                idxs = list(range(lo, min(lo + slots, args.num_samples)))
                conds, pvs, uncond = [], [], None
                for i in idxs:
                    c, uncond, pv = sess._cond_pair(prompts[i % len(prompts)])
                    conds.append(c)
                    pvs.append(pv)
                conds = jnp.stack(conds)
                pv_b = None if pvs[0] is None else jnp.stack(pvs)
                rngs = jax.vmap(jax.random.key)(
                    jnp.asarray([args.seed + i for i in idxs], jnp.uint32))
                toks_b = np.asarray(ar.generate_many(
                    sess.params, cfg, conds, uncond, cfg.block_size,
                    args.cfg, warp, rngs, prefix_valid=pv_b))
                for row, i in enumerate(idxs):
                    items.append((toks_b[row], prompts[i % len(prompts)]))
        else:
            for i in range(args.num_samples):
                prompt = prompts[i % len(prompts)]
                toks, _ = sess.generate(
                    prompt, mode="ar", temperature=args.temperature,
                    top_k=args.top_k, cfg_scale=args.cfg, seed=args.seed + i,
                )
                items.append((toks, prompt))

    n_img = cfg.block_size
    for i, (codes, meta) in enumerate(items):
        if isinstance(meta, str) or meta is None:
            cond, _, pv = sess._cond_pair(meta or "")
            cap_valid = (np.ones((1, Tc), bool) if pv is None
                         else np.asarray(pv)[:1, :Tc])
        else:
            emb, mask = meta
            cond = jnp.asarray(emb)[None]
            cap_valid = np.asarray(mask, bool)[None]
        tokens = jnp.asarray(np.asarray(codes, np.int32))[None]
        T_all_ = Tc + len(codes)
        valid_row = np.ones((1, T_all_), bool)
        valid_row[:, :Tc] = cap_valid
        hidden = np.asarray(
            teacher_forward(params, cond, tokens, jnp.asarray(valid_row)),
            dtype=np.float32)[0]

        # drafter stream: token_{i+1} paired with hidden_i
        # (cnets input layout; zeros over the conditioning prefix)
        T_all = hidden.shape[0]
        dr_tokens = np.zeros((T_all,), np.int32)
        dr_tokens[Tc - 1 : Tc - 1 + len(codes)] = np.asarray(codes)
        target = np.concatenate([hidden[1:], np.zeros_like(hidden[:1])], 0)
        loss_mask = np.zeros((T_all,), np.float32)
        loss_mask[Tc - 1 : Tc - 1 + n_img] = 1.0

        out = os.path.join(args.save_dir, f"sample_{i:06d}.npz")
        np.savez_compressed(
            out, tokens=dr_tokens[: T_all - 1], hidden=hidden[: T_all - 1],
            target=target[: T_all - 1], loss_mask=loss_mask[: T_all - 1],
        )
    print(f"wrote {len(items)} samples to {args.save_dir}")
    return 0
