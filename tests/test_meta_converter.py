"""Original-Meta Chameleon weight converter: consolidated.pth layout ->
HF layout -> params pytree (reference convert_chameleon_weights_to_hf.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lantern_tpu import configs
from lantern_tpu.models import transformer as tfm
from lantern_tpu.utils.checkpoint import (chameleon_params_from_torch,
                                          load_meta_chameleon_dir,
                                          meta_chameleon_to_hf)

L, NH, DIM, FFN, V = 2, 4, 64, 128, 96
HD = DIM // NH


def _meta_shard(rng, frac=1.0, seed_off=0):
    """One Meta-layout shard; frac scales the sharded dims."""
    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    sd = {}
    for li in range(L):
        P = f"layers.{li}."
        sd[P + "attention.wq.weight"] = t(int(DIM * frac), DIM)
        sd[P + "attention.wk.weight"] = t(int(DIM * frac), DIM)
        sd[P + "attention.wv.weight"] = t(int(DIM * frac), DIM)
        sd[P + "attention.wo.weight"] = t(DIM, int(DIM * frac))
        sd[P + "attention.q_normalization.weight"] = t(HD)
        sd[P + "attention.q_normalization.bias"] = t(HD)
        sd[P + "attention.k_normalization.weight"] = t(HD)
        sd[P + "attention.k_normalization.bias"] = t(HD)
        sd[P + "feed_forward.w1.weight"] = t(int(FFN * frac), DIM)
        sd[P + "feed_forward.w2.weight"] = t(DIM, int(FFN * frac))
        sd[P + "feed_forward.w3.weight"] = t(int(FFN * frac), DIM)
        sd[P + "attention_norm.weight"] = t(DIM)
        sd[P + "ffn_norm.weight"] = t(DIM)
    sd["tok_embeddings.weight"] = t(V, int(DIM * frac) if frac < 1 else DIM)
    sd["norm.weight"] = t(DIM)
    sd["output.weight"] = t(int(V * frac) if frac < 1 else V, DIM)
    return sd


def test_permute_matches_reference_formula():
    """q/k get the sliced-rotary permute; pin against the reference's torch
    expression (convert_chameleon_weights_to_hf.py:140-141)."""
    rng = np.random.default_rng(0)
    sd = _meta_shard(rng)
    out = meta_chameleon_to_hf(sd, num_layers=L, n_heads=NH, dim=DIM)
    w = torch.tensor(sd["layers.0.attention.wq.weight"])
    ref = (w.view(NH, DIM // NH // 2, 2, DIM).transpose(1, 2)
           .reshape(DIM, DIM).numpy())
    np.testing.assert_array_equal(out["model.layers.0.self_attn.q_proj.weight"], ref)
    # QK-norm gamma/beta get the same sliced-rotary permute (reference
    # unsharded formula .view(hd//2,2).t().reshape(1,-1),
    # convert_chameleon_weights_to_hf.py:171-195)
    for meta, hf in (("q_normalization", "q_norm"), ("k_normalization", "k_norm")):
        for part in ("weight", "bias"):
            g = torch.tensor(sd[f"layers.0.attention.{meta}.{part}"])
            ref_g = g.view(HD // 2, 2).t().reshape(-1).numpy()
            np.testing.assert_array_equal(
                out[f"model.layers.0.self_attn.{hf}.{part}"].reshape(-1), ref_g)
    # non-permuted tensors pass through
    np.testing.assert_array_equal(
        out["model.layers.0.self_attn.v_proj.weight"],
        sd["layers.0.attention.wv.weight"])
    np.testing.assert_array_equal(
        out["model.layers.1.mlp.down_proj.weight"],
        sd["layers.1.feed_forward.w2.weight"])


def test_converted_sd_loads_and_runs():
    rng = np.random.default_rng(1)
    sd = meta_chameleon_to_hf(_meta_shard(rng), num_layers=L, n_heads=NH,
                              dim=DIM)
    cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=DIM, intermediate_size=FFN,
        num_layers=L, num_heads=NH, num_kv_heads=NH, rope_kind="1d",
        rope_pairing="half", cond_kind="none", qk_norm=True, swin_norm=True,
        max_seq_len=64, dtype="float32")
    params = chameleon_params_from_torch(sd, cfg, dtype=jnp.float32)
    import jax

    from lantern_tpu.kv import KVCache

    kv = KVCache.create(cfg, 2, max_len=16)
    toks = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    res = tfm.forward(params, cfg, tfm.token_embed(params, toks), kv,
                      jnp.arange(4), tfm.make_rope_tables(cfg))
    assert np.isfinite(np.asarray(res.hidden)).all()


def test_load_meta_dir_with_shards(tmp_path):
    """2-shard consolidated.*.pth + params.json round trip; sharded tensors
    concatenate on the reference's axes (converter:208-300)."""
    import json

    rng = np.random.default_rng(2)
    full = _meta_shard(rng)

    # split the full shard in two along each tensor's sharded axis
    def split(key, axis):
        a = full[key]
        h = a.shape[axis] // 2
        sl0 = [slice(None)] * a.ndim
        sl1 = [slice(None)] * a.ndim
        sl0[axis] = slice(0, h)
        sl1[axis] = slice(h, None)
        return a[tuple(sl0)], a[tuple(sl1)]

    shards = [dict(), dict()]
    axes = {"attention.wq.weight": 0, "attention.wk.weight": 0,
            "attention.wv.weight": 0, "attention.wo.weight": 1,
            "feed_forward.w1.weight": 0, "feed_forward.w2.weight": 1,
            "feed_forward.w3.weight": 0}
    for li in range(L):
        P = f"layers.{li}."
        for k, ax in axes.items():
            a, b = split(P + k, ax)
            shards[0][P + k], shards[1][P + k] = a, b
        for k in ("attention.q_normalization.weight",
                  "attention.q_normalization.bias",
                  "attention.k_normalization.weight",
                  "attention.k_normalization.bias",
                  "attention_norm.weight", "ffn_norm.weight"):
            shards[0][P + k] = shards[1][P + k] = full[P + k]
    e0, e1 = split("tok_embeddings.weight", 1)
    shards[0]["tok_embeddings.weight"], shards[1]["tok_embeddings.weight"] = e0, e1
    o0, o1 = split("output.weight", 0)
    shards[0]["output.weight"], shards[1]["output.weight"] = o0, o1
    shards[0]["norm.weight"] = shards[1]["norm.weight"] = full["norm.weight"]

    for i, s in enumerate(shards):
        torch.save({k: torch.tensor(v) for k, v in s.items()},
                   tmp_path / f"consolidated.{i:02d}.pth")
    with open(tmp_path / "params.json", "w") as f:
        json.dump({"model": {"dim": DIM, "n_layers": L, "n_heads": NH},
                   "model_parallel_size": 2, "swin_norm": True}, f)

    sd, pj = load_meta_chameleon_dir(str(tmp_path))
    assert pj["model_parallel_size"] == 2
    ref = meta_chameleon_to_hf(full, num_layers=L, n_heads=NH, dim=DIM)
    np.testing.assert_allclose(
        sd["model.layers.0.mlp.up_proj.weight"],
        ref["model.layers.0.mlp.up_proj.weight"], rtol=0, atol=0)
    np.testing.assert_allclose(sd["lm_head.weight"], ref["lm_head.weight"])
    np.testing.assert_allclose(sd["model.embed_tokens.weight"],
                               ref["model.embed_tokens.weight"])
    # MP-replicated QK-norm layout: 2 shards concatenate to [2*hd], each
    # shard row permuted (converter:239-256 .view(ns,hd//2,2).transpose(1,2))
    assert sd["model.layers.0.self_attn.q_norm.weight"].shape == (2 * HD,)
    g = torch.tensor(full["layers.0.attention.q_normalization.weight"])
    per = g.view(HD // 2, 2).t().reshape(-1).numpy()
    np.testing.assert_array_equal(
        sd["model.layers.0.self_attn.q_norm.weight"],
        np.concatenate([per, per]))
