"""Decoder parity vs the reference LlamaGen kv_variants model on torch CPU.

We instantiate the reference LlamaModel with a tiny config, copy its randomly
initialized weights into our parameter pytree, and compare hidden states for
prefill (conditioning prefix), incremental decode against the KV cache, and a
tree-masked speculative block.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs
from lantern_tpu.kv import KVCache
from lantern_tpu.models import transformer as tfm
from tests.refmod import load_ref_kv_llamagen


@pytest.fixture(scope="module")
def ref_kv_mod():
    return load_ref_kv_llamagen()


def tiny_ref_config(ref_kv_mod, cfg: configs.ModelConfig, input_type: str):
    from transformers.models.llama import LlamaConfig

    c = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_seq_len,
    )
    c.pretraining_tp = 1
    c.attention_bias = False
    c.block_size = cfg.block_size
    c.num_classes = cfg.num_classes
    c.input_type = input_type
    c.cls_token_num = cfg.cls_token_num
    c.caption_dim = cfg.caption_dim
    c.class_dropout_p = 0.1   # >0 so the uncond embedding row exists
    c.token_dropout_p = 0.0
    c.ffn_dropout_p = 0.0
    c.resid_dropout_p = 0.0
    c.rope_base = int(cfg.rope_base)
    c.rope_theta = cfg.rope_base
    c.rope_scaling = None
    c._attn_implementation = "eager"
    return c


def copy_weights_to_jax(model, cfg: configs.ModelConfig) -> dict:
    """torch LlamaModel state -> our [in, out] kernel pytree."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    L = cfg.num_layers

    def stack(fmt, transpose=False):
        ws = [sd[fmt.format(l)] for l in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws))

    layers = {
        "attn_norm": stack("layers.{}.input_layernorm.weight"),
        "wq": stack("layers.{}.self_attn.q_proj.weight", transpose=True),
        "wk": stack("layers.{}.self_attn.k_proj.weight", transpose=True),
        "wv": stack("layers.{}.self_attn.v_proj.weight", transpose=True),
        "wo": stack("layers.{}.self_attn.o_proj.weight", transpose=True),
        "ffn_norm": stack("layers.{}.post_attention_layernorm.weight"),
        "w_gate": stack("layers.{}.mlp.gate_proj.weight", transpose=True),
        "w_up": stack("layers.{}.mlp.up_proj.weight", transpose=True),
        "w_down": stack("layers.{}.mlp.down_proj.weight", transpose=True),
    }
    params = {
        "embed": jnp.asarray(sd["embed_tokens.weight"]),
        "layers": layers,
        "norm": jnp.asarray(sd["norm.weight"]),
        "lm_head": jnp.zeros((cfg.hidden_size, cfg.vocab_size), jnp.float32),
    }
    if cfg.cond_kind == "label":
        params["cond"] = {"table": jnp.asarray(sd["cls_embedding.embedding_table.weight"])}
    elif cfg.cond_kind == "caption":
        params["cond"] = {
            "fc1": jnp.asarray(sd["cls_embedding.cap_proj.fc1.weight"].T),
            "fc2": jnp.asarray(sd["cls_embedding.cap_proj.fc2.weight"].T),
            "uncond": jnp.asarray(sd["cls_embedding.uncond_embedding"]),
        }
    return params


def build_pair(ref_kv_mod, input_type):
    torch.manual_seed(0)
    if input_type == "c2i":
        cfg = configs.tiny_config(cond_kind="label")
    else:
        cfg = configs.tiny_config(cond_kind="caption")
    rc = tiny_ref_config(ref_kv_mod, cfg, input_type)
    with torch.no_grad():
        model = ref_kv_mod.LlamaModel(rc).eval().float()
    params = copy_weights_to_jax(model, cfg)
    return cfg, model, params


@pytest.mark.parametrize("input_type", ["c2i", "t2i"])
def test_prefill_and_decode_parity(ref_kv_mod, input_type):
    cfg, model, params = build_pair(ref_kv_mod, input_type)
    rope = tfm.make_rope_tables(cfg)
    B = 2
    rng = np.random.default_rng(0)

    # --- conditioning prefix ---
    if input_type == "c2i":
        cond = np.array([3, 7])
        cond_t = torch.tensor(cond)
        cond_j = jnp.asarray(cond)
    else:
        cond = rng.normal(size=(B, cfg.cls_token_num, cfg.caption_dim)).astype(np.float32)
        cond_t = torch.tensor(cond)
        cond_j = jnp.asarray(cond)

    from models.drafters.kv_cache import initialize_past_key_values

    pkv, _, cur_len_data = initialize_past_key_values(model, batch_size=B)

    with torch.no_grad():
        out_ref = model(cond_idx=cond_t, past_key_values=pkv)
    h_ref = out_ref.last_hidden_state.numpy()

    kv = KVCache.create(cfg, B)
    embeds = tfm.cond_embed(params, cfg, cond_j)
    positions = jnp.arange(cfg.cls_token_num)
    res = tfm.forward(params, cfg, embeds, kv, positions, rope)
    np.testing.assert_allclose(np.asarray(res.hidden), h_ref, rtol=2e-4, atol=2e-5)

    # --- two incremental decode steps ---
    kv = res.kv
    for step in range(2):
        tok = rng.integers(0, cfg.vocab_size, size=(B, 1))
        with torch.no_grad():
            out_ref = model(input_ids=torch.tensor(tok), past_key_values=pkv)
        h_ref = out_ref.last_hidden_state.numpy()

        embeds = tfm.token_embed(params, jnp.asarray(tok))
        positions = jnp.asarray([cfg.cls_token_num + step])
        res = tfm.forward(params, cfg, embeds, kv, positions, rope)
        kv = res.kv
        np.testing.assert_allclose(
            np.asarray(res.hidden), h_ref, rtol=2e-4, atol=2e-5, err_msg=f"step {step}"
        )

    # --- tree-masked speculative block (provisional write) ---
    from lantern_tpu import trees

    spec = trees.get_tree("chain")
    Ttree = spec.num_nodes
    toks = rng.integers(0, cfg.vocab_size, size=(B, Ttree))
    base = cfg.cls_token_num + 2
    tree_pos = spec.depth + base

    model.tree_mask = torch.tensor(spec.attn_mask.astype(np.float32))[None, None]
    with torch.no_grad():
        out_ref = model(
            input_ids=torch.tensor(toks),
            past_key_values=pkv,
            # reference expects shared 1-D tree positions (tree_decoding,
            # ea_model_llamagen.py:918)
            position_ids=torch.tensor(tree_pos.astype(np.int64)),
        )
    h_ref = out_ref.last_hidden_state.numpy()
    model.tree_mask = None

    embeds = tfm.token_embed(params, jnp.asarray(toks))
    res = tfm.forward(
        params, cfg, embeds, kv, jnp.asarray(tree_pos), rope,
        block_mask=jnp.asarray(spec.attn_mask), commit=False,
    )
    np.testing.assert_allclose(np.asarray(res.hidden), h_ref, rtol=2e-4, atol=2e-5)
    # provisional write must not advance the committed length
    assert int(res.kv.length) == base


def test_caption_prefix_padding_mask(ref_kv_mod):
    """Left-padded caption masks (attention_mask path) must match."""
    cfg, model, params = build_pair(ref_kv_mod, "t2i")
    rope = tfm.make_rope_tables(cfg)
    B = 2
    rng = np.random.default_rng(1)
    cond = rng.normal(size=(B, cfg.cls_token_num, cfg.caption_dim)).astype(np.float32)
    # emulate flipped T5 masks: first rows invalid for sample 0
    attn_mask = np.ones((B, cfg.cls_token_num), np.int64)
    attn_mask[0, :3] = 0

    from models.drafters.kv_cache import initialize_past_key_values

    pkv, _, _ = initialize_past_key_values(model, batch_size=B)
    with torch.no_grad():
        out_ref = model(
            cond_idx=torch.tensor(cond),
            past_key_values=pkv,
            attention_mask=torch.tensor(attn_mask),
        )
        tok = rng.integers(0, cfg.vocab_size, size=(B, 1))
        step_mask = np.concatenate([attn_mask, np.ones((B, 1), np.int64)], axis=1)
        out_ref2 = model(
            input_ids=torch.tensor(tok),
            past_key_values=pkv,
            attention_mask=torch.tensor(step_mask),
        )

    kv = KVCache.create(cfg, B)
    embeds = tfm.cond_embed(params, cfg, jnp.asarray(cond))
    pv = np.ones((B, kv.max_len), bool)
    pv[:, : cfg.cls_token_num] = attn_mask.astype(bool)
    # prefill: prefix not yet in cache; per-sample padding enters via a
    # batched [B, T, T] block mask
    block = np.tril(np.ones((cfg.cls_token_num, cfg.cls_token_num), bool))
    block = block & attn_mask[:, None, :].astype(bool)
    res = tfm.forward(
        params, cfg, embeds, kv, jnp.arange(cfg.cls_token_num), rope,
        block_mask=jnp.asarray(block),
    )
    h_ref = out_ref.last_hidden_state.numpy()
    valid = attn_mask.astype(bool)
    # compare only valid (non-pad) positions: pad rows differ by design
    np.testing.assert_allclose(
        np.asarray(res.hidden)[valid], h_ref[valid], rtol=2e-4, atol=2e-5
    )

    # decode step with per-batch prefix padding mask
    res2 = tfm.forward(
        params, cfg, tfm.token_embed(params, jnp.asarray(tok)), res.kv,
        jnp.asarray([cfg.cls_token_num]), rope,
        prefix_valid=jnp.asarray(pv),
    )
    np.testing.assert_allclose(
        np.asarray(res2.hidden), out_ref2.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )


def test_fused_params_forward_equivalence():
    """fuse_params (QKV + gate/up fused matmuls, the single-chip serving
    layout) must be numerically identical to the split layout on both the
    cached-decode and training forwards, across norm orderings."""
    import dataclasses

    from lantern_tpu import configs
    from lantern_tpu.kv import KVCache

    cases = [
        configs.llamagen_config("nano", "t2i", image_tokens=16),
        dataclasses.replace(
            configs.chameleon_7b_config(swin_norm=True),
            num_layers=2, hidden_size=64, num_heads=4, num_kv_heads=4,
            intermediate_size=128, vocab_size=256, max_seq_len=64,
        ),
    ]
    for cfg in cases:
        params = tfm.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
        fused = tfm.fuse_params(params)
        assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        rope = tfm.make_rope_tables(cfg)
        kv = KVCache.create(cfg, 2, max_len=64)
        x = jax.random.normal(jax.random.key(1), (2, 5, cfg.hidden_size), jnp.float32)
        r1 = tfm.forward(params, cfg, x, kv, jnp.arange(5), rope)
        r2 = tfm.forward(fused, cfg, x, kv, jnp.arange(5), rope)
        np.testing.assert_allclose(np.asarray(r1.hidden), np.asarray(r2.hidden),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1.kv.k), np.asarray(r2.kv.k),
                                   rtol=1e-5, atol=1e-5)
        h1 = tfm.forward_train(params, cfg, x, jnp.arange(5), rope)
        h2 = tfm.forward_train(fused, cfg, x, jnp.arange(5), rope)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kvq", [False, True])
@pytest.mark.parametrize("T", [1, 2])
def test_dense_mulsum_decode_matches_einsum(kvq, T):
    """The mul-sum decode-attention path (dense_qk_mulsum_max_t) must agree
    with the einsum fused path: same math, different contraction order."""
    import dataclasses

    from lantern_tpu.kv import KVCache

    cfg = configs.tiny_config(cond_kind="label", block_size=16,
                              num_heads=4, hidden_size=256)
    cfg = dataclasses.replace(cfg, use_flash_attention=False,
                              dense_softmax="fused")
    params = tfm.init_params(jax.random.key(0), cfg)
    rope = tfm.make_rope_tables(cfg)
    kv = KVCache.create(cfg, 2, quantized=kvq)
    # commit a short random prefix
    pre = jax.random.randint(jax.random.key(1), (2, 7), 0, cfg.vocab_size)
    res = tfm.forward(params, cfg, tfm.token_embed(params, pre), kv,
                      jnp.arange(7), rope)
    kv = res.kv
    tok = jax.random.randint(jax.random.key(2), (2, T), 0, cfg.vocab_size)
    outs = {}
    for ms in (0, 4):
        c = dataclasses.replace(cfg, dense_qk_mulsum_max_t=ms)
        r = tfm.forward(params, c, tfm.token_embed(params, tok), kv,
                        kv.length + jnp.arange(T), rope, commit=False)
        outs[ms] = np.asarray(r.hidden, np.float32)
    np.testing.assert_allclose(outs[0], outs[4], rtol=3e-2, atol=3e-2)
