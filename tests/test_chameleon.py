"""Chameleon-family decoder parity vs the reference anole kv model: QK-norm,
1-D RoPE, swin-norm ordering, tree-masked decode."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.kv import KVCache
from lantern_tpu.models import transformer as tfm
from tests.refmod import _imp

V, H, HEADS, L = 128, 64, 4, 2


def build_pair(swin: bool):
    torch.manual_seed(0)
    mod = _imp("models.kv_variants.modeling_anole_kv")
    cfgmod = _imp("models.configs.configuration_anole")
    vq = cfgmod.ChameleonVQVAEConfig(
        embed_dim=4, num_embeddings=16, latent_channels=32, resolution=16,
        base_channels=32, channel_multiplier=[1], num_res_blocks=1,
        attn_resolutions=[],
    )
    rc = cfgmod.ChameleonConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=128,
        rms_norm_eps=1e-5, swin_norm=swin, vq_config=vq.to_dict(),
        vocabulary_map={"<image>": 1},
        attention_bias=False, mlp_bias=False,
    )
    rc._attn_implementation = "eager"
    with torch.no_grad():
        model = mod.ChameleonModel(rc).eval().float()

    cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_layers=L, num_heads=HEADS, num_kv_heads=HEADS,
        rms_norm_eps=1e-5, rope_kind="1d", rope_pairing="half",
        cond_kind="none", qk_norm=True, swin_norm=swin,
        max_seq_len=128, dtype="float32",
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    def S(fmt, transpose=False):
        ws = [sd[fmt.format(l)] for l in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws))

    params = {
        "embed": jnp.asarray(sd["embed_tokens.weight"]),
        "norm": jnp.asarray(sd["norm.weight"]),
        "lm_head": jnp.zeros((H, V), jnp.float32),
        "layers": {
            "attn_norm": S("layers.{}.input_layernorm.weight"),
            "wq": S("layers.{}.self_attn.q_proj.weight", True),
            "wk": S("layers.{}.self_attn.k_proj.weight", True),
            "wv": S("layers.{}.self_attn.v_proj.weight", True),
            "wo": S("layers.{}.self_attn.o_proj.weight", True),
            "ffn_norm": S("layers.{}.post_attention_layernorm.weight"),
            "w_gate": S("layers.{}.mlp.gate_proj.weight", True),
            "w_up": S("layers.{}.mlp.up_proj.weight", True),
            "w_down": S("layers.{}.mlp.down_proj.weight", True),
            "q_norm_w": S("layers.{}.self_attn.q_norm.weight"),
            "q_norm_b": S("layers.{}.self_attn.q_norm.bias"),
            "k_norm_w": S("layers.{}.self_attn.k_norm.weight"),
            "k_norm_b": S("layers.{}.self_attn.k_norm.bias"),
        },
    }
    return mod, model, cfg, params


@pytest.mark.parametrize("swin", [False, True])
def test_chameleon_prefill_decode_tree_parity(swin):
    mod, model, cfg, params = build_pair(swin)
    rope = tfm.make_rope_tables(cfg)
    fwd = jax.jit(tfm.forward, static_argnames=("cfg", "commit"))
    B = 2
    rng = np.random.default_rng(0)

    from models.drafters.kv_cache import initialize_past_key_values

    pkv, _, _ = initialize_past_key_values(model, batch_size=B)

    # prefill 7 tokens
    toks = rng.integers(2, V, size=(B, 7))
    with torch.no_grad():
        out_ref = model(input_ids=torch.tensor(toks), past_key_values=pkv)
    kv = KVCache.create(cfg, B)
    res = fwd(params, cfg, tfm.token_embed(params, jnp.asarray(toks)), kv,
              jnp.arange(7), rope)
    np.testing.assert_allclose(
        np.asarray(res.hidden), out_ref.last_hidden_state.numpy(),
        rtol=3e-4, atol=3e-5,
    )
    kv = res.kv

    # one decode step
    tok = rng.integers(2, V, size=(B, 1))
    with torch.no_grad():
        out_ref = model(input_ids=torch.tensor(tok), past_key_values=pkv)
    res = fwd(params, cfg, tfm.token_embed(params, jnp.asarray(tok)), kv,
              jnp.asarray([7]), rope)
    np.testing.assert_allclose(
        np.asarray(res.hidden), out_ref.last_hidden_state.numpy(),
        rtol=3e-4, atol=3e-5,
    )
    kv = res.kv

    # tree block with anole's per-branch position ids (uncond offset)
    spec = trees.get_tree("mc_sim_7b_63")
    N1 = spec.num_nodes
    ttoks = rng.integers(2, V, size=(B, N1))
    pos = np.stack([spec.depth + 8, spec.depth + 8], 0)
    model.tree_mask = torch.tensor(spec.attn_mask.astype(np.float32))[None, None]
    with torch.no_grad():
        out_ref = model(
            input_ids=torch.tensor(ttoks), past_key_values=pkv,
            position_ids=torch.tensor(pos.astype(np.int64)),
            cache_position=torch.arange(8, 8 + N1),
            # without an explicit attention_mask the reference pads its
            # causal mask one column wide and the tree block lands shifted;
            # real callers (ea_model_anole tree_decoding) always pass one
            attention_mask=torch.ones((B, 8 + N1), dtype=torch.long),
        )
    model.tree_mask = None
    res = fwd(params, cfg, tfm.token_embed(params, jnp.asarray(ttoks)), kv,
              jnp.asarray(pos), rope, block_mask=jnp.asarray(spec.attn_mask),
              commit=False)
    np.testing.assert_allclose(
        np.asarray(res.hidden), out_ref.last_hidden_state.numpy(),
        rtol=3e-4, atol=3e-5,
    )
