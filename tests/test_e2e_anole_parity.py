"""Golden end-to-end parity: our Chameleon-family (Anole) speculative engine
vs the reference ea_model_anole.EaModel.generate, on a tiny tied-weight
model.

This exercises the risk the self-referential tests (test_chameleon_engine)
cannot: the Anole prompt/position/pad scheme
(/root/reference/models/ea_model_anole.py:1026-1046), the dual position ids
threaded through tree decoding (905-933), the non-image logits mask (931),
and the image-offset LANTERN tables (511) — all against the reference's own
torch implementation, token-exact under greedy decoding.

The tiny model keeps the REAL Chameleon vocab layout (image BPE ids 4..8195,
prompt syntax ids 0/1/8196/8197/8710) because the reference hardcodes them;
only widths/depths shrink.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import jax

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.models import chameleon as cham
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.utils import checkpoint as ckpt_utils
from tests.refmod import _imp

V = 8712            # >= 8711 so the hardcoded prompt ids exist
H, HEADS, L = 64, 4, 2
N_CODES = cham.IMAGE_TOKEN_END - cham.IMAGE_TOKEN_START + 1   # 8192
MAX_NEW = 12
TEXT_TOKENS = [8205, 8300, 777]   # arbitrary non-pad text ids
NEAREST_W = 12


class _StubTokenManager:
    """Replaces the reference TokenManager (which loads real tokenizer/VQGAN
    checkpoints, modeling_anole_kv.py:1606-1609)."""

    def __init__(self, *a, **kw):
        pass

    def tokenize_text(self, text):
        return list(TEXT_TOKENS)


def _patch_vocab_ranges(obj):
    """The reference hardcodes non_image_tokens up to vocab 65536
    (ea_model_anole.py:144-146); rebuild for the tiny vocab."""
    ids = list(range(0, 4)) + list(range(cham.IMAGE_END_ID, V))
    obj.non_image_tokens = torch.tensor(ids)


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("anole_e2e")
    torch.manual_seed(0)
    mod = _imp("models.kv_variants.modeling_anole_kv")
    cfgmod = _imp("models.configs.configuration_anole")
    cnets = _imp("models.drafters.cnets_anole")
    refcfg = _imp("models.configs.configs")

    vq = cfgmod.ChameleonVQVAEConfig(
        embed_dim=4, num_embeddings=16, latent_channels=32, resolution=16,
        base_channels=32, channel_multiplier=[1], num_res_blocks=1,
        attn_resolutions=[],
    )
    rc = cfgmod.ChameleonConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=256,
        rms_norm_eps=1e-5, swin_norm=False, vq_config=vq.to_dict(),
        vocabulary_map={"<image>": 1},
        attention_bias=False, mlp_bias=False,
        initializer_range=0.2,   # wide init: tie-free greedy trajectories
    )
    rc._attn_implementation = "eager"
    orig_tm = mod.TokenManager
    mod.TokenManager = _StubTokenManager
    try:
        with torch.no_grad():
            base = mod.ChameleonForConditionalGeneration(rc).eval().float()
    finally:
        mod.TokenManager = orig_tm
    _patch_vocab_ranges(base)

    # --- tiny reference drafter -----------------------------------------
    econf = refcfg.EConfigAnole(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=1, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, rms_norm_eps=1e-5,
        max_position_embeddings=256, pretraining_tp=1,
        initializer_range=0.2,
        # read by cnets_anole but absent from EConfigAnole's signature; the
        # real drafter JSONs carry these as extra kwargs
        attention_dropout=0.0, rope_theta=10000.0, rope_scaling=None,
        attention_bias=False, mlp_bias=False, model_parallel_size=1,
    )
    with torch.no_grad():
        drafter = cnets.Model(econf, bias=True, total_tokens=12, depth=3,
                              top_k=10).eval().float()
        drafter.embed_tokens.weight.copy_(base.model.embed_tokens.weight)
    _patch_vocab_ranges(drafter)

    # --- EaModel assembly (bypassing from_pretrained's file IO) ----------
    econf_path = tmp / "drafter_config.json"
    with open(econf_path, "w") as f:
        json.dump({**econf.to_dict(), "bias": True}, f)
    vqd = tmp / "ckpts/anole/vq_distances"
    vqd.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # parity needs identical neighbor sets on both sides, not true
    # distances: random distinct neighbors per code
    nearest = np.argsort(rng.random((N_CODES, N_CODES)), axis=1)[:, :NEAREST_W]
    nearest = np.where(nearest == np.arange(N_CODES)[:, None],
                       (nearest + 1) % N_CODES, nearest).astype(np.int64)
    np.save(vqd / "top_8191_indices.npy", nearest)

    ref_ea = _imp("models.ea_model_anole")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        ea = ref_ea.EaModel(
            base, "tiny", str(econf_path), total_token=12, depth=3, top_k=10,
            threshold=1.0, ea_layer_state_dict=drafter.state_dict(),
        ).eval()
    finally:
        os.chdir(cwd)
    _patch_vocab_ranges(ea)
    _patch_vocab_ranges(ea.ea_layer)

    # --- our side: tied weights ------------------------------------------
    my_cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_layers=L, num_heads=HEADS, num_kv_heads=HEADS,
        rms_norm_eps=1e-5, rope_kind="1d", rope_pairing="half",
        cond_kind="none", qk_norm=True, swin_norm=False,
        max_seq_len=128, dtype="float32",
    )
    sd = {k: v.detach().numpy() for k, v in base.state_dict().items()}
    params = ckpt_utils.chameleon_params_from_torch(sd, my_cfg, dtype=jnp.float32)
    params["nearest_latents"] = jnp.asarray(
        cham.shift_nearest_table(nearest.astype(np.int32), V))
    dcfg = configs.drafter_config(my_cfg, total_tokens=12, depth=3, top_k=10)
    assert not dcfg.model.first_layer_no_input_norm   # anole drafter norms L0
    dsd = {k: v.detach().numpy() for k, v in ea.ea_layer.state_dict().items()}
    dparams = ckpt_utils.drafter_params_from_torch(dsd, dcfg, dtype=jnp.float32)
    return ea, my_cfg, dcfg, params, dparams


def my_generate(rig_data, mode, tree_name, lantern_k=0, lantern_delta=0.0):
    ea, my_cfg, dcfg, params, dparams = rig_data
    tp = cham.anole_token_prompt(TEXT_TOKENS)
    mask = jnp.asarray(cham.non_image_token_mask(V))
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.5,
        lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
        max_new=MAX_NEW, mode=mode,
    )
    tspec = trees.get_tree(tree_name) if mode == "static" else None
    res = spec.generate(
        params, dparams, ecfg, my_cfg, dcfg, tspec,
        None, None, jax.random.key(0), token_prompt=tp, logits_mask=mask,
    )
    return np.asarray(res.tokens), int(res.steps), int(res.accept_sum)


def ref_generate(ea, static_tree, tree_name, lantern=False, lantern_k=0,
                 lantern_delta=0.0):
    with torch.no_grad():
        toks, comp, _ = ea.generate(
            prompt=["a tiny test prompt"], max_length=MAX_NEW,
            temperature=0.0, top_k=0, top_p=1.0, cfg=2.5,
            lantern=lantern, lantern_k=lantern_k, lantern_delta=lantern_delta,
            static_tree=static_tree,
            tree_choices=[list(p) for p in trees.TREE_LIBRARY[tree_name]],
        )
    return toks[0].numpy(), comp


def test_anole_static_tree_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63")
    ref, ref_comp = ref_generate(ea, True, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_anole_dynamic_tree_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "dynamic", None)
    ref, ref_comp = ref_generate(ea, False, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_anole_lantern_static_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63",
                                   lantern_k=4, lantern_delta=0.3)
    ref, ref_comp = ref_generate(ea, True, "mc_sim_7b_63", lantern=True,
                                 lantern_k=4, lantern_delta=0.3)
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)
