"""THE integration test: our full speculative engine vs the reference
EaModel.generate, end to end, on a tiny tied-weight LlamaGen model.

Greedy decoding is deterministic on both sides, so the committed token
stream, the number of verify steps, and the mean accept length must match
exactly.  This jointly validates prompt embedding, CFG batching, drafting,
tree verification, KV rollback, and the update loop against the reference's
host-loop implementation.
"""

import json
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.utils import checkpoint as ckpt_utils
from tests.refmod import _imp, load_ref_kv_llamagen
from tests.test_transformer import tiny_ref_config

V, H, HEADS, L = 128, 64, 4, 2
CAPTION_DIM = 32
BLOCK = 256          # reference drafter hardcodes t2i -> block 256 / cls 119
MAX_NEW = 20


class _StubT5:
    """Deterministic caption 'embeddings' shared by both sides."""

    def __init__(self, dim):
        self.dim = dim

    def embeddings(self, prompt):
        # fixed seed: python str hash is per-process randomized, and random
        # captions occasionally land on near-tie logits where torch vs XLA
        # f32 accumulation order flips an argmax
        rng = np.random.default_rng(12345)
        emb = rng.normal(size=(1, 120, self.dim)).astype(np.float32)
        mask = np.ones((1, 120), np.int64)
        mask[0, 17:] = 0  # emulate a short caption
        return emb, mask

    def get_text_embeddings(self, prompts):
        emb, mask = self.embeddings(prompts[0])
        return torch.tensor(emb), torch.tensor(mask)


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    torch.manual_seed(0)
    ref_kv = load_ref_kv_llamagen()
    ref_ea = _imp("models.ea_model_llamagen")
    cnets = _imp("models.drafters.cnets_llamagen")
    cfgmod = _imp("models.configs.configs")

    # --- tiny base model (reference), T5 stubbed out -------------------
    my_cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_layers=L, num_heads=HEADS, num_kv_heads=HEADS,
        rms_norm_eps=1e-5, rope_kind="2d", rope_pairing="interleaved",
        rope_base=10000.0, block_size=BLOCK,
        cond_kind="caption", cls_token_num=120, caption_dim=CAPTION_DIM,
        max_seq_len=120 + BLOCK + 74, dtype="float32",
    )
    rc = tiny_ref_config(ref_kv, my_cfg, "t2i")
    rc.initializer_range = 0.2   # wide init: random tiny models are otherwise
                                 # near-degenerate, with sub-float-noise ties
                                 # in top-k rank order (both orders are valid;
                                 # parity needs a tie-free trajectory)
    orig_t5 = ref_kv.T5Embedder
    ref_kv.T5Embedder = lambda **kw: _StubT5(CAPTION_DIM)
    try:
        with torch.no_grad():
            base = ref_kv.LlamaForCausalLM(rc).eval().float()
    finally:
        ref_kv.T5Embedder = orig_t5
    base.t5_model = _StubT5(CAPTION_DIM)

    # --- tiny drafter (reference) --------------------------------------
    econf = cfgmod.EConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=1, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, rms_norm_eps=1e-5,
        max_position_embeddings=512, input_type="t2i", pretraining_tp=1,
        initializer_range=0.2,
    )
    with torch.no_grad():
        drafter = cnets.Model(econf, bias=True, total_tokens=12, depth=3,
                              top_k=10).eval().float()
        # share the base embedding (load_emb semantics)
        drafter.embed_tokens.weight.copy_(base.model.embed_tokens.weight)

    # --- EaModel assembly (bypassing from_pretrained's file IO) --------
    econf_path = tmp / "drafter_config.json"
    with open(econf_path, "w") as f:
        json.dump({**econf.to_dict(), "bias": True}, f)
    vqd = tmp / "ckpts/llamagen/vq_distances"
    vqd.mkdir(parents=True)
    rng = np.random.default_rng(0)
    cb = rng.normal(size=(V, 4))
    d = ((cb[:, None] - cb[None, :]) ** 2).sum(-1)
    nearest = np.argsort(d, axis=1)[:, 1:].astype(np.int64)
    # (reference ships uint16 tables; torch-CPU lacks uint16 masked_fill, so
    # the test stores int64 — same values)
    np.save(vqd / "top_16383_indices.npy", nearest)

    import os

    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        ea = ref_ea.EaModel(
            base, "tiny", str(econf_path), total_token=12, depth=3, top_k=10,
            threshold=1.0, ea_layer_state_dict=drafter.state_dict(),
        ).eval()
    finally:
        os.chdir(cwd)

    # --- our side: tied weights ----------------------------------------
    sd = {k: v.detach().numpy() for k, v in base.state_dict().items()}
    params = ckpt_utils.llamagen_params_from_torch(sd, my_cfg, dtype=jnp.float32)
    params["nearest_latents"] = jnp.asarray(nearest.astype(np.int32))
    dcfg = configs.drafter_config(my_cfg, total_tokens=12, depth=3, top_k=10)
    assert dcfg.model.cls_token_num == 119
    dcfg = configs.DrafterConfig(
        model=dcfg.model.replace(block_size=BLOCK),
        total_tokens=12, depth=3, top_k=10,
    )
    dsd = {k: v.detach().numpy() for k, v in ea.ea_layer.state_dict().items()}
    dparams = ckpt_utils.drafter_params_from_torch(dsd, dcfg, dtype=jnp.float32)
    return ea, my_cfg, dcfg, params, dparams


def my_generate(rig_data, mode, tree_name, lantern_k=0, lantern_delta=0.0):
    ea, my_cfg, dcfg, params, dparams = rig_data
    prompt = "a tiny test prompt"
    stub = _StubT5(CAPTION_DIM)
    emb, mask = stub.embeddings(prompt)
    # reference flips so pads are left and zeros pad rows
    from lantern_tpu.utils.t5 import flip_for_left_padding

    emb_f, mask_f = flip_for_left_padding(emb, mask)
    cond = jnp.asarray(emb_f)
    uncond = jnp.asarray(params["cond"]["uncond"])[None]
    pv = np.ones((2, my_cfg.max_seq_len), bool)
    pv[:, :120] = mask_f.astype(bool)

    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.5,
        lantern=__import__("lantern_tpu.ops.acceptance", fromlist=["x"]).LanternSpec(
            k=lantern_k, delta=lantern_delta),
        max_new=MAX_NEW, mode=mode,
    )
    tspec = trees.get_tree(tree_name) if mode == "static" else None
    res = spec.generate(
        params, dparams, ecfg, my_cfg, dcfg, tspec,
        cond, uncond, jax.random.key(0), prefix_valid=jnp.asarray(pv),
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


def test_static_tree_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63")
    ref, ref_comp = ref_generate(ea, True, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_dynamic_tree_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "dynamic", None)
    ref, ref_comp = ref_generate(ea, False, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_lantern_static_full_loop_parity(rig):
    ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63",
                                   lantern_k=8, lantern_delta=0.3)
    ref, ref_comp = ref_generate(ea, True, "mc_sim_7b_63", lantern=True,
                                 lantern_k=8, lantern_delta=0.3)
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)
