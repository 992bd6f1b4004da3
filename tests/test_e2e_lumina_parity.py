"""Golden end-to-end parity: our Lumina-mGPT speculative engine vs the
reference ea_model_lumina_mgpt.EaLumina_mGPT.generate, tiny tied weights.

Covers the risks test_lumina_engine's self-referential oracle cannot: the
sequential dual-KV CFG mode (/root/reference/models/ea_model_lumina_mgpt.py:
869-895), the grid-FSM logits processors applied inside drafter and verifier
(ibid:25-86, 599-605), and the fixed [8197, 8828, 8828] image header
(835-836) — all token-exact under greedy.

Our engine has ONE compiled path (batch-2 with per-branch position offsets);
the reference's two cfg_modes are *intended* to be the same computation
organized differently.  The parallel mode, however, carries a position-ids
bug: initialize_tree's NOTE (ea_model_lumina_mgpt.py:461) assumes the model
derives positions from the attention mask (cumsum-1), but the KV model uses
plain arange (modeling_lumina_mgpt_kv.py:1409-1417), so the parallel uncond
prefill writes the image header at RoPE positions prompt_len..prompt_len+2
while every later tree forward addresses it at 0..2 (tree_decoding:564).
The uncond stream's RoPE geometry is inconsistent and parallel diverges
from the reference's own default sequential mode
(test_reference_cfg_modes_disagree pins this).  We therefore token-match
the sequential oracle — the intended semantics and the reference default
(from_pretrained cfg_mode="sequential", ibid:359).

The reference samples its FIRST image token via torch.multinomial even with
do_sample=False (initialize_tree:497-499); the rig pins that draw to argmax
so greedy trajectories are deterministic on both sides.
"""

import json
import os
import unittest.mock as mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.models import chameleon as cham
from lantern_tpu.ops.acceptance import LanternSpec
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.utils import checkpoint as ckpt_utils
from tests.refmod import _imp

V = 8832            # covers ids 8197/8803/8828; image BPE ids 4..8195
H, HEADS, L = 64, 4, 2
N_CODES = cham.IMAGE_TOKEN_END - cham.IMAGE_TOKEN_START + 1   # 8192
MAX_NEW = 12
TEXT_TOKENS = [8205, 8300, 777, 31]
NEAREST_W = 12


def _strip_cuda():
    """Patch torch.tensor/arange to drop device='cuda' during reference
    construction (MultiModalLogitsProcessor and EaLumina_mGPT.__init__
    hardcode cuda tensors, ea_model_lumina_mgpt.py:38-44, 323-325)."""
    orig_tensor, orig_arange = torch.tensor, torch.arange

    def _tensor(*a, **kw):
        kw.pop("device", None)
        return orig_tensor(*a, **kw)

    def _arange(*a, **kw):
        kw.pop("device", None)
        return orig_arange(*a, **kw)

    return (mock.patch.object(torch, "tensor", _tensor),
            mock.patch.object(torch, "arange", _arange))


def _shrink_processor(p):
    """Rebuild a MultiModalLogitsProcessor's vocab tensors for the tiny V
    (the reference hardcodes voc_size=65536, ea_model_lumina_mgpt.py:31)."""
    vocab = torch.arange(V)
    p.vocab_list = list(range(V))
    p.vocab_tensor = vocab
    p.suppress_token_mask = ~((vocab >= cham.IMAGE_TOKEN_START)
                              & (vocab <= cham.IMAGE_TOKEN_END))
    return p


class _HFSuppressNonImage:
    """Stand-in for the solver's HF-style first-token processors
    (eagle_inference_solver.py:384-401): inside an open image span, suppress
    non-image tokens.  The golden prompts are always inside the span and
    never reach a grid boundary within MAX_NEW, so suppression is the whole
    observable behavior here."""

    def __call__(self, input_ids, scores):
        out = scores.clone()
        mask = torch.ones(scores.shape[-1], dtype=torch.bool)
        mask[cham.IMAGE_TOKEN_START: cham.IMAGE_TOKEN_END + 1] = False
        out[..., mask] = -float("inf")
        return out


def build_rig(tmp):
    torch.manual_seed(0)
    mod = _imp("models.kv_variants.modeling_lumina_mgpt_kv")
    cfgmod = _imp("models.configs.configuration_lumina_mgpt")
    cnets = _imp("models.drafters.cnets_lumina_mgpt")
    refcfg = _imp("models.configs.configs")

    vq = {"embed_dim": 4, "num_embeddings": 16, "latent_channels": 32,
          "resolution": 16, "base_channels": 32, "channel_multiplier": [1],
          "num_res_blocks": 1, "attn_resolutions": []}
    rc = cfgmod.ChameleonConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=256,
        rms_norm_eps=1e-5, swin_norm=True, vq_config=vq,
        vocabulary_map={"<image>": 1}, model_parallel_size=1,
        attention_bias=False, mlp_bias=False,
        initializer_range=0.2,
    )
    rc._attn_implementation = "eager"
    with torch.no_grad():
        base = mod.ChameleonForConditionalGeneration(rc).eval().float()

    econf = refcfg.EConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=1, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, rms_norm_eps=1e-5,
        max_position_embeddings=256, pretraining_tp=1,
        initializer_range=0.2,
        attention_dropout=0.0, rope_theta=10000.0, rope_scaling=None,
        attention_bias=False, mlp_bias=False, model_parallel_size=1,
        dropout=0.0,
    )
    econf._attn_implementation = "eager"
    p1, p2 = _strip_cuda()
    with p1, p2, torch.no_grad():
        drafter = cnets.Model(econf, bias=True, total_tokens=12, depth=3,
                              top_k=10).eval().float()
        drafter.embed_tokens.weight.copy_(base.model.embed_tokens.weight)

    econf_path = tmp / "drafter_config.json"
    with open(econf_path, "w") as f:
        # attn_implementation: newer transformers default _attn_implementation
        # to None on from_pretrained round trips; pin eager for CPU
        json.dump({**econf.to_dict(), "bias": True,
                   "attn_implementation": "eager"}, f)
    vqd = tmp / "ckpts/lumina_mgpt/vq_distances"
    vqd.mkdir(parents=True)
    rng = np.random.default_rng(0)
    nearest = np.argsort(rng.random((N_CODES, N_CODES)), axis=1)[:, :NEAREST_W]
    nearest = np.where(nearest == np.arange(N_CODES)[:, None],
                       (nearest + 1) % N_CODES, nearest).astype(np.int64)
    np.save(vqd / "top_8191_indices.npy", nearest)

    ref_ea = _imp("models.ea_model_lumina_mgpt")
    # EConfig.from_pretrained inside EaLumina_mGPT.__init__ loses
    # _attn_implementation (None) on this transformers version; map it to
    # the eager attention class the reference was written against
    cnets.CHAMELEON_ATTENTION_CLASSES.setdefault(None, cnets.ChameleonAttention)

    def make_ea(cfg_mode, eagle_version):
        p1, p2 = _strip_cuda()
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            with p1, p2:
                ea = ref_ea.EaLumina_mGPT(
                    base, "tiny", str(econf_path), total_token=12, depth=3,
                    top_k=10, threshold=1.0, cfg_mode=cfg_mode,
                    eagle_version=eagle_version, dtype=torch.float32,
                    ea_layer_state_dict=drafter.state_dict(),
                ).eval()
        finally:
            os.chdir(cwd)
        for plist in (ea.internal_logits_processors,
                      ea.drafter_logits_processors):
            _shrink_processor(plist[0])
        return ea

    # --- our side: tied weights ------------------------------------------
    my_cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_layers=L, num_heads=HEADS, num_kv_heads=HEADS,
        rms_norm_eps=1e-5, rope_kind="1d", rope_pairing="half",
        cond_kind="none", qk_norm=True, swin_norm=True,
        max_seq_len=128, dtype="float32",
    )
    sd = {k: v.detach().numpy() for k, v in base.state_dict().items()}
    params = ckpt_utils.chameleon_params_from_torch(sd, my_cfg, dtype=jnp.float32)
    params["nearest_latents"] = jnp.asarray(
        cham.shift_nearest_table(nearest.astype(np.int32), V))
    dcfg = configs.drafter_config(my_cfg, total_tokens=12, depth=3, top_k=10)
    assert not dcfg.model.first_layer_no_input_norm
    assert not dcfg.model.swin_norm            # drafters are always pre-norm
    dsd = {k: v.detach().numpy() for k, v in drafter.state_dict().items()}
    dparams = ckpt_utils.drafter_params_from_torch(dsd, dcfg, dtype=jnp.float32)
    return make_ea, my_cfg, dcfg, params, dparams


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    return build_rig(tmp_path_factory.mktemp("lumina_e2e"))


def my_generate(rig_data, mode, tree_name, lantern_k=0, lantern_delta=0.0):
    _, my_cfg, dcfg, params, dparams = rig_data
    tp = cham.lumina_token_prompt(TEXT_TOKENS, grid=(48, 48))
    assert [int(t) for t in np.asarray(tp.tokens[0, -3:])] == [8197, 8828, 8828]
    fsm = cham.LuminaGridFSM(w=48, h=48, image_start_idx=len(TEXT_TOKENS),
                             vocab_size=V)
    mask = jnp.asarray(cham.non_image_token_mask(V))
    # the reference Lumina EA implements ONLY do_sample=True; pin=0.5 makes
    # the stochastic path deterministic on both sides (see SpecDecodeConfig)
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=1.0, top_k=2000, top_p=1.0),
        cfg_scale=2.5,
        lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
        max_new=MAX_NEW, mode=mode, pin=0.5,
    )
    tspec = trees.get_tree(tree_name) if mode == "static" else None
    res = spec.generate(
        params, dparams, ecfg, my_cfg, dcfg, tspec,
        None, None, jax.random.key(0), token_prompt=tp, logits_mask=mask,
        logits_fn=fsm,
    )
    return np.asarray(res.tokens), int(res.steps), int(res.accept_sum)


def ref_generate(make_ea, cfg_mode, eagle_version, tree_name,
                 lantern=False, lantern_k=0, lantern_delta=0.0):
    import random

    ea = make_ea(cfg_mode, eagle_version)
    input_ids = torch.tensor([TEXT_TOKENS], dtype=torch.long)
    input_len = input_ids.shape[1] + 3          # + [8197, 8828, 8828]

    def pinned_multinomial(probs, n, **kw):
        # The reference draws its first token, the drafter's k proposals, and
        # the bonus token via multinomial (initialize_tree:497-499,
        # cnets_lumina_mgpt.py:941); pin every draw to deterministic top-n —
        # exactly what our engine computes under SpecDecodeConfig.pin.
        return probs.topk(n, dim=-1).indices

    with torch.no_grad(), \
            mock.patch.object(torch, "multinomial", pinned_multinomial), \
            mock.patch.object(random, "random", lambda: 0.5):
        out_ids, accept_list = ea.generate(
            input_ids, do_sample=True, max_new_tokens=MAX_NEW,
            max_length=200, cfg_scale=2.5, top_k=2000,
            logits_processors=[object(), _HFSuppressNonImage()],
            lantern=lantern, lantern_k=lantern_k, lantern_delta=lantern_delta,
            tree_choices=[list(p) for p in trees.TREE_LIBRARY[tree_name]],
        )
    comp = sum(a if isinstance(a, int) else int(a) for a in accept_list) / len(accept_list)
    return out_ids[0, input_len:].numpy(), comp


def test_lumina_static_full_loop_parity(rig):
    make_ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63")
    ref, ref_comp = ref_generate(make_ea, "sequential", 1, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_lumina_dynamic_full_loop_parity(rig):
    make_ea = rig[0]
    mine, steps, acc = my_generate(rig, "dynamic", None)
    ref, ref_comp = ref_generate(make_ea, "sequential", 2, "mc_sim_7b_63")
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)


def test_reference_cfg_modes_disagree(rig):
    """Pin the reference-internal parallel-vs-sequential divergence (the
    position-ids bug documented in the module docstring).  If a reference
    update ever fixes it, this fails and the parity tests above should be
    re-parametrized over both cfg_modes."""
    make_ea = rig[0]
    seq, _ = ref_generate(make_ea, "sequential", 1, "mc_sim_7b_63")
    par, _ = ref_generate(make_ea, "parallel", 1, "mc_sim_7b_63")
    assert seq.tolist() != par.tolist()


def test_lumina_lantern_static_full_loop_parity(rig):
    make_ea = rig[0]
    mine, steps, acc = my_generate(rig, "static", "mc_sim_7b_63",
                                   lantern_k=4, lantern_delta=0.3)
    ref, ref_comp = ref_generate(make_ea, "sequential", 1, "mc_sim_7b_63",
                                 lantern=True, lantern_k=4, lantern_delta=0.3)
    n = min(MAX_NEW, len(ref))
    np.testing.assert_array_equal(mine[:n], ref[:n])
    np.testing.assert_allclose(acc / steps, ref_comp, rtol=1e-6)
