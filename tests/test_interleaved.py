"""EOS-terminated / interleaved generation.

Golden side: the only reference path with WORKING eos semantics is HF
``generate`` on the pristine Chameleon model (inference_solver.py:441 passes
eos_token_id=[8710]; the EAGLE loop's own check,
ea_model_lumina_mgpt.py:1010-1011, tests list-in-list membership and never
fires).  We pin our ``stop_ids`` engines against that HF behavior: generate
stops one past the first stop id, stop id included in the stream.

Interleaved side: a forced-script logits processor drives the engine through
text -> image-span -> text -> EOT, and ``decode_ids`` must split the
variable-length stream into the spans (inference_solver.py:474-499).
"""

from typing import NamedTuple

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import ar, spec
from lantern_tpu.engine.session import ChameleonSession
from lantern_tpu.models import chameleon as cham
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp
from lantern_tpu.utils import checkpoint as ckpt_utils
from tests.refmod import _imp

V = 8832
H, HEADS, L = 64, 4, 2
PROMPT = [8205, 8300, 777, 31]


@pytest.fixture(scope="module")
def pristine_rig():
    torch.manual_seed(0)
    mod = _imp("models.base_models.lumina_mgpt.modeling_lumina_mgpt")
    cfgmod = _imp("models.configs.configuration_lumina_mgpt")
    vq = {"embed_dim": 4, "num_embeddings": 16, "latent_channels": 32,
          "resolution": 16, "base_channels": 32, "channel_multiplier": [1],
          "num_res_blocks": 1, "attn_resolutions": []}
    rc = cfgmod.ChameleonConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=L, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, max_position_embeddings=256,
        rms_norm_eps=1e-5, swin_norm=True, vq_config=vq,
        vocabulary_map={"<image>": 1}, model_parallel_size=1,
        attention_bias=False, mlp_bias=False, initializer_range=0.2,
    )
    rc._attn_implementation = "eager"
    with torch.no_grad():
        base = mod.ChameleonForConditionalGeneration(rc).eval().float()
    if not hasattr(base, "generate"):
        # transformers >= 4.50 dropped GenerationMixin from PreTrainedModel;
        # the reference model predates that — mix it back in
        from transformers.generation import GenerationConfig, GenerationMixin

        ref_sample = type(base)._sample

        # newer GenerationMixin resolves _sample on the CLASS and no longer
        # passes `streamer`/`synced_gpus` positionally; the reference _sample
        # (written for older HF) requires them — shim the signature
        def _sample(self, input_ids, logits_processor, stopping_criteria,
                    generation_config, synced_gpus=False, streamer=None,
                    **kw):
            return ref_sample(self, input_ids, logits_processor,
                              stopping_criteria, generation_config,
                              synced_gpus, streamer, **kw)

        # the reference calls self._get_initial_cache_position(input_ids,
        # model_kwargs); the new mixin signature is (seq_length, device, mk)
        def _gicp(self, input_ids, model_kwargs):
            return GenerationMixin._get_initial_cache_position(
                self, input_ids.shape[1], input_ids.device, model_kwargs)

        # old callers pass cur_len/max_length kwargs the new mixin dropped
        def _hus(self, this_peer_finished, synced_gpus, device, **_ignored):
            return GenerationMixin._has_unfinished_sequences(
                self, this_peer_finished, synced_gpus, device)

        base.__class__ = type("GenChameleon", (type(base), GenerationMixin),
                              {"_sample": _sample,
                               "_get_initial_cache_position": _gicp,
                               "_has_unfinished_sequences": _hus})
        if getattr(base, "generation_config", None) is None:
            base.generation_config = GenerationConfig()

    my_cfg = configs.ModelConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_layers=L, num_heads=HEADS, num_kv_heads=HEADS,
        rms_norm_eps=1e-5, rope_kind="1d", rope_pairing="half",
        cond_kind="none", qk_norm=True, swin_norm=True,
        max_seq_len=128, dtype="float32",
    )
    sd = {k: v.detach().numpy() for k, v in base.state_dict().items()}
    params = ckpt_utils.chameleon_params_from_torch(sd, my_cfg,
                                                    dtype=jnp.float32)
    return base, my_cfg, params


def _flat_prompt():
    """Batch-1-equivalent TokenPrompt: both CFG rows carry the same prompt
    at plain arange positions; with cfg_scale=1.0 the combined logits ARE
    the cond row's, so the trajectory equals single-row HF generate."""
    t = np.asarray([PROMPT, PROMPT], np.int32)
    pos = np.broadcast_to(np.arange(len(PROMPT), dtype=np.int32), (2, len(PROMPT)))
    return spec.TokenPrompt(
        tokens=jnp.asarray(t), positions=jnp.asarray(pos),
        valid=jnp.ones((2, len(PROMPT)), bool),
        pos_diff=jnp.asarray(0, jnp.int32),
    )


def test_eos_golden_vs_reference_hf_generate(pristine_rig):
    base, my_cfg, params = pristine_rig
    ids = torch.tensor([PROMPT])
    with torch.no_grad():
        free = base.generate(ids, do_sample=False, max_new_tokens=24)
    free = free[0, len(PROMPT):].tolist()
    eos_id = free[8]
    first = free.index(eos_id)
    with torch.no_grad():
        ref = base.generate(ids, do_sample=False, max_new_tokens=24,
                            eos_token_id=eos_id, pad_token_id=1)
    ref = ref[0, len(PROMPT):].tolist()
    # HF stops one past the first stop id (stop included)
    assert ref == free[: first + 1]

    tp = _flat_prompt()
    warp = LogitsWarp(temperature=0.0)
    res = ar.generate_tokens(params, my_cfg, tp, 24, 1.0, warp,
                             jax.random.key(0), stop_ids=(eos_id,))
    ours = np.asarray(res.tokens)[: int(res.n_valid)].tolist()
    assert ours == ref

    # spec engine: greedy speculation is trajectory-exact vs AR, so it must
    # land on the identical variable-length stream
    dcfg = configs.drafter_config(my_cfg, total_tokens=10, depth=2, top_k=4)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg,
                                      params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=warp, cfg_scale=1.0, max_new=24, mode="static",
        stop_ids=(eos_id,),
    )
    sres = spec.generate(params, dparams, ecfg, my_cfg, dcfg,
                         trees.get_tree("chain"), None, None,
                         jax.random.key(0), token_prompt=tp)
    sours = np.asarray(sres.tokens)[: int(sres.n_valid)].tolist()
    assert sours == ref


def test_no_stop_hit_runs_to_budget(pristine_rig):
    base, my_cfg, params = pristine_rig
    tp = _flat_prompt()
    warp = LogitsWarp(temperature=0.0)
    res = ar.generate_tokens(params, my_cfg, tp, 12, 1.0, warp,
                             jax.random.key(0), stop_ids=(V - 1,))
    assert int(res.n_valid) == 12
    base_res = ar.generate_tokens(params, my_cfg, tp, 12, 1.0, warp,
                                  jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(res.tokens),
                                  np.asarray(base_res.tokens))


class ScriptFSM(NamedTuple):
    """Position-scripted logits processor: force token ``tid`` for the token
    generated at absolute cond position ``pos`` (scored by FSM rows whose
    ``positions`` argument equals pos-1 — same convention as LuminaGridFSM);
    other positions pass through."""

    script: tuple      # ((pos, tid), ...)
    vocab: int

    def __call__(self, logits, positions, start=None):
        neg = jnp.finfo(jnp.float32).min
        out = logits
        for pos, tid in self.script:
            row = jnp.full((self.vocab,), neg).at[tid].set(0.0)
            out = jnp.where((positions == pos - 1)[:, None], row[None], out)
        return out


def test_interleaved_script_spans():
    """text -> image span -> text -> EOT through session.generate(stop_ids):
    variable-length stream, decode_ids splits >= 2 text spans + 1 image,
    spec and AR paths identical under greedy."""
    cfg = configs.tiny_config(
        vocab_size=V, hidden_size=48, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True, block_size=32,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    sess = ChameleonSession.random(cfg, dcfg, family="anole", grid=(2, 2))
    L0 = len(cham.anole_token_prompt([12, 33, 7]).tokens[0])
    # generated stream indices -> forced ids (cond position = L0 + idx)
    script = (
        (L0 + 2, cham.IMAGE_START_ID),
        (L0 + 7, cham.IMAGE_END_ID),
        (L0 + 9, cham.ANOLE_EOT),
    )
    fsm = ScriptFSM(script=script, vocab=V)
    outs = {}
    for mode in ("ar", "static"):
        toks, stats = sess.generate(
            [12, 33, 7], max_new=16, temperature=0.0, cfg_scale=2.0,
            mode=mode, tree="chain", stop_ids=(cham.ANOLE_EOT,),
            logits_fn=fsm)
        assert len(toks) == 10, (mode, toks)
        assert toks[-1] == cham.ANOLE_EOT
        assert toks[2] == cham.IMAGE_START_ID and toks[7] == cham.IMAGE_END_ID
        outs[mode] = toks
    np.testing.assert_array_equal(outs["ar"], outs["static"])

    proc = sess.item_processor
    proc.decode_image = lambda toks: np.zeros((2, 2, 3), np.uint8)
    texts, images = proc.decode_ids(list(outs["ar"]))
    assert len(images) == 1
    assert len(texts) == 2          # text before the image, text + EOT after
    assert texts[0] == list(outs["ar"][:2])
    assert texts[1] == list(outs["ar"][8:])
