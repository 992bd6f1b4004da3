"""Drafter parity vs the reference cnets model (torch CPU, tied weights):
forward pass and full greedy static-tree drafting (topK_genrate_v1)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.kv import KVCache
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp
from tests.refmod import _imp

V, H, HEADS, BLOCK = 128, 64, 4, 16


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cnets = _imp("models.drafters.cnets_llamagen")
    cfgmod = _imp("models.configs.configs")
    econf = cfgmod.EConfig(
        vocab_size=V, hidden_size=H, intermediate_size=192,
        num_hidden_layers=1, num_attention_heads=HEADS,
        num_key_value_heads=HEADS, rms_norm_eps=1e-5,
        max_position_embeddings=64,
        # custom input_type so the reference keeps our small block_size
        input_type="custom", block_size=BLOCK, rope_base=10000,
        cls_token_num=0, pretraining_tp=1,
    )
    with torch.no_grad():
        ref = cnets.Model(econf, bias=True, total_tokens=25, depth=5, top_k=10)
        ref = ref.eval().float()
    ref.init_tree()
    ref.diff_device = False

    base = configs.tiny_config(
        vocab_size=V, hidden_size=H, num_heads=HEADS, num_layers=1,
        cond_kind="label", block_size=BLOCK,
    )
    dcfg = configs.drafter_config(base, total_tokens=25, depth=5, top_k=10)
    assert dcfg.model.cls_token_num == 0

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    L = 1
    params = {
        "layers": {
            "attn_norm": jnp.ones((L, H)),   # layer 0: skipped
            "wq": jnp.asarray(sd["layers.0.self_attn.q_proj.weight"].T)[None],
            "wk": jnp.asarray(sd["layers.0.self_attn.k_proj.weight"].T)[None],
            "wv": jnp.asarray(sd["layers.0.self_attn.v_proj.weight"].T)[None],
            "wo": jnp.asarray(sd["layers.0.self_attn.o_proj.weight"].T)[None],
            "ffn_norm": jnp.asarray(sd["layers.0.post_attention_layernorm.weight"])[None],
            "w_gate": jnp.asarray(sd["layers.0.mlp.gate_proj.weight"].T)[None],
            "w_up": jnp.asarray(sd["layers.0.mlp.up_proj.weight"].T)[None],
            "w_down": jnp.asarray(sd["layers.0.mlp.down_proj.weight"].T)[None],
        },
        "fc_w": jnp.asarray(sd["fc.weight"].T),
        "fc_b": jnp.asarray(sd["fc.bias"]),
        "embed": jnp.asarray(sd["embed_tokens.weight"]),
    }
    head = torch.nn.Linear(H, V, bias=False)
    with torch.no_grad():
        head.weight.normal_(0, 0.5)
    lm_head = jnp.asarray(head.weight.detach().numpy().T)
    return ref, dcfg, params, head, lm_head


def test_drafter_forward_parity(pair):
    ref, dcfg, params, head, lm_head = pair
    rng = np.random.default_rng(0)
    Tn = 6
    hidden = rng.normal(size=(2, Tn, H)).astype(np.float32)
    toks = rng.integers(0, V, size=(2, Tn))
    with torch.no_grad():
        out_ref = ref(torch.tensor(hidden), torch.tensor(toks))
    rope = tfm.make_rope_tables(dcfg.model)
    kv = KVCache.create(dcfg.model, 2, max_len=64)
    out, kv = drf.extend(
        params, dcfg, rope, kv, jnp.asarray(toks), jnp.asarray(hidden), Tn
    )
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-5)
    assert int(kv.length) == Tn


@pytest.mark.parametrize("tree_name", ["mc_sim_7b_63", "reverse_balanced_25"])
def test_greedy_static_draft_parity(pair, tree_name):
    ref, dcfg, params, head, lm_head = pair
    spec = trees.get_tree(tree_name)
    rng = np.random.default_rng(1)
    Tn = 5
    cfg_scale = 2.0
    hidden = rng.normal(size=(2, Tn, H)).astype(np.float32)
    # input_ids includes the leading slot the reference drops ([:, 1:])
    ids = rng.integers(0, V, size=(1, Tn + 1))
    ids2 = np.broadcast_to(ids, (2, Tn + 1)).copy()

    ref.init_tree_v1([list(p) for p in spec.paths])
    ref.reset_kv()
    with torch.no_grad():
        ss_token, ss_prob, ss_op = ref.topK_genrate_v1(
            torch.tensor(hidden), torch.tensor(ids2), head, None, cfg_scale
        )

    rope = tfm.make_rope_tables(dcfg.model)
    kv = KVCache.create(dcfg.model, 2, max_len=64)
    out, kv = drf.extend(
        params, dcfg, rope, kv, jnp.asarray(ids2[:, 1:]), jnp.asarray(hidden), Tn
    )
    draft, kv = drf.draft_static(
        params, dcfg, spec, rope, kv, out[:, -1:],
        lm_head, cfg_scale, LogitsWarp(temperature=0.0), jax.random.key(0),
    )
    np.testing.assert_array_equal(np.asarray(draft.ss_token), ss_token.numpy())
    np.testing.assert_allclose(
        np.asarray(draft.ss_prob), ss_prob.numpy(), rtol=2e-3, atol=1e-4
    )


def test_dynamic_children_table_complete():
    """Every non-root node appears exactly once in the children table, and
    the root's rank-0 child slot is occupied (regression: the root's
    self-referential parent pointer used to shift its children's sibling
    ranks by one, dropping the K-th child)."""
    import numpy as np

    from lantern_tpu import configs
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.kv import KVCache
    from lantern_tpu.ops.sampling import LogitsWarp

    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=12, depth=3, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    drope = tfm.make_rope_tables(dcfg.model)
    kv = KVCache.create(dcfg.model, 2).commit(jnp.int32(5))
    root_hidden = jax.random.normal(jax.random.key(2), (2, 1, cfg.hidden_size))
    draft, _ = drf.draft_dynamic(
        dparams, dcfg, drope, kv, root_hidden, jnp.int32(3),
        params["lm_head"], 2.0, LogitsWarp(temperature=1.0, top_k=50),
    )
    ch = np.asarray(draft.children)
    N1 = ch.shape[0]
    listed = ch[ch >= 0]
    assert sorted(listed.tolist()) == list(range(1, N1)), (
        "children table must list every non-root slot exactly once")
    assert ch[0, 0] >= 0, "root's rank-0 child missing"
    # ranks are dense: no -1 before a valid child in any row
    for r in range(N1):
        row = ch[r]
        seen_pad = False
        for v in row:
            if v < 0:
                seen_pad = True
            else:
                assert not seen_pad, f"gap in sibling ranks of row {r}: {row}"


def test_draft_fsm_positions_are_row_cond_positions():
    """The FSM/logits_fn receives each row's own cond position: kv.length
    for the root row, kv.length + d + 1 for level-d rows (the drafter
    stream is shifted one left of the cond stream).  Regression for an
    off-by-one that applied grid constraints one position early."""
    import numpy as np

    from lantern_tpu import configs, trees
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.kv import KVCache
    from lantern_tpu.ops.sampling import LogitsWarp

    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=3, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    drope = tfm.make_rope_tables(dcfg.model)
    L0 = 7
    kv = KVCache.create(dcfg.model, 2).commit(jnp.int32(L0))
    root_hidden = jax.random.normal(jax.random.key(2), (2, 1, cfg.hidden_size))

    calls = []

    def recorder(logits, positions):
        calls.append(np.unique(np.asarray(positions)).tolist())
        return logits

    spec = trees.get_tree("mc_sim_7b_63")
    drf.draft_static(
        dparams, dcfg, spec, drope, kv, root_hidden, params["lm_head"],
        2.0, LogitsWarp(temperature=0.0), jax.random.key(3),
        logits_fn=recorder,
    )
    # root call at kv.length; level-d calls at kv.length + d + 1
    assert calls[0] == [L0]
    for d, got in enumerate(calls[1:]):
        assert got == [L0 + d + 1], (d, got)

    calls.clear()
    drf.draft_dynamic(
        dparams, dcfg, drope, kv, root_hidden, jnp.int32(3),
        params["lm_head"], 2.0, LogitsWarp(temperature=0.0),
        logits_fn=recorder,
    )
    assert calls[0] == [L0]
    for d, got in enumerate(calls[1:]):
        assert got == [L0 + d + 1], (d, got)
