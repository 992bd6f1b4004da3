"""Golden parity tests: acceptance rules vs the reference verifier.

The reference rules live as methods on EaModel (models/ea_model_llamagen.py);
we call them unbound with a duck-typed `self` carrying the nearest-latent
table, on torch CPU.  Stochastic rules consume one uniform per trial from
python `random.random()`; we pin it to a constant so the flat draw stream and
our per-(level, path) indexed draws coincide.
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu import trees
from lantern_tpu.ops import acceptance as acc
from lantern_tpu.ops.sampling import LogitsWarp
from tests.refmod import load_ref_ea_llamagen, load_ref_utils

V = 64
NEIGH_K = 8

# jit with the static specs hashed so each config compiles once across the
# whole parameter matrix (eager tracing of the unrolled level walk is slow).
_greedy = jax.jit(acc.greedy_verify, static_argnames=("lantern",))
_stoch = jax.jit(acc.stochastic_verify, static_argnames=("warp", "lantern"))


@pytest.fixture(scope="module")
def ref_ea():
    return load_ref_ea_llamagen()


@pytest.fixture(scope="module")
def nearest():
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(V, 4))
    d = ((emb[:, None] - emb[None, :]) ** 2).sum(-1)
    order = np.argsort(d, axis=1)[:, 1:]  # drop self
    return order.astype(np.int64)


def fake_self(nearest):
    return types.SimpleNamespace(nearest_latents=nearest.copy())


def draftlike_tokens(rng, spec, collide=False):
    """Assign tokens the way a real drafter does: children of each node are
    distinct (sampled without replacement), so token paths identify slot
    paths.  ``collide=True`` forces one sibling collision to exercise the
    reference's dedup walk."""
    toks = np.zeros((spec.num_nodes,), np.int64)
    toks[0] = rng.integers(0, V)
    for s in range(spec.num_nodes):
        kids = [k for k in spec.children[s] if k >= 0]
        if kids:
            vals = rng.choice(V, size=len(kids), replace=False)
            for k, v in zip(kids, vals):
                toks[k] = v
    if collide and spec.children.shape[1] >= 2 and spec.children[0, 1] >= 0:
        toks[spec.children[0, 1]] = toks[spec.children[0, 0]]
    return toks


def make_case(seed, tree_name="mc_sim_7b_63", collide=True):
    """Draft-like tree tokens + base logits shaped like a real verification
    step."""
    rng = np.random.default_rng(seed)
    spec = trees.get_tree(tree_name)
    tree_tokens = draftlike_tokens(rng, spec, collide)
    ext = np.concatenate([tree_tokens, [-1]])
    candidates = ext[spec.retrieve_indices]            # [P, D]
    # per-NODE logits gathered along paths (the real verification layout)
    node_logits = rng.normal(size=(spec.num_nodes, V)).astype(np.float32) * 3
    logits = node_logits[np.where(spec.retrieve_indices < 0, 0,
                                  spec.retrieve_indices)]
    return spec, tree_tokens, candidates, logits, node_logits


def _accepted_tokens(candidates, best, alen):
    return candidates[int(best), : int(alen) + 1]


# ---------------------------------------------------------------------------
# greedy (strict + lantern)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(5))
def test_greedy_strict_matches_reference(ref_ea, nearest, seed):
    spec, toks, cand, logits, _ = make_case(seed)
    me_best, me_len, me_bonus = _greedy(jnp.asarray(logits), jnp.asarray(cand))

    self_ = fake_self(nearest)
    rb, rl, rbonus = ref_ea.EaModel.evaluate_posterior(
        self_, torch.tensor(logits), torch.tensor(cand), None, lantern=False
    )
    assert int(me_len) == int(rl)
    np.testing.assert_array_equal(
        _accepted_tokens(cand, me_best, me_len), _accepted_tokens(cand, rb, rl)
    )
    np.testing.assert_allclose(np.asarray(me_bonus), rbonus.numpy(), rtol=1e-5)


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("delta", [0.05, 0.5, 2.0])
def test_greedy_lantern_matches_reference(ref_ea, nearest, seed, delta):
    spec, toks, cand, logits, _ = make_case(seed)
    lant = acc.LanternSpec(k=NEIGH_K, delta=delta)
    me_best, me_len, me_bonus = _greedy(
        jnp.asarray(logits), jnp.asarray(cand), jnp.asarray(nearest), lantern=lant
    )
    self_ = fake_self(nearest)
    rb, rl, rbonus = ref_ea.EaModel.evaluate_posterior(
        self_, torch.tensor(logits), torch.tensor(cand), None,
        lantern=True, lantern_k=NEIGH_K, lantern_delta=delta,
    )
    assert int(me_len) == int(rl), (seed, delta)
    np.testing.assert_array_equal(
        _accepted_tokens(cand, me_best, me_len), _accepted_tokens(cand, rb, rl)
    )
    np.testing.assert_allclose(np.asarray(me_bonus), rbonus.numpy(), rtol=1e-5)


# ---------------------------------------------------------------------------
# stochastic multi-round rejection (q == 1, EAGLE-2 style)
# ---------------------------------------------------------------------------

class _ConstRandom:
    def __init__(self, u):
        self.u = u

    def random(self):
        return self.u


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("u", [0.0, 0.2, 0.6, 0.999])
@pytest.mark.parametrize("use_lantern", [False, True])
def test_stochastic_matches_reference(ref_ea, nearest, monkeypatch, seed, u, use_lantern):
    spec, toks, cand, logits, _ = make_case(seed)
    warp = LogitsWarp(temperature=1.0, top_k=0, top_p=1.0)
    lant = acc.LanternSpec(k=NEIGH_K, delta=0.3) if use_lantern else acc.LanternSpec()

    D, P = spec.path_len, spec.num_paths
    uniforms = jnp.full((D, P), u, dtype=jnp.float32)
    me_best, me_len, me_dist = _stoch(
        None, jnp.asarray(logits), jnp.asarray(cand), warp,
        nearest=jnp.asarray(nearest), lantern=lant, uniforms=uniforms,
    )

    monkeypatch.setattr(ref_ea, "random", _ConstRandom(u))
    ru = load_ref_utils()
    proc = ru.prepare_logits_processor(temperature=1.0, top_k=0, top_p=1.0)
    self_ = fake_self(nearest)
    rb, rl, rdist = ref_ea.EaModel.evaluate_posterior(
        self_, torch.tensor(logits), torch.tensor(cand), proc,
        lantern=use_lantern, lantern_k=NEIGH_K, lantern_delta=0.3,
    )
    assert int(me_len) == int(rl), (seed, u, use_lantern)
    np.testing.assert_array_equal(
        _accepted_tokens(cand, me_best, me_len), _accepted_tokens(cand, rb, rl)
    )
    np.testing.assert_allclose(np.asarray(me_dist), rdist.numpy(), rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# stochastic multi-draft (EAGLE-1 static tree, drafter q)
# ---------------------------------------------------------------------------

def make_multidraft_case(seed, tree_name="mc_sim_7b_63"):
    rng = np.random.default_rng(100 + seed)
    spec = trees.get_tree(tree_name)
    n = spec.num_nodes
    tree_tokens = draftlike_tokens(rng, spec)
    ext = np.concatenate([tree_tokens, [-1]])
    candidates = ext[spec.retrieve_indices]
    node_logits = rng.normal(size=(n, V)).astype(np.float32) * 3
    logits = node_logits[np.where(spec.retrieve_indices < 0, 0,
                                  spec.retrieve_indices)]

    # drafter distributions per level: rows = internal nodes at that depth
    internal_slots = np.unique(spec.parent_slot[1:])
    depth_of = spec.depth[internal_slots]
    n_levels = int(depth_of.max()) + 1
    level_probs = []
    for d in range(n_levels):
        rows = int((depth_of == d).sum())
        p = rng.random((rows, V)).astype(np.float32)
        p /= p.sum(-1, keepdims=True)
        level_probs.append(p)

    # per-node residual q, gathered along paths like generate_candidates
    node_q = rng.random(n).astype(np.float32)
    node_q[0] = 1.0
    q_ext = np.concatenate([node_q, [1.0]]).astype(np.float32)
    q_probs = q_ext[spec.retrieve_indices]
    return spec, tree_tokens, candidates, logits, level_probs, q_probs, node_logits, node_q


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("u", [0.0, 0.4, 0.999])
@pytest.mark.parametrize("use_lantern", [False, True])
def test_multidraft_matches_reference(ref_ea, nearest, monkeypatch, seed, u, use_lantern):
    spec, toks, cand, logits, level_probs, q_probs, _, _ = make_multidraft_case(seed)
    warp = LogitsWarp(temperature=1.0, top_k=0, top_p=1.0)
    lant = acc.LanternSpec(k=NEIGH_K, delta=0.3) if use_lantern else acc.LanternSpec()

    D, P = spec.path_len, spec.num_paths
    me_best, me_len, me_dist = _stoch(
        None, jnp.asarray(logits), jnp.asarray(cand), warp,
        nearest=jnp.asarray(nearest), lantern=lant,
        q_probs=jnp.asarray(q_probs),
        level_probs=tuple(jnp.asarray(p) for p in level_probs),
        p_indices=jnp.asarray(spec.p_indices),
        b_indices=jnp.asarray(spec.b_indices),
        tree_tokens=jnp.asarray(toks),
        uniforms=jnp.full((D, P), u, dtype=jnp.float32),
    )

    monkeypatch.setattr(ref_ea, "random", _ConstRandom(u))
    ru = load_ref_utils()
    ref_buf = ru.generate_tree_buffers(
        [list(p) for p in spec.paths], device="cpu"
    )
    proc = ru.prepare_logits_processor(temperature=1.0, top_k=0, top_p=1.0)
    self_ = fake_self(nearest)
    tree_candidates = torch.tensor(toks)[None].repeat(2, 1)
    rb, rl, rdist = ref_ea.EaModel.evaluate_posterior_v1(
        self_, torch.tensor(logits), torch.tensor(cand), proc,
        torch.tensor(q_probs),
        [torch.tensor(p) for p in level_probs],
        ref_buf["p_indices"], tree_candidates, ref_buf["b_indices"],
        lantern=use_lantern, lantern_k=NEIGH_K, lantern_delta=0.3,
    )
    assert int(me_len) == int(rl), (seed, u, use_lantern)
    np.testing.assert_array_equal(
        _accepted_tokens(cand, me_best, me_len), _accepted_tokens(cand, rb, rl)
    )
    np.testing.assert_allclose(np.asarray(me_dist), rdist.numpy(), rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# tree-walk verifier equivalence (the engine's fast path)
# ---------------------------------------------------------------------------

_stoch_tree = jax.jit(acc.stochastic_verify_tree,
                      static_argnames=("depth", "warp", "lantern",
                                       "batch_warp"))


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("u", [0.0, 0.4, 0.999])
@pytest.mark.parametrize("variant", ["q1", "multidraft", "lantern"])
def test_tree_walk_equals_path_walk(nearest, seed, u, variant):
    """The O(depth x children) tree walk must reproduce the O(depth x paths)
    path-table walk exactly (same pinned uniforms)."""
    if variant == "multidraft":
        (spec, toks, cand, logits, level_probs, q_probs,
         node_logits, node_q) = make_multidraft_case(seed)
    else:
        spec, toks, cand, logits, node_logits = make_case(seed, collide=False)
        level_probs = q_probs = node_q = None
    warp = LogitsWarp(temperature=1.0, top_k=0, top_p=1.0)
    lant = (acc.LanternSpec(k=NEIGH_K, delta=0.3) if variant == "lantern"
            else acc.LanternSpec())
    D, P = spec.path_len, spec.num_paths

    pb, pl_, pd = _stoch(
        None, jnp.asarray(logits), jnp.asarray(cand), warp,
        nearest=jnp.asarray(nearest), lantern=lant,
        q_probs=None if q_probs is None else jnp.asarray(q_probs),
        level_probs=None if level_probs is None else tuple(jnp.asarray(x) for x in level_probs),
        p_indices=jnp.asarray(spec.p_indices) if q_probs is not None else None,
        b_indices=jnp.asarray(spec.b_indices) if q_probs is not None else None,
        tree_tokens=jnp.asarray(toks) if q_probs is not None else None,
        uniforms=jnp.full((D, P), u, jnp.float32),
    )

    C = spec.children.shape[1]
    path, alen, dist = _stoch_tree(
        None, jnp.asarray(node_logits), jnp.asarray(toks),
        jnp.asarray(spec.children), depth=spec.max_depth, warp=warp,
        nearest=jnp.asarray(nearest), lantern=lant,
        node_q=None if node_q is None else jnp.asarray(node_q),
        level_probs=None if level_probs is None else tuple(jnp.asarray(x) for x in level_probs),
        node_level_row=jnp.asarray(spec.inlevel_rank),
        uniforms=jnp.full((spec.max_depth, C), u, jnp.float32),
    )

    assert int(alen) == int(pl_), (variant, seed, u)
    # accepted tokens identical
    exp = cand[int(pb), : int(pl_) + 1]
    got = np.asarray(jnp.asarray(toks)[np.asarray(path)[: int(alen) + 1]])
    np.testing.assert_array_equal(got, exp)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(pd), rtol=2e-4, atol=1e-6)


class TestKthLargest:
    """Bit-search top-k threshold (sampling.kth_largest) vs sort oracle."""

    def test_exact_vs_sort(self):
        import numpy as np
        import jax.numpy as jnp

        from lantern_tpu.ops.sampling import apply_top_k, kth_largest

        rng = np.random.default_rng(0)
        for trial in range(5):
            x = (rng.normal(size=(5, 777)) * [0.1, 10, 1000, 1, 5][trial]
                 ).astype(np.float32)
            if trial == 2:
                x[:, ::3] = -1.5          # heavy ties
            if trial == 3:
                x = -np.abs(x)            # all-negative
            if trial == 4:
                x[:, :50] = np.finfo(np.float32).min
            for k in (1, 2, 137, 500, 776):
                want = np.sort(x, axis=-1)[:, ::-1][:, k - 1 : k]
                got = np.asarray(kth_largest(jnp.asarray(x), k))
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"t={trial} k={k}")
        # masking path equivalence at the bench operating point (top-2000)
        x = rng.normal(size=(3, 16384)).astype(np.float32)
        a = np.asarray(apply_top_k(jnp.asarray(x), 2000))
        kth = np.sort(x, axis=-1)[:, ::-1][:, 1999:2000]
        b = np.where(x < kth, np.finfo(np.float32).min, x)
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# traced (k, delta) operating-point override
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("k_eff,delta_eff", [(3, 0.2), (5, 0.45), (8, 5.0)])
def test_greedy_runtime_point_equals_static(nearest, k_eff, delta_eff):
    """greedy_verify with a traced LanternRT(k', d') must equal a statically
    compiled LanternSpec(k', d') — one compile serves the whole sweep."""
    spec, toks, cand, logits, _ = make_case(3, collide=False)
    nj = jnp.asarray(nearest)
    static = _greedy(jnp.asarray(logits), jnp.asarray(cand), nj,
                     lantern=acc.LanternSpec(k=k_eff, delta=delta_eff))
    wide = acc.LanternSpec(k=NEIGH_K, delta=0.123)   # compiled table width
    rt = wide.runtime(k_eff=k_eff, delta_eff=delta_eff)
    dyn = jax.jit(acc.greedy_verify, static_argnames=("lantern",))(
        jnp.asarray(logits), jnp.asarray(cand), nj, lantern=wide, rt=rt)
    assert int(dyn[0]) == int(static[0])
    assert int(dyn[1]) == int(static[1])
    np.testing.assert_allclose(np.asarray(dyn[2]), np.asarray(static[2]))


@pytest.mark.parametrize("u", [0.0, 0.4, 0.999])
@pytest.mark.parametrize("k_eff,delta_eff", [(3, 0.2), (5, 5.0), (8, 20.0)])
def test_tree_walk_runtime_point_equals_static(nearest, u, k_eff, delta_eff):
    (spec, toks, cand, logits, level_probs, q_probs,
     node_logits, node_q) = make_multidraft_case(5)
    warp = LogitsWarp(temperature=1.0, top_k=0, top_p=1.0)
    nj = jnp.asarray(nearest)
    C = spec.children.shape[1]
    uniforms = jnp.full((spec.max_depth, C), u, jnp.float32)
    common = dict(
        node_q=jnp.asarray(node_q),
        level_probs=tuple(jnp.asarray(x) for x in level_probs),
        node_level_row=jnp.asarray(spec.inlevel_rank),
        uniforms=uniforms,
    )
    sp, sl, sd = _stoch_tree(
        None, jnp.asarray(node_logits), jnp.asarray(toks),
        jnp.asarray(spec.children), depth=spec.max_depth, warp=warp,
        nearest=nj, lantern=acc.LanternSpec(k=k_eff, delta=delta_eff),
        **common)
    wide = acc.LanternSpec(k=NEIGH_K, delta=0.123)
    dp, dl, dd = _stoch_tree(
        None, jnp.asarray(node_logits), jnp.asarray(toks),
        jnp.asarray(spec.children), depth=spec.max_depth, warp=warp,
        nearest=nj, lantern=wide,
        rt=wide.runtime(k_eff=k_eff, delta_eff=delta_eff),
        **common)
    assert int(dl) == int(sl)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(sp))
    np.testing.assert_allclose(np.asarray(dd), np.asarray(sd),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("seed", range(2))
def test_tree_walk_batch_warp_mode_agreement(nearest, seed):
    """Pinned batch_warp modes produce identical walks (advisor r4: the
    size-heuristic mode flip must not silently shift seed-pinned streams).
    The warp/softmax is row-wise either way; this asserts the batched
    [N+1, V] pass and the per-visited-row chain agree bitwise on the
    accepted path, length, and node_dist at a representative multidraft
    geometry (active top-k warp, LANTERN on)."""
    (spec, toks, cand, logits, level_probs, q_probs,
     node_logits, node_q) = make_multidraft_case(11 + seed)
    warp = LogitsWarp(temperature=1.0, top_k=50, top_p=1.0)
    nj = jnp.asarray(nearest)
    C = spec.children.shape[1]
    uniforms = jnp.full((spec.max_depth, C), 0.35, jnp.float32)
    common = dict(
        node_q=jnp.asarray(node_q),
        level_probs=tuple(jnp.asarray(x) for x in level_probs),
        node_level_row=jnp.asarray(spec.inlevel_rank),
        uniforms=uniforms,
        nearest=nj, lantern=acc.LanternSpec(k=5, delta=5.0),
        depth=spec.max_depth, warp=warp,
    )
    outs = {}
    for mode in (True, False):
        outs[mode] = _stoch_tree(
            None, jnp.asarray(node_logits), jnp.asarray(toks),
            jnp.asarray(spec.children), batch_warp=mode, **common)
    bp, bl, bd = outs[True]
    sp, sl, sd = outs[False]
    assert int(bl) == int(sl)
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(sp))
    np.testing.assert_array_equal(np.asarray(bd), np.asarray(sd))
