"""Continuous batching: batched greedy decoding must produce exactly the
same tokens per request as single-request decoding, including slot reuse
(more requests than slots)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lantern_tpu import configs, trees
from lantern_tpu.engine import spec
from lantern_tpu.engine.batch import BatchedEngine
from lantern_tpu.engine.scheduler import Request, Scheduler
from lantern_tpu.models import drafter as drf
from lantern_tpu.models import transformer as tfm
from lantern_tpu.ops.sampling import LogitsWarp

MAX_NEW = 12


@pytest.fixture(scope="module")
def setup():
    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )
    tree = trees.get_tree("mc_sim_7b_63")
    return cfg, dcfg, params, dparams, ecfg, tree


def single(cfg, dcfg, params, dparams, ecfg, tree, label, seed):
    res = spec.generate(
        params, dparams, ecfg, cfg, dcfg, tree,
        jnp.asarray([label]), jnp.asarray([cfg.num_classes]),
        jax.random.key(seed),
    )
    return np.asarray(res.tokens), int(res.steps)


@pytest.mark.parametrize("use_native", [False, True])
def test_batched_matches_single(setup, use_native):
    from lantern_tpu import native

    if use_native and not native.available():
        pytest.skip("native scheduler not built")
    cfg, dcfg, params, dparams, ecfg, tree = setup
    labels = [1, 4, 7, 2, 9]

    expected = {
        lab: single(cfg, dcfg, params, dparams, ecfg, tree, lab, 100 + i)
        for i, lab in enumerate(labels)
    }

    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=2,
    )
    reqs = [
        Request(uid=lab, cond=jnp.asarray([lab]),
                uncond=jnp.asarray([cfg.num_classes]), seed=100 + i)
        for i, lab in enumerate(labels)
    ]
    done = Scheduler(eng, use_native=use_native).run(reqs)

    assert len(done) == len(labels)
    for req in done:
        exp_tokens, exp_steps = expected[req.uid]
        np.testing.assert_array_equal(req.tokens, exp_tokens, err_msg=str(req.uid))
        assert req.steps == exp_steps


def test_batched_throughput_counts(setup):
    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=3,
    )
    reqs = [Request(uid=i, cond=jnp.asarray([i % cfg.num_classes]),
                    uncond=jnp.asarray([cfg.num_classes]), seed=i)
            for i in range(3)]
    done = Scheduler(eng).run(reqs)
    for r in done:
        assert r.tokens.shape == (MAX_NEW,)
        assert r.steps >= 1 and r.step_compression >= 1.0


def test_batched_sampling_mode(setup):
    """Batched engine with stochastic verification (sampling) runs and
    matches single-request results per seed."""
    cfg, dcfg, params, dparams, _, tree = setup
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=1.0, top_k=20), cfg_scale=2.0,
        max_new=MAX_NEW, mode="static",
    )
    expected = {}
    for i, lab in enumerate([2, 6]):
        res = spec.generate(
            params, dparams, ecfg, cfg, dcfg, tree,
            jnp.asarray([lab]), jnp.asarray([cfg.num_classes]),
            jax.random.key(50 + i),
        )
        expected[lab] = np.asarray(res.tokens)

    eng = BatchedEngine(ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
                        params=params, dparams=dparams, num_slots=2)
    reqs = [Request(uid=lab, cond=jnp.asarray([lab]),
                    uncond=jnp.asarray([cfg.num_classes]), seed=50 + i)
            for i, lab in enumerate([2, 6])]
    done = Scheduler(eng, use_native=False).run(reqs)
    for r in done:
        np.testing.assert_array_equal(r.tokens, expected[r.uid])


def test_batched_token_prompts():
    """Chameleon-style token-prompt requests through the batched engine."""
    from lantern_tpu.models import chameleon as cham

    cfg = configs.tiny_config(
        vocab_size=64, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    mask = jnp.asarray(cham.non_image_token_mask(64))
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=8, mode="static",
    )
    tree = trees.get_tree("chain")
    prompts = [cham.anole_token_prompt([12, 33, 7]),
               cham.anole_token_prompt([5, 9, 44])]

    expected = []
    for i, tp in enumerate(prompts):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            None, None, jax.random.key(9 + i),
                            token_prompt=tp, logits_mask=mask)
        expected.append(np.asarray(res.tokens))

    eng = BatchedEngine(ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
                        params=params, dparams=dparams, num_slots=2,
                        logits_mask=mask)
    reqs = [Request(uid=i, token_prompt=tp, seed=9 + i)
            for i, tp in enumerate(prompts)]
    done = Scheduler(eng, use_native=False).run(reqs)
    for r in done:
        np.testing.assert_array_equal(r.tokens, expected[r.uid])


def test_batched_ragged_lumina_prompts():
    """Mixed prompt lengths in ONE Lumina batch: each slot's grid FSM start
    index is a traced per-slot value (bind_logits_fn), so batched output is
    token-identical to per-request runs — the reference's vLLM path batches
    ragged paired-CFG prompts freely (vllm_inference_solver.py:296-306)."""
    from lantern_tpu.models import chameleon as cham

    V, NEWLINE, IMG_END = 64, 60, 61
    HG, WG = 2, 3
    max_new = (WG + 1) * HG + 1
    cfg = configs.tiny_config(
        vocab_size=V, hidden_size=64, num_layers=2, num_heads=4,
        rope_kind="1d", cond_kind="none", qk_norm=True,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=10, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=max_new, mode="static",
    )
    tree = trees.get_tree("chain")
    texts = [[12], [12, 33], [12, 33, 7]]          # three different lengths
    prompts = [cham.lumina_token_prompt(t, grid=(HG, WG)) for t in texts]

    def fsm_for(start):
        return cham.LuminaGridFSM(
            w=WG, h=HG, image_start_idx=start, vocab_size=V,
            newline_id=NEWLINE, image_end_id=IMG_END, image_lo=4, image_hi=50)

    expected = []
    for i, tp in enumerate(prompts):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            None, None, jax.random.key(9 + i),
                            token_prompt=tp, logits_fn=fsm_for(int(tp.pos_diff)))
        expected.append(np.asarray(res.tokens))

    # one engine, one FSM whose static start is WRONG for two of the three
    # slots — the per-slot traced override must win
    eng = BatchedEngine(ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
                        params=params, dparams=dparams, num_slots=3,
                        logits_fn=fsm_for(0))
    reqs = [Request(uid=i, token_prompt=tp, seed=9 + i)
            for i, tp in enumerate(prompts)]
    done = Scheduler(eng, use_native=False).run(reqs)
    for r in done:
        assert r.error is None, r.error
        np.testing.assert_array_equal(r.tokens, expected[r.uid])
        # grammar holds per slot: newline every WG+1 tokens, eos at the end
        body = r.tokens[: max_new - 1].reshape(HG, WG + 1)
        assert (body[:, WG] == NEWLINE).all()
        assert r.tokens[max_new - 1] == IMG_END


def test_step_many_equals_repeated_step(setup):
    """The fused multi-step dispatch must be bit-identical to n single
    steps (same math, one scan)."""
    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng_a = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams, num_slots=2)
    eng_b = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams, num_slots=2)

    def fill(eng):
        reqs = [eng.prefill(jnp.asarray([i]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(40 + i)) for i in range(2)]
        batch = eng.empty_batch(reqs[0])
        for i, r in enumerate(reqs):
            batch = eng.insert(batch, i, r)
        return batch

    ba = fill(eng_a)
    for _ in range(4):
        ba = eng_a.step(ba)
    bb = fill(eng_b)
    bb = eng_b.step_many(bb, 4)

    na, sa, aa = eng_a.slot_status(ba)
    nb, sb, ab = eng_b.slot_status(bb)
    np.testing.assert_array_equal(na, nb)
    np.testing.assert_array_equal(sa, sb)
    np.testing.assert_array_equal(aa, ab)
    for s in range(2):
        np.testing.assert_array_equal(eng_a.slot_tokens(ba, s),
                                      eng_b.slot_tokens(bb, s))


def test_batched_engine_through_stacked_write_kernel():
    """End-to-end batched decode with the pallas in-place write kernel active
    (interpret mode): tokens must match the dus fallback exactly.  Uses a
    kernel-eligible layout (n_kv * head_dim % 128 == 0) — the tiny fixture
    config falls back, so this is the only CPU coverage of the custom_vmap
    stacked-write path inside the real engine."""
    import lantern_tpu.kv as kvmod

    cfg = configs.ModelConfig(
        vocab_size=128, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=128,
        dtype="float32", cond_kind="label", num_classes=10, block_size=16,
        cls_token_num=1,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=3)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=8, mode="static",
    )
    tree = trees.get_tree("mc_sim_7b_63")

    def run_batched():
        eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                            num_slots=2)
        reqs = [eng.prefill(jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(7)) for lbl in (3, 5)]
        batch = eng.empty_batch(reqs[0])
        for i, r in enumerate(reqs):
            batch = eng.insert(batch, i, r)
        for _ in range(16):
            batch = eng.step(batch)
            n_new, _, _ = eng.slot_status(batch)
            if (n_new >= 8).all():
                break
        return [np.asarray(eng.slot_tokens(batch, i))[:8] for i in range(2)]

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "never"
        ref = run_batched()
        kvmod.PALLAS_WRITE = "interpret"
        got = run_batched()
    finally:
        kvmod.PALLAS_WRITE = prev
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_batched_engine_int8_kv_matches_single():
    """Batched decode with quantized KV (+ stacked write kernel active)
    must equal single-request int8-KV decode per slot."""
    import lantern_tpu.kv as kvmod

    cfg = configs.ModelConfig(
        vocab_size=128, hidden_size=256, num_layers=2, num_heads=2,
        num_kv_heads=2, intermediate_size=256, max_seq_len=128,
        dtype="float32", cond_kind="label", num_classes=10, block_size=16,
        cls_token_num=1,
    )
    dcfg = configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=3)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=8, mode="static", kv_quant=True,
    )
    tree = trees.get_tree("mc_sim_7b_63")

    singles = {}
    for lbl in (3, 5):
        r = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                          jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                          jax.random.key(7))
        singles[lbl] = np.asarray(r.tokens)[:8]

    prev = kvmod.PALLAS_WRITE
    try:
        kvmod.PALLAS_WRITE = "interpret"
        eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams,
                            num_slots=2)
        reqs = [eng.prefill(jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(7)) for lbl in (3, 5)]
        batch = eng.empty_batch(reqs[0])
        for i, r in enumerate(reqs):
            batch = eng.insert(batch, i, r)
        for _ in range(16):
            batch = eng.step(batch)
            n_new, _, _ = eng.slot_status(batch)
            if (n_new >= 8).all():
                break
        got = [np.asarray(eng.slot_tokens(batch, i))[:8] for i in range(2)]
    finally:
        kvmod.PALLAS_WRITE = prev
    np.testing.assert_array_equal(got[0], singles[3])
    np.testing.assert_array_equal(got[1], singles[5])


def test_batched_dynamic_mode_matches_single(setup):
    """EAGLE-2 dynamic drafting under the vmapped batched engine."""
    cfg, dcfg, params, dparams, _, _ = setup
    ecfg = spec.SpecDecodeConfig(
        warp=LogitsWarp(temperature=0.0), cfg_scale=2.0,
        max_new=MAX_NEW, mode="dynamic",
    )
    singles = {}
    for lbl in (1, 6):
        r = spec.generate(params, dparams, ecfg, cfg, dcfg, None,
                          jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                          jax.random.key(5))
        singles[lbl] = np.asarray(r.tokens)[:MAX_NEW]

    eng = BatchedEngine(ecfg, cfg, dcfg, None, params, dparams, num_slots=2)
    reqs = [eng.prefill(jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                        jax.random.key(5)) for lbl in (1, 6)]
    batch = eng.empty_batch(reqs[0])
    for i, r in enumerate(reqs):
        batch = eng.insert(batch, i, r)
    for _ in range(MAX_NEW + 4):
        batch = eng.step(batch)
        n_new, _, _ = eng.slot_status(batch)
        if (n_new >= MAX_NEW).all():
            break
    np.testing.assert_array_equal(
        np.asarray(eng.slot_tokens(batch, 0))[:MAX_NEW], singles[1])
    np.testing.assert_array_equal(
        np.asarray(eng.slot_tokens(batch, 1))[:MAX_NEW], singles[6])


def test_scheduler_empty_and_native_guards(setup):
    """Empty request lists return [] on both scheduler paths; the native
    queue rejects duplicate and unrepresentable uids instead of wedging."""
    from lantern_tpu import native
    from lantern_tpu.engine.scheduler import Scheduler

    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams, num_slots=2)
    assert Scheduler(eng, use_native=False).run([]) == []
    if native.available():
        assert Scheduler(eng, use_native=True).run([]) == []
        ns = native.NativeScheduler(2)
        ns.enqueue(7, prompt_len=0, max_new=4)
        ns.enqueue(7, prompt_len=0, max_new=4)      # duplicate: dropped
        ns.enqueue(2 ** 63 + 1, prompt_len=0, max_new=4)  # unrepresentable
        assert ns.num_waiting == 1


@pytest.mark.parametrize("use_native", [False, True])
def test_failure_capture_keeps_serving(setup, use_native):
    """A request whose prefill raises is recorded (error set) and the rest
    of the batch completes normally — the serving loop never dies
    (reference role: vllm_inference_solver.py:312-325 failure records)."""
    from lantern_tpu import native

    if use_native and not native.available():
        pytest.skip("native scheduler not built")
    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=2,
    )
    good = [1, 4, 7]
    reqs = []
    for i, lab in enumerate(good):
        reqs.append(Request(uid=lab, cond=jnp.asarray([lab]),
                            uncond=jnp.asarray([cfg.num_classes]), seed=i))
    # bad cond shape -> prefill raises inside the scheduler
    reqs.insert(1, Request(uid="bad", cond=jnp.zeros((3, 5)),
                           uncond=jnp.asarray([cfg.num_classes]), seed=9))
    # pre-failed upstream (e.g. prompt/cond construction error)
    reqs.insert(3, Request(uid="prefailed", error="ValueError: bad prompt"))

    done = Scheduler(eng, use_native=use_native).run(reqs)
    assert len(done) == 5
    by_uid = {r.uid: r for r in done}
    assert by_uid["bad"].error is not None and by_uid["bad"].tokens is None
    assert by_uid["prefailed"].error == "ValueError: bad prompt"
    for lab in good:
        r = by_uid[lab]
        assert r.error is None and r.tokens.shape == (MAX_NEW,)
        assert r.steps >= 1
    # input order preserved
    assert [r.uid for r in done] == [1, "bad", 4, "prefailed", 7]


def test_all_requests_fail(setup):
    cfg, dcfg, params, dparams, ecfg, tree = setup
    eng = BatchedEngine(ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
                        params=params, dparams=dparams, num_slots=2)
    reqs = [Request(uid=i, error=f"boom {i}") for i in range(3)]
    done = Scheduler(eng, use_native=False).run(reqs)
    assert len(done) == 3 and all(r.error for r in done)


def test_batched_stop_ids_drain(setup):
    """Slots that hit a stop id finish early: the scheduler sees them as
    done (slot_status reports max_new), slot_tokens truncates one past the
    stop, and outputs match single-request stop runs."""
    cfg, dcfg, params, dparams, _, tree = setup
    # find a token each label's greedy stream actually emits
    probe = spec.SpecDecodeConfig(warp=LogitsWarp(temperature=0.0),
                                  cfg_scale=2.0, max_new=MAX_NEW,
                                  mode="static")
    streams = {}
    for lbl in (3, 5):
        res = spec.generate(params, dparams, probe, cfg, dcfg, tree,
                            jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(40 + lbl))
        streams[lbl] = np.asarray(res.tokens)
    stop = int(streams[3][5])
    ecfg = spec.SpecDecodeConfig(warp=LogitsWarp(temperature=0.0),
                                 cfg_scale=2.0, max_new=MAX_NEW,
                                 mode="static", stop_ids=(stop,))
    expected = {}
    for lbl in (3, 5):
        res = spec.generate(params, dparams, ecfg, cfg, dcfg, tree,
                            jnp.asarray([lbl]), jnp.asarray([cfg.num_classes]),
                            jax.random.key(40 + lbl))
        expected[lbl] = np.asarray(res.tokens)[: int(res.n_valid)]
    assert len(expected[3]) < MAX_NEW          # the stop actually fires

    eng = BatchedEngine(ecfg, cfg, dcfg, tree, params, dparams, num_slots=2)
    reqs = [Request(uid=lbl, cond=jnp.asarray([lbl]),
                    uncond=jnp.asarray([cfg.num_classes]), seed=40 + lbl)
            for lbl in (3, 5)]
    done = Scheduler(eng, use_native=False).run(reqs)
    for r in done:
        assert r.error is None
        np.testing.assert_array_equal(r.tokens, expected[r.uid])


@pytest.mark.parametrize("use_native", [False, True])
def test_open_loop_arrivals_match_saturated(setup, use_native):
    """Requests with staggered arrival_time produce the same per-request
    tokens as the saturated (all-at-once) run, wait for their arrival
    (e2e_latency >= arrival gap), and survive a full batch drain between
    arrival bursts."""
    from lantern_tpu import native

    if use_native and not native.available():
        pytest.skip("native scheduler not built")
    cfg, dcfg, params, dparams, ecfg, tree = setup
    labels = [3, 8, 5]
    expected = {
        lab: single(cfg, dcfg, params, dparams, ecfg, tree, lab, 300 + i)
        for i, lab in enumerate(labels)
    }
    eng = BatchedEngine(
        ecfg=ecfg, cfg=cfg, dcfg=dcfg, tree=tree,
        params=params, dparams=dparams, num_slots=2,
    )
    # two immediate requests, then a gap long enough that the batch drains
    # before the third arrives (exercises the idle-until-arrival path)
    reqs = [
        Request(uid=labels[0], cond=jnp.asarray([labels[0]]),
                uncond=jnp.asarray([cfg.num_classes]), seed=300),
        Request(uid=labels[1], cond=jnp.asarray([labels[1]]),
                uncond=jnp.asarray([cfg.num_classes]), seed=301,
                arrival_time=0.0),
        Request(uid=labels[2], cond=jnp.asarray([labels[2]]),
                uncond=jnp.asarray([cfg.num_classes]), seed=302,
                arrival_time=2.5),
    ]
    done = Scheduler(eng, use_native=use_native).run(reqs)
    assert len(done) == len(labels)
    for req in done:
        exp_tokens, exp_steps = expected[req.uid]
        np.testing.assert_array_equal(req.tokens, exp_tokens,
                                      err_msg=str(req.uid))
    late = next(r for r in done if r.uid == labels[2])
    assert late.e2e_latency >= 0.0
    assert late.latency <= late.e2e_latency + 1e-6
