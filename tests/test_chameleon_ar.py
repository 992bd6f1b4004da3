"""Chameleon base-mode (vanilla CFG AR over token prompts) tests.

Reference: modeling_anole_kv.py:1784-1837 generate; pristine Lumina _sample
(modeling_lumina_mgpt.py:1644-1793).  Invariants: greedy base-mode and greedy
speculative decode emit identical tokens; the Lumina grid FSM forces valid
image-grammar output in base mode too.
"""

import jax
import numpy as np

from lantern_tpu import configs
from lantern_tpu.engine.session import ChameleonSession
from lantern_tpu.models import chameleon as cham


# small-vocab stand-ins for the production grammar ids (vocab 256)
FSM_IDS = dict(newline_id=250, image_end_id=251, image_lo=4, image_hi=249)


def _session(family, grid, seed=0):
    cfg = configs.tiny_config(cond_kind="none", rope_kind="1d", qk_norm=True,
                              num_heads=4, hidden_size=64, vocab_size=256,
                              max_seq_len=160)
    dcfg = configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=4)
    sess = ChameleonSession.random(cfg, dcfg, seed=seed, family=family,
                                   grid=grid, aligned_drafter=True)
    sess.fsm_overrides = FSM_IDS
    return sess


class TestAnoleBaseMode:
    def test_greedy_base_matches_greedy_spec(self):
        sess = _session("anole", grid=(4, 4))
        toks_ar, st_ar = sess.generate([5, 6, 7], max_new=12, temperature=0.0,
                                       mode="ar", seed=3)
        toks_sp, st_sp = sess.generate([5, 6, 7], max_new=12, temperature=0.0,
                                       mode="static", tree="chain", seed=3)
        np.testing.assert_array_equal(toks_ar[:12], toks_sp[:12])
        assert st_ar.step_compression == 1.0
        assert st_sp.step_compression >= 1.0

    def test_base_mode_respects_image_mask(self):
        sess = _session("anole", grid=(4, 4), seed=1)
        toks, _ = sess.generate([9], max_new=16, temperature=1.0, mode="ar",
                                seed=5)
        # non-image tokens are suppressed during image generation
        assert all(cham.IMAGE_TOKEN_START <= t <= cham.IMAGE_TOKEN_END
                   for t in toks)

    def test_no_drafter_falls_back_to_ar(self):
        cfg = configs.tiny_config(cond_kind="none", rope_kind="1d",
                                  qk_norm=True, num_heads=4, hidden_size=64,
                                  vocab_size=256, max_seq_len=160)
        sess = ChameleonSession.random(cfg, None, family="anole", grid=(4, 4))
        toks, st = sess.generate([5], max_new=8, temperature=0.0, seed=0)
        assert toks.shape == (8,)
        assert st.step_compression == 1.0


class TestLuminaBaseMode:
    def test_grid_fsm_enforced_in_base_mode(self):
        h, w = 3, 4
        sess = _session("lumina", grid=(h, w), seed=2)
        max_new = h * (w + 1) + 1
        toks, _ = sess.generate([11, 12], max_new=max_new, temperature=1.0,
                                mode="ar", seed=7)
        toks = list(toks)
        # newline token after every w image tokens; EOS-image at the end
        for row in range(h):
            assert toks[row * (w + 1) + w] == FSM_IDS["newline_id"]
            for c in range(w):
                t = toks[row * (w + 1) + c]
                assert FSM_IDS["image_lo"] <= t <= FSM_IDS["image_hi"]
        assert toks[-1] == FSM_IDS["image_end_id"]

    def test_greedy_base_matches_greedy_spec(self):
        h, w = 2, 3
        sess = _session("lumina", grid=(h, w), seed=4)
        max_new = h * (w + 1) + 1
        a, _ = sess.generate([8], max_new=max_new, temperature=0.0, mode="ar",
                             seed=1)
        b, _ = sess.generate([8], max_new=max_new, temperature=0.0,
                             mode="static", tree="chain", seed=1)
        np.testing.assert_array_equal(a[:max_new], b[:max_new])


class TestMultiResolution:
    """Per-call grid override (Lumina multi-resolution, reference
    target_size eagle_inference_solver.py:244): one session serves several
    grids; each obeys its own grammar and matches a dedicated session."""

    def test_grid_override_grammar_and_parity(self):
        sess = _session("lumina", grid=(2, 3))
        # call-time override to a DIFFERENT, non-square grid (h=4, w=2)
        h, w = 4, 2
        toks, _ = sess.generate([7, 8], temperature=0.0, cfg_scale=2.0,
                                mode="ar", grid=(h, w))
        assert len(toks) == h * (w + 1) + 1
        body = toks[: h * (w + 1)].reshape(h, w + 1)
        assert (body[:, w] == FSM_IDS["newline_id"]).all()
        assert toks[-1] == FSM_IDS["image_end_id"]
        # a session built at that grid produces the identical stream
        sess2 = _session("lumina", grid=(h, w))
        toks2, _ = sess2.generate([7, 8], temperature=0.0, cfg_scale=2.0,
                                  mode="ar")
        np.testing.assert_array_equal(toks, toks2)
        # spec path at the overridden grid agrees with AR
        toks3, _ = sess.generate([7, 8], temperature=0.0, cfg_scale=2.0,
                                 mode="static", tree="chain", grid=(h, w))
        np.testing.assert_array_equal(toks, toks3)
