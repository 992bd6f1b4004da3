"""Draft-budget autotune (reference ea_model_llamagen.py:202-226)."""

import jax

from lantern_tpu import configs
from lantern_tpu.engine.autotune import autotune_total_tokens, time_verify_forward
from lantern_tpu.models import transformer as tfm


def test_autotune_picks_a_candidate():
    cfg = configs.tiny_config(cond_kind="label", block_size=64)
    params = tfm.init_params(jax.random.key(0), cfg)
    best = autotune_total_tokens(params, cfg, candidates=(4, 8, 12),
                                 prefix=8, iters=2)
    assert best in (4, 8, 12)


def test_time_verify_forward_positive():
    cfg = configs.tiny_config(cond_kind="label", block_size=64)
    params = tfm.init_params(jax.random.key(0), cfg)
    dt = time_verify_forward(params, cfg, 8, prefix=8, iters=2)
    assert dt > 0


def test_cli_flag_plumbing():
    from entrypoints_tpu import generate_images

    import argparse

    p = argparse.ArgumentParser()
    generate_images.add_args(p)
    args = p.parse_args(["--total-tokens", "-1", "--random-weights"])
    assert args.total_tokens == -1
    sess = generate_images.build_session(args)
    # -1 must not leak into the drafter config used for loading
    assert sess.dcfg.total_tokens >= 2
