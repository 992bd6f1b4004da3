"""generate_images drives all model families and serving modes in-process
(tiny monkeypatched configs): Chameleon sessions from --model anole/
lumina_mgpt, --slots batched spec, batched AR chunks, decode_generated."""

import argparse
import json

import numpy as np
import pytest

import jax

from lantern_tpu import configs


def _tiny_cham(max_seq_len=4096, swin_norm=False):
    return configs.ModelConfig(
        vocab_size=8832, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=2, num_kv_heads=2, rope_kind="1d",
        cond_kind="none", qk_norm=True, swin_norm=swin_norm,
        max_seq_len=256, dtype="float32")


@pytest.fixture()
def gi(monkeypatch):
    import entrypoints_tpu.generate_images as gi_mod

    monkeypatch.setattr(
        configs, "llamagen_config",
        lambda size, task, image_tokens=256: configs.tiny_config(
            cond_kind="caption", block_size=16))
    monkeypatch.setattr(configs, "chameleon_7b_config", _tiny_cham)
    orig_build = gi_mod.build_session

    def build(args):
        s = orig_build(args)
        if args.model in ("anole", "lumina_mgpt"):
            s.grid = (4, 4)
        return s

    monkeypatch.setattr(gi_mod, "build_session", build)
    return gi_mod


def _args(gi_mod, *argv):
    p = argparse.ArgumentParser()
    gi_mod.add_args(p)
    return p.parse_args(list(argv))


def test_lumina_family_batched_slots(gi, tmp_path):
    out = str(tmp_path / "lum")
    args = _args(gi, "--model", "lumina_mgpt", "--random-weights",
                 "--model-type", "eagle", "--prompts", "a cat|a dog|a fox",
                 "--slots", "2", "--output-dir", out,
                 "--total-tokens", "10", "--depth", "2",
                 "--drafter-top-k", "4", "--top-k", "20",
                 "--tree-choices", "chain")
    assert gi.run(args) == 0
    st = json.load(open(f"{out}/global_statistics_0_3.json"))
    assert len(st) == 3
    assert all("step_compression" in v for v in st.values())


def test_anole_family_single(gi, tmp_path):
    out = str(tmp_path / "ano")
    args = _args(gi, "--model", "anole", "--random-weights",
                 "--model-type", "eagle", "--prompts", "one prompt",
                 "--output-dir", out, "--total-tokens", "10", "--depth", "2",
                 "--drafter-top-k", "4", "--top-k", "20",
                 "--tree-choices", "chain")
    assert gi.run(args) == 0
    st = json.load(open(f"{out}/global_statistics_0_1.json"))
    assert len(st) == 1


def test_batched_ar_chunks(gi, tmp_path):
    out = str(tmp_path / "bar")
    args = _args(gi, "--model", "llamagen", "--random-weights",
                 "--model-type", "base", "--prompts", "a|b|c|d",
                 "--slots", "2", "--max-new", "16", "--output-dir", out,
                 "--top-k", "20")
    assert gi.run(args) == 0
    st = json.load(open(f"{out}/global_statistics_0_4.json"))
    assert len(st) == 4
    # lockstep AR: compression 1.0, every request has a latency
    assert all(v["step_compression"] == 1.0 and v["latency"] > 0
               for v in st.values())


def test_decode_generated_shapes():
    from lantern_tpu.engine.session import ChameleonSession
    from lantern_tpu.models import vqgan

    cfg = _tiny_cham(swin_norm=True)
    s = ChameleonSession.random(
        cfg, configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=4),
        family="lumina", grid=(4, 4))
    s.vq_cfg = vqgan.chameleon_vq_config(resolution=32)
    s.vq_params = vqgan.init_vqgan_params(jax.random.key(5), s.vq_cfg)
    toks, _ = s.generate("a small test prompt", max_new=4 * 5 + 1,
                         mode="static", tree="chain", cfg_scale=2.0,
                         top_k=20)
    img = s.decode_generated(toks)
    assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8
