"""ChameleonBPE: real tokenizers-file loading (VocabInfo/TokenManager parity,
reference models/base_models/anole/chameleon/chameleon.py:19-31, vocab.py).

Builds a tiny tokenizers-format JSON (the same format the checkpoints ship)
so the loader, special-id extraction, image translation tables, and the
session raw-text path are all exercised offline.
"""

import json

import numpy as np
import pytest

from lantern_tpu.models.bpe import ChameleonBPE, load_tokenizer


def _make_tokenizer_file(tmp_path, name="text_tokenizer.json"):
    from tokenizers import Tokenizer, models, pre_tokenizers

    # vocab: specials, a few text pieces, and IMGIMG names encoding codes
    # 0, 1, 12, 53 via the A-J digit scheme (vocab.py:83-95)
    vocab = {
        "<s>": 0, "</s>": 1, "<pad>": 2, "<racm3:break>": 3, "<eoss>": 4,
        "<reserved08706>": 5, "<reserved08799>": 6,
        "a": 7, "b": 8, "c": 9, "ab": 10, "bc": 11, "abc": 12,
        "IMGIMGAZ": 13,    # A -> 0
        "IMGIMGBZ": 14,    # B -> 1
        "IMGIMGBCZ": 15,   # BC -> 12
        "IMGIMGFDZ": 16,   # FD -> 53
    }
    merges = [("a", "b"), ("b", "c"), ("ab", "c")]
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    p = tmp_path / name
    tok.save(str(p))
    # tokenizers.save writes the same {"model": {"vocab": ...}} layout the
    # reference reads (chameleon.py:28)
    assert json.load(open(p))["model"]["vocab"] == vocab
    return p


def test_load_encode_decode(tmp_path):
    p = _make_tokenizer_file(tmp_path)
    bpe = ChameleonBPE(str(p))
    ids = bpe.encode("abc ab")
    assert ids == [12, 10]
    assert bpe.encode("abc", bos=True) == [0, 12]
    assert bpe.decode([12, 10]).replace(" ", "") == "abcab"
    # FlexARItemProcessor-compatible callable
    assert bpe("abc") == [12]


def test_special_ids_and_image_tables(tmp_path):
    bpe = ChameleonBPE(str(_make_tokenizer_file(tmp_path)))
    assert (bpe.bos_id, bpe.eos_id, bpe.pad_id) == (0, 1, 2)
    assert (bpe.boi_id, bpe.eoi_id) == (3, 4)
    assert bpe.eot_id == 5 and bpe.newline_id == 6
    # img2bpe: code -> BPE id
    assert bpe.img_to_bpe(np.array([0, 1, 12, 53])).tolist() == [13, 14, 15, 16]
    assert bpe.bpe_to_img(np.array([13, 14, 15, 16])).tolist() == [0, 1, 12, 53]


def test_checkpoint_dir_search(tmp_path):
    sub = tmp_path / "chameleon" / "tokenizer"
    sub.mkdir(parents=True)
    _make_tokenizer_file(sub)
    bpe = ChameleonBPE.from_checkpoint_dir(str(tmp_path))
    assert bpe.encode("ab") == [10]
    assert load_tokenizer(str(tmp_path)).path == bpe.path
    assert load_tokenizer(None) is None
    with pytest.raises(FileNotFoundError):
        ChameleonBPE.from_checkpoint_dir(str(tmp_path / "empty"))


def test_session_raw_text_prompt(tmp_path):
    """ChameleonSession.generate("raw text") tokenizes via the loaded BPE."""
    import jax.numpy as jnp

    from lantern_tpu import configs
    from lantern_tpu.engine.session import ChameleonSession

    cfg = configs.ModelConfig(
        vocab_size=8832, hidden_size=32, intermediate_size=64,
        num_layers=1, num_heads=2, num_kv_heads=2, rope_kind="1d",
        cond_kind="none", qk_norm=True, max_seq_len=96, dtype="float32")
    sess = ChameleonSession.random(cfg, family="lumina", grid=(4, 4))
    # random sessions ship the hash fallback; clearing it makes raw text fail
    sess.tokenizer = None
    with pytest.raises(ValueError, match="tokenizer"):
        sess._prompt("a prompt")
    sess.tokenizer = ChameleonBPE(str(_make_tokenizer_file(tmp_path)))
    tp = sess._prompt("abc ab")
    toks = np.asarray(tp.tokens[0])
    # text ids then the fixed [image_start, h_grid, w_grid] header
    assert toks[:2].tolist() == [12, 10]
    # pre-tokenized lists build the identical prompt
    tp2 = sess._prompt([12, 10])
    np.testing.assert_array_equal(np.asarray(tp2.tokens), np.asarray(tp.tokens))


def test_drafter_top_k_engine_surface():
    """drafter_warp (reference drafter_top_k kwarg) reaches the drafter:
    with drafter_top_k=1 proposals collapse to the greedy chain while the
    verifier keeps the wide warp."""
    import jax

    from lantern_tpu import configs
    from lantern_tpu.engine import spec
    from lantern_tpu.models import drafter as drf
    from lantern_tpu.models import transformer as tfm
    from lantern_tpu.ops.sampling import LogitsWarp

    cfg = configs.tiny_config(cond_kind="label", block_size=16)
    dcfg = configs.drafter_config(cfg, total_tokens=8, depth=2, top_k=4)
    params = tfm.init_params(jax.random.key(0), cfg)
    dparams = drf.init_drafter_params(jax.random.key(1), dcfg, params["embed"])
    warp = LogitsWarp(temperature=1.0, top_k=50, top_p=1.0)
    cond = jnp_arr = None
    import jax.numpy as jnp
    cond, uncond = jnp.asarray([1]), jnp.asarray([cfg.num_classes])

    def run(dtk):
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=2.0, max_new=12, mode="static", pin=0.5,
            drafter_warp=None if dtk is None else
            LogitsWarp(temperature=1.0, top_k=dtk, top_p=1.0))
        from lantern_tpu import trees
        tree = trees.get_tree([[0], [1], [0, 0], [0, 1], [1, 0], [1, 1]])
        st, _, _ = spec.prefill_request(
            params, dparams, ecfg, cfg, dcfg, tree, cond, uncond,
            jax.random.key(0))
        return np.asarray(st.draft.ss_token)

    wide = run(None)
    narrow = run(1)
    assert wide.shape == narrow.shape
    # pinned top-k of a 1-wide warp repeats the greedy head; the wide warp
    # proposes distinct ids
    assert not np.array_equal(wide, narrow)
