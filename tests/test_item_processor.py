"""FlexARItemProcessor parity tests (reference item_processor.py:36-199,
inference_solver.py:474-505)."""

import numpy as np
import pytest

from lantern_tpu.models import chameleon as cham
from lantern_tpu.models import item_processor as ip


class TestCropSizes:
    def test_reference_properties(self):
        # 768px target: (768/32)^2 = 576 patches
        sizes = ip.generate_crop_size_list(576, 32)
        assert (768, 768) in sizes
        for w, h in sizes:
            assert w % 32 == 0 and h % 32 == 0
            assert (w // 32) * (h // 32) <= 576
            assert max(w, h) / min(w, h) <= 4.0
        # frontier: widest and tallest allowed shapes present
        assert any(w / h == 4.0 for w, h in sizes)
        assert any(h / w == 4.0 for w, h in sizes)

    def test_var_center_crop_picks_matching_aspect(self):
        sizes = ip.generate_crop_size_list(576, 32)
        cw, ch = ip.var_center_crop_size(1024, 512, sizes)
        assert cw / ch == pytest.approx(2.0, rel=0.2)
        cw, ch = ip.var_center_crop_size(500, 500, sizes)
        assert cw == ch

    def test_center_crop_shapes(self):
        img = np.zeros((100, 300, 3), np.uint8)
        out = ip.center_crop(img, 96, 96)
        assert out.shape == (96, 96, 3)
        out = ip.center_crop(img, 512, 256)  # upscale path
        assert out.shape == (256, 512, 3)


class TestTokenAssembly:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 8192, (6, 8))
        toks = ip.codes_to_image_tokens(codes)
        # header: start, h_grids=3, w_grids=4
        assert toks[0] == cham.IMAGE_START_ID
        assert toks[1] == ip.grid_token(3)
        assert toks[2] == ip.grid_token(4)
        assert toks[-1] == cham.IMAGE_END_ID
        # newline after every row of 8
        assert toks[3 + 8] == cham.LUMINA_NEWLINE_ID
        back, h_lat, w_lat = ip.image_tokens_to_codes(toks)
        assert (h_lat, w_lat) == (6, 8)
        np.testing.assert_array_equal(back, codes)

    def test_lumina_768_grid_header_value(self):
        # 768px -> 24 grids -> token 8828, the ea-model magic constant
        # (ea_model_lumina_mgpt.py:835)
        assert ip.grid_token(24) == 8828

    def test_malformed_span_raises(self):
        with pytest.raises(ValueError):
            ip.image_tokens_to_codes([cham.IMAGE_START_ID, 5, 5, 7])
        toks = ip.codes_to_image_tokens(np.zeros((2, 2), np.int64))
        with pytest.raises(ValueError):
            ip.image_tokens_to_codes(toks[:-2])  # truncated


class TestConversation:
    def test_text_only_prompt(self):
        proc = ip.FlexARItemProcessor()
        toks = proc.process_item([["draw me a cat", None]])
        assert len(toks) == 4
        assert all(10000 <= t < 55000 for t in toks)

    def test_hash_tokenize_deterministic(self):
        assert ip.hash_tokenize("a cat") == ip.hash_tokenize("a cat")
        assert ip.hash_tokenize("a cat") != ip.hash_tokenize("a dog")

    def test_image_splice_and_decode_ids(self):
        import jax

        from lantern_tpu.models import vqgan

        cfg = vqgan.chameleon_vq_config(ch=32, num_res_blocks=1,
                                        codebook_size=64, codebook_dim=8,
                                        z_channels=32)
        params = vqgan.init_vqgan_params(jax.random.key(0), cfg)
        proc = ip.FlexARItemProcessor(vq_params=params, vq_cfg=cfg,
                                      target_size=64)
        img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
        toks = proc.process_item([["describe <|image|>", None]], images=[img])
        assert toks.count(cham.IMAGE_START_ID) == 1
        assert toks.count(cham.IMAGE_END_ID) == 1
        texts, images = proc.decode_ids(toks)
        assert len(images) == 1
        assert images[0].shape == (64, 64, 3)
        assert images[0].dtype == np.uint8

    def test_missing_vq_raises(self):
        proc = ip.FlexARItemProcessor()
        with pytest.raises(ValueError, match="vq_params"):
            proc.process_image(np.zeros((64, 64, 3), np.uint8))


class TestChameleonLoader:
    def test_qknorm_mp_repeat(self):
        import jax.numpy as jnp

        from lantern_tpu import configs
        from lantern_tpu.utils import checkpoint as ckpt

        cfg = configs.tiny_config(cond_kind="none", rope_kind="1d",
                                  qk_norm=True, num_heads=4, hidden_size=64)
        L, nh, hd = cfg.num_layers, cfg.num_heads, cfg.head_dim
        H, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        sd = {}
        for l in range(L):
            p = f"model.layers.{l}."
            sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
            sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
            for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
                sd[p + f"self_attn.{n}.weight"] = np.zeros((H, H), np.float32)
            for n in ("gate_proj", "up_proj"):
                sd[p + f"mlp.{n}.weight"] = np.zeros((I, H), np.float32)
            sd[p + "mlp.down_proj.weight"] = np.zeros((H, I), np.float32)
            # Lumina MP-sharded layout: [mp=2, hd], distinct per shard
            sd[p + "self_attn.q_norm.weight"] = np.stack(
                [np.full(hd, 1.0 + l, np.float32), np.full(hd, 2.0 + l, np.float32)])
            sd[p + "self_attn.q_norm.bias"] = np.zeros((2, hd), np.float32)
            # Anole full layout: [nh, hd]
            sd[p + "self_attn.k_norm.weight"] = np.arange(
                nh * hd, dtype=np.float32).reshape(nh, hd)
            sd[p + "self_attn.k_norm.bias"] = np.zeros((nh, hd), np.float32)
        sd["model.embed_tokens.weight"] = np.zeros((V, H), np.float32)
        sd["model.norm.weight"] = np.ones(H, np.float32)
        sd["lm_head.weight"] = np.zeros((V, H), np.float32)

        params = ckpt.chameleon_params_from_torch(sd, cfg, dtype=jnp.float32)
        qw = np.asarray(params["layers"]["q_norm_w"])
        assert qw.shape == (L, nh, hd)
        # shard 0's gamma repeated over heads 0-1, shard 1's over heads 2-3
        np.testing.assert_allclose(qw[0, 0], 1.0)
        np.testing.assert_allclose(qw[0, 1], 1.0)
        np.testing.assert_allclose(qw[0, 2], 2.0)
        kw = np.asarray(params["layers"]["k_norm_w"])
        np.testing.assert_allclose(
            kw[0], np.arange(nh * hd, dtype=np.float32).reshape(nh, hd))
