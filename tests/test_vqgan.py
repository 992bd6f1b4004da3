"""VQ-GAN codec parity vs the reference torch VQModel with tied weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lantern_tpu.models import vqgan
from tests.refmod import _imp


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref_mod = _imp("models.base_models.llamagen.vq_model")
    args = ref_mod.ModelArgs(
        codebook_size=64, codebook_embed_dim=4,
        encoder_ch_mult=[1, 2], decoder_ch_mult=[1, 2], z_channels=32,
    )
    with torch.no_grad():
        model = ref_mod.VQModel(args).eval().float()
    cfg = vqgan.VQGANConfig(
        codebook_size=64, codebook_dim=4, ch_mult=(1, 2), z_channels=32,
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = vqgan.load_torch_state_dict(sd, cfg)
    return cfg, model, params


def test_decode_code_parity(pair):
    cfg, model, params = pair
    rng = np.random.default_rng(0)
    grid = 8
    codes = rng.integers(0, 64, size=(2, grid * grid))
    with torch.no_grad():
        ref = model.decode_code(
            torch.tensor(codes), shape=[2, 4, grid, grid]
        ).numpy()                                  # NCHW
    mine = vqgan.decode_code(params, cfg, jnp.asarray(codes), grid)
    np.testing.assert_allclose(
        np.transpose(np.asarray(mine), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_encode_parity(pair):
    cfg, model, params = pair
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 16, 16, 3)).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        _, _, (_, _, ref_idx) = model.encode(
            torch.tensor(np.transpose(imgs, (0, 3, 1, 2)))
        )
    mine = vqgan.encode(params, cfg, jnp.asarray(imgs))
    np.testing.assert_array_equal(
        np.asarray(mine).reshape(-1), ref_idx.numpy().reshape(-1)
    )


def test_roundtrip_self_consistency(pair):
    """encode(decode(codes)) should mostly recover the codes for a random
    codec only loosely; instead check decode determinism + shape contract."""
    cfg, _, params = pair
    codes = jnp.asarray(np.arange(64).reshape(1, 64) % 64)
    img = vqgan.decode_code(params, cfg, codes, 8)
    assert img.shape == (1, 16, 16, 3)
    img2 = vqgan.decode_code(params, cfg, codes, 8)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
