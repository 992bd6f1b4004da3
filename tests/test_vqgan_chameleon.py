"""Chameleon (taming) VQ-GAN parity vs the reference chameleon_vae_ori
VQModel with tied weights: decode_code and encode."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lantern_tpu.models import vqgan
from tests.refmod import _imp


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    mod = _imp("models.base_models.lumina_mgpt.chameleon_vae_ori.vqgan")
    ddconfig = dict(
        ch=32, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
        attn_resolutions=[8], in_channels=3, resolution=16,
        z_channels=32, double_z=False, dropout=0.0,
    )
    with torch.no_grad():
        model = mod.VQModel(ddconfig, n_embed=64, embed_dim=16).eval().float()
    cfg = vqgan.chameleon_vq_config(
        resolution=16, attn_resolutions=(8,), ch_mult=(1, 2),
        codebook_size=64, codebook_dim=16, ch=32, z_channels=32,
        num_res_blocks=1,
    )
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = vqgan.load_taming_state_dict(sd, cfg)
    return cfg, model, params


def test_chameleon_decode_parity(pair):
    cfg, model, params = pair
    rng = np.random.default_rng(0)
    grid = 8
    codes = rng.integers(0, 64, size=(2, grid * grid))
    with torch.no_grad():
        zq = model.quantize.get_codebook_entry(
            torch.tensor(codes).reshape(-1), shape=(2, grid, grid, 16)
        )
        ref = model.decode(zq).numpy()
    mine = vqgan.decode_code(params, cfg, jnp.asarray(codes), grid)
    np.testing.assert_allclose(
        np.transpose(np.asarray(mine), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_chameleon_encode_parity(pair):
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
