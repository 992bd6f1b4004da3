"""End-to-end CLI smoke: data gen -> drafter training -> image generation,
driven through main.py like a user would (nano model, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
    PALLAS_AXON_POOL_IPS="",   # keep the remote-TPU plugin out of subprocesses
)


def cli(*args, timeout=300):
    return subprocess.run(
        [sys.executable, "main.py", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    data_dir = str(tmp_path / "train_data")
    save_dir = str(tmp_path / "drafter")
    out_dir = str(tmp_path / "images")

    r = cli("generate_train_data", "--model-size", "nano", "--random-weights",
            "--num-samples", "2", "--save-dir", data_dir)
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(os.listdir(data_dir)) == 2

    r = cli("train_drafter", "--model-size", "nano", "--data-dir", data_dir,
            "--save-dir", save_dir, "--num-epochs", "2", "--bs", "1",
            "--train-data-ratio", "0.5", "--max-len", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 0" in r.stdout
    assert os.path.exists(os.path.join(save_dir, "history.json"))

    r = cli("generate_images", "--model-size", "nano", "--random-weights",
            "--prompts", "a tiny test", "--output-dir", out_dir,
            "--temperature", "0", "--max-new", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    stats_files = [f for f in os.listdir(out_dir) if f.startswith("global_statistics")]
    assert stats_files, os.listdir(out_dir)
    with open(os.path.join(out_dir, stats_files[0])) as f:
        stats = json.load(f)
    assert stats["prompt_0"]["step_compression"] >= 1.0
    assert os.path.exists(os.path.join(out_dir, "prompt_0.png"))


@pytest.mark.slow
def test_generate_images_int8(tmp_path):
    out_dir = str(tmp_path / "images_q")
    r = cli("generate_images", "--model-size", "nano", "--random-weights",
            "--prompts", "a tiny test", "--output-dir", out_dir,
            "--quant", "int8", "--kv-quant",
            "--temperature", "0", "--max-new", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, "prompt_0.png"))


@pytest.mark.slow
def test_generate_codebook_cli(tmp_path):
    save = str(tmp_path / "vqd")
    r = cli("generate_codebook", "--model", "random", "--codebook-size", "64",
            "--codebook-dim", "4", "--save-path", save)
    assert r.returncode == 0, r.stderr[-2000:]
    t = np.load(os.path.join(save, "top_63_indices.npy"))
    assert t.shape == (64, 63) and t.dtype == np.uint16
