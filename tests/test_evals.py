"""Image-quality metric tests: analytic FID, manifold precision/recall,
CLIP/HPS scoring, and the eval CLI surfaces with precomputed features.

Reference semantics: entrypoints/eval_fid_clip.py (FID + CLIP score),
entrypoints/eval_prec_recall.py (k-NN manifolds), eval_hpsv2.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lantern_tpu.evals import features as F
from lantern_tpu.evals import metrics as M

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(500, 16))
        assert M.fid_from_features(x, x) == pytest.approx(0.0, abs=1e-8)

    def test_analytic_isotropic_gaussians(self):
        # FD(N(m1, a I), N(m2, b I)) = |m1-m2|^2 + D (a + b - 2 sqrt(ab))
        d = 4
        mu1, mu2 = np.zeros(d), np.full(d, 2.0)
        s1, s2 = np.eye(d) * 3.0, np.eye(d) * 1.0
        expect = 4 * 4.0 + d * (3.0 + 1.0 - 2.0 * np.sqrt(3.0))
        assert M.frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expect, rel=1e-9)

    def test_mean_shift_dominates(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=(2000, 8))
        near = rng.normal(size=(2000, 8)) + 0.1
        far = rng.normal(size=(2000, 8)) + 3.0
        assert M.fid_from_features(base, near) < M.fid_from_features(base, far)

    def test_sample_estimate_matches_analytic(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=(20000, 3))
        b = rng.normal(size=(20000, 3)) + np.array([1.0, 0.0, 0.0])
        # true FD = 1.0 (identical covariances, unit mean shift)
        assert M.fid_from_features(a, b) == pytest.approx(1.0, abs=0.05)


class TestPrecisionRecall:
    def test_same_cloud_is_perfect(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(200, 8))
        pr = M.precision_recall(x, x + rng.normal(size=x.shape) * 1e-3, k=3)
        assert pr.precision == pytest.approx(1.0)
        assert pr.recall == pytest.approx(1.0)

    def test_disjoint_clouds_are_zero(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(200, 8))
        b = rng.normal(size=(200, 8)) + 100.0
        pr = M.precision_recall(a, b, k=3)
        assert pr.precision == 0.0
        assert pr.recall == 0.0

    def test_mode_drop_hits_recall_not_precision(self):
        # fake covers only one of two real modes: precision high, recall ~0.5
        rng = np.random.default_rng(5)
        real = np.concatenate([rng.normal(size=(150, 8)),
                               rng.normal(size=(150, 8)) + 50.0])
        fake = rng.normal(size=(300, 8))
        pr = M.precision_recall(real, fake, k=3)
        assert pr.precision > 0.75
        assert 0.3 < pr.recall < 0.7
        assert pr.precision > pr.recall + 0.2

    def test_knn_radii_matches_reference_rule(self):
        # 1-D points 0,1,3,7: with k=1 the radius is the nearest-other distance
        x = np.array([[0.0], [1.0], [3.0], [7.0]])
        np.testing.assert_allclose(M.knn_radii(x, k=1), [1.0, 1.0, 2.0, 4.0])

    def test_realism_in_vs_out(self):
        rng = np.random.default_rng(6)
        ref = M.manifold(rng.normal(size=(300, 4)), k=3)
        inside = M.realism(ref, np.zeros(4))
        outside = M.realism(ref, np.full(4, 30.0))
        assert inside > 1.0 > outside


class TestScores:
    def test_clip_score_aligned_vs_random(self):
        rng = np.random.default_rng(7)
        a = rng.normal(size=(50, 32))
        assert M.clip_score_from_embeddings(a, a) == pytest.approx(1.0)
        b = rng.normal(size=(50, 32))
        assert abs(M.clip_score_from_embeddings(a, b)) < 0.5

    def test_hps_scale(self):
        a = np.eye(4)[:2]
        out = M.hps_from_embeddings(a, a, logit_scale=100.0)
        np.testing.assert_allclose(out, [100.0, 100.0])


class TestFeaturesIO:
    def test_image_roundtrip_and_crop(self, tmp_path):
        from PIL import Image

        arr = np.arange(40 * 20 * 3, dtype=np.uint8).reshape(40, 20, 3)
        p = str(tmp_path / "img_0.png")
        Image.fromarray(arr).save(p)
        out = F.load_image(p, resize=8)
        assert out.shape == (8, 8, 3)

    def test_natural_sort(self):
        files = ["x/prompt_10.png", "x/prompt_2.png", "x/prompt_1.png"]
        assert F.natural_sort(files)[0].endswith("_1.png")
        assert F.natural_sort(files)[-1].endswith("_10.png")

    def test_npz_features(self, tmp_path):
        p = str(tmp_path / "f.npz")
        feats = np.random.default_rng(8).normal(size=(10, 4))
        np.savez(p, features=feats, radii=np.ones(10))
        got, radii = F.load_npz_features(p)
        np.testing.assert_allclose(got, feats)
        np.testing.assert_allclose(radii, np.ones(10))


class TestCLI:
    def _run(self, args):
        return subprocess.run(
            [sys.executable, "main.py"] + args, cwd=REPO, capture_output=True,
            text=True, timeout=300,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})

    def test_prec_recall_cli_npz(self, tmp_path):
        rng = np.random.default_rng(9)
        ref = str(tmp_path / "ref.npz")
        fake = str(tmp_path / "fake.npz")
        np.savez(ref, features=rng.normal(size=(100, 8)))
        np.savez(fake, features=rng.normal(size=(100, 8)))
        r = self._run(["eval_prec_recall", "--ref_dir", ref,
                       "--fake_dir", fake, "--k", "3"])
        assert r.returncode == 0, r.stderr
        lines = dict(ln.split(": ") for ln in r.stdout.strip().splitlines())
        assert 0.5 < float(lines["precision"]) <= 1.0
        assert 0.5 < float(lines["recall"]) <= 1.0

    def test_prec_recall_precalc_manifold(self, tmp_path):
        rng = np.random.default_rng(10)
        ref = str(tmp_path / "ref.npz")
        out = str(tmp_path / "manifold.npz")
        np.savez(ref, features=rng.normal(size=(50, 4)))
        r = self._run(["eval_prec_recall", "--ref_dir", ref,
                       "--fname_precalc", out])
        assert r.returncode == 0, r.stderr
        z = np.load(out)
        assert z["features"].shape == (50, 4)
        assert z["radii"].shape == (50,)

    def test_fid_cli_npz_features(self, tmp_path):
        rng = np.random.default_rng(11)
        fake_dir = tmp_path / "fake"
        fake_dir.mkdir()
        ref = str(tmp_path / "ref.npz")
        fake = str(fake_dir / "feats.npz")
        np.savez(ref, features=rng.normal(size=(400, 8)))
        np.savez(fake, features=rng.normal(size=(400, 8)) + 1.0)
        r = self._run(["eval_fid_clip", "--fake_dir", fake, "--ref_dir", ref,
                       "--skip-clip-score", "--eval_res", "256"])
        assert r.returncode == 0, r.stderr
        fid_line = [ln for ln in r.stdout.splitlines() if "FID_256px" in ln][0]
        fid = float(fid_line.split(": ")[1])
        assert 4.0 < fid < 14.0  # ~ D * shift^2 = 8

    def test_hpsv2_cli_reports_missing_model(self, tmp_path):
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        from PIL import Image

        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            str(img_dir / "prompt_0.png"))
        pp = str(tmp_path / "prompts.json")
        with open(pp, "w") as f:
            json.dump(["a cat"], f)
        r = self._run(["eval_hpsv2", "--image_path", str(img_dir),
                       "--prompt_path", pp])
        assert r.returncode != 0
        assert "clip-model-dir" in (r.stdout + r.stderr)
