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
        # pinned HPSv2.1 backbone is the default; the error names its inputs
        assert "--model" in (r.stdout + r.stderr)
        r = self._run(["eval_hpsv2", "--image_path", str(img_dir),
                       "--prompt_path", pp, "--backbone", "hf_clip"])
        assert r.returncode != 0
        assert "clip-model-dir" in (r.stdout + r.stderr)


class TestFIDInception:
    """The pinned FID backbone (evals/inception.py): structural census of the
    canonical pt_inception checkpoint, the Inception-V3 spatial trace, the
    clean-fid float-bicubic resize, and FID through the full extractor."""

    def test_state_dict_census(self):
        from lantern_tpu.evals import inception as inc

        exp = inc.expected_state_dict_shapes()
        convs = [k for k in exp if k.endswith("conv.weight")]
        # Inception-V3 pool3 has exactly 94 convolutions:
        # 5 stem + 3 blocks A (7 each) + B (4) + 4 blocks C (10 each)
        # + D (6) + 2 blocks E (9 each)
        assert len(convs) == 94
        assert len(exp) == 94 * 5
        # spot-pin canonical names/shapes (torchvision inception_v3 layout)
        assert exp["Conv2d_1a_3x3.conv.weight"] == (32, 3, 3, 3)
        assert exp["Mixed_5b.branch5x5_2.conv.weight"] == (64, 48, 5, 5)
        assert exp["Mixed_6b.branch7x7_2.conv.weight"] == (128, 128, 1, 7)
        assert exp["Mixed_7a.branch3x3_2.conv.weight"] == (320, 192, 3, 3)
        assert exp["Mixed_7c.branch3x3dbl_3b.conv.weight"] == (384, 384, 3, 1)
        assert exp["Mixed_7c.branch_pool.conv.weight"] == (192, 2048, 1, 1)

    def test_converter_strictness(self):
        from lantern_tpu.evals import inception as inc

        rng = np.random.default_rng(0)
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in inc.expected_state_dict_shapes().items()}
        sd["fc.weight"] = rng.normal(size=(1008, 2048)).astype(np.float32)
        sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
        p = inc.params_from_torch(sd)          # extra keys ignored
        assert p["Conv2d_1a_3x3"]["w"].shape == (3, 3, 3, 32)   # HWIO
        bad = dict(sd)
        del bad["Mixed_6e.branch_pool.bn.running_var"]
        with pytest.raises(ValueError, match="missing"):
            inc.params_from_torch(bad)

    def test_spatial_trace_and_features(self):
        from lantern_tpu.evals import inception as inc

        params = inc.init_random_params()
        dims = inc.spatial_trace(params)
        # the canonical Inception-V3 trace at 299 input
        assert dims[0] == (149, 149, 32)
        assert dims[3] == (73, 73, 64)
        assert dims[5] == (71, 71, 192)
        assert dims[6] == (35, 35, 192)
        assert dims[7] == (35, 35, 256)      # Mixed_5b
        assert dims[9] == (35, 35, 288)      # Mixed_5d
        assert dims[10] == (17, 17, 768)     # Mixed_6a
        assert dims[15] == (8, 8, 1280)      # Mixed_7a
        assert dims[16] == (8, 8, 2048)      # Mixed_7b
        assert dims[17] == (8, 8, 2048)      # Mixed_7c
        feats = inc.pool3_features(
            params, np.zeros((2, 299, 299, 3), np.float32))
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()

    def test_clean_resize_is_float_bicubic(self):
        from PIL import Image

        from lantern_tpu.evals.inception import clean_resize

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
        out = clean_resize(img, size=8)
        assert out.shape == (8, 8, 3) and out.dtype == np.float32
        # per-channel 'F'-mode PIL bicubic, bit-exact
        ref = np.stack([
            np.asarray(Image.fromarray(img[..., c].astype(np.float32),
                                       mode="F").resize((8, 8),
                                                        Image.BICUBIC))
            for c in range(3)], axis=-1)
        np.testing.assert_array_equal(out, ref)
        # float path keeps out-of-uint8 precision (the "clean" fix): a
        # constant image stays exactly constant
        const = np.full((31, 31, 3), 101.5, np.float32)
        np.testing.assert_allclose(clean_resize(const, 8), 101.5, rtol=1e-6)

    def test_fid_through_extractor(self, tmp_path):
        from PIL import Image

        from lantern_tpu.evals import features as F
        from lantern_tpu.evals import metrics as M

        rng = np.random.default_rng(2)
        for d in ("a", "b"):
            (tmp_path / d).mkdir()
            for i in range(3):
                arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
                Image.fromarray(arr).save(tmp_path / d / f"{i}.png")
        ex = F.make_extractor("fid_inception")       # random weights
        fa = F.extract_dir_features(str(tmp_path / "a"), ex, batch=2)
        fb = F.extract_dir_features(str(tmp_path / "b"), ex, batch=2)
        assert fa.shape == (3, 2048)
        assert M.fid_from_features(fa, fa) < 1e-4
        assert M.fid_from_features(fa, fb) > 0


class TestVGG16Backbone:
    """Pinned precision/recall backbone (evals/vgg.py): torchvision vgg16
    census, fc2 extraction shape, manifold round trip."""

    def test_census_matches_torchvision_vgg16(self):
        from lantern_tpu.evals import vgg

        exp = vgg.expected_state_dict_shapes()
        convs = [k for k in exp if k.startswith("features.")
                 and k.endswith(".weight")]
        assert len(convs) == 13                  # VGG16 = 13 convs + 3 FC
        # canonical torchvision indices: conv layers at these slots
        idxs = sorted(int(k.split(".")[1]) for k in convs)
        assert idxs == [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        assert exp["features.0.weight"] == (64, 3, 3, 3)
        assert exp["features.28.weight"] == (512, 512, 3, 3)
        assert exp["classifier.0.weight"] == (4096, 25088)
        assert exp["classifier.3.weight"] == (4096, 4096)

    def test_fc2_extraction_and_manifold(self, tmp_path):
        from PIL import Image

        from lantern_tpu.evals import features as F
        from lantern_tpu.evals import metrics as M

        rng = np.random.default_rng(3)
        (tmp_path / "imgs").mkdir()
        for i in range(4):
            arr = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "imgs" / f"{i}.png")
        ex = F.make_extractor("vgg16_jax")      # random weights
        feats = F.extract_dir_features(str(tmp_path / "imgs"), ex, batch=2)
        assert feats.shape == (4, 4096)
        assert np.isfinite(feats).all()
        # distinct inputs -> distinct features (wiring is input-sensitive)
        assert np.abs(feats[0] - feats[1]).max() > 1e-4
        pr = M.precision_recall(feats, feats, k=2)
        assert pr.precision == 1.0 and pr.recall == 1.0

    def test_converter_missing_key(self):
        from lantern_tpu.evals import vgg

        rng = np.random.default_rng(0)
        sd = {k: rng.normal(size=s).astype(np.float32)
              for k, s in vgg.expected_state_dict_shapes().items()}
        del sd["features.12.bias"]
        with pytest.raises(ValueError, match="missing"):
            vgg.params_from_torch(sd)


class TestClipBackbone:
    """Pinned CLIP ViT-B/32 (CLIP score) and ViT-H/14 (HPSv2.1) backbones —
    census + numeric parity vs transformers CLIPModel as torch oracle."""

    def test_census_matches_hf_vit_b32(self):
        # transformers' default CLIPConfig IS ViT-B/32; its converted state
        # dict must match our pinned census key-for-key, shape-for-shape
        import torch
        from transformers import CLIPConfig, CLIPModel

        from lantern_tpu.evals import clip as C

        with torch.device("meta"):        # shapes only, no 600MB alloc
            model = CLIPModel(CLIPConfig())
        sd = {k: np.zeros(tuple(v.shape), np.float32)
              for k, v in model.state_dict().items()
              if "position_ids" not in k}
        conv = C.hf_to_openai(sd)
        exp = C.expected_state_dict_shapes(C.VIT_B32)
        assert set(conv) == set(exp)
        for k, s in exp.items():
            assert tuple(np.shape(conv[k])) == s, k

    def test_h14_census_structure(self):
        from lantern_tpu.evals import clip as C

        exp = C.expected_state_dict_shapes(C.VIT_H14)
        assert exp["visual.positional_embedding"] == (257, 1280)
        assert exp["visual.conv1.weight"] == (1280, 3, 14, 14)
        assert exp["visual.proj"] == (1280, 1024)
        assert exp["text_projection"] == (1024, 1024)
        assert sum(1 for k in exp
                   if k.startswith("visual.transformer.resblocks")) == 32 * 12
        # loaders keep the pinned census honest
        sd = {k: np.zeros(s, np.float32) for k, s in exp.items()}
        C.params_from_openai(sd, C.VIT_H14)
        with pytest.raises(ValueError, match="missing"):
            C.params_from_openai({k: v for k, v in sd.items()
                                  if k != "visual.proj"}, C.VIT_H14)

    def test_numeric_parity_vs_hf_clip(self):
        import torch
        from transformers import CLIPConfig, CLIPModel
        from transformers import CLIPTextConfig, CLIPVisionConfig

        from lantern_tpu.evals import clip as C

        geom = C.CLIPGeom(vision_width=64, vision_layers=2, vision_heads=4,
                          patch=16, image_size=64, embed_dim=32,
                          text_width=48, text_layers=2, text_heads=4,
                          vocab=128, ctx=16, quick_gelu=True)
        cfgv = CLIPVisionConfig(hidden_size=64, intermediate_size=256,
                                num_hidden_layers=2, num_attention_heads=4,
                                image_size=64, patch_size=16,
                                hidden_act="quick_gelu")
        # eos_token_id must be the max id so HF's eos-pooling coincides with
        # the OpenAI argmax-pooling convention our encode_text implements
        cfgt = CLIPTextConfig(hidden_size=48, intermediate_size=192,
                              num_hidden_layers=2, num_attention_heads=4,
                              vocab_size=128, max_position_embeddings=16,
                              hidden_act="quick_gelu", eos_token_id=127)
        torch.manual_seed(0)
        model = CLIPModel(CLIPConfig(text_config=cfgt.to_dict(),
                                     vision_config=cfgv.to_dict(),
                                     projection_dim=32)).eval()
        sd = {k: v.numpy() for k, v in model.state_dict().items()
              if "position_ids" not in k}
        params = C.params_from_openai(C.hf_to_openai(sd), geom)

        rng = np.random.default_rng(0)
        imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
        toks = np.zeros((2, 16), np.int64)
        toks[0, :5] = [1, 7, 9, 4, 127]
        toks[1, :3] = [1, 20, 127]

        with torch.no_grad():
            x = (imgs - C.CLIP_MEAN) / C.CLIP_STD
            ref_img = model.get_image_features(
                torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
            ref_txt = model.get_text_features(torch.from_numpy(toks)).numpy()

        got_img = np.asarray(C.encode_image(params, imgs, geom))
        got_txt = np.asarray(C.encode_text(params, toks, geom))
        np.testing.assert_allclose(got_img, ref_img, atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(got_txt, ref_txt, atol=2e-4, rtol=1e-3)

    def test_extractor_and_cosine(self):
        from lantern_tpu.evals import clip as C

        geom = C.CLIPGeom(vision_width=32, vision_layers=1, vision_heads=2,
                          patch=16, image_size=32, embed_dim=16,
                          text_width=32, text_layers=1, text_heads=2,
                          vocab=64, ctx=8)
        ex = C.CLIPExtractor(weights=None, geom=geom)
        rng = np.random.default_rng(1)
        feats = ex.image_features(
            (rng.random((3, 48, 40, 3)) * 255).astype(np.uint8))
        assert feats.shape == (3, 16)
        cos = np.asarray(C.cosine_scores(feats, feats))
        np.testing.assert_allclose(cos, 1.0, atol=1e-5)


class TestClipTokenizer:
    def _merges(self):
        # synthetic merges over the byte alphabet: enough to exercise the
        # greedy lowest-rank loop, word-end markers, and the cache
        return [("h", "e"), ("l", "l"), ("o</w>", ""), ("he", "ll"),
                ("t", "h"), ("th", "e</w>")]

    def test_matches_transformers_tokenizer(self, tmp_path):
        import json as _json

        from transformers import CLIPTokenizer

        from lantern_tpu.evals.clip_bpe import ClipTokenizer

        merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("t", "h"),
                  ("th", "e</w>"), ("hell", "o</w>")]
        tok = ClipTokenizer(merges, ctx=16)
        vocab_file = tmp_path / "vocab.json"
        vocab_file.write_text(_json.dumps(tok.encoder))
        merges_file = tmp_path / "merges.txt"
        merges_file.write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
        hf = CLIPTokenizer(str(vocab_file), str(merges_file),
                           model_max_length=16)
        for text in ("hello the hell", "The HELLO!", "a b  c", "th th th"):
            got = tok([text])[0].tolist()
            ref = hf(text, truncation=True, max_length=16)["input_ids"]
            # OpenAI pads with zeros (HF's pad token is EOT); compare the
            # real ids and check our zero tail
            assert got[: len(ref)] == ref, (text, got, ref)
            assert all(x == 0 for x in got[len(ref):]), (text, got)

    def test_prepend_splice(self):
        from lantern_tpu.evals.clip_bpe import ClipTokenizer

        tok = ClipTokenizer([("h", "e")], ctx=8)
        plain = tok(["hello"])[0]
        spliced = tok(["hello"], prepend="the")[0]
        assert spliced[0] == tok.sot
        # prepend ids sit between SOT and the text ids
        pre = tok.encode("the")
        assert spliced[1: 1 + len(pre)].tolist() == pre
        assert plain[0] == tok.sot


class TestPinnedCliWiring:
    def test_fid_clip_b32_requires_weights(self, tmp_path):
        from entrypoints_tpu import eval_fid_clip as E

        d = tmp_path / "imgs"
        d.mkdir()
        with pytest.raises(SystemExit, match="clip_b32 needs"):
            E.main(["--fake_dir", str(d), "--ref_dir", str(d)])

    def test_hpsv2_pinned_requires_model_and_merges(self, tmp_path):
        from PIL import Image

        from entrypoints_tpu import eval_hpsv2 as E

        d = tmp_path / "imgs"
        d.mkdir()
        Image.new("RGB", (32, 32)).save(d / "image_0.png")
        pp = tmp_path / "prompts.json"
        pp.write_text(json.dumps(["a cat"]))
        with pytest.raises(SystemExit, match="pinned needs --model"):
            E.main(["--image_path", str(d), "--prompt_path", str(pp)])
