"""Finetune data pipeline tests (xllmx-equivalent: dataset.py / sampler.py)."""

import json

import numpy as np
import pytest

from lantern_tpu.train.data import (
    LengthClusteredSampler,
    MetaDataset,
    mild_shuffle,
    pad_batch,
    read_jsonl,
)


@pytest.fixture
def meta(tmp_path):
    a = tmp_path / "text.jsonl"
    with open(a, "w") as f:
        for i in range(40):
            f.write(json.dumps({"tokens": list(range(i + 1)), "id": f"t{i}"}) + "\n")
    b = tmp_path / "imgs.json"
    with open(b, "w") as f:
        json.dump([{"len": 100 + i, "id": f"i{i}"} for i in range(24)], f)
    cfg = tmp_path / "meta.json"
    with open(cfg, "w") as f:
        json.dump([
            {"path": "text.jsonl", "type": "text"},
            {"path": "imgs.json", "type": "image_text", "ratio": 0.5},
        ], f)
    return str(cfg)


def test_meta_dataset_indexing(meta):
    ds = MetaDataset(meta)
    assert len(ds) == 64
    assert ds[0]["id"] == "t0"
    assert ds[40]["id"] == "i0"
    assert ds.meta_collection[0]["item_len_list"][5] == 6
    assert ds.meta_collection[1]["item_len_list"][3] == 103


def test_read_jsonl_skips_blank_lines(tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": 1}\n\n{"a": 2}\n')
    assert [r["a"] for r in read_jsonl(str(p))] == [1, 2]


def test_single_type_batches(meta):
    ds = MetaDataset(meta)
    sampler = LengthClusteredSampler(ds, num_replicas=2, rank=0, batch_size=4)
    for batch in sampler:
        kinds = {"text" if i < 40 else "image_text" for i in batch}
        assert len(kinds) == 1
        assert len(batch) == 4


def test_replicas_partition_batches(meta):
    ds = MetaDataset(ds_or_meta := meta)
    s0 = LengthClusteredSampler(ds, num_replicas=2, rank=0, batch_size=4, seed=1)
    s1 = LengthClusteredSampler(ds, num_replicas=2, rank=1, batch_size=4, seed=1)
    for b0, b1 in zip(s0, s1):
        assert not (set(b0) & set(b1))


def test_length_clustering_bounds_batch_spread(meta):
    ds = MetaDataset(meta)
    sampler = LengthClusteredSampler(ds, num_replicas=1, rank=0, batch_size=8,
                                     shuffle_factor=0.05)
    lens = {i: l for m_start, m in [(0, ds.meta_collection[0]),
                                    (40, ds.meta_collection[1])]
            for i, l in enumerate(m["item_len_list"], start=m_start)}
    for batch in sampler:
        ls = [lens[i] for i in batch]
        if batch[0] < 40:  # text group: full set, tight clustering
            assert max(ls) - min(ls) <= 16  # vs ~40 for random batching
        else:  # image group is ratio-subsampled before clustering
            assert max(ls) - min(ls) <= 24


def test_epoch_changes_order_resume_skips(meta):
    ds = MetaDataset(meta)
    s = LengthClusteredSampler(ds, num_replicas=1, rank=0, batch_size=4, seed=3)
    s.set_epoch(0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert e0 != e1
    s.set_epoch(0, start_iter=2)
    assert list(s) == e0[2:]


def test_ratio_subsamples(meta):
    ds = MetaDataset(meta)
    s = LengthClusteredSampler(ds, num_replicas=1, rank=0, batch_size=4)
    img_items = [i for b in s for i in b if i >= 40]
    assert len(img_items) == 12  # 24 * 0.5 = 12 (one batch dropped by rounding)


def test_mild_shuffle_is_local_permutation():
    rng = np.random.default_rng(0)
    items = list(range(100))
    out = mild_shuffle(items, 0.05, rng)
    assert sorted(out) == items
    assert max(abs(v - i) for i, v in enumerate(out)) <= 10  # 2 * radius
    assert out != items


def test_pad_batch_buckets():
    out, mask = pad_batch([[1, 2, 3], [4]], pad_id=9, multiple=4)
    assert out.shape == (2, 4)
    np.testing.assert_array_equal(out[1], [4, 9, 9, 9])
    assert mask.sum() == 4


def test_h5_annotation_cache(tmp_path):
    """The reference's on-disk h5 annotation cache (xllmx/data/dataset.py:
    97-146): rank 0 builds data.h5 + ready, readers decode items lazily;
    a second rank-1 open sees the same items without the source files."""
    from lantern_tpu.train.data import MetaDataset

    ann = [{"tokens": list(range(3 + i)), "type": "t"} for i in range(7)]
    src = tmp_path / "a.jsonl"
    src.write_text("\n".join(json.dumps(a) for a in ann))
    meta = [{"path": str(src), "type": "text", "ratio": 1.0}]
    cache = tmp_path / "cache"

    ds = MetaDataset(meta, cache_on_disk=True, cache_dir=str(cache), rank=0)
    assert (cache / "data.h5").exists() and (cache / "ready").exists()
    assert len(ds) == 7
    assert ds[2] == ann[2]
    assert ds[-1] == ann[-1]
    assert ds.meta_collection[0]["item_len_list"] == [3 + i for i in range(7)]

    # a non-zero rank must not rebuild; items identical, source removable
    src.unlink()
    ds2 = MetaDataset(meta, cache_on_disk=True, cache_dir=str(cache), rank=1)
    assert [ds2[i] for i in range(7)] == ann

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        MetaDataset(meta, cache_on_disk=True, cache_dir=str(tmp_path / "x"),
                    rank=1, cache_timeout_s=1.0)



def test_pkl_and_pth_annotations(tmp_path):
    import pickle

    import torch

    from lantern_tpu.train.data import read_annotations

    ann = [{"text": "a b c"}, {"text": "d"}]
    p = tmp_path / "a.pkl"
    p.write_bytes(pickle.dumps(ann))
    assert read_annotations(str(p)) == ann
    q = tmp_path / "a.pth"
    torch.save(ann, str(q))
    assert read_annotations(str(q)) == ann
