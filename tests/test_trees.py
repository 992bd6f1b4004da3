"""Golden parity tests: tree-buffer compiler vs the reference implementation.

The reference compilers (models/drafters/utils.py:80-217 and utils_c.py:100-179)
are pure torch-CPU functions; we run them directly as oracles over every tree
in the library and check each compiled buffer.
"""

import numpy as np
import pytest

from lantern_tpu import trees
from tests.refmod import load_ref_utils, load_ref_utils_c

TREE_NAMES = sorted(trees.TREE_LIBRARY)


@pytest.fixture(scope="module")
def ref_utils():
    return load_ref_utils()


@pytest.fixture(scope="module")
def ref_utils_c():
    return load_ref_utils_c()


@pytest.mark.parametrize("name", TREE_NAMES)
def test_verifier_buffers_match_reference(name, ref_utils):
    paths = trees.TREE_LIBRARY[name]
    spec = trees.compile_tree(paths)
    ref = ref_utils.generate_tree_buffers(paths, device="cpu")

    np.testing.assert_array_equal(
        spec.attn_mask.astype(np.float32),
        ref["tree_attn_mask"][0, 0].numpy(),
    )
    np.testing.assert_array_equal(spec.tree_indices, ref["tree_indices"].numpy())
    np.testing.assert_array_equal(spec.depth, ref["tree_position_ids"].numpy())
    np.testing.assert_array_equal(
        spec.retrieve_indices, ref["retrieve_indices"].numpy()
    )

    # p_indices: reference gathers with wrap-around at pad slots; compare only
    # where the path position is valid.
    ref_p = np.asarray(ref["p_indices"])
    valid = spec.retrieve_valid
    np.testing.assert_array_equal(
        np.where(valid, spec.p_indices, 0), np.where(valid, ref_p, 0)
    )

    # b_indices: ragged per position -> compare as sets.
    for r in range(spec.num_paths):
        for c in range(spec.path_len):
            ref_b = ref["b_indices"][r][c]
            ref_set = set(int(x) for x in (ref_b.tolist() if hasattr(ref_b, "tolist") else ref_b))
            mine = set(int(x) for x in spec.b_indices[r, c] if x >= 0)
            if valid[r, c]:
                assert mine == ref_set, (name, r, c)


@pytest.mark.parametrize("name", TREE_NAMES)
def test_drafter_level_buffers_match_reference(name, ref_utils_c):
    paths = trees.TREE_LIBRARY[name]
    spec = trees.compile_tree(paths)
    ref = ref_utils_c.generate_tree_buffers(paths, device="cpu")

    assert len(spec.levels) == len(ref["tree_indices"])
    for d, lvl in enumerate(spec.levels):
        np.testing.assert_array_equal(
            lvl.child_flat_idx, ref["tree_indices"][d].numpy(), err_msg=f"{name} level {d}"
        )
        np.testing.assert_array_equal(
            lvl.attn_mask.astype(np.float32),
            ref["attn_mask"][d][0, 0].numpy(),
            err_msg=f"{name} level {d}",
        )
        # repeat_nums[i][g] = number of consecutive children of parent-group g;
        # equivalent to counting each parent_row's occurrences in order.
        counts = []
        prev, run = None, 0
        for pr in lvl.parent_row:
            if prev is None or pr == prev:
                run += 1
            else:
                counts.append(run)
                run = 1
            prev = pr
        counts.append(run)
        assert counts == list(ref["repeat_nums"][d]), f"{name} level {d}"


def test_tree_indices_reference_flat_grid_layout():
    # slot -> 1 + internal_rank(parent)*K + child_rank; root slot = 0
    spec = trees.compile_tree([[0], [1], [0, 0], [0, 1], [1, 0], [0, 0, 2]])
    # sorted paths: [0],[1],[00],[01],[10],[002]
    # internal nodes: root(r0), [0](r1), [1](r2), [00](r3)
    np.testing.assert_array_equal(
        spec.tree_indices, [0, 1, 2, 11, 12, 21, 33]
    )


def test_retrieve_rows_are_leaves():
    for name in TREE_NAMES:
        spec = trees.get_tree(name)
        n_leaves = spec.num_nodes - spec.num_internal
        assert spec.num_paths == n_leaves
        # every path starts at the root slot
        assert (spec.retrieve_indices[:, 0] == 0).all()


def test_compile_rejects_bad_specs():
    with pytest.raises(ValueError):
        trees.compile_tree([[0, 0]])  # not prefix-closed
    with pytest.raises(ValueError):
        trees.compile_tree([[0], [0]])  # duplicate
    with pytest.raises(ValueError):
        trees.compile_tree([[trees.TOPK]])  # rank out of range


def test_get_tree_json_formats(tmp_path):
    """Both on-disk calibration formats load: a bare path list
    (select_lumina_tree.py) and {"paths": ...} (optimize_bench_tree.py).
    Regression: the committed ckpts/bench_tree_lumina.json is a bare list
    and used to crash the bench's north-star lane."""
    import json

    paths = [[0], [1], [0, 0], [0, 1], [0, 0, 0]]
    bare = tmp_path / "bare.json"
    bare.write_text(json.dumps(paths))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"paths": paths, "rank_probs": [0.5, 0.2]}))
    a = trees.get_tree(str(bare))
    b = trees.get_tree(str(wrapped))
    np.testing.assert_array_equal(a.parent_slot, b.parent_slot)
    assert a.num_nodes == len(paths) + 1

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname in ("ckpts/bench_tree_lumina.json", "ckpts/bench_tree_XL.json"):
        p = os.path.join(repo, fname)
        if os.path.exists(p):
            trees.get_tree(p)
