"""Data layer: packed store round-trip, train sampling invariants
(mirroring the reference asserts at cone/ego4d_mad_dataloader.py:141-224)."""

import math
import os

import numpy as np
import pytest

from cone_tpu.config import DataConfig
from cone_tpu.data import make_synthetic_dataset, write_packed_store
from cone_tpu.data.dataset import TrainLoader, gaussian_window_choice
from cone_tpu.data.store import PackedArrayStore


def test_packed_store_roundtrip(tmp_path, rng):
    items = {
        f"vid_{i}": rng.normal(size=(int(rng.integers(5, 50)), 16)).astype(np.float32)
        for i in range(7)
    }
    path = str(tmp_path / "feat.cfs")
    write_packed_store(path, items)
    store = PackedArrayStore(path)
    assert set(store.keys()) == set(items.keys())
    for k, v in items.items():
        np.testing.assert_array_equal(store.get(k), v)
    assert "vid_0" in store and "nope" not in store


def test_gaussian_choice_prefers_middle():
    rng = np.random.default_rng(0)
    ids = np.array([3, 4, 5, 6, 7])
    picks = [gaussian_window_choice(ids, rng) for _ in range(2000)]
    counts = np.bincount(picks, minlength=8)[3:8]
    assert counts.argmax() == 2  # middle window (5) most frequent
    assert counts[0] < counts[2] and counts[4] < counts[2]


@pytest.fixture(scope="module")
def ds():
    cfg = DataConfig(dset_name="synthetic", max_v_l=90, clip_length=1.0,
                     max_q_l=12, topk_window=5)
    return make_synthetic_dataset(cfg, n_videos=3, queries_per_video=4, dim=32,
                                  seed=3)


def test_train_sample_invariants(ds):
    rng = np.random.default_rng(1)
    cfg = ds.cfg
    stride = cfg.max_v_l // 2
    for i in range(len(ds)):
        ex = ds.examples[i]
        s = ds.sample_train(i, rng)
        ctx_l = len(ds.video_features(ex.clip_id)[0])
        # window bounds
        ws, wl = int(s["video_start"]), int(s["video_length"])
        assert 0 <= ws < ctx_l and 0 < wl <= cfg.max_v_l and ws + wl <= ctx_l
        # the chosen window overlaps GT
        gt_s = ex.timestamps[0] / cfg.clip_length
        gt_e = ex.timestamps[1] / cfg.clip_length
        assert ws < gt_e and ws + wl > gt_s
        # span label is a valid window-normalized cxw span
        c, w = s["span_labels"][0]
        assert 0 < w <= 1 + 1e-6 and 0 <= c <= 1
        st, ed = c - w / 2, c + w / 2
        assert -1e-6 <= st < ed <= 1 + 1e-6
        # span equals window-clipped GT
        exp_st = max(ws, gt_s) - ws
        exp_ed = min(ws + cfg.max_v_l, gt_e) - ws
        np.testing.assert_allclose(
            [st * wl, ed * wl], [exp_st, exp_ed], atol=1e-4
        )
        # proposal ints bracket the span
        assert s["prop_start"] == math.floor(exp_st)
        assert s["prop_end"] == math.ceil(exp_ed)
        # saliency frames: pos inside GT, neg outside
        sp, sn = int(s["sal_pos"][0]), int(s["sal_neg"][0])
        assert math.floor(exp_st) <= sp < math.ceil(exp_ed)
        assert not (math.floor(exp_st) <= sn < math.ceil(exp_ed))
        # masks consistent
        assert s["pos_mask"].sum() == wl
        assert s["query_mask"].sum() >= 1
        # features L2-normalized rows
        norms = np.linalg.norm(s["pos_appear"][: wl], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        # negative window does not overlap GT
        nm = int(s["neg_mask"].sum())
        assert nm > 0


def test_train_loader_batches(ds):
    loader = TrainLoader(ds, bsz=4, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["pos_motion"].shape == (4, ds.cfg.max_v_l, 32)
    assert b["query_tokens"].shape == (4, ds.cfg.max_q_l, 32)
    assert b["span_labels"].shape == (4, ds.cfg.max_windows, 2)
    # determinism
    b2 = next(iter(TrainLoader(ds, bsz=4, seed=0).epoch(0)))
    np.testing.assert_array_equal(b["pos_motion"], b2["pos_motion"])


def test_txt_drop_ratio_zeroes_token_rows():
    """cfg.txt_drop_ratio blanks round(L*ratio) token rows at train time
    (cone/config.py:113-114; Moment-DETR random_drop_rows semantics) while
    leaving the mask and the zero-ratio path untouched."""
    import dataclasses

    base = DataConfig(dset_name="synthetic", max_v_l=90, clip_length=1.0,
                      max_q_l=12, topk_window=5)
    ds0 = make_synthetic_dataset(base, n_videos=2, queries_per_video=3, dim=32,
                                 seed=3)
    ds_drop = make_synthetic_dataset(
        dataclasses.replace(base, txt_drop_ratio=0.5),
        n_videos=2, queries_per_video=3, dim=32, seed=3)

    s0 = ds0.sample_train(0, np.random.default_rng(7))
    s1 = ds_drop.sample_train(0, np.random.default_rng(7))
    n_tok = int(s0["query_mask"].sum())
    tok0 = s0["query_tokens"][:n_tok]
    tok1 = s1["query_tokens"][:n_tok]
    zeroed = np.all(tok1 == 0, axis=1) & ~np.all(tok0 == 0, axis=1)
    assert zeroed.sum() == round(n_tok * 0.5)
    # non-dropped rows identical, mask unchanged (rows blanked, not removed)
    np.testing.assert_array_equal(tok1[~zeroed], tok0[~zeroed])
    np.testing.assert_array_equal(s1["query_mask"], s0["query_mask"])
    # deterministic given the same seeded rng
    s1b = ds_drop.sample_train(0, np.random.default_rng(7))
    np.testing.assert_array_equal(s1b["query_tokens"], s1["query_tokens"])


def test_train_loader_row_slice_matches_full(ds):
    """The multi-host loader contract (dataset.py TrainLoader.epoch): rows
    [lo:hi) of each global batch materialize bit-identically whether the
    process builds the full batch or only its slice — per-sample seeded
    generators make the rows independent of who builds them."""
    full = list(TrainLoader(ds, bsz=4, seed=0).epoch(0))
    lo, hi = 2, 4
    part = list(TrainLoader(ds, bsz=4, seed=0).epoch(0, lo=lo, hi=hi))
    assert len(part) == len(full)
    for fb, pb in zip(full, part):
        for k in fb:
            np.testing.assert_array_equal(fb[k][lo:hi], pb[k])
