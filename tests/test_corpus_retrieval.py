"""Corpus-level retrieval: one query searched across all resident videos
(serve/corpus.py; no reference counterpart — the reference always grounds
in the annotated video)."""

import dataclasses

import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.models.init import build_model_and_params
from cone_tpu.serve.corpus import CorpusRetriever

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32, adapter_module="none",
        ),
        data=DataConfig(
            max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=5,
            max_ctx_l=256, max_windows=5,
        ),
        eval=EvalConfig(nms_thd=0.5, max_after_nms=5),
    )


@pytest.fixture(scope="module")
def ds(cfg):
    # each query's coarse signal is planted only inside its own video
    return make_synthetic_dataset(
        cfg.data, n_videos=4, queries_per_video=2, ctx_l_range=(100, 220),
        dim=DIM, signal=3.0, seed=13,
    )


@pytest.fixture(scope="module")
def retriever(cfg, ds):
    model, params = build_model_and_params(cfg.model, seed=0)
    return CorpusRetriever(model, params, cfg, dataset=ds)


def test_rank_videos_finds_the_right_video(retriever, ds):
    """The coarse retrieval signal (the part that carries the planted
    query-frame similarity) must rank the query's own video first."""
    hits = 0
    for ex in ds.examples:
        _, cls = ds.query_features(ex.query_id)
        ranking = retriever.rank_videos(cls)
        assert len(ranking) == 4
        scores = [s for _, s in ranking]
        assert scores == sorted(scores, reverse=True)
        hits += ranking[0][0] == ex.clip_id
    assert hits >= len(ds.examples) - 1, hits


def test_search_moments_cover_the_right_video(retriever, ds):
    """End-to-end search: the query's own video appears among the returned
    moments' videos for every query, and the top moment comes from it for
    most (the fine stage's fusion rerank is untrained noise here — its
    *moment* quality is pinned by the per-video pipeline parity tests)."""
    covered, top_hits = 0, 0
    for ex in ds.examples:
        tok, cls = ds.query_features(ex.query_id)
        out = retriever.search(tok, cls, query=ex.query)
        assert out, ex.query_id
        covered += any(o["video_id"] == ex.clip_id for o in out)
        top_hits += out[0]["video_id"] == ex.clip_id
    assert covered == len(ds.examples)
    assert top_hits >= len(ds.examples) // 2, top_hits


def test_search_budget_and_format(retriever, ds, cfg):
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    out = retriever.search(tok, cls, search_windows=8, top_moments=3)
    assert 1 <= len(out) <= 3
    fused = [o["fused"] for o in out]
    assert fused == sorted(fused, reverse=True)
    for o in out:
        assert o["span"][0] <= o["span"][1] + 1e-6
        assert o["video_id"] in {e.clip_id for e in ds.examples}


def test_add_video_expands_the_corpus(cfg, ds):
    model, params = build_model_and_params(cfg.model, seed=0)
    r = CorpusRetriever(model, params, cfg)
    assert not r.clip_ids
    rng = np.random.default_rng(0)
    r.add_video("fresh", rng.standard_normal((120, DIM)).astype(np.float32))
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    out = r.search(tok, cls)
    assert out and all(o["video_id"] == "fresh" for o in out)


def test_append_video_streaming_ingest(cfg, ds):
    """append_video == add_video of the full concatenation (bit-identical
    search results), and a segment planted in the appended tail is found at
    its post-append offset — the live-feed contract."""
    model, params = build_model_and_params(cfg.model, seed=0)
    rng = np.random.default_rng(7)
    old = rng.standard_normal((96, DIM)).astype(np.float32)
    new = rng.standard_normal((64, DIM)).astype(np.float32)
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    # plant the query signal ONLY in the appended tail, at clips [120, 140)
    new[24:44] += 3.0 * cls / np.linalg.norm(cls)

    grown = CorpusRetriever(model, params, cfg)
    grown.add_video("live", old)
    pre = grown.search(tok, cls)  # forces stacking of the pre-append corpus
    assert all(o["span"][1] <= 96.0 + 1e-6 for o in pre)
    n = grown.append_video("live", new)
    assert n == 160

    rebuilt = CorpusRetriever(model, params, cfg)
    rebuilt.add_video("live", np.concatenate([old, new]))

    a = grown.search(tok, cls, top_moments=5)
    b = rebuilt.search(tok, cls, top_moments=5)
    assert a == b, "append must equal a from-scratch rebuild"
    best = max(a, key=lambda o: o["match"])
    assert best["span"][0] < 140 and best["span"][1] > 115, a

    # a video unknown to the corpus cannot be appended to
    with pytest.raises(KeyError):
        grown.append_video("nope", new)


def test_adaptive_margin_budget(cfg, ds):
    """adaptive_margin shrinks the per-query fine budget by coarse-score
    concentration: an effectively-infinite margin reproduces the fixed
    budget exactly; margin 0 refines only windows tied with the query's
    best, equivalent to searching with that many windows."""
    model, params = build_model_and_params(cfg.model, seed=0)
    rng = np.random.default_rng(11)
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    clsn = cls / np.linalg.norm(cls)

    r = CorpusRetriever(model, params, cfg)
    va = rng.standard_normal((120, DIM)).astype(np.float32)
    vb = rng.standard_normal((120, DIM)).astype(np.float32)
    # one towering window in vb; everything else is noise far below it
    vb[40:56] += 8.0 * clsn
    r.add_video("a", va)
    r.add_video("b", vb)

    base = r.search(tok, cls, top_moments=5)
    assert r.search(tok, cls, top_moments=5, adaptive_margin=1e9) == base

    # count how many merged windows survive margin 0 (ties with the best)
    scored = r._coarse_all(clsn[None])
    from cone_tpu.ops.windows import num_windows as nw

    all_scores = np.concatenate(
        [s[0][: nw(ctx, r.pipe.stride)] for _, ctx, s in scored])
    n_tied = int((all_scores >= all_scores.max()).sum())
    assert n_tied < 20  # the margin cut must bind below the budget
    tight = r.search(tok, cls, top_moments=5, search_windows=20,
                     adaptive_margin=0.0)
    want = r.search(tok, cls, top_moments=5, search_windows=n_tied)
    assert tight == want
    best = max(tight, key=lambda o: o["match"])
    assert best["video_id"] == "b"


def test_remove_video_and_corpus_persistence(cfg, ds, tmp_path):
    """The full library lifecycle: remove evicts a video from search
    results; save_corpus -> load_corpus in a fresh retriever reproduces
    search results bit-exactly (the durability path for live ingest)."""
    model, params = build_model_and_params(cfg.model, seed=0)
    rng = np.random.default_rng(21)
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    clsn = cls / np.linalg.norm(cls)

    r = CorpusRetriever(model, params, cfg)
    va = rng.standard_normal((100, DIM)).astype(np.float32)
    vb = rng.standard_normal((120, DIM)).astype(np.float32)
    vb[40:60] += 3.0 * clsn
    r.add_video("a", va)
    r.add_video("b", vb)
    before = r.search(tok, cls)
    assert any(o["video_id"] == "b" for o in before)

    # persist, then rebuild in a FRESH retriever: identical results
    n = r.save_corpus(str(tmp_path / "lib"))
    assert n == 2
    fresh = CorpusRetriever(model, params, cfg)
    assert fresh.load_corpus(str(tmp_path / "lib")) == 2
    assert fresh.search(tok, cls) == before

    # evict the planted video: no result mentions it anymore
    r.remove_video("b")
    assert r.clip_ids == ["a"]
    after = r.search(tok, cls)
    assert after and all(o["video_id"] == "a" for o in after)
    with pytest.raises(ValueError):
        r.remove_video("b")

    # mixed corpus: dual-stream videos keep their motion stream across the
    # round trip, single-stream ones reload as ONE shared array
    r2 = CorpusRetriever(model, params, cfg)
    r2.add_video("d", rng.standard_normal((50, DIM)).astype(np.float32),
                 motion_feats=rng.standard_normal((50, DIM)).astype(np.float32))
    r2.add_video("s", rng.standard_normal((40, DIM)).astype(np.float32))
    r2.save_corpus(str(tmp_path / "lib2"))
    f2 = CorpusRetriever(model, params, cfg)
    assert f2.load_corpus(str(tmp_path / "lib2")) == 2
    ap_d, mo_d = f2.pipe.ds.video_features("d")
    assert mo_d is not ap_d and not np.allclose(ap_d, mo_d)
    ap_s, mo_s = f2.pipe.ds.video_features("s")
    assert mo_s is ap_s


def test_search_with_int8_corpus_agrees_on_top_video(cfg, ds):
    """Retrieval composes with the quantized corpus: the top-ranked video
    matches the fp32 retriever for every query (strong signal)."""
    model, params = build_model_and_params(cfg.model, seed=0)
    f32 = CorpusRetriever(model, params, cfg, dataset=ds)
    i8 = CorpusRetriever(
        model, params,
        cfg.replace(eval=dataclasses.replace(cfg.eval, corpus_dtype="int8")),
        dataset=ds,
    )
    agree = 0
    for ex in ds.examples:
        tok, cls = ds.query_features(ex.query_id)
        a = f32.search(tok, cls)
        b = i8.search(tok, cls)
        agree += a[0]["video_id"] == b[0]["video_id"]
    assert agree >= len(ds.examples) - 1


def test_search_batch_matches_single_searches(retriever, ds):
    """search_batch == per-query search (same merge, fine math and
    postproc; the batch only changes dispatch packing)."""
    toks, clss, singles = [], [], []
    for ex in ds.examples[:5]:
        tok, cls = ds.query_features(ex.query_id)
        toks.append(tok)
        clss.append(cls)
        singles.append(retriever.search(tok, cls, query=ex.query))
    batch = retriever.search_batch(
        toks, np.stack(clss), queries=[e.query for e in ds.examples[:5]])
    assert len(batch) == 5
    for got, want in zip(batch, singles):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g["video_id"] == w["video_id"]
            np.testing.assert_allclose(g["span"], w["span"], atol=1e-4)
            np.testing.assert_allclose(g["fused"], w["fused"], atol=1e-3)


def test_dual_stream_corpus(cfg, ds):
    """A corpus with distinct appearance/motion stores exercises the
    stacked dual-stream branch (M/MS); results stay well-formed and the
    coarse ranking (appearance-driven) still finds the planted video."""
    from cone_tpu.data.dataset import GroundingDataset
    from cone_tpu.data.store import InMemoryArrayStore

    rng = np.random.default_rng(3)
    appear = {c: ds.video_features(c)[0] for c in ds.video_ids}
    motion = {c: a + 0.01 * rng.standard_normal(a.shape).astype(np.float32)
              for c, a in appear.items()}
    dual = GroundingDataset(ds.examples, InMemoryArrayStore(appear), ds.text,
                            cfg.data,
                            video_motion_store=InMemoryArrayStore(motion))
    model, params = build_model_and_params(cfg.model, seed=0)
    r = CorpusRetriever(model, params, cfg, dataset=dual)
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    assert r.rank_videos(cls)[0][0] == ex.clip_id
    out = r.search(tok, cls)
    assert out and all(o["span"][0] <= o["span"][1] + 1e-6 for o in out)
    # the stack kept two streams
    bucket = next(iter(r._ensure_stacked().values()))
    assert bucket[3] is not None  # M


def test_search_windows_concentrated_in_one_video(cfg, ds):
    """A corpus-wide budget larger than data.topk_window whose selected
    windows ALL land in one video must dispatch multiple fine rows (the fine
    program has only topk_window lanes) rather than crash or silently drop
    the excess windows."""
    model, params = build_model_and_params(cfg.model, seed=0)
    r = CorpusRetriever(model, params, cfg)
    rng = np.random.default_rng(7)
    # single resident video, 17 windows (ctx 256, stride 16)
    r.add_video("solo", rng.standard_normal((256, DIM)).astype(np.float32))
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)

    seen_windows = set()
    orig_fine = r.pipe._fine_fn

    def spy(params, a, asc, m, msc, ctx, win_idx, *rest):
        seen_windows.update(np.asarray(win_idx).reshape(-1).tolist())
        return orig_fine(params, a, asc, m, msc, ctx, win_idx, *rest)

    r.pipe._fine_fn = spy
    out = r.search(tok, cls, search_windows=12, top_moments=10)
    assert out and all(o["video_id"] == "solo" for o in out)
    # budget honored: 12 > topk_window=5 distinct windows reached the fine
    # stage (split across ceil(12/5) rows), not a clamped 5
    assert len(seen_windows) >= 12, sorted(seen_windows)


def test_add_video_dual_stream_motion(cfg, ds):
    """add_video with an explicit motion stream keeps the two streams
    distinct in the resident stack (appearance drives coarse, motion drives
    the fine forward) instead of silently duplicating appearance."""
    model, params = build_model_and_params(cfg.model, seed=0)
    r = CorpusRetriever(model, params, cfg)
    rng = np.random.default_rng(11)
    ap = rng.standard_normal((96, DIM)).astype(np.float32)
    mo = rng.standard_normal((96, DIM)).astype(np.float32)
    r.add_video("dual", ap, motion_feats=mo)
    bucket = next(iter(r._ensure_stacked().values()))
    assert bucket[3] is not None  # M stack exists
    ex = ds.examples[0]
    tok, cls = ds.query_features(ex.query_id)
    out = r.search(tok, cls)
    assert out and all(o["video_id"] == "dual" for o in out)


def test_mesh_sharded_library_matches_single(cfg, ds):
    """The library sharded over an 8-device mesh (each chip scans its own
    movies) returns the same rankings and moments as single-device."""
    from cone_tpu.parallel.mesh import make_mesh

    model, params = build_model_and_params(cfg.model, seed=0)
    single = CorpusRetriever(model, params, cfg, dataset=ds)
    sharded = CorpusRetriever(model, params, cfg, dataset=ds,
                              mesh=make_mesh(8))
    for ex in ds.examples[:4]:
        tok, cls = ds.query_features(ex.query_id)
        r1 = single.rank_videos(cls)
        r2 = sharded.rank_videos(cls)
        assert [v for v, _ in r1] == [v for v, _ in r2]
        np.testing.assert_allclose([s for _, s in r1], [s for _, s in r2],
                                   atol=1e-5)
        o1 = single.search(tok, cls)
        o2 = sharded.search(tok, cls)
        assert len(o1) == len(o2)
        for a, b in zip(o1, o2):
            assert a["video_id"] == b["video_id"]
            np.testing.assert_allclose(a["span"], b["span"], atol=1e-4)
            np.testing.assert_allclose(a["fused"], b["fused"], atol=1e-3)


def test_sharded_library_merge_matches_full(cfg, ds):
    """The multi-host merge path (global top-k + pre-fusion row merge over
    the control plane, serve/corpus.py search_batch) returns EXACTLY the
    full-library single-host ranking. Emulated in-process: two shard
    retrievers, all_gather_obj stubbed with staged capture/replay — the
    real 2-process cluster version is tests/test_multiprocess.py
    test_corpus_search_sharded_library."""
    import jax

    import cone_tpu.parallel.distributed as dist_mod

    model, params = build_model_and_params(cfg.model, seed=0)

    def build(vids):
        r = CorpusRetriever(model, params, cfg, dataset=None, fine_chunk=4)
        for cid in vids:
            r.add_video(cid, ds.video_features(cid)[0])
        return r

    vids = sorted(ds.video_ids)
    toks, clss = [], []
    for ex in ds.examples[:6]:
        tok, cls = ds.query_features(ex.query_id)
        toks.append(tok)
        clss.append(cls)
    clsv = np.stack(clss)
    want = build(vids).search_batch(toks, clsv, top_moments=5)
    shards = [build(vids[0::2]), build(vids[1::2])]

    class Stop(Exception):
        pass

    captured = {}
    orig_pc, orig_gather = jax.process_count, dist_mod.all_gather_obj

    def run(rank, upto):
        n = [0]

        def fake(obj, tag="obj"):
            i = n[0]
            n[0] += 1
            if i < upto:
                return captured[i]
            captured.setdefault(i, [None, None])[rank] = obj
            raise Stop()

        jax.process_count = lambda: 2
        dist_mod.all_gather_obj = fake
        try:
            return shards[rank].search_batch(toks, clsv, top_moments=5)
        except Stop:
            return None
        finally:
            jax.process_count = orig_pc
            dist_mod.all_gather_obj = orig_gather

    for upto in (0, 1):  # capture call 0 (global top-k), call 1 (rows)
        for rank in (0, 1):
            run(rank, upto)
    outs = [run(0, 99), run(1, 99)]

    for got in outs:  # every rank returns the identical full-library view
        assert got is not None
        for gq, wq in zip(got, want):
            assert [h["video_id"] for h in gq] == [h["video_id"] for h in wq]
            np.testing.assert_allclose(
                [h["fused"] for h in gq], [h["fused"] for h in wq], atol=1e-6)
            np.testing.assert_allclose(
                np.array([h["span"] for h in gq], np.float64),
                np.array([h["span"] for h in wq], np.float64), atol=1e-4)


def test_sharded_library_empty_shard_participates(cfg, ds):
    """A rank whose library shard is EMPTY (more processes than movies)
    must still reach the control-plane gathers with an empty contribution
    and return the identical global ranking — an assert before the
    rendezvous would wedge every peer for the full KV timeout
    (serve/corpus.py _ensure_stacked)."""
    import jax

    import cone_tpu.parallel.distributed as dist_mod

    model, params = build_model_and_params(cfg.model, seed=0)

    def build(vids):
        r = CorpusRetriever(model, params, cfg, dataset=None, fine_chunk=4)
        for cid in vids:
            r.add_video(cid, ds.video_features(cid)[0])
        return r

    vids = sorted(ds.video_ids)
    toks, clss = [], []
    for ex in ds.examples[:4]:
        tok, cls = ds.query_features(ex.query_id)
        toks.append(tok)
        clss.append(cls)
    clsv = np.stack(clss)
    want = build(vids).search_batch(toks, clsv, top_moments=5)
    shards = [build(vids), build([])]  # rank 1 holds nothing

    class Stop(Exception):
        pass

    captured = {}
    orig_pc, orig_gather = jax.process_count, dist_mod.all_gather_obj

    def run(rank, upto):
        n = [0]

        def fake(obj, tag="obj"):
            i = n[0]
            n[0] += 1
            if i < upto:
                return captured[i]
            captured.setdefault(i, [None, None])[rank] = obj
            raise Stop()

        jax.process_count = lambda: 2
        dist_mod.all_gather_obj = fake
        try:
            return shards[rank].search_batch(toks, clsv, top_moments=5)
        except Stop:
            return None
        finally:
            jax.process_count = orig_pc
            dist_mod.all_gather_obj = orig_gather

    for upto in (0, 1):
        for rank in (0, 1):
            run(rank, upto)
    outs = [run(0, 99), run(1, 99)]

    for got in outs:
        assert got is not None
        for gq, wq in zip(got, want):
            assert [h["video_id"] for h in gq] == [h["video_id"] for h in wq]
            np.testing.assert_allclose(
                [h["fused"] for h in gq], [h["fused"] for h in wq], atol=1e-6)
