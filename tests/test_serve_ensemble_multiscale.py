"""Serve path, ensemble tool, multiscale training loader."""

import jax
import numpy as np
import pytest

from cone_tpu.config import ConeConfig, DataConfig, EvalConfig, ModelConfig, TrainConfig
from cone_tpu.data import make_synthetic_dataset
from cone_tpu.data.multiscale import MultiscaleTrainLoader, sample_multiscale_windows
from cone_tpu.eval.ensemble import ensemble_predictions, top1_generator
from cone_tpu.models.init import build_model_and_params
from cone_tpu.serve import OnlineLocalizer
from cone_tpu.train.optim import make_optimizer
from cone_tpu.train.step import make_train_step

DIM = 32


@pytest.fixture(scope="module")
def cfg():
    return ConeConfig(
        model=ModelConfig(
            hidden_dim=64, nheads=4, dim_feedforward=128,
            t_feat_dim=DIM, v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
            max_q_l=8, max_v_l=32,
        ),
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0, topk_window=4,
                        max_ctx_l=256),
        train=TrainConfig(bsz=4),
        eval=EvalConfig(query_chunk=2),
    )


def test_online_localizer(cfg, rng):
    model, params = build_model_and_params(cfg.model, seed=0)
    loc = OnlineLocalizer(model, params, cfg)
    video = rng.normal(size=(150, DIM)).astype(np.float32)
    tok = rng.normal(size=(6, DIM)).astype(np.float32)
    cls = rng.normal(size=(DIM,)).astype(np.float32)
    out = loc.localize(video, tok, cls, query="where is it")
    assert 1 <= len(out) <= cfg.eval.max_after_nms
    for st, ed, p, m, f in out:
        assert st <= ed + 1e-6
    # second call reuses compiled programs, different video length is fine
    out2 = loc.localize(
        rng.normal(size=(90, DIM)).astype(np.float32), tok, cls
    )
    assert len(out2) >= 1

    # regression: a second request must see ITS OWN video, not the cached
    # first one — plant the query signal in a distinct segment and check the
    # top moment lands there
    video3 = rng.normal(size=(150, DIM)).astype(np.float32)
    video3[100:120] += 5.0 * cls / np.linalg.norm(cls)
    video3 = video3 / np.linalg.norm(video3, axis=-1, keepdims=True)
    out3 = loc.localize(video3, tok, cls / np.linalg.norm(cls))
    ranked_by_match = sorted(out3, key=lambda t: t[3], reverse=True)
    st, ed = ranked_by_match[0][0], ranked_by_match[0][1]
    assert st < 120 and ed > 95, out3


def test_service_probes_text_encoder_dims(cfg, rng):
    """A text backend whose dims don't match the served model must fail at
    construction with a clear message, not per-request deep in staging."""
    from cone_tpu.serve.server import MomentService

    model, params = build_model_and_params(cfg.model, seed=0)
    good = lambda q: (np.zeros((4, DIM), np.float32),
                      np.zeros(DIM, np.float32))
    svc = MomentService(model, params, cfg, text_encoder=good)
    assert svc.text_encoder is good

    bad = lambda q: (np.zeros((4, 512), np.float32),
                     np.zeros(512, np.float32))
    with pytest.raises(AssertionError, match="text_backend"):
        MomentService(model, params, cfg, text_encoder=bad)


def test_serving_surfaces_dispatch_tan_family(rng):
    """make_pipeline lets a TAN workdir serve like a CONE one: the online
    localizer and corpus retriever run the TAN fine stage (score-map cells,
    within-window NMS) end to end."""
    from cone_tpu.config import TanConfig
    from cone_tpu.serve.corpus import CorpusRetriever
    from cone_tpu.train.loop import build_family

    tan = TanConfig(
        num_clips=32, hidden_size=48, v_feat_dim=DIM, t_feat_dim=DIM,
        txt_hidden_size=48, lstm_layers=2, num_scale_layers=(8, 4),
        map_hidden_sizes=(48, 48), map_kernel_sizes=(5, 5), map_paddings=(4, 0),
    )
    cfg = ConeConfig(
        model=ModelConfig(model_family="tan", t_feat_dim=DIM,
                          v_motion_feat_dim=DIM, v_appear_feat_dim=DIM,
                          max_q_l=8, max_v_l=32),
        tan=tan,
        data=DataConfig(max_v_l=32, max_q_l=8, clip_length=1.0,
                        topk_window=4, max_ctx_l=256),
        eval=EvalConfig(query_chunk=2),
    )
    model, params = build_family(cfg, seed=0)

    from cone_tpu.eval.tan_pipeline import TanInferencePipeline

    loc = OnlineLocalizer(model, params, cfg)
    assert isinstance(loc.pipe, TanInferencePipeline)
    tok = rng.normal(size=(6, DIM)).astype(np.float32)
    cls = rng.normal(size=(DIM,)).astype(np.float32)
    out = loc.localize(rng.normal(size=(120, DIM)).astype(np.float32),
                       tok, cls, query="tan served")
    assert 1 <= len(out) <= cfg.eval.max_after_nms
    for st, ed, *_ in out:
        assert st <= ed + 1e-6

    r = CorpusRetriever(model, params, cfg)
    assert isinstance(r.pipe, TanInferencePipeline)
    r.add_video("v", rng.normal(size=(100, DIM)).astype(np.float32))
    moments = r.search(tok, cls)
    assert moments and all(m["video_id"] == "v" for m in moments)


def test_top1_generator_clusters():
    rows = [
        [10.0, 14.0, 0, 0, 1.0],
        [10.5, 14.5, 0, 0, 0.8],   # same cluster (centers 12, 12.5)
        [50.0, 54.0, 0, 0, 0.5],   # far cluster
    ]
    out = top1_generator(rows)
    assert len(out) == 2
    assert out[0][-1] == pytest.approx(1.8)  # summed cluster score ranks first
    assert 10.0 <= out[0][0] <= 10.5 and 14.0 <= out[0][1] <= 14.5


def test_ensemble_predictions():
    def sub(shift, score):
        return [
            dict(query_id="q0", clip_uid="c", annotation_uid="a", query_idx=0,
                 predicted_times=[[10 + shift, 20 + shift, 0, 0, score],
                                  [100 + shift, 110 + shift, 0, 0, score / 2]])
        ]

    fused = ensemble_predictions([sub(0, 1.0), sub(0.5, 0.9), sub(40, 0.8)])
    assert len(fused) == 1
    times = fused[0]["predicted_times"]
    assert len(times) == 5  # padded to exactly 5
    for t in times:
        assert len(t) == 2


def test_multiscale_window_geometry(cfg):
    ds = make_synthetic_dataset(cfg.data, n_videos=3, queries_per_video=3,
                                ctx_l_range=(100, 200), dim=DIM, seed=3)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        ex = ds.examples[i]
        ctx_l = len(ds.video_features(ex.clip_id)[0])
        start = ex.timestamps[0] / cfg.data.clip_length
        end = ex.timestamps[1] / cfg.data.clip_length
        for w_start, w_end, w_len in sample_multiscale_windows(ds, i, rng):
            assert 0 <= w_start < w_end <= ctx_l
            assert w_end - w_start <= 2 * cfg.data.max_v_l
            # window covers (at least part of) the GT span
            assert w_start < end and w_end > start


def test_multiscale_loader_trains(cfg):
    ds = make_synthetic_dataset(cfg.data, n_videos=3, queries_per_video=4,
                                ctx_l_range=(100, 200), dim=DIM, seed=4)
    loader = MultiscaleTrainLoader(ds, bsz=cfg.train.bsz, seed=0)
    batch = next(iter(loader.epoch(0)))
    b = cfg.train.bsz
    assert batch["pos_motion"].shape == (4 * b, 2 * cfg.data.max_v_l, DIM)
    assert batch["span_labels"].shape == (4 * b, cfg.data.max_windows, 2)
    assert batch["pos_appear"].shape[0] == b  # matching branch: standard only
    # spans are valid normalized cxw
    c, w = batch["span_labels"][:, 0, 0], batch["span_labels"][:, 0, 1]
    assert (w > 0).all() and (c - w / 2 >= -1e-5).all() and (c + w / 2 <= 1 + 1e-5).all()

    model, params = build_model_and_params(cfg.model, seed=0)
    tx = make_optimizer(params, cfg.train, 4)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)
    params, opt_state, metrics = step(
        params, opt_state, {k: np.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0), True,
    )
    assert np.isfinite(float(metrics["loss_overall"]))
    assert "loss_adapter" in metrics


def test_egovlp_predictor_end_to_end(cfg, tmp_path, monkeypatch):
    """backend="egovlp": video-file -> ranked moments through the flax
    EgoVlpVideoTower on the device (the reference demo's actual backbone,
    run_on_video/run.py:10-70). ffmpeg decode and the DistilBERT text tower
    are stubbed (no media fixture / no network); the video tower is the real
    parity-tested flax module, and the feature cache round-trips."""
    import jax.numpy as jnp

    from cone_tpu.models.egovlp import EgoVlpConfig, EgoVlpVideoTower
    from cone_tpu.serve.predictor import MomentPredictor

    ecfg = EgoVlpConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                        num_heads=2, num_frames=2, projection_dim=DIM)
    tower = EgoVlpVideoTower(ecfg)
    eparams = tower.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 2, 16, 16, 3)))["params"]

    model, params = build_model_and_params(cfg.model, seed=0)
    pred = MomentPredictor(model, params, cfg, backend="egovlp",
                           egovlp_cfg=ecfg, egovlp_params=eparams,
                           cache_dir=str(tmp_path), frames_per_clip=2)

    rng_l = np.random.default_rng(0)
    frames = rng_l.integers(0, 255, size=(80, 16, 16, 3), dtype=np.uint8)
    seen_fps = []

    def fake_decode(path, fps, size=224):
        seen_fps.append((fps, size))
        return frames

    monkeypatch.setattr("cone_tpu.extract.video.decode_frames", fake_decode)
    tok = rng_l.normal(size=(6, DIM)).astype(np.float32)
    cls_v = rng_l.normal(size=(DIM,)).astype(np.float32)
    monkeypatch.setattr(MomentPredictor, "_egovlp_text_features",
                        lambda self, q: (tok, cls_v))

    out = pred.localize_moment(str(tmp_path / "vid.mp4"), "where is the cup")
    assert 1 <= len(out) <= cfg.eval.max_after_nms
    for st, ed, p, m, f in out:
        assert st <= ed + 1e-6
    # frame rate = clip rate x frames_per_clip at the tower's resolution
    # (egovlp_extrator.py:120-135)
    assert seen_fps == [(2.0, 16)]
    # 80 frames -> 40 clips of projection_dim features, cached to disk
    cached = pred.video_features(str(tmp_path / "vid.mp4"))
    assert cached.shape == (40, DIM)
    assert seen_fps == [(2.0, 16)]  # second call hit the cache


def test_http_server_roundtrip(cfg, rng, tmp_path):
    """serve/server.py: add_video -> search and localize over real HTTP,
    plus health/stats and error handling."""
    import json
    import threading
    import urllib.request

    from cone_tpu.serve.server import MomentService, make_server

    model, params = build_model_and_params(cfg.model, seed=0)
    service = MomentService(model, params, cfg)
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=300) as r:
            return r.status, json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        status, health = get("/healthz")
        assert status == 200 and health["ok"] and health["videos"] == 0

        cls = rng.normal(size=(DIM,)).astype(np.float32)
        cls /= np.linalg.norm(cls)
        tok = rng.normal(size=(6, DIM)).astype(np.float32)
        # two videos; plant the query signal in video b at [100, 120)
        va = rng.normal(size=(150, DIM)).astype(np.float32)
        vb = rng.normal(size=(150, DIM)).astype(np.float32)
        vb[100:120] += 5.0 * cls
        for cid, v in [("a", va), ("b", vb)]:
            status, body = post("/add_video",
                                {"clip_id": cid, "features": v.tolist()})
            assert status == 200 and body["clips"] == 150

        status, body = post("/search", {
            "token_features": tok.tolist(), "cls_feature": cls.tolist(),
            "query": "planted", "top_moments": 5,
        })
        assert status == 200
        moments = body["moments"]
        assert 1 <= len(moments) <= 5
        best = max(moments, key=lambda m: m["match"])
        assert best["video_id"] == "b"
        assert best["span"][0] < 120 and best["span"][1] > 95

        status, body = post("/localize", {
            "video_features": vb.tolist(), "token_features": tok.tolist(),
            "cls_feature": cls.tolist(), "top_k": 3,
        })
        assert status == 200 and 1 <= len(body["moments"]) <= 3

        # batched search: the planted query (sent BINARY: b64 float32) + a
        # random one, one device sweep; row 0 must reproduce the single
        # /search result exactly
        import base64

        tok2 = rng.normal(size=(4, DIM)).astype(np.float32)
        cls2 = rng.normal(size=(DIM,)).astype(np.float32)
        status, body = post("/search_batch", {
            "queries": [
                {"token_features_b64":
                     base64.b64encode(tok.astype("<f4").tobytes()).decode(),
                 "token_shape": list(tok.shape),
                 "cls_feature_b64":
                     base64.b64encode(cls.astype("<f4").tobytes()).decode()},
                {"token_features": tok2.tolist(),
                 "cls_feature": cls2.tolist()},
            ],
            "top_moments": 5,
        })
        assert status == 200 and len(body["results"]) == 2
        batch0 = body["results"][0]["moments"]
        assert [m["span"] for m in batch0] == [m["span"] for m in moments]

        # streaming ingest: grow video a's timeline; the corpus reflects it
        status, body = post("/append_video", {
            "clip_id": "a",
            "features": rng.normal(size=(40, DIM)).astype(np.float32).tolist(),
        })
        assert status == 200 and body["clips"] == 190

        status, stats = get("/stats")
        assert status == 200
        assert stats["videos"] == 2 and stats["total_clips"] == 340
        assert stats["requests"] == {"add_video": 2, "search": 1,
                                     "localize": 1, "search_batch": 1,
                                     "append_video": 1}
        assert all(v >= 0 for v in stats["mean_latency_s"].values())

        # errors: bad route, missing fields, no text encoder, unknown video
        assert post("/nope", {})[0] == 404
        status, body = post("/search", {"query": "text only"})
        assert status == 400 and "text encoder" in body["error"]
        status, body = post("/add_video", {"clip_id": "x"})
        assert status == 400 and "KeyError" in body["error"]
        status, body = post("/append_video",
                            {"clip_id": "unknown", "features": [[0.0] * DIM]})
        assert status == 400 and "KeyError" in body["error"]

        # library lifecycle over HTTP: persist, evict, reload
        status, body = post("/save_corpus", {"dir": str(tmp_path / "lib")})
        assert status == 200 and body["videos"] == 2
        status, body = post("/remove_video", {"clip_id": "a"})
        assert status == 200 and body["videos"] == 1
        status, body = post("/remove_video", {"clip_id": "a"})
        assert status == 400 and "ValueError" in body["error"]
        status, body = post("/load_corpus", {"dir": str(tmp_path / "lib")})
        assert status == 200 and body["videos"] == 2  # a restored
        status, body = post("/load_corpus", {"dir": str(tmp_path / "nope")})
        assert status == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_search_microbatching(cfg, rng):
    """batch_window_ms > 0: concurrent /search requests coalesce into one
    device sweep (stats show batches < requests), each answer matching its
    own query; different top_moments split into per-signature sub-batches.
    """
    import json
    import threading
    import urllib.request

    from cone_tpu.serve.server import MomentService, make_server

    model, params = build_model_and_params(cfg.model, seed=0)
    # window far above the enqueue cost of 4 local threads, max_batch small
    # enough that a full window fires immediately once all requests land
    service = MomentService(model, params, cfg, batch_window_ms=2000.0,
                            max_batch=3)

    cls_a = rng.normal(size=(DIM,)).astype(np.float32)
    cls_a /= np.linalg.norm(cls_a)
    cls_b = rng.normal(size=(DIM,)).astype(np.float32)
    cls_b -= cls_a * (cls_b @ cls_a)  # orthogonal plants
    cls_b /= np.linalg.norm(cls_b)
    va = rng.normal(size=(150, DIM)).astype(np.float32)
    vb = rng.normal(size=(150, DIM)).astype(np.float32)
    va[30:50] += 5.0 * cls_a
    vb[100:120] += 5.0 * cls_b
    service.retriever.add_video("a", va)
    service.retriever.add_video("b", vb)

    tok = rng.normal(size=(6, DIM)).astype(np.float32)
    # warm the compiled sweep so collection timing isn't compile-bound
    service.retriever.search_batch([tok], cls_a[None], top_moments=5)

    srv = make_server(service, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"

    def post(path, payload, out, i):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out[i] = (r.status, json.loads(r.read()))

    try:
        reqs = [
            {"cls": cls_a, "video": "a", "lo": 30, "hi": 50, "tm": 5},
            {"cls": cls_b, "video": "b", "lo": 100, "hi": 120, "tm": 5},
            {"cls": cls_a, "video": "a", "lo": 30, "hi": 50, "tm": 3},
        ]
        out = [None] * len(reqs)
        threads = [
            threading.Thread(target=post, args=("/search", {
                "token_features": tok.tolist(),
                "cls_feature": r["cls"].tolist(),
                "top_moments": r["tm"]}, out, i))
            for i, r in enumerate(reqs)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        for r, got in zip(reqs, out):
            status, body = got
            assert status == 200
            moments = body["moments"]
            assert 1 <= len(moments) <= r["tm"]
            best = max(moments, key=lambda m: m["match"])
            assert best["video_id"] == r["video"], (r, moments)
            assert best["span"][0] < r["hi"] and best["span"][1] > r["lo"] - 5

        with urllib.request.urlopen(base + "/stats", timeout=300) as resp:
            stats = json.loads(resp.read())
        dyn = stats["dynamic_batching"]
        assert dyn["batched_queries"] == 3
        # 3 requests coalesced: 2 sub-batches max (one per top_moments
        # signature), strictly fewer sweeps than requests
        assert 1 <= dyn["batches"] <= 2, dyn

        # malformed search_windows must 400 at the endpoint (unhashable
        # options reaching the batcher would kill its thread and hang every
        # later /search) — and a valid request afterwards must still work
        bad = {"token_features": tok.tolist(),
               "cls_feature": cls_a.tolist(), "search_windows": ["x"]}
        req = urllib.request.Request(
            base + "/search", data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        alive = [None]
        post("/search", {"token_features": tok.tolist(),
                         "cls_feature": cls_a.tolist(), "top_moments": 5},
             alive, 0)
        assert alive[0][0] == 200 and alive[0][1]["moments"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_clip_predictor_engines_match(cfg, tmp_path, monkeypatch):
    """backend="clip": torch vs flax engines produce the same moments —
    the demo path is TPU-native end-to-end with clip_engine="flax"."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from cone_tpu.serve.predictor import MomentPredictor
    from tests.clip_testing import FakeClipTokenizer

    vcfg = transformers.CLIPVisionConfig(
        hidden_size=DIM, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=16, patch_size=8,
        projection_dim=DIM, hidden_act="quick_gelu",
        attn_implementation="eager")
    tcfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=DIM, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=12, projection_dim=DIM,
        hidden_act="quick_gelu", eos_token_id=98,
        attn_implementation="eager")
    torch.manual_seed(0)
    clip_models = {
        "vision": transformers.CLIPVisionModelWithProjection(vcfg).eval(),
        "text": transformers.CLIPTextModelWithProjection(tcfg).eval(),
        "processor": transformers.CLIPImageProcessor(
            size={"shortest_edge": 16},
            crop_size={"height": 16, "width": 16}),
        "tokenizer": FakeClipTokenizer(),
    }

    rng_l = np.random.default_rng(7)
    frames = rng_l.integers(0, 255, size=(120, 16, 16, 3), dtype=np.uint8)
    monkeypatch.setattr("cone_tpu.extract.video.decode_frames",
                        lambda path, fps, size=224: frames)

    model, params = build_model_and_params(cfg.model, seed=0)
    outs = {}
    for engine in ("torch", "flax"):
        pred = MomentPredictor(model, params, cfg, backend="clip",
                               cache_dir=str(tmp_path / engine),
                               clip_engine=engine, clip_models=clip_models)
        outs[engine] = pred.localize_moment(
            str(tmp_path / "vid.mp4"), "find the red cup on the table")
    assert len(outs["torch"]) == len(outs["flax"]) >= 1
    np.testing.assert_allclose(np.asarray(outs["flax"], np.float64),
                               np.asarray(outs["torch"], np.float64),
                               atol=2e-3)


def test_predictor_probes_backbone_dims(cfg, monkeypatch, tmp_path):
    """A backbone whose feature dims don't match the served checkpoint must
    fail with a readable message at localize_moment, not deep in the
    pipeline's staging buffers (same probe as MomentService's text-encoder
    check)."""
    from cone_tpu.serve.predictor import MomentPredictor

    model, params = build_model_and_params(cfg.model, seed=0)
    pred = MomentPredictor(model, params, cfg, backend="clip",
                           cache_dir=str(tmp_path))
    # CLIP-512-d features against a DIM-d model
    monkeypatch.setattr(
        MomentPredictor, "video_features",
        lambda self, p: np.zeros((40, 512), np.float32))
    monkeypatch.setattr(
        MomentPredictor, "text_features",
        lambda self, q: (np.zeros((6, 512), np.float32),
                         np.zeros(512, np.float32)))
    with pytest.raises(AssertionError, match="backend"):
        pred.localize_moment("v.mp4", "where is the cup")
