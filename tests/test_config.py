"""Config presets + JSON round-trip details."""

import dataclasses

import pytest

from cone_tpu.config import (
    ConeConfig,
    EvalConfig,
    ego4d_config,
    ego4d_scratch_config,
    mad_config,
    tan_mad_config,
)


def test_scratch_preset_differs_only_in_geometry():
    """ego4d_scratch = ego4d with nheads=2 (d_head 128, one MXU lane;
    identical parameter count, fastest at the recommended co-located
    dispatch — docs/RESULTS.md qc sweep). Everything else must stay
    reference-canonical."""
    base, scratch = ego4d_config(), ego4d_scratch_config()
    assert scratch.model.nheads == 2 and base.model.nheads == 8
    assert base.model.seq_pad_multiple == 16
    assert scratch.model.seq_pad_multiple == 16
    # scratch training defaults to the MXU-native dtype (7.3x on v5e,
    # tools/bench_train.py); the plain preset stays fp32 for
    # converted-checkpoint parity
    assert scratch.model.compute_dtype == "bfloat16"
    assert base.model.compute_dtype == "float32"
    # rng_impl stays threefry everywhere: rbg won a forward-only
    # microbench but lost the full train step 3.7x (tools/bench_rng.py,
    # docs/RESULTS.md round 4)
    assert scratch.train.rng_impl == "threefry"
    assert base.train.rng_impl == "threefry"
    assert scratch.replace(
        model=dataclasses.replace(scratch.model, nheads=8,
                                  compute_dtype="float32")) == base


def test_eval_modality_clip_round_trips():
    """'clip' — the reference dispatch's own name for the matching modality
    (cone/inference.py:489) — survives a config JSON round-trip so converted
    opt.json files load."""
    cfg = ConeConfig(eval=EvalConfig(eval_modality="clip"))
    cfg2 = ConeConfig.from_json(cfg.to_json())
    assert cfg2.eval.eval_modality == "clip"


def test_legacy_field_dropped_on_load():
    import json

    raw = json.loads(ConeConfig().to_json())
    raw["train"]["eval_bsz"] = 16  # removed field from old snapshots
    cfg = ConeConfig.from_json(json.dumps(raw))
    assert not hasattr(cfg.train, "eval_bsz")


def test_unknown_keys_warn_but_load():
    """A workdir config written by a NEWER build (keys this version doesn't
    know) must still load — unknown keys drop with a warning, known ones
    apply."""
    import json
    import warnings

    raw = json.loads(ConeConfig().to_json())
    raw["train"]["bsz"] = 64
    raw["train"]["some_future_knob"] = True
    raw["model"]["another_future_knob"] = "x"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = ConeConfig.from_json(json.dumps(raw))
    assert cfg.train.bsz == 64
    msgs = [str(x.message) for x in w]
    assert any("some_future_knob" in m for m in msgs)
    assert any("another_future_knob" in m for m in msgs)


def test_strict_load_rejects_unknown_keys(tmp_path):
    """strict=True (the CLI's --config path) must fail loudly on a typo'd
    key instead of silently using the default."""
    import json

    import pytest

    raw = json.loads(ConeConfig().to_json())
    raw["train"]["n_epochs"] = 5  # typo for n_epoch
    with pytest.raises(ValueError, match="n_epochs"):
        ConeConfig.from_json(json.dumps(raw), strict=True)
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    with pytest.raises(ValueError, match="n_epochs"):
        ConeConfig.load(str(p), strict=True)
    # tolerant default still loads it (workdir round-trip path)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ConeConfig.load(str(p))


def test_mad_presets_geometry():
    mad = mad_config()
    assert mad.data.topk_window == 30 and mad.data.max_v_l == 125
    tan_mad = tan_mad_config()
    # TAN-MAD: 30 windows x proposal_top_k=10 = 300 candidates, the geometry
    # that exceeds max_before_nms=200 (covered by test_nms_device_parity)
    assert tan_mad.data.topk_window * tan_mad.tan.proposal_top_k == 300
    assert tan_mad.eval.max_before_nms == 200


def test_mad_scratch_preset_differs_only_in_geometry():
    """mad_scratch = mad with nheads=2 (d_head 128, one MXU lane) and the
    sublane-aligned sequence (seq_pad_multiple=16): measured 960 -> 1362
    q/s device at full MAD serving scale, identical params —
    docs/RESULTS.md round 3 / tools/bench_seqpad.py."""
    from cone_tpu.config import mad_scratch_config

    base, scratch = mad_config(), mad_scratch_config()
    assert scratch.model.nheads == 2 and base.model.nheads == 8
    assert scratch.model.seq_pad_multiple == 16
    assert base.model.seq_pad_multiple == 1
    assert scratch.model.compute_dtype == "bfloat16"
    assert base.model.compute_dtype == "float32"
    assert scratch.train.rng_impl == "threefry"
    assert base.train.rng_impl == "threefry"
    assert scratch.replace(
        model=dataclasses.replace(scratch.model, nheads=8,
                                  seq_pad_multiple=1,
                                  compute_dtype="float32")) == base


def test_train_flops_model():
    """The train-step FLOPs model: ~3x (pos + neg [+ adapter]) window
    forwards; MFU report scales linearly with throughput."""
    from cone_tpu.config import ego4d_config
    from cone_tpu.utils.perf import (
        _window_forward_flops, cone_train_flops_per_sample, train_perf_report,
    )

    cfg = ego4d_config()
    core = _window_forward_flops(cfg.model)["core"]
    no_adapter = cone_train_flops_per_sample(cfg, adapter_on=False)
    assert no_adapter == pytest.approx(3 * 2 * core)  # pos + neg, x3 fwd+bwd
    with_adapter = cone_train_flops_per_sample(cfg, adapter_on=True)
    assert with_adapter > no_adapter
    import dataclasses as dc

    cfg_noneg = cfg.replace(loss=dc.replace(cfg.loss, neg_loss=False))
    assert cone_train_flops_per_sample(cfg_noneg, adapter_on=False) == (
        pytest.approx(3 * core))

    rep = train_perf_report(cfg, samples_per_sec=1000.0)
    assert rep["train_mfu"] == pytest.approx(
        with_adapter * 1000.0 / 49e12, abs=1e-4)  # fp32 peak, 4-dp rounded
    rep2 = train_perf_report(cfg, samples_per_sec=2000.0)
    assert rep2["train_mfu"] == pytest.approx(2 * rep["train_mfu"], abs=2e-4)


def test_preset_feature_dims_are_consistent():
    """The shared pipeline buffers size token arrays by model.t_feat_dim
    and cls arrays by model.v_appear_feat_dim (the matching-branch dim) —
    every preset must keep those in sync with its family's own dims. The
    tan_mad preset once left ModelConfig at the 256-d defaults while its
    tan section was 512-d, so a MAD TAN eval crashed staging queries."""
    from cone_tpu import config as C

    for make in (C.ego4d_config, C.ego4d_scratch_config, C.mad_config,
                 C.mad_scratch_config, C.tan_ego4d_config, C.tan_mad_config):
        cfg = make()
        if cfg.model.model_family == "tan":
            assert cfg.model.t_feat_dim == cfg.tan.t_feat_dim, make.__name__
            assert cfg.model.v_appear_feat_dim == cfg.tan.v_feat_dim, make.__name__
            assert cfg.model.v_motion_feat_dim == cfg.tan.v_feat_dim, make.__name__
            assert (cfg.tan.num_clips * cfg.tan.frame_stride
                    == cfg.data.max_v_l), make.__name__
        else:
            # CONE: the transformer consumes tokens, matching consumes cls;
            # default datasets pair same-dim stores (EgoVLP 256 / CLIP 512)
            assert cfg.model.v_appear_feat_dim == cfg.model.v_motion_feat_dim
