"""Config presets + JSON round-trip details."""

import dataclasses

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
    assert scratch.replace(
        model=dataclasses.replace(scratch.model, nheads=8)) == base


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
    assert scratch.replace(
        model=dataclasses.replace(scratch.model, nheads=8,
                                  seq_pad_multiple=1)) == base
