"""Convert reference 2D-TAN (CONE_TAN) torch weights into cone_tpu
ConeTanModel params. Dense/conv kernels transpose; torch LSTM gate chunks
[i|f|g|o] split into flax LSTMCell's per-gate denses (input denses carry no
bias; both torch biases sum into the hidden denses' bias).

Accepts BOTH naming schemes:
- real `CONE_TAN.state_dict()` names (cone_2dtan/lib/models/cone_tan.py:15-23:
  frame_layer / prop_layer / fusion_layer / map_layer / pred_layer /
  adapter_layer), with optional `module.` DataParallel prefixes (the 2dtan
  driver wraps in nn.DataParallel, moment_localization/train.py:133-135);
- the compact golden-blob scheme written by tools/gen_golden_tan.py
  (frame. / fusion. / mapconv. / pred. / adapter.).

Usage (host with torch):
    python tools/convert_tan_ckpt.py --ckpt iter005000-....pkl \\
        --workdir runs/tan_converted --config tan_config.json
"""

from __future__ import annotations

import argparse
import re

import numpy as np

# real reference state_dict prefix -> internal scheme
_RENAMES = [
    (re.compile(r"^frame_layer\."), "frame."),
    (re.compile(r"^fusion_layer\."), "fusion."),
    (re.compile(r"^map_layer\.convs\."), "mapconv.convs."),
    (re.compile(r"^pred_layer\."), "pred."),
    (re.compile(r"^adapter_layer\."), "adapter."),
    (re.compile(r"^prop_layer\."), "prop."),
]


def _canonicalize(blob: dict) -> dict:
    renamed = {}
    for k in blob:
        k2 = k[len("module."):] if k.startswith("module.") else k  # DataParallel
        for pat, repl in _RENAMES:
            k3 = pat.sub(repl, k2)
            if k3 != k2:
                k2 = k3
                break
        if k2 != k:
            renamed[k] = k2
    if not renamed:
        return blob  # already canonical: keep the caller's dict (and type)
    return {renamed.get(k, k): v for k, v in blob.items()}


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}


def _conv1x1(sd, name):
    w = sd[f"{name}.weight"]  # (out, in, 1[, 1])
    w = w.reshape(w.shape[0], w.shape[1])
    return {"kernel": w.T.copy(), "bias": sd[f"{name}.bias"].copy()}


def _conv1d(sd, name):
    w = sd[f"{name}.weight"]  # (out, in, k) -> (k, in, out)
    return {"kernel": w.transpose(2, 1, 0).copy(),
            "bias": sd[f"{name}.bias"].copy()}


def _conv2d(sd, name):
    w = sd[f"{name}.weight"]  # (out, in, kh, kw) -> (kh, kw, in, out)
    return {"kernel": w.transpose(2, 3, 1, 0).copy(),
            "bias": sd[f"{name}.bias"].copy()}


def _lstm_layer(sd, prefix, layer):
    w_ih = sd[f"{prefix}.weight_ih_l{layer}"]  # (4H, in)
    w_hh = sd[f"{prefix}.weight_hh_l{layer}"]  # (4H, H)
    b = sd[f"{prefix}.bias_ih_l{layer}"] + sd[f"{prefix}.bias_hh_l{layer}"]
    h = w_hh.shape[1]
    out = {}
    for k, gate in enumerate(["i", "f", "g", "o"]):
        sl = slice(k * h, (k + 1) * h)
        out[f"i{gate}"] = {"kernel": w_ih[sl].T.copy()}
        out[f"h{gate}"] = {"kernel": w_hh[sl].T.copy(), "bias": b[sl].copy()}
    return out


def tan_state_dict_to_params(blob: dict, num_lstm_layers: int = None,
                             num_map_convs: int = None) -> dict:
    """`blob` maps reference names to numpy arrays — either a real
    CONE_TAN.state_dict() or the gen_golden_tan.py scheme (see module
    docstring). Layer counts default to what the keys contain."""
    blob = _canonicalize(blob)
    if num_lstm_layers is None:
        num_lstm_layers = sum(
            1 for k in blob
            if re.fullmatch(r"fusion\.textual_encoder\.weight_ih_l\d+", k))
    if num_map_convs is None:
        num_map_convs = sum(
            1 for k in blob if re.fullmatch(r"mapconv\.convs\.\d+\.weight", k))
    params = {
        "frame_layer": {"vis_conv": _conv1x1(blob, "frame.vis_conv")},
        "fusion_layer": {
            "textual_encoder": {
                f"lstm_{i}": _lstm_layer(blob, "fusion.textual_encoder", i)
                for i in range(num_lstm_layers)
            },
            "tex_linear": _dense(blob, "fusion.tex_linear"),
            "vis_conv": _conv1x1(blob, "fusion.vis_conv"),
        },
        "map_layer": {
            f"conv_{i}": _conv2d(blob, f"mapconv.convs.{i}")
            for i in range(num_map_convs)
        },
        "pred_layer": _conv1x1(blob, "pred"),
    }
    if any(k.startswith("adapter.") for k in blob):
        # VisualAdapter = MLP(input, hidden, input, 2) with layers.{i}
        params["adapter_layer"] = {
            f"layer_{i}": _dense(blob, f"adapter.layers.{i}") for i in range(2)
        }
    prop_keys = sorted(k for k in blob
                       if re.fullmatch(r"prop\.layers\.\d+\.\d+\.weight", k))
    if prop_keys:
        # SparsePropConv (prop_modules/sparse.py:69-80): per-scale Conv1d
        # cascades, flax names conv_{scale}_{layer} (models/tan.py:160-185)
        prop = {}
        for k in prop_keys:
            s, i = re.fullmatch(r"prop\.layers\.(\d+)\.(\d+)\.weight", k).groups()
            prop[f"conv_{s}_{i}"] = _conv1d(blob, f"prop.layers.{s}.{i}")
        params["prop_layer"] = prop
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="reference 2dtan checkpoint (torch .pkl/.pth; the"
                         " driver saves a bare state_dict,"
                         " moment_localization/train.py:490-498)")
    ap.add_argument("--workdir", required=True,
                    help="write model_converted.msgpack + config.json here")
    ap.add_argument("--config", required=True,
                    help="ConeConfig json with model.model_family=tan and the"
                         " tan section matching the checkpoint geometry")
    args = ap.parse_args()

    import os
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from cone_tpu.config import ConeConfig
    from cone_tpu.train.checkpoint import CheckpointManager

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw.get("state_dict", raw)) if isinstance(raw, dict) else raw
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    cfg = ConeConfig.load(args.config)
    assert cfg.model.model_family == "tan", "config must set model_family=tan"
    params = tan_state_dict_to_params(sd)
    mgr = CheckpointManager(args.workdir, cfg)
    path = mgr.save("converted", params, None, 0)
    print(f"wrote {path} (+ config.json); evaluate with:\n"
          f"  python -m cone_tpu.cli infer --workdir {args.workdir}"
          f" --ckpt converted --eval_path <val.jsonl>")


if __name__ == "__main__":
    main()
