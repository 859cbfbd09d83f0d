"""Convert reference 2D-TAN (CONE_TAN) torch weights into cone_tpu
ConeTanModel params. Dense/conv kernels transpose; torch LSTM gate chunks
[i|f|g|o] split into flax LSTMCell's per-gate denses (input denses carry no
bias; both torch biases sum into the hidden denses' bias)."""

from __future__ import annotations

import numpy as np


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}


def _conv1x1(sd, name):
    w = sd[f"{name}.weight"]  # (out, in, 1[, 1])
    w = w.reshape(w.shape[0], w.shape[1])
    return {"kernel": w.T.copy(), "bias": sd[f"{name}.bias"].copy()}


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


def tan_state_dict_to_params(blob: dict, num_lstm_layers: int = 3,
                             num_map_convs: int = 4) -> dict:
    """`blob` maps '{module}.{param}' (e.g. 'frame.vis_conv.weight') to
    numpy arrays, as produced by tools/gen_golden_tan.py / a flattened
    reference checkpoint."""
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
    return params
