"""Convert a reference PyTorch CONE checkpoint into a cone_tpu param tree.

The mapping is purely structural (transpose Dense kernels); attention
in-projections stay packed, so every reference tensor maps 1:1.

Usage (host with torch):
    python tools/convert_ckpt.py --ckpt model_best.ckpt --out params.msgpack

Also importable: `torch_state_dict_to_params(sd_numpy, cfg)` where
`sd_numpy` maps reference names (cone/model.py parameter names) to numpy
arrays — used by the golden-parity tests.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cone_tpu.config import ModelConfig


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), tree)


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T.copy(), "bias": sd[f"{name}.bias"].copy()}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].copy(), "bias": sd[f"{name}.bias"].copy()}


def _attn(sd, name):
    return {
        "in_proj": {
            "kernel": sd[f"{name}.in_proj_weight"].T.copy(),  # (D, 3D)
            "bias": sd[f"{name}.in_proj_bias"].copy(),
        },
        "out_proj": _dense(sd, f"{name}.out_proj"),
    }


def _mlp(sd, name, n_layers):
    return {f"layer_{i}": _dense(sd, f"{name}.layers.{i}") for i in range(n_layers)}


def _linear_layer(sd, name):
    out = {"linear": _dense(sd, f"{name}.net.1")}
    if f"{name}.LayerNorm.weight" in sd:
        out["LayerNorm"] = _ln(sd, f"{name}.LayerNorm")
    return out


def _encoder_layer(sd, name):
    return {
        "self_attn": _attn(sd, f"{name}.self_attn"),
        "ffn": {
            "linear1": _dense(sd, f"{name}.linear1"),
            "linear2": _dense(sd, f"{name}.linear2"),
        },
        "norm1": _ln(sd, f"{name}.norm1"),
        "norm2": _ln(sd, f"{name}.norm2"),
    }


def _decoder_layer(sd, name):
    out = _encoder_layer(sd, name)
    out["multihead_attn"] = _attn(sd, f"{name}.multihead_attn")
    out["norm3"] = _ln(sd, f"{name}.norm3")
    return out


def torch_state_dict_to_params(sd: dict, cfg: ModelConfig) -> dict:
    """Reference state_dict (numpy values) -> cone_tpu flax param dict."""
    params = {}
    for i in range(cfg.n_input_proj):
        params[f"input_txt_proj_{i}"] = _linear_layer(sd, f"input_txt_proj.{i}")
        params[f"input_vid_proj_{i}"] = _linear_layer(sd, f"input_vid_proj.{i}")

    tr = {}
    for i in range(cfg.enc_layers):
        tr[f"encoder_layer_{i}"] = _encoder_layer(sd, f"transformer.encoder.layers.{i}")
    for i in range(cfg.dec_layers):
        tr[f"decoder_layer_{i}"] = _decoder_layer(sd, f"transformer.decoder.layers.{i}")
    tr["decoder_norm"] = _ln(sd, "transformer.decoder.norm")
    params["transformer"] = tr

    params["query_embed"] = sd["query_embed.weight"].copy()
    params["span_embed"] = _mlp(sd, "span_embed", 3)
    params["class_embed"] = _dense(sd, "class_embed")
    params["saliency_proj"] = _dense(sd, "saliency_proj")
    if cfg.adapter_module == "linear":
        params["adapter_layer"] = _mlp(sd, "adapter_layer", 2)
    # the reference builds txt_position_embed UNCONDITIONALLY (model.py:480,
    # build_position_encoding) and only gates its USE on use_txt_pos
    # (model.py:106) — so real checkpoints always carry these tensors. With
    # use_txt_pos=False they are consumed-and-dropped here (the flax model
    # has no unused module to hold them; they never touch the forward).
    if "txt_position_embed.position_embeddings.weight" in sd:
        txt_pos = {
            "position_embeddings": sd["txt_position_embed.position_embeddings.weight"].copy(),
            "LayerNorm": _ln(sd, "txt_position_embed.LayerNorm"),
        }
        if cfg.use_txt_pos:
            params["txt_position_embed"] = txt_pos
    return params


def _inv_dense(out, name, p):
    out[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    out[f"{name}.bias"] = np.asarray(p["bias"]).copy()


def _inv_ln(out, name, p):
    out[f"{name}.weight"] = np.asarray(p["scale"]).copy()
    out[f"{name}.bias"] = np.asarray(p["bias"]).copy()


def _inv_attn(out, name, p):
    out[f"{name}.in_proj_weight"] = np.ascontiguousarray(
        np.asarray(p["in_proj"]["kernel"]).T)
    out[f"{name}.in_proj_bias"] = np.asarray(p["in_proj"]["bias"]).copy()
    _inv_dense(out, f"{name}.out_proj", p["out_proj"])


def _inv_mlp(out, name, p):
    for key, layer in p.items():
        _inv_dense(out, f"{name}.layers.{key.split('_')[1]}", layer)


def _inv_linear_layer(out, name, p):
    _inv_dense(out, f"{name}.net.1", p["linear"])
    if "LayerNorm" in p:
        _inv_ln(out, f"{name}.LayerNorm", p["LayerNorm"])


def _inv_encoder_layer(out, name, p):
    _inv_attn(out, f"{name}.self_attn", p["self_attn"])
    _inv_dense(out, f"{name}.linear1", p["ffn"]["linear1"])
    _inv_dense(out, f"{name}.linear2", p["ffn"]["linear2"])
    _inv_ln(out, f"{name}.norm1", p["norm1"])
    _inv_ln(out, f"{name}.norm2", p["norm2"])


def params_to_torch_state_dict(params: dict, cfg: ModelConfig) -> dict:
    """cone_tpu flax param dict -> reference-named numpy state dict — the
    exact inverse of torch_state_dict_to_params, so cone_tpu-trained
    weights load into the reference PyTorch model (cone/model.py names)
    for apples-to-apples GPU evaluation. Pinned by
    tests/test_convert_workflow.py round-trip equality."""
    out: dict = {}
    for i in range(cfg.n_input_proj):
        _inv_linear_layer(out, f"input_txt_proj.{i}", params[f"input_txt_proj_{i}"])
        _inv_linear_layer(out, f"input_vid_proj.{i}", params[f"input_vid_proj_{i}"])
    tr = params["transformer"]
    for i in range(cfg.enc_layers):
        _inv_encoder_layer(out, f"transformer.encoder.layers.{i}",
                           tr[f"encoder_layer_{i}"])
    for i in range(cfg.dec_layers):
        p = tr[f"decoder_layer_{i}"]
        name = f"transformer.decoder.layers.{i}"
        _inv_encoder_layer(out, name, p)
        _inv_attn(out, f"{name}.multihead_attn", p["multihead_attn"])
        _inv_ln(out, f"{name}.norm3", p["norm3"])
    _inv_ln(out, "transformer.decoder.norm", tr["decoder_norm"])
    out["query_embed.weight"] = np.asarray(params["query_embed"]).copy()
    _inv_mlp(out, "span_embed", params["span_embed"])
    _inv_dense(out, "class_embed", params["class_embed"])
    _inv_dense(out, "saliency_proj", params["saliency_proj"])
    if cfg.adapter_module == "linear":
        _inv_mlp(out, "adapter_layer", params["adapter_layer"])
    if cfg.use_txt_pos:
        out["txt_position_embed.position_embeddings.weight"] = np.asarray(
            params["txt_position_embed"]["position_embeddings"]).copy()
        _inv_ln(out, "txt_position_embed.LayerNorm",
                params["txt_position_embed"]["LayerNorm"])
    else:
        # the reference model owns these tensors even when use_txt_pos=False
        # (built unconditionally, model.py:480; unused in forward) and
        # load_state_dict is strict (inference.py:529) — synthesize
        # fresh-init values so the export loads: LN at its torch init
        # (ones/zeros), embedding zeros
        out["txt_position_embed.position_embeddings.weight"] = np.zeros(
            (cfg.max_q_l, cfg.hidden_dim), np.float32)
        out["txt_position_embed.LayerNorm.weight"] = np.ones(
            cfg.hidden_dim, np.float32)
        out["txt_position_embed.LayerNorm.bias"] = np.zeros(
            cfg.hidden_dim, np.float32)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt (torch)")
    ap.add_argument("--out", help="raw params msgpack output path")
    ap.add_argument("--workdir",
                    help="instead of --out: write an evaluation-ready workdir"
                         " (model_converted.msgpack + config.json) for"
                         " `cone_tpu.cli infer --workdir ... --ckpt converted`")
    ap.add_argument("--config", default=None, help="ConeConfig json (optional)")
    ap.add_argument("--export", action="store_true",
                    help="REVERSE direction: read a cone_tpu checkpoint"
                         " (--workdir + --ckpt name) and write a"
                         " reference-format torch .ckpt to --out, loadable"
                         " by cone/inference.py setup_model")
    args = ap.parse_args()
    assert args.out or args.workdir, "need --out or --workdir"

    import torch  # local import: conversion host only

    if args.export:
        assert args.workdir and args.out, "--export needs --workdir and --out"
        from cone_tpu.train.checkpoint import CheckpointManager
        from cone_tpu.train.loop import build_family

        cfg = CheckpointManager.load_config(args.workdir)
        assert cfg.model.model_family != "tan", "export supports CONE ckpts"
        model, template = build_family(cfg, seed=0)
        mgr = CheckpointManager(args.workdir)
        params, _, epoch, _ = mgr.restore(args.ckpt, template)
        sd = params_to_torch_state_dict(jax_to_numpy(params), cfg.model)
        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()},
                    "epoch": epoch}, args.out)
        print(f"exported '{args.ckpt}' (epoch {epoch}) -> {args.out} "
              f"({len(sd)} reference tensors)")
        return
    from flax.serialization import msgpack_serialize

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw["model"] if "model" in raw else raw
    sd = {k: v.numpy() for k, v in sd.items()}

    from cone_tpu.config import ConeConfig

    cfg = ConeConfig.load(args.config) if args.config else ConeConfig()
    params = torch_state_dict_to_params(sd, cfg.model)

    if args.workdir:
        from cone_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(args.workdir, cfg)
        epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0
        path = mgr.save("converted", params, None, epoch)
        print(f"wrote {path} (+ config.json); evaluate with:\n"
              f"  python -m cone_tpu.cli infer --workdir {args.workdir}"
              f" --ckpt converted --eval_path <val.jsonl>")
    else:
        with open(args.out, "wb") as f:
            f.write(msgpack_serialize({"params": params}))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
