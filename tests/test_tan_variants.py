"""FrameMaxPool / PropMaxPool / SparsePropConv variants vs direct torch
re-executions of the reference formulas (the modules are pools + 1D convs;
torch-cpu is available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cone_tpu.models.tan import (
    FrameMaxPool,
    PropMaxPool,
    SparsePropConv,
    sparse_map_mask,
)


def test_frame_max_pool_matches_torch(rng):
    b, l, d, h, stride = 2, 16, 8, 12, 2
    x = rng.normal(size=(b, l, d)).astype(np.float32)
    m = FrameMaxPool(h, stride)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    w = np.asarray(params["vis_conv"]["kernel"])  # (d, h)
    bch = np.asarray(params["vis_conv"]["bias"])
    t = torch.relu(torch.tensor(x @ w + bch)).transpose(1, 2)  # (b, h, l)
    ref = torch.nn.MaxPool1d(stride)(t).transpose(1, 2).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dense_prop_max_pool_matches_reference_loop(rng):
    b, nc, d, n_layers = 2, 12, 6, 5
    x = rng.normal(size=(b, nc, d)).astype(np.float32)
    m = PropMaxPool(nc, n_layers)
    out, mask = m.apply({}, jnp.asarray(x))
    out, mask = np.asarray(out), np.asarray(mask)

    # reference loop (prop_modules/dense.py)
    t = torch.tensor(x).transpose(1, 2)  # (b, d, nc)
    ref = np.zeros((b, d, nc, nc), np.float32)
    ref_mask = np.zeros((nc, nc), np.float32)
    cur = t
    for dig in range(n_layers):
        if dig > 0:
            cur = torch.nn.MaxPool1d(2, stride=1)(cur)
        s_idx = list(range(0, nc - dig))
        e_idx = [s + dig for s in s_idx]
        ref[:, :, s_idx, e_idx] = cur.numpy()
        ref_mask[s_idx, e_idx] = 1
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1), atol=1e-6)
    np.testing.assert_array_equal(mask, ref_mask)


def test_sparse_prop_conv_matches_torch(rng):
    b, nc, d, h = 2, 16, 6, 6
    scales = (4, 2)
    x = rng.normal(size=(b, nc, d)).astype(np.float32)
    m = SparsePropConv(nc, scales, h)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    out, mask = m.apply({"params": params}, jnp.asarray(x))
    out, mask = np.asarray(out), np.asarray(mask)
    np.testing.assert_array_equal(mask, sparse_map_mask(nc, scales))

    # reference conv cascade (prop_modules/sparse.py:69-103) in torch with
    # the same weights
    convs = []
    for scale_idx, num_layer in enumerate(scales):
        layers = []
        for i in range(num_layer):
            k, s = ((1, 1) if scale_idx == 0 else (3, 2)) if i == 0 else (2, 1)
            conv = torch.nn.Conv1d(h if (scale_idx, i) != (0, 0) else d, h, k, s)
            kern = np.asarray(params[f"conv_{scale_idx}_{i}"]["kernel"])  # (k, in, out)
            with torch.no_grad():
                conv.weight.copy_(torch.tensor(kern.transpose(2, 1, 0)))
                conv.bias.copy_(
                    torch.tensor(np.asarray(params[f"conv_{scale_idx}_{i}"]["bias"]))
                )
            layers.append(conv)
        convs.append(layers)

    t = torch.tensor(x).transpose(1, 2)
    ref = np.zeros((b, h, nc, nc), np.float32)
    acum_layers, stride = 0, 1
    cur = t
    with torch.no_grad():
        for scale_layers in convs:
            for i, conv in enumerate(scale_layers):
                cur = conv(cur)
                s = conv.stride[0]
                stride *= s
                n_scale = cur.shape[-1] + i  # num_scale_clips at this scale
                ori_s = list(range(0, nc - acum_layers - i * stride, stride))
                ori_e = [si + acum_layers + i * stride for si in ori_s]
                n = min(len(ori_s), cur.shape[-1])
                ref[:, :, ori_s[:n], ori_e[:n]] = cur.numpy()[:, :, :n]
            acum_layers += stride * (len(scale_layers) + 1)
    np.testing.assert_allclose(out, ref.transpose(0, 2, 3, 1), atol=1e-5)


def test_small_geometry_layout_skips_overrun_stages():
    """At small num_clips with deep scale stacks, later pooling stages run
    past the map. Mirroring the reference's try/except (sparse.py:28-31),
    which guards ONLY the pool op: a stage whose pool succeeds but whose
    scatter range is empty still advances x (pool_ok=True, empty lists); a
    stage where both fail is dropped entirely."""
    from cone_tpu.models.tan import SparsePropMaxPool, sparse_map_layout

    layout = sparse_map_layout(16, (8, 4, 4))
    assert layout, "layout must not be empty"
    for _, _, _, _, pool_ok, s_idx, e_idx in layout:
        assert len(s_idx) == len(e_idx)
        # empty scatter only allowed on pool-advancing stages
        assert pool_ok or len(s_idx) > 0
        assert all(isinstance(v, int) for v in s_idx)
    # the module builds and runs at this geometry
    prop = SparsePropMaxPool(num_clips=16, num_scale_layers=(8, 4, 4))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 8)),
                    jnp.float32)
    map_h, mask = prop.apply({}, x)
    assert map_h.shape == (2, 16, 16, 8)
    got_mask = sparse_map_mask(16, (8, 4, 4))
    np.testing.assert_array_equal(np.asarray(mask), got_mask)
    assert got_mask.sum() > 0


@pytest.mark.parametrize("nc,scales", [
    (64, (16, 8, 8)),   # shipped ego4d/mad geometry
    (64, (8, 8)),
    (32, (16, 8, 8)),
    (16, (8, 4, 4)),
    (16, (16, 8, 8)),   # scales deeper than the map
    (8, (4, 4)),
    (128, (16, 8, 8)),
])
def test_sparse_layout_fuzz(nc, scales):
    """Any (num_clips, scale-stack) combination must yield a structurally
    valid layout: non-empty int index lists inside the map, a mask that the
    module reproduces, and a buildable forward."""
    from cone_tpu.models.tan import SparsePropMaxPool, sparse_map_layout

    layout = sparse_map_layout(nc, scales)
    assert layout
    for _, _, k, s, pool_ok, s_idx, e_idx in layout:
        assert k >= 1 and s >= 1
        assert len(s_idx) == len(e_idx)
        assert pool_ok or len(s_idx) > 0
        assert all(0 <= v < nc for v in s_idx)
        assert all(0 <= v < nc for v in e_idx)
        assert all(e >= s_ for s_, e in zip(s_idx, e_idx))
    prop = SparsePropMaxPool(num_clips=nc, num_scale_layers=scales)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, nc, 4)),
                    jnp.float32)
    map_h, mask = prop.apply({}, x)
    assert map_h.shape == (1, nc, nc, 4)
    assert float(np.asarray(mask).sum()) > 0
