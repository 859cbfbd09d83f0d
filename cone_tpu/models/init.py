"""Parameter initialization helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cone_tpu.config import ModelConfig
from cone_tpu.models.cone import ConeModel


def build_model_and_params(cfg: ModelConfig, seed: int = 0):
    """Construct a ConeModel and a full parameter tree (all branches).

    The reference additionally xavier-uniform-initializes every >1-D
    transformer parameter (cone/transformer.py:44-47); we mirror that by
    re-initializing transformer kernels with xavier_uniform.
    """
    model = ConeModel(cfg)
    rng = jax.random.PRNGKey(seed)
    b, lq, lv = 2, cfg.max_q_l, cfg.max_v_l
    # ones, not zeros: parameter shapes don't depend on input values, but
    # zero features hit the (reference-exact, eps-free) x/||x|| in the
    # matching branch as 0/0 at trace time, which trips `--debug_nans`
    # before training even starts
    variables = model.init(
        {"params": rng},
        jnp.ones((b, lq, cfg.t_feat_dim)),
        jnp.ones((b, lq)),
        jnp.ones((b, lv, cfg.v_motion_feat_dim)),
        jnp.ones((b, lv)),
        jnp.ones((b, cfg.t_feat_dim)),
        jnp.ones((b, lv, cfg.v_appear_feat_dim)),
        jnp.ones((b, lv)),
        method=ConeModel.init_all,
    )
    params = variables["params"]

    # xavier-uniform all matrix params inside the transformer
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    xavier = jax.nn.initializers.xavier_uniform()
    new = {}
    key = jax.random.PRNGKey(seed + 1)
    leaves = {}
    for path, leaf in flat:
        keystr = jax.tree_util.keystr(path)
        if "'transformer'" in keystr and leaf.ndim > 1:
            key, sub = jax.random.split(key)
            leaves[keystr] = xavier(sub, leaf.shape, leaf.dtype)
        else:
            leaves[keystr] = leaf
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: leaves[jax.tree_util.keystr(p)], params
    )
    return model, params
