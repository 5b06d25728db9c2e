"""Forward-pass tests for the MMFN family: shapes, jit, lane-mask invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model, get_entry_point

CFG = GlobalConfig(max_lanes=8)  # small lanes for test speed


def _init_and_run(variant, batch, train=False):
    model = build_model(CFG, variant)
    # jitted init (CLAUDE.md): bare model.init runs the forward eagerly
    # op-by-op — minutes per call on the full graph
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train,
    )
    out = model.apply(variables, batch, False)
    return model, variables, out


@pytest.mark.parametrize("variant", ["img", "vec", "rad"])
def test_forward_shapes(variant):
    batch = synthetic_batch(batch_size=2, max_lanes=8)
    _, _, out = _init_and_run(variant, batch)
    assert out.shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_jit_forward_and_determinism():
    batch = synthetic_batch(batch_size=2, max_lanes=8)
    model, variables, _ = _init_and_run("vec", batch)
    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    out1 = np.asarray(fwd(variables, batch))
    out2 = np.asarray(fwd(variables, batch))
    np.testing.assert_array_equal(out1, out2)


@pytest.mark.slow
def test_lane_mask_invariance():
    """Lanes beyond lane_num must not affect the output (masked attention +
    token-0-only generator)."""
    batch = synthetic_batch(batch_size=2, max_lanes=8)
    lane_num = jnp.asarray([3, 5], dtype=jnp.int32)
    batch = batch._replace(lane_num=lane_num)
    model, variables, _ = _init_and_run("vec", batch)

    lanes2 = np.asarray(batch.lanes).copy()
    lanes2[0, 3:] = 777.0   # scribble on padded lanes
    lanes2[1, 5:] = -123.0
    batch2 = batch._replace(lanes=jnp.asarray(lanes2))

    out1 = np.asarray(model.apply(variables, batch, False))
    out2 = np.asarray(model.apply(variables, batch2, False))
    # Padded lanes still traverse the subgraph max-pool before masking kicks in
    # at the attention stage, exactly like the reference; with the mask, token 0
    # (the only consumed token) must be unchanged.
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_dropout_changes_train_output():
    batch = synthetic_batch(batch_size=2, max_lanes=8)
    model, variables, _ = _init_and_run("img", batch)
    out_a = model.apply(variables, batch, True, rngs={"dropout": jax.random.PRNGKey(7)},
                        mutable=["batch_stats"])[0]
    out_b = model.apply(variables, batch, True, rngs={"dropout": jax.random.PRNGKey(8)},
                        mutable=["batch_stats"])[0]
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_registry_entry_points():
    fn = get_entry_point("mmfn_utils.models.model_vec:MMFN")
    model = fn(CFG)
    assert model.variant == "vec"
    assert get_entry_point("mmfn_rad")(CFG).variant == "rad"


@pytest.mark.slow
def test_attention_introspection():
    from mmfn_tpu.utils.introspection import forward_with_intermediates, attention_rollout

    batch = synthetic_batch(batch_size=1, max_lanes=8)
    model, variables, _ = _init_and_run("vec", batch)
    out, inter = forward_with_intermediates(model, variables, batch)
    assert out.shape == (1, 4, 2)
    rollout = attention_rollout(inter, "transformer4")
    assert rollout.size > 0
    assert rollout.shape[1] == 512  # stage-4 embedding width


def test_attention_capture_and_token_maps():
    """SelfAttention sows softmax maps; introspection extracts (B,H,T,T) maps
    and cross-modality token images (viz tooling, scripts/viz_attention.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmfn_tpu.models.gpt import FusionTransformer
    from mmfn_tpu.utils.introspection import (
        attention_weights, token_attention_image)

    ft = FusionTransformer(n_embd=32, n_head=4, block_exp=2, n_layer=2,
                           n_groups=3)
    grids = [jnp.ones((2, 8, 8, 32)) * i for i in range(3)]
    vel = jnp.ones((2,))
    variables = ft.init(jax.random.PRNGKey(0), grids, vel, False)
    _, state = ft.apply(
        variables, grids, vel, False,
        capture_intermediates=lambda m, _: type(m).__name__ == "SelfAttention")
    maps = attention_weights(state["intermediates"])
    assert len(maps) == 2                      # one per block
    att = next(iter(maps.values()))
    assert att.shape == (2, 4, 192, 192)       # B, heads, 3*64 tokens
    np.testing.assert_allclose(att.sum(axis=-1), 1.0, atol=1e-5)  # softmax rows
    img = token_attention_image(att, 0, 2)
    assert img.shape == (8, 8) and np.isfinite(img).all()
