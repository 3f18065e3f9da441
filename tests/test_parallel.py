"""Mesh/sharding on 8 faked CPU devices (SURVEY §4 plan item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from polyp_tpu.configs import DiffusionConfig
from polyp_tpu.diffusion import DiffusionSchedule
from polyp_tpu.models import tiny_condition_unet
from polyp_tpu.parallel import (
    data_sharding,
    make_mesh,
    shard_batch,
    shard_params,
    unet_param_sharding,
)
from polyp_tpu.train.scratch_ddpm import create_ddpm_state, ddpm_train_step
from tests.test_trainers import TINY_UNET, _images

pytestmark = pytest.mark.slow  # compile-heavy


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh({"data": 8})
    batch = jnp.zeros((16, 4, 4, 3))
    sharded = shard_batch(batch, mesh)
    assert sharded.sharding.spec == P("data", None, None, None)
    assert len(sharded.sharding.device_set) == 8


def test_dp_train_step_over_mesh():
    """Full DDPM train step with the batch sharded over 8 devices — XLA
    inserts the grad psum; params come back replicated."""
    mesh = make_mesh({"data": 8})
    cfg = DiffusionConfig(image_size=16, train_batch_size=8, num_epochs=1,
                          num_train_timesteps=50).with_schedule(1)
    sched = DiffusionSchedule.create(50)
    state = create_ddpm_state(cfg, TINY_UNET, jax.random.PRNGKey(0), 16)
    images = shard_batch(jnp.asarray(_images(8)), mesh)
    state, loss = ddpm_train_step(state, sched, images, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_tensor_parallel_sharding_rules():
    mesh = make_mesh({"data": 4, "model": 2})
    unet = tiny_condition_unet()
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.asarray([0]), jnp.zeros((1, 4, 32)))["params"]
    shardings = unet_param_sharding(params, mesh)

    def find(tree, path):
        for p in path.split("/"):
            tree = tree[p]
        return tree

    qspec = find(shardings,
                 "down_0_attn_0/transformer_blocks_0/attn1/to_q/kernel").spec
    assert qspec == P(None, "model")
    ospec = find(shardings,
                 "down_0_attn_0/transformer_blocks_0/attn1/to_out/kernel").spec
    assert ospec == P("model", None)
    # convs replicated
    cspec = find(shardings, "conv_in/kernel").spec
    assert cspec == P()


def test_tp_forward_matches_replicated():
    """Sharded-params forward == replicated forward (numerics preserved
    through the megatron split)."""
    mesh = make_mesh({"data": 1, "model": 8})
    unet = tiny_condition_unet()
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.asarray([1, 2])
    ctx = jnp.ones((2, 4, 32))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    expected = unet.apply({"params": params}, x, t, ctx)
    # auto sharding mode: resident NamedShardings on params are enough; XLA
    # partitions the jitted computation and inserts collectives.
    sharded = shard_params(params, mesh)
    apply = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
    got = apply(sharded, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_mesh_spec_rejects_nonpositive_sizes():
    from polyp_tpu.parallel.mesh import mesh_from_spec

    with pytest.raises(ValueError, match="axis size"):
        mesh_from_spec("data=-2")
    with pytest.raises(ValueError, match="axis size"):
        mesh_from_spec("data=0")
    assert mesh_from_spec("data=-1").shape["data"] == len(jax.devices())
