"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4: "Multi-node is
never tested because it's never implemented"); these validate the TPU-native
replacement: mesh construction, megatron-layout parameter shardings,
sharded-vs-single-device numerical equivalence, and the QAT train step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_lns_quantization_tpu.models import build_model
from llm_lns_quantization_tpu.parallel import (
    make_mesh,
    make_train_step,
    param_partition_specs,
    shard_params,
)
from llm_lns_quantization_tpu.parallel.mesh import data_sharding
from llm_lns_quantization_tpu.quant import QuantConfig


requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_multidevice
def test_mesh_shape_heuristic():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    assert mesh.shape["model"] == 8  # prefer model parallelism up to 8


@requires_multidevice
@pytest.mark.parametrize("family", ["gpt2", "llama", "opt"])
def test_sharded_forward_matches_single_device(family):
    mesh = make_mesh(shape=(2, 4))
    overrides = {}
    bundle = build_model(family=family, preset="tiny", config_overrides=overrides)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 250, (4, 16)).astype(np.int32)
    )
    single = bundle.forward(bundle.params, bundle.cfg, tokens)

    sharded_params = shard_params(bundle.params, bundle, mesh)
    toks_sharded = jax.device_put(tokens, data_sharding(mesh))
    fwd = jax.jit(lambda p, t: bundle.forward(p, bundle.cfg, t))
    sharded = fwd(sharded_params, toks_sharded)
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )


@requires_multidevice
def test_partition_specs_cover_matmul_weights():
    bundle = build_model(family="llama", preset="tiny")
    specs = param_partition_specs(bundle.params, "llama", model_axis_size=2)
    flat = {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    # projections sharded; norms replicated
    assert flat["layers/0/q_proj"] == jax.sharding.PartitionSpec(None, "model")
    assert flat["layers/0/down_proj"] == jax.sharding.PartitionSpec("model", None)
    assert flat["layers/0/input_norm"] == jax.sharding.PartitionSpec()


@requires_multidevice
def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(shape=(2, 4))
    bundle = build_model(
        family="llama",
        preset="tiny",
        config_overrides=dict(num_key_value_heads=4),
    )
    params = shard_params(bundle.params, bundle, mesh)
    step, init_opt = make_train_step(
        bundle, mesh, quant=QuantConfig(acts="fp8"), learning_rate=1e-2
    )
    opt_state = init_opt(params)
    rng = np.random.default_rng(0)
    toks = jax.device_put(
        rng.integers(0, 250, (4, 17)).astype(np.int32), data_sharding(mesh)
    )
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, toks[:, :-1], toks[:, 1:])
        losses.append(float(jax.device_get(loss)))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # memorizes the single batch


@requires_multidevice
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    ge.dryrun_multichip(8)


@requires_multidevice
def test_sharded_tpulm_matches_unsharded():
    """TPULM with tensor/data-sharded params returns identical results."""
    from llm_lns_quantization_tpu.lm.tpu_lm import TPULM

    reqs = [("hello there", " world"), ("abc", " def"), ("x y z", " w")]
    plain = TPULM(family="gpt2", preset="tiny", batch_size=4, dtype="float32")
    r_plain = plain.loglikelihood(reqs)

    mesh = make_mesh(shape=(2, 4))
    sharded = TPULM(
        family="gpt2", preset="tiny", batch_size=4, dtype="float32",
        mesh=mesh, shard=True,
    )
    r_sharded = sharded.loglikelihood(reqs)
    for (ll1, g1), (ll2, g2) in zip(r_plain, r_sharded):
        assert abs(ll1 - ll2) < 1e-3
        assert g1 == g2


def test_multihost_sharding_single_process():
    """Single-host degenerate behavior of the multi-host request plumbing."""
    from llm_lns_quantization_tpu.parallel import multihost

    reqs = list(range(10))
    assert multihost.shard_requests(reqs, process_id=0, process_count=1) == reqs
    # explicit 3-way partition + merge round-trips
    parts = [multihost.shard_requests(reqs, i, 3) for i in range(3)]
    merged = [None] * 10
    for i, p in enumerate(parts):
        merged[i::3] = p
    assert merged == reqs
    out = multihost.run_sharded(lambda rs: [r * 2 for r in rs], reqs)
    assert out == [r * 2 for r in reqs]


@requires_multidevice
def test_sharded_packed_weights():
    """Packed (Pallas real-quant) weights get model-axis shardings through
    their pytree wrappers and the sharded forward matches single-device."""
    from llm_lns_quantization_tpu.ops.packing import LNSWeight

    mesh = make_mesh(shape=(2, 4))
    bundle = build_model(
        family="llama", preset="tiny", quant=QuantConfig.parse("w:lns8;pallas")
    )
    # wrapper leaves must pick up the rule matched on the wrapper's own path
    specs = param_partition_specs(bundle.params, "llama", mesh.shape["model"])
    q0 = bundle.params["layers"][0]["q_proj"]
    assert isinstance(q0, LNSWeight)
    assert tuple(specs["layers"][0]["q_proj"].codes) == (None, "model")
    assert tuple(specs["layers"][0]["o_proj"].codes) == ("model", None)

    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 250, (4, 16)).astype(np.int32)
    )
    single = bundle.forward(bundle.params, bundle.cfg, tokens)
    sharded_params = shard_params(bundle.params, bundle, mesh)
    codes = sharded_params["layers"][0]["q_proj"].codes
    assert not codes.sharding.is_fully_replicated
    fwd = jax.jit(lambda p, t: bundle.forward(p, bundle.cfg, t))
    sharded = fwd(sharded_params, jax.device_put(tokens, data_sharding(mesh)))
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )


@requires_multidevice
def test_sharded_t5_forward_matches_single_device():
    mesh = make_mesh(shape=(2, 4))
    bundle = build_model(family="t5", preset="tiny", dtype=jnp.float32)
    enc = jnp.asarray(
        np.random.default_rng(2).integers(0, 250, (4, 12)).astype(np.int32)
    )
    dec = jnp.concatenate([jnp.zeros((4, 1), jnp.int32), enc[:, :5]], axis=1)
    single = bundle.forward(bundle.params, bundle.cfg, enc, dec)
    sharded_params = shard_params(bundle.params, bundle, mesh)
    fwd = jax.jit(lambda p, e, d: bundle.forward(p, bundle.cfg, e, d))
    sharded = fwd(
        sharded_params,
        jax.device_put(enc, data_sharding(mesh)),
        jax.device_put(dec, data_sharding(mesh)),
    )
    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )
    specs = param_partition_specs(bundle.params, "t5", mesh.shape["model"])
    assert tuple(specs["encoder"][0]["q"]) == (None, "model")
    assert tuple(specs["decoder"][0]["co"]) == ("model", None)
    assert tuple(specs["encoder"][0]["wi"]) == (None, "model")
