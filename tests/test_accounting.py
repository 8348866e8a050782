"""Collective accounting (parallel/accounting.py): HLO parsing, the ring ICI
model, and end-to-end accounting of a genuinely partitioned program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from forge_tpu.parallel.accounting import (
    account_program, hlo_collectives, ici_time_s)


def test_hlo_parse_counts_and_bytes():
    txt = """
  %ar = f32[2,16]{1,0} all-reduce(f32[2,16] %x), replica_groups={}
  %ag.1 = bf16[4,8]{1,0} all-gather(bf16[2,8] %y), dimensions={0}
  %cps = f32[8]{0} collective-permute-start(f32[8] %z)
  %cpd = f32[8]{0} collective-permute-done(f32[8] %cps)
  %t = (f32[4]{0}, f32[4]{0}) all-reduce-start(f32[4] %a, f32[4] %b)
"""
    c = hlo_collectives(txt)
    assert c["counts"]["all-reduce"] == 2
    assert c["counts"]["all-gather"] == 1
    assert c["counts"]["collective-permute"] == 1  # start counted, done not
    assert c["bytes"]["all-gather"] == 4 * 8 * 2
    assert c["bytes"]["all-reduce"] == 2 * 16 * 4 + 2 * 4 * 4
    assert c["bytes_total"] == sum(c["bytes"].values())


def test_ici_ring_model():
    coll = {"bytes": {"all-reduce": 90e9}}  # 90 GB at 45 GB/s/link
    t8 = ici_time_s(coll, 8, link_bw=45e9)
    assert abs(t8 - 2 * (7 / 8) * 2.0) < 1e-6
    assert ici_time_s(coll, 1) == 0.0
    ag = {"bytes": {"all-gather": 45e9}}
    assert abs(ici_time_s(ag, 8, link_bw=45e9) - 7 / 8) < 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_account_program_detects_tp_allreduce():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("tp",))
    x = jax.device_put(jnp.ones((8, 32)), NamedSharding(mesh, P(None, "tp")))
    w = jax.device_put(jnp.ones((32, 16)), NamedSharding(mesh, P("tp", None)))
    f = jax.jit(lambda x, w: x @ w,
                out_shardings=NamedSharding(mesh, P(None, None)))
    acct = account_program(f, (x, w), 8, compute_time_s=1e-3)
    assert acct["collectives_per_step"].get("all-reduce", 0) >= 1
    assert acct["collective_bytes_per_step"] > 0
    assert 0.0 < acct["predicted_efficiency"] <= 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_account_program_dp_is_collective_free():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    x = jax.device_put(jnp.ones((8, 32)), NamedSharding(mesh, P("dp", None)))
    w = jax.device_put(jnp.ones((32, 16)), NamedSharding(mesh, P(None, None)))
    f = jax.jit(lambda x, w: jnp.tanh(x @ w))
    acct = account_program(f, (x, w), 8, compute_time_s=1e-3)
    assert acct["collective_bytes_per_step"] == 0
    assert acct["predicted_efficiency"] == 1.0
