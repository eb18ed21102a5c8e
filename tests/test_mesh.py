"""Multi-chip (virtual 8-device CPU mesh, tests/conftest.py) data-parallel
rendering: sharding the script batch over a jax.sharding.Mesh must change
nothing about the audio (scripts are independent — SURVEY.md §2.6)."""

import jax
import numpy as np
import pytest

from skred_tpu.assets import WaveBank
from skred_tpu.engine.fused import render_fused
from skred_tpu.host.timeline import compile_script
from skred_tpu.parallel.batch import (make_mesh, render_stacked,
                                      stack_timelines)


@pytest.fixture(scope="module")
def small_batch(reference_dir):
    bank = WaveBank()
    tls = [compile_script((reference_dir / n).read_text().splitlines(), 0.1,
                          bank=bank.fork(), script_dir=reference_dir,
                          block=128)
           for n in ("0.sk", "14.sk", "21.sk", "2.sk")]
    return stack_timelines(tls * 2)        # batch 8 = one row per device


def test_mesh_has_devices():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"


def test_fused_mesh_matches_unsharded(small_batch):
    mesh = make_mesh()
    a = render_fused(small_batch)
    b = render_fused(small_batch, mesh=mesh)
    assert np.array_equal(a, b), "dp sharding changed the audio"


def test_compat_mesh_matches_unsharded(small_batch):
    mesh = make_mesh()
    a = render_stacked(small_batch)
    b = render_stacked(small_batch, mesh=mesh)
    assert np.array_equal(a, b)


def test_mesh_subset(small_batch):
    # a 4-device sub-mesh with batch 8 shards 2 rows per device
    mesh = make_mesh(4)
    a = render_fused(small_batch)
    b = render_fused(small_batch, mesh=mesh)
    assert np.array_equal(a, b)


def test_render_batch_mesh_odd_sizes(reference_dir):
    """render_batch auto mode pads each feature bucket so arbitrary group
    sizes shard evenly over the mesh (regression: 3 scripts over 8
    devices failed NamedSharding divisibility)."""
    import pathlib

    from skred_tpu.parallel.batch import render_batch

    ps = [reference_dir / n for n in ("0.sk", "21.sk", "14.sk")]
    mesh = make_mesh()
    a = render_batch(ps, 0.2, mesh=mesh)
    b = render_batch(ps, 0.2, engine="compat")
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) < 1e-3
