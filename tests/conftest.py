"""Test harness: force CPU with 8 virtual devices BEFORE jax initializes.

This gives the multi-host test capability the reference lacks (SURVEY.md §4.4):
`jax.sharding` meshes are exercised on a simulated 8-device CPU topology.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image; the
# config API is authoritative. Must run before any backend initialization.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs (and re-runs of single
# files while iterating) skip XLA CPU recompiles, which dominate test time.
# Keyed on HLO hash, so code changes invalidate safely; concurrent writers
# (tools/ptest.sh) are fine (atomic renames). Separate dir from the TPU cache.
_cache_dir = os.environ.get("GRAPHGPS_TPU_TEST_CACHE",
                            os.path.expanduser("~/.cache/jax_pytest_cpu"))
if _cache_dir != "off":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def base_cfg():
    from graphgps_tpu.config.config import new_cfg
    import graphgps_tpu.data.datasets  # noqa: F401 — populate registries
    import graphgps_tpu.train.loop  # noqa: F401

    cfg = new_cfg()
    cfg.dataset.synth_num_graphs = 48
    cfg.dataset.synth_max_nodes = 20
    cfg.train.batch_size = 8
    cfg.gt.layers = 2
    cfg.gt.dim_hidden = 32
    cfg.gt.n_heads = 4
    cfg.gnn.dim_inner = 32
    cfg.optim.max_epoch = 3
    cfg.train.enable_ckpt = False
    return cfg


def make_chain_graph(n=5, feat_dim=1):
    """Deterministic path graph with int features — hand-checkable."""
    from graphgps_tpu.data.graph import Graph

    s = np.arange(n - 1)
    r = s + 1
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    x = np.arange(n, dtype=np.int64)[:, None] % 4
    e = np.zeros((ei.shape[1], 1), dtype=np.int64)
    y = np.array([float(n)], dtype=np.float32)
    return Graph(node_feat=x, edge_index=ei, edge_feat=e, y=y)
