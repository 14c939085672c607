"""Test harness: force CPU platform with 8 virtual devices so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware —
the JAX-native analog of the reference's (absent) multi-node testing
(SURVEY.md §4)."""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the TPU ('axon') platform and
# overwrites JAX_PLATFORMS, so the env var alone is not enough — override the
# config knob before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the suite: the full tier's wall time on
# a 1-core host is dominated by CPU XLA compiles of near-identical tiny
# programs; with the on-disk cache a repeat run (the common local loop)
# compiles from disk. Cold first runs are unaffected. Opt out with
# TGTC_NO_COMPILE_CACHE=1 (same knob as bench.py / the CLI).
if os.environ.get("TGTC_NO_COMPILE_CACHE") != "1":
    _cache_dir = os.environ.get(
        "TGTC_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tgtc_jax_tests"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # CPU-backend cache writes are gated off by default; enable them.
        jax.config.update(
            "jax_persistent_cache_enable_xla_caches",
            "xla_gpu_per_fusion_autotune_cache_dir",
        )
    except Exception:
        pass  # cache is an optimization, never a test dependency

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cpu_mesh8():
    """8-virtual-device CPU mesh for multi-chip sharding tests."""
    from tgtc.parallel import get_mesh

    assert len(jax.devices()) == 8
    return get_mesh()

@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_llff_dir(tmp_path_factory):
    """A tiny on-disk LLFF-like scene (8 views of a colored gradient) for
    loader and end-to-end smoke tests. Builder shared with the multi-host
    workers (tests/synthetic_scene.py)."""
    from tests.synthetic_scene import make_synthetic_llff_scene

    return make_synthetic_llff_scene(tmp_path_factory.mktemp("llff_scene"))


@pytest.fixture
def private_llff_dir(synthetic_llff_dir, tmp_path):
    """Per-test copy of the synthetic scene. The pipeline writes
    ``stylized_gen_{factor}/`` INTO the scene dir (reference layout,
    /root/reference/dataset.py:438) and ``ensure_style2d`` skip-if-exists
    resumes on it — so tests that RUN the 2D stack must not share the
    session-scoped scene dir, or whichever runs first short-circuits the
    rest (the C1-collage assertion caught exactly that)."""
    import glob
    import shutil

    scene_dir = str(tmp_path / "scene")
    shutil.copytree(synthetic_llff_dir, scene_dir)
    for leftover in glob.glob(os.path.join(scene_dir, "stylized_gen_*")):
        shutil.rmtree(leftover)
    return scene_dir
