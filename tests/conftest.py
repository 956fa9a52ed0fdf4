"""Test config: force CPU JAX with an 8-device virtual mesh.

This machine's axon site (PYTHONPATH sitecustomize) pre-imports jax with
``JAX_PLATFORMS=axon,cpu`` before any user code runs, so env vars are too
late — platform selection must go through ``jax.config.update`` before the
first backend use. XLA_FLAGS is still read at backend-creation time, so the
virtual device count can be set here. Multi-device sharding tests (the
reference has none — SURVEY.md §4) run on this 8-device CPU mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# keep the axon TPU tunnel free for bench runs; tests use the CPU mesh
jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: first full run pays compiles, reruns are
# fast (important: 2-vCPU machine, LLVM compiles dominate test wall-clock)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# XLA's DEFAULT matmul precision is reduced (bf16-class on TPU); decode-vs-
# score and cross-shape consistency tests need true f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402

# Build the C++ janitor extension on demand so its parity tests run (the
# reference requires a manual compile, janitor.py:8-9; here the suite builds
# it once and tests skip only if no toolchain is available).
try:
    import janitor_cc  # noqa: F401
except ImportError:
    import subprocess
    import sys

    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        timeout=300,
        check=False,
    )


# Pin the CJK segmenters to the built-in script-class fallback
# (tasks/translation.py): the wmt20-en-ja goldens were bootstrapped with the
# fallback, and on a machine where nagisa/jieba ARE installed the optional
# path would segment differently and fail them. A None sys.modules entry
# makes `import nagisa` raise ImportError deterministically.
import sys as _sys  # noqa: E402

for _seg in ("nagisa", "jieba"):
    _sys.modules.setdefault(_seg, None)


@pytest.fixture(autouse=True)
def _exercise_fused_kernels():
    """Unit tests use tiny weights, which the production dispatch would route
    to the XLA dequant-dot path (ops/matmul.py _FUSED_MIN_WEIGHT) — zero the
    threshold so kernel tests keep exercising the fused Pallas kernels in
    interpret mode. test_dispatch_policy restores the default to test the
    dispatch itself."""
    from llm_lns_quantization_tpu.ops import matmul as qmm

    prev = qmm._FUSED_MIN_WEIGHT
    qmm._FUSED_MIN_WEIGHT = 0
    yield
    qmm._FUSED_MIN_WEIGHT = prev
