"""Package setup. ``python setup.py build_ext --inplace`` builds the C++
decontamination kernel (native/janitor_cc.cpp); the package works without it
via the pure-Python fallback."""

from setuptools import Extension, find_packages, setup

setup(
    name="llm_lns_quantization_tpu",
    version="0.1.0",
    description=(
        "TPU-native LM evaluation harness with first-class quantization "
        "emulation (LNS/FP/MX/INT formats)"
    ),
    # compat/lm_eval installs under the reference's package name ``lm_eval``
    # (an import-compatibility re-export shim; see PARITY.md). It lives in a
    # subdirectory so the repo-root sys.path entry used by the test suite
    # cannot shadow the reference checkout's real lm_eval package, which the
    # oracle-parity tests import from /root/reference.
    packages=find_packages(exclude=["tests*", "scripts*", "compat*"])
    + [
        "lm_eval",
        "lm_eval.models",
        "lm_eval.tasks",
        "lm_eval.decontamination",
    ],
    package_dir={"lm_eval": "compat/lm_eval"},
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    extras_require={
        "eval": ["transformers", "datasets", "safetensors"],
        "metrics": ["scikit-learn", "sacrebleu"],
        "decontam": ["zstandard"],
        "dev": ["pytest", "torch"],
    },
    ext_modules=[
        Extension(
            "janitor_cc",
            sources=["native/janitor_cc.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            optional=True,
        )
    ],
)
