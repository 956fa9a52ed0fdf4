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
    packages=find_packages(exclude=["tests*", "scripts*"]),
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
