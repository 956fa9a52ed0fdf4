"""Applying quantizers to parameter pytrees and activation sites.

Replaces the reference's two interception mechanisms:

* weight path — an in-place ``named_parameters()`` rewrite loop skipping
  ``"norm"`` params (reference lm_eval/models/huggingface.py:1740-1762)
  becomes a pure ``jax.tree_util`` map over the param pytree;
* activation path — ``register_forward_hook`` on every leaf module except
  containers/LayerNorm/Dropout/activations (e.g. huggingface.py:672-676)
  becomes explicit ``ActQuantizer.__call__`` sites inside the model code (JAX
  has no module hooks; an explicit site list per architecture is the
  documented translation, see each model's ``QUANT_SITES``).

``ste`` gives every fake-quant function a straight-through-estimator gradient
(identity backward), matching the reference's ``STEFunction_structured``
autograd functions (e.g. huggingface.py:663-666) so QAT-style training steps
differentiate through quantization.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .config import QuantConfig


def ste(quant_fn: Callable) -> Callable:
    """Wrap a fake-quant fn with a straight-through (identity) gradient."""

    @jax.custom_vjp
    def _q(x):
        return quant_fn(x)

    def _fwd(x):
        return quant_fn(x), None

    def _bwd(_, g):
        return (g,)

    _q.defvjp(_fwd, _bwd)
    return _q


def _is_skipped(path: str, patterns) -> bool:
    low = path.lower()
    return any(p in low for p in patterns)


def quantize_weights(params, config: QuantConfig):
    """Fake-quantize every eligible leaf of a param pytree.

    Mirrors the reference weight-quantization loop (huggingface.py:1740-1762):
    every parameter whose path does not match a skip pattern (reference:
    ``"norm" not in name``) and with rank >= 2 (the reference only rewrites
    2-D/3-D params, leaving biases alone via its shape branch falling through)
    is mapped through ``config.weight_fn``.
    """
    fn = config.weight_fn
    if fn is None:
        return params

    def leaf_fn(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        if _is_skipped(name, config.skip_weight_patterns):
            return leaf
        if getattr(leaf, "ndim", 0) < 2:
            return leaf
        return fn(leaf)

    return jax.tree_util.tree_map_with_path(leaf_fn, params)


class ActQuantizer:
    """Callable activation-quant site: ``x = actq("site_name", x)``.

    One instance is threaded through a model's forward pass; each call site
    corresponds to a leaf-module output the reference would have hooked. With
    no activation format configured it is the identity (and compiles away).
    """

    def __init__(self, config: Optional[QuantConfig] = None, use_ste: bool = False):
        self.config = config or QuantConfig()
        fn = self.config.act_fn
        if fn is not None and use_ste:
            fn = ste(fn)
        self._fn = fn

    def __call__(self, site: str, x: jnp.ndarray) -> jnp.ndarray:
        if self._fn is None:
            return x
        if site == "embed" and not self.config.quantize_embedding_acts:
            return x
        return self._fn(x)

    @property
    def enabled(self) -> bool:
        return self._fn is not None


NULL_ACT_QUANT = ActQuantizer(QuantConfig())
