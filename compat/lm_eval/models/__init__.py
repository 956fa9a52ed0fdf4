"""Reference-compatible ``lm_eval.models`` (reference lm_eval/models/
__init__.py:8-22). ``MODEL_REGISTRY`` resolves classes lazily on access so
importing this module doesn't pull in every backend's dependencies."""

from llm_lns_quantization_tpu.lm.registry import _REGISTRY, get_model  # noqa: F401


class _LazyRegistry(dict):
    """name -> LM class, resolving the lazy loaders on first access."""

    def __getitem__(self, name):
        return get_model(name)

    def __contains__(self, name):
        return dict.__contains__(self, name)


MODEL_REGISTRY = _LazyRegistry({k: None for k in _REGISTRY})
