"""Machine-translated LAMBADA OpenAI (en/fr/de/it/es).

Parity: reference lm_eval/tasks/lambada_multilingual.py.
"""

from .lambada import LambadaOpenAI

_LANGS = ["en", "fr", "de", "it", "es"]


def create_task(lang):
    cls = type(
        f"LambadaOpenAIMultilingual_{lang}",
        (LambadaOpenAI,),
        {"VERSION": 0, "DATASET_NAME": lang},
    )
    return cls


def construct_tasks():
    return {f"lambada_openai_mt_{lang}": create_task(lang) for lang in _LANGS}
