"""Tokenizers for the TPU LM engine.

Two implementations behind one duck-typed interface (``encode``, ``decode``,
``eot_token_id``, ``vocab_size``):

* ``HFTokenizer`` — wraps a ``transformers`` tokenizer loaded from a local
  checkpoint directory (the only part of HF this framework uses at eval time;
  the reference loads tokenizer + model + hooks through transformers,
  huggingface.py:216-230).
* ``ByteTokenizer`` — dependency-free UTF-8 byte-level tokenizer used by the
  offline test suite and the synthetic benchmark models.
"""

from typing import Iterable, List


class ByteTokenizer:
    """UTF-8 bytes as token ids (0-255); id 0 doubles as EOT."""

    vocab_size = 256
    eot_token_id = 0

    def encode(self, string: str) -> List[int]:
        return list(string.encode("utf-8"))

    def decode(self, tokens: Iterable[int]) -> str:
        return bytes(int(t) % 256 for t in tokens).decode("utf-8", errors="ignore")


class HFTokenizer:
    def __init__(self, path: str, trust_remote_code: bool = False):
        import transformers

        self.tok = transformers.AutoTokenizer.from_pretrained(
            path, trust_remote_code=trust_remote_code
        )
        self.vocab_size = len(self.tok)

    @property
    def eot_token_id(self):
        if self.tok.eos_token_id is not None:
            return self.tok.eos_token_id
        return self.tok.pad_token_id or 0

    def encode(self, string: str) -> List[int]:
        return self.tok.encode(string, add_special_tokens=False)

    def decode(self, tokens: Iterable[int]) -> str:
        return self.tok.decode(list(tokens))


def build_tokenizer(spec: str):
    """``"byte"`` or a local HF checkpoint path."""
    if spec == "byte":
        return ByteTokenizer()
    return HFTokenizer(spec)
