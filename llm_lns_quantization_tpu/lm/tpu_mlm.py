"""TPUMLM: encoder-only (masked-LM) engine scoring via pseudo-log-likelihood.

Beyond-reference capability. The reference ships a BERT result artifact
(``lm_eval/models/BERT.csv``) but no adapter — encoder-only models cannot be
scored through its causal 3-method API at all. Here BERT-family models plug
into the same harness via **pseudo-log-likelihood** (PLL, Salazar et al.
2020, "Masked Language Model Scoring"): each scored token is masked in turn
and its log-probability read from the bidirectional forward at the masked
position; the sum over positions is the sequence score.

Mechanics mirror TPULM where the contract overlaps:

* ``loglikelihood(ctx, cont)`` — PLL of the continuation tokens given the
  full (context + continuation) surround. One forward row per scored token;
  rows from all requests are packed together into shape-bucketed batches, so
  device utilization does not depend on per-request continuation length.
  ``is_greedy`` is the all-positions argmax==target analogue.
* ``loglikelihood_rolling(string)`` — PLL over every token, window-chunked
  to the model's ``max_position_embeddings``.
* ``greedy_until`` raises (no autoregressive decode for encoders — the same
  partial-API precedent as the reference's AnthropicLM, whose
  ``loglikelihood`` raises, anthropic_llms.py:40-112).

Like every engine here, quantization is first-class: ``quant=`` selects
weight/activation formats over the same registry.
"""

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..harness.api import LM
from ..models import build_model
from ..models.tokenizer import build_tokenizer
from ..quant.apply import ActQuantizer
from ..quant.config import QuantConfig


_bucket_len = utils.bucket_len


class TPUMLM(LM):
    def __init__(
        self,
        family: str = "bert",
        pretrained: Optional[str] = None,
        preset: str = "tiny",
        tokenizer: Optional[str] = None,
        quant: Optional[str] = None,
        batch_size: int = 8,
        max_batch_size: Optional[int] = None,
        max_length: Optional[int] = None,
        max_gen_toks: int = 0,
        dtype: str = "bfloat16",
        device: Optional[str] = None,
        seed: int = 0,
    ):
        super().__init__()
        del device
        self.quant_config = (
            quant if isinstance(quant, QuantConfig) else QuantConfig.parse(quant)
        )
        jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(dtype)]
        self.bundle = build_model(
            family=family,
            preset=preset,
            checkpoint=pretrained,
            dtype=jdtype,
            quant=self.quant_config,
            seed=seed,
        )
        if not self.bundle.is_encoder:
            raise ValueError(
                f"family {family!r} is not encoder-only; use model=tpu"
            )
        if tokenizer is None:
            tokenizer = pretrained if pretrained is not None else "byte"
        self.tokenizer = build_tokenizer(tokenizer)
        self.actq = ActQuantizer(self.quant_config)
        del max_gen_toks  # no generation; accepted for registry/CLI compat
        # batch_size="auto": PLL rows are near-uniform (one window each), so
        # a fixed default suffices; max_batch_size caps it (CLI contract)
        bs = 8 if str(batch_size) == "auto" else int(batch_size)
        if max_batch_size:
            bs = min(bs, int(max_batch_size))
        self._batch_size = bs
        self._max_length = int(max_length) if max_length else self.bundle.max_length
        self.mask_id = int(
            getattr(self.tokenizer, "mask_token_id", None)
            or self.bundle.cfg.mask_token_id
        )

        self._score_jit = jax.jit(
            functools.partial(self._score_step, self.bundle.cfg)
        )

    # ------------------------------------------------------------------

    @property
    def eot_token_id(self):
        return self.tokenizer.eot_token_id

    @property
    def max_length(self):
        return self._max_length

    @property
    def max_gen_toks(self):
        return 0

    @property
    def batch_size(self):
        return self._batch_size

    def tok_encode(self, string: str) -> List[int]:
        return self.tokenizer.encode(string)

    def tok_decode(self, tokens) -> str:
        return self.tokenizer.decode(tokens)

    # ------------------------------------------------------------------
    # scoring
    # ------------------------------------------------------------------

    def _score_step(self, cfg, params, tokens, attn_mask, pos_idx, targets):
        """Per row: (logprob of ``targets`` at masked index, argmax match).

        ``tokens[i, pos_idx[i]]`` is already the mask id; everything stays on
        device and two scalars per row come back.
        """
        logits = self.bundle.forward(
            params, cfg, tokens, self.actq, attn_mask=attn_mask
        )
        rows = jnp.arange(tokens.shape[0])
        at = logits[rows, pos_idx, :].astype(jnp.float32)
        logz = jax.nn.logsumexp(at, axis=-1)
        tgt = jnp.take_along_axis(at, targets[:, None], axis=-1)[:, 0]
        return tgt - logz, jnp.argmax(at, axis=-1) == targets

    def _pll_rows(self, rows) -> List[Tuple[float, bool]]:
        """Score masked rows: each item is (token_ids, masked_position).

        Returns per-row (logprob, argmax-match), in input order. Rows are
        sorted longest-first by plain index sort (NOT utils.Reorderer, which
        DEDUPLICATES equal keys — distinct rows routinely share (length,
        position), e.g. equal-length multiple-choice continuations).
        """
        order = sorted(range(len(rows)), key=lambda i: -len(rows[i][0]))
        out = [None] * len(rows)
        reordered = [(i, rows[i]) for i in order]

        # depth-1 dispatch pipeline (same pattern as tpu_lm): pack+dispatch
        # chunk i+1 before fetching chunk i's two scalars per row
        pending = None

        def _collect(entry):
            ll, match, idxs = entry
            ll = np.asarray(jax.device_get(ll))
            match = np.asarray(jax.device_get(match))
            for j, orig_i in enumerate(idxs):
                out[orig_i] = (float(ll[j]), bool(match[j]))

        for chunk in utils.chunks(reordered, self._batch_size):
            B = len(chunk)
            S = _bucket_len(max(len(ids) for _, (ids, _) in chunk))
            toks = np.zeros((B, S), np.int32)
            amask = np.zeros((B, S), np.int32)
            pos = np.zeros((B,), np.int32)
            tgt = np.zeros((B,), np.int32)
            for j, (_, (ids, p)) in enumerate(chunk):
                toks[j, : len(ids)] = ids
                amask[j, : len(ids)] = 1
                pos[j] = p
                tgt[j] = ids[p]
                toks[j, p] = self.mask_id
            ll, match = self._score_jit(
                self.bundle.params, toks, amask, pos, tgt
            )
            if pending is not None:
                _collect(pending)
            pending = (ll, match, [orig_i for orig_i, _ in chunk])

        if pending is not None:
            _collect(pending)
        return out

    def loglikelihood(self, requests):
        # tokenize each (context, continuation) pair once; one masked row
        # per continuation token, batched across ALL requests
        plans = []  # (n_rows_start, n_rows)
        rows = []
        keys = []
        for context, continuation in requests:
            ctx_enc = self.tok_encode(context) if context else []
            whole = self.tok_encode(context + continuation) if context else self.tok_encode(continuation)
            cont_start = len(ctx_enc)
            # keep the window around the continuation within max_length
            ids = whole[-self._max_length:]
            shift = len(whole) - len(ids)
            start = max(0, cont_start - shift)
            plans.append((len(rows), len(ids) - start))
            for p in range(start, len(ids)):
                rows.append((ids, p))
            keys.append((context, continuation))
        scored = self._pll_rows(rows)
        res = []
        for (off, n), cache_key in zip(plans, keys):
            lls = scored[off : off + n]
            answer = (
                float(sum(x[0] for x in lls)),
                bool(all(x[1] for x in lls)),
            )
            if cache_key is not None:
                self.cache_hook.add_partial("loglikelihood", cache_key, answer)
            res.append(answer)
        return res

    def loglikelihood_rolling(self, requests):
        res = []
        for (string,) in requests:
            ids = self.tok_encode(string)
            rows = []
            # window-chunk long documents; each token scored once with its
            # window as bidirectional context
            W = self._max_length
            for w0 in range(0, len(ids), W):
                window = ids[w0 : w0 + W]
                for p in range(len(window)):
                    rows.append((window, p))
            scored = self._pll_rows(rows)
            ll = float(sum(x[0] for x in scored))
            self.cache_hook.add_partial("loglikelihood_rolling", (string,), ll)
            res.append(ll)
        return res

    def greedy_until(self, requests) -> List[str]:
        raise NotImplementedError(
            "encoder-only (masked) LMs cannot generate; PLL scoring covers "
            "loglikelihood tasks only"
        )
