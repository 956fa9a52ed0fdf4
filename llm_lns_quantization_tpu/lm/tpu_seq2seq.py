"""TPUSeq2SeqLM: encoder-decoder LM engine (T5 family).

Replacement for the reference's ``AutoSeq2SeqLM`` (huggingface.py:2131-2291):
the context is consumed by the encoder, the continuation is scored/generated
by the decoder. Inherits TPULM's request batching, bucketing and caching; the
tokens-to-device packing and the jitted compute differ:

* ``loglikelihood``: encoder gets the context (right-padded + mask), decoder
  scores the continuation teacher-forced from ``decoder_start_token_id``
  (reference: huggingface.py:2199-2240).
* ``loglikelihood_rolling``: each rolling window (a, b) from
  utils.get_rolling_token_windows maps to encoder=a, decoder-target=b — the
  seq2seq reading of the causal window split (reference: huggingface.py:
  2242-2258).
* ``greedy_until``: encode once, greedy decode with the decoder self-attn
  cache + precomputed cross-attention k/v; stop on EOS / single-token stops
  on device, multi-token stops trimmed on host (huggingface.py:2260-2291).
"""

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from .tpu_lm import TPULM, _bucket_len, _collect_generations, _collect_scores


class TPUSeq2SeqLM(TPULM):
    def __init__(self, family: str = "t5", preset: str = "tiny", **kw):
        super().__init__(family=family, preset=preset, **kw)
        if not self.bundle.is_seq2seq:
            raise ValueError(
                f"family {family!r} is decoder-only; use model=tpu for it"
            )

    # ------------------------------------------------------------------
    # scoring
    # ------------------------------------------------------------------

    def _score_step(self, cfg, params, enc_tokens, enc_mask, dec_inputs,
                    targets, cont_mask):
        logits = self.bundle.forward(
            params, cfg, enc_tokens, dec_inputs, self.actq,
            enc_attn_mask=enc_mask,
        )
        logits = logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
        logprobs = tgt_logit - logz
        ll = jnp.sum(jnp.where(cont_mask, logprobs, 0.0), axis=-1)
        greedy_tok = jnp.argmax(logits, axis=-1)
        is_greedy = jnp.all(
            jnp.where(cont_mask, greedy_tok == targets, True), axis=-1
        )
        return ll, is_greedy

    def loglikelihood_rolling(self, requests):
        # seq2seq windows: window context -> encoder, prediction -> decoder
        loglikelihoods = []
        for (string,) in requests:
            windows = list(
                map(
                    utils.make_disjoint_window,
                    utils.get_rolling_token_windows(
                        token_list=self.tok_encode(string),
                        prefix_token=self.eot_token_id,
                        max_seq_len=self.max_length,
                        context_len=1,
                    ),
                )
            )
            windows = [(None,) + x for x in windows]
            string_nll = self._loglikelihood_tokens(windows)
            loglikelihoods.append(sum(x[0] for x in string_nll))
        return loglikelihoods

    def _loglikelihood_tokens(self, requests) -> List[Tuple[float, bool]]:
        res = []

        def _collate(x):
            return -(len(x[1]) + len(x[2])), (tuple(x[1]), tuple(x[2]))

        re_ord = utils.Reorderer(requests, _collate)
        reordered = re_ord.get_reordered()

        if self._auto_batch and reordered:
            def _chunks_by_budget(items):
                pos = 0
                while pos < len(items):
                    r = items[pos]
                    blen = _bucket_len(len(r[1])) + _bucket_len(len(r[2]))
                    n = max(1, min(self._token_budget // blen, 128))
                    yield items[pos : pos + n]
                    pos += n

            chunk_iter = _chunks_by_budget(reordered)
        else:
            chunk_iter = utils.chunks(reordered, self.batch_size)

        start_id = int(getattr(self.bundle.cfg, "decoder_start_token_id", 0))

        # depth-1 dispatch pipeline (see tpu_lm._loglikelihood_tokens): pack
        # and dispatch chunk i+1 before fetching chunk i's per-row scalars
        pending = None

        def _collect(entry):
            _collect_scores(entry, self.cache_hook, res)

        for chunk in chunk_iter:
            metas, encs, decs, tgts_rows = [], [], [], []
            for cache_key, context_enc, continuation_enc in chunk:
                assert len(context_enc) > 0
                assert len(continuation_enc) > 0
                assert len(continuation_enc) <= self.max_length
                enc = context_enc[-self.max_length:]
                # teacher forcing: inputs = [start] + cont[:-1], targets = cont
                dec_in = [start_id] + list(continuation_enc[:-1])
                encs.append(enc)
                decs.append(dec_in)
                tgts_rows.append(list(continuation_enc))
                metas.append(cache_key)

            B = len(chunk)
            S = _bucket_len(max(len(e) for e in encs))
            T = _bucket_len(max(len(d) for d in decs), minimum=8)
            enc_toks = np.zeros((B, S), np.int32)
            enc_mask = np.zeros((B, S), np.int32)
            dec_toks = np.full((B, T), start_id, np.int32)
            tgt_toks = np.zeros((B, T), np.int32)
            cont_mask = np.zeros((B, T), bool)
            for i, (e, d, g) in enumerate(zip(encs, decs, tgts_rows)):
                enc_toks[i, : len(e)] = e
                enc_mask[i, : len(e)] = 1
                dec_toks[i, : len(d)] = d
                tgt_toks[i, : len(g)] = g
                cont_mask[i, : len(g)] = True

            ll, greedy = self._score_jit(
                self._params, enc_toks, enc_mask, dec_toks, tgt_toks, cont_mask
            )
            if pending is not None:
                _collect(pending)
            pending = (ll, greedy, metas)

        if pending is not None:
            _collect(pending)

        return re_ord.get_original(res)

    # ------------------------------------------------------------------
    # generation
    # ------------------------------------------------------------------

    def _build_decode(self, batch: int, enc_len: int, gen_len: int):
        from ..models import t5 as t5_mod

        cfg = self.bundle.cfg
        actq = self.actq
        start_id = int(getattr(cfg, "decoder_start_token_id", 0))

        def decode(params, enc_tokens, enc_mask, stop_tokens):
            enc_hidden = t5_mod.encode(params, cfg, enc_tokens, actq, enc_mask)
            cache = t5_mod.init_cache(params, cfg, batch, gen_len, enc_hidden, actq)
            out0 = jnp.zeros((batch, gen_len), jnp.int32)
            done0 = jnp.zeros((batch,), bool)
            tok0 = jnp.full((batch,), start_id, jnp.int32)

            def cond(state):
                i, _, _, _, done = state
                return jnp.logical_and(i < gen_len, ~jnp.all(done))

            def body(state):
                i, cache, tok, out, done = state
                logits, cache = t5_mod.decode(
                    params, cfg, tok[:, None], enc_hidden, actq,
                    enc_attn_mask=enc_mask, cache=cache, cache_index=i,
                )
                nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
                out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
                done = jnp.logical_or(done, jnp.isin(nxt, stop_tokens))
                return (i + 1, cache, nxt, out, done)

            _, _, _, toks, _ = jax.lax.while_loop(
                cond, body, (0, cache, tok0, out0, done0)
            )
            return toks  # [B, gen_len]

        return jax.jit(decode)

    def greedy_until(self, requests) -> List[str]:
        res = []

        def _collate(x):
            return -len(self.tok_encode(x[0])), x[0]

        re_ord = utils.Reorderer(requests, _collate)
        reordered = re_ord.get_reordered()
        chunk_iter = utils.chunks(reordered, self.batch_size)

        eos_id = int(getattr(self.bundle.cfg, "eos_token_id", self.eot_token_id))

        # depth-1 dispatch pipeline (same pattern as the scoring loop)
        pending = None

        def _collect(entry):
            _collect_generations(entry, self.tok_decode, self.cache_hook, res)

        for chunk in chunk_iter:
            contexts = [c for c, _ in chunk]
            args = [a for _, a in chunk]
            untils = []
            for a in args:
                u = a["until"] if isinstance(a, dict) else a
                if isinstance(u, str):
                    u = [u]
                untils.append(u or [])
            max_gen = min(
                self.max_gen_toks,
                max(
                    (a.get("max_length", self.max_gen_toks) if isinstance(a, dict) else self.max_gen_toks)
                    for a in args
                ),
            )

            encs = [self.tok_encode(ctx)[-self.max_length:] for ctx in contexts]
            S = _bucket_len(max(len(e) for e in encs))
            B = len(chunk)
            enc_toks = np.zeros((B, S), np.int32)
            enc_mask = np.zeros((B, S), np.int32)
            for i, e in enumerate(encs):
                enc_toks[i, : len(e)] = e  # encoder: right-padded + masked
                enc_mask[i, : len(e)] = 1

            shared = set(untils[0])
            for u in untils[1:]:
                shared &= set(u)
            stop_ids = {eos_id}
            for term in shared:
                enc = self.tok_encode(term)
                if len(enc) == 1:
                    stop_ids.add(enc[0])
            stop_arr = np.asarray(sorted(stop_ids), np.int32)

            key = (B, S, max_gen, len(stop_arr))
            if key not in self._decode_cache:
                self._decode_cache[key] = self._build_decode(B, S, max_gen)
            out_dev = self._decode_cache[key](
                self._params, enc_toks, enc_mask, stop_arr
            )
            if pending is not None:
                _collect(pending)
            pending = (out_dev, contexts, untils, stop_arr)

        if pending is not None:
            _collect(pending)

        return re_ord.get_original(res)
