"""Continuous-batching greedy decode engine (slot-based serving loop).

BASELINE.json config #3 ("Llama-2-7B ... continuous batching, 1 host") asks
for the serving pattern the reference never had (its generation path batches
whole request groups lock-step, reference huggingface.py:1993-2057): a fixed
pool of decode *slots* over one shared KV cache, where finished sequences
free their slot immediately and queued prompts are admitted mid-flight —
keeping the (weight-HBM-bound) decode step at full batch occupancy instead
of waiting for the slowest sequence of a static batch.

Mechanics (all shapes static; the compiled-program family is deliberately
small: one decode-chunk program per stop-set size, one prefill program per
(length bucket, power-of-2 admission group size), one scatter per group
size):

* one shared cache of ``[slots, heads, max_len, head_dim]`` per layer
  (plain bf16, INT8 or FP8 via ``kv_quant``);
* **admission**: a prompt is prefilled with a batch-1 forward on a fresh
  single-slot cache (padded to a power-of-2 length bucket), then scattered
  into its slot of the shared cache — prefill compute is proportional to the
  prompt, not to the pool;
* **step**: one fused forward over all slots with *per-row* cache offsets
  (models/layers.py update_kv_cache accepts an index vector) and a
  per-slot validity mask, so slots at different depths decode together;
  inactive slots compute but write only to masked positions;
* **chunked dispatch**: ``steps_per_dispatch`` decode steps run inside ONE
  jitted ``lax.while_loop`` with on-device stop-id / token-budget / length
  masking, so the host syncs once per chunk instead of once per token (on
  the tunneled TPU each dispatch+sync costs ~1 ms — at 7B that is ~5% of a
  step, at 124M it dominates). Rows that finish mid-chunk idle until the
  chunk ends (bounded occupancy loss of ``steps_per_dispatch - 1`` steps);
  the loop exits early once every slot is done. Greedy outputs are
  bit-identical to the 1-step-per-dispatch loop for any chunk size;
* the host loop admits/evicts between chunks and applies the same stop
  conditions when accounting emitted tokens.
"""

import functools
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import matmul as qmatmul
from ..quant.apply import ActQuantizer
from ..quant.config import QuantConfig

_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, cap: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return min(b, cap)
    return cap


class ContinuousBatcher:
    """Greedy continuous-batching decoder over a ``ModelBundle``."""

    def __init__(
        self,
        bundle,
        quant: Optional[QuantConfig] = None,
        slots: int = 4,
        max_len: int = 256,
        steps_per_dispatch: int = 8,
    ):
        assert not bundle.is_seq2seq and not getattr(bundle, "is_encoder", False), (
            "continuous batching serves causal LMs"
        )
        self.bundle = bundle
        self.cfg = bundle.cfg
        self.quant = quant or QuantConfig()
        self.actq = ActQuantizer(self.quant)
        self.slots = slots
        self.max_len = max_len
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))

        # the cache pool (arg 1) is donated: the chunk is its only consumer
        # and in-place reuse keeps one pool resident instead of two (the
        # pool is the dominant serving allocation beside the weights)
        self._chunk = jax.jit(
            self._chunk_impl, static_argnames=("steps",), donate_argnums=(1,)
        )
        self._prefills = {}  # padded len -> jitted prefill

    # -- jitted programs -------------------------------------------------

    def _chunk_impl(
        self, params, cache, lengths, valid, cur_toks, active, budget,
        stop_ids, *, steps,
    ):
        """Up to ``steps`` decode steps over the slot pool, one dispatch.

        Emits each step's fed token into ``out`` (sentinel -1 for inactive
        rows) and deactivates a row on-device under exactly the host loop's
        conditions: stop id emitted, per-row budget exhausted, or cache full.
        Exits early once no row is active.
        """
        rows = jnp.arange(self.slots)
        out0 = jnp.full((self.slots, steps), -1, jnp.int32)

        def cond(state):
            i, _, _, _, _, active, _, _ = state
            return jnp.logical_and(i < steps, jnp.any(active))

        def body(state):
            i, cache, lengths, valid, tok, active, budget, out = state
            out = jax.lax.dynamic_update_slice(
                out, jnp.where(active, tok, -1)[:, None], (0, i)
            )
            valid = valid.at[rows, lengths].set(valid[rows, lengths] | active)
            logits, cache = self.bundle.forward(
                params,
                self.cfg,
                tok[:, None],
                self.actq,
                cache=cache,
                cache_index=lengths,
                attn_mask=valid,
                positions=lengths[:, None],
            )
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            lengths = lengths + active.astype(jnp.int32)
            budget = budget - active.astype(jnp.int32)
            stopped = (
                jnp.isin(tok, stop_ids)
                | (budget <= 0)
                | (lengths >= self.max_len - 1)
            )
            active = active & ~stopped
            tok = jnp.where(active, nxt, tok)
            return (i + 1, cache, lengths, valid, tok, active, budget, out)

        state = (0, cache, lengths, valid, cur_toks, active, budget, out0)
        _, cache, lengths, valid, tok, active, budget, out = (
            jax.lax.while_loop(cond, body, state)
        )
        return cache, lengths, valid, tok, active, budget, out

    def _prefill_fn(self, padded: int, n: int):
        """Batched prefill: one forward for ``n`` same-bucket admissions.

        Admissions grouped by length bucket share one dispatch instead of a
        batch-1 prefill each (the dispatch, not the prompt FLOPs, dominates
        admission cost in the decode regime). ``n`` is a power of 2 (dummy
        rows are dropped at scatter), so compile count is bounded by
        #buckets x (log2(slots)+1) — at 7B each prefill compile costs
        minutes, so the group-size axis must not be dense.
        """
        key = (padded, n)
        if key not in self._prefills:

            def prefill(params, tokens, true_lens):
                cache_n = self.bundle.init_cache(
                    self.cfg, n, self.max_len,
                    kv_quant=self.quant.kv_cache or False,
                )
                logits, cache_n = self.bundle.forward(
                    params,
                    self.cfg,
                    tokens,
                    self.actq,
                    cache=cache_n,
                    cache_index=0,
                )
                first = jnp.argmax(
                    logits[jnp.arange(n), true_lens - 1, :], axis=-1
                ).astype(jnp.int32)
                return cache_n, first

            self._prefills[key] = jax.jit(prefill)
        return self._prefills[key]

    @staticmethod
    @functools.partial(jax.jit, donate_argnums=(0,))
    def _scatter_rows(big, small, slot_idx):
        """Write prefill-cache rows into pool rows ``slot_idx``.

        ``big`` is donated (updated in place; one pool allocation) and
        ``slot_idx`` is traced, so all admissions share one compilation per
        group size.
        """

        def upd(b, s):
            # mode="drop": padding rows carry an out-of-range slot index
            return b.at[slot_idx].set(s.astype(b.dtype), mode="drop")

        return jax.tree_util.tree_map(upd, big, small)

    # -- host loop -------------------------------------------------------

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 32,
        stop_ids: Sequence[int] = (),
    ) -> List[List[int]]:
        """Greedy continuations for every prompt, in request order.

        Prompts are admitted into free slots as they open up; the number of
        in-flight sequences is capped by ``slots`` but throughput does not
        wait for a whole static batch to finish.
        """
        S, L = self.slots, self.max_len
        params = self.bundle.params
        # phase attribution (VERDICT r4 item 2): every phase below ends at a
        # host sync (device_get) or is pure host work, so perf_counter
        # spans are honest wall shares. Exposed as self.last_stats after
        # each generate(); scripts/bench_serving_7b.py --batcher prints it.
        st = {
            "t_admit_build": 0.0,   # host: queue pop + numpy assembly
            "t_prefill": 0.0,       # prefill dispatch + scatter + first sync
            "t_chunk": 0.0,         # decode-chunk dispatch + result fetch
            "t_account": 0.0,       # host: emitted-token accounting
            "n_chunks": 0, "n_prefill_dispatches": 0,
            "prefill_rows": 0, "prefill_padded_tokens": 0,
            "executed_steps": 0, "slot_steps": 0, "emitted_tokens": 0,
            "admitted": 0,
        }
        t_start = time.perf_counter()
        # on-device stop lookup; -2 sentinel keeps the array non-empty
        stop_arr = jnp.asarray(
            sorted(set(int(t) for t in stop_ids)) or [-2], jnp.int32
        )

        cache = self.bundle.init_cache(
            self.cfg, S, L, kv_quant=self.quant.kv_cache or False
        )
        lengths = jnp.zeros((S,), jnp.int32)
        valid = jnp.zeros((S, L), bool)

        pending = list(range(len(prompts)))
        outputs: List[List[int]] = [[] for _ in prompts]
        slot_req = [-1] * S          # request id per slot (-1 = free)
        budget = np.zeros(S, np.int32)
        cur = np.zeros(S, np.int32)  # token to feed next step per slot
        active = np.zeros(S, bool)

        while pending or active.any():
            # admission: fill free slots from the queue; same-bucket
            # admissions share one batched prefill dispatch + one scatter
            t0 = time.perf_counter()
            admits = []  # (rid, slot, ids, padded)
            while pending and not active.all():
                rid = pending.pop(0)
                s = int(np.flatnonzero(~active)[0])
                # keep at least one prompt token: a non-positive slice bound
                # (max_new_tokens >= L - 1) would keep the WHOLE prompt and
                # overflow the slot cache
                keep = max(1, L - max_new_tokens - 1)
                ids = list(prompts[rid])[-keep:]
                admits.append((rid, s, ids, _bucket(len(ids), L)))
                slot_req[s] = rid
                budget[s] = max_new_tokens
                active[s] = True

            by_bucket = {}
            for adm in admits:
                by_bucket.setdefault(adm[3], []).append(adm)
            st["t_admit_build"] += time.perf_counter() - t0
            st["admitted"] += len(admits)
            t0 = time.perf_counter()
            for padded, group in sorted(by_bucket.items()):
                n = len(group)
                n_pad = 1
                while n_pad < n:
                    n_pad *= 2
                toks = np.zeros((n_pad, padded), np.int32)
                true_lens = np.ones((n_pad,), np.int32)  # dummies: 1 token
                slots_idx = np.full((n_pad,), S, np.int32)  # dummies: dropped
                for j, (rid, s, ids, _) in enumerate(group):
                    toks[j, : len(ids)] = ids
                    true_lens[j] = len(ids)
                    slots_idx[j] = s
                # standalone-prefill dispatch scope: int4gk mid-M matmuls
                # take the fused kernel here (~19% faster prefill phase at
                # 7B, measured round 5) — but NOT in fused prefill+decode
                # programs, where the same kernel loses (ops/matmul.py
                # _INT4GK_KERNEL_MAX_M rationale)
                with qmatmul.int4gk_prefill_kernel():
                    cache_n, first = self._prefill_fn(padded, n_pad)(
                        params, jnp.asarray(toks), jnp.asarray(true_lens)
                    )
                cache = self._scatter_rows(cache, cache_n, jnp.asarray(slots_idx))
                real = jnp.asarray(slots_idx[:n])
                lengths = lengths.at[real].set(jnp.asarray(true_lens[:n]))
                vrows = np.zeros((n, L), bool)
                for j in range(n):
                    vrows[j, : true_lens[j]] = True
                valid = valid.at[real].set(jnp.asarray(vrows))
                first_host = np.asarray(jax.device_get(first))
                for j, (rid, s, ids, _) in enumerate(group):
                    cur[s] = int(first_host[j])
                st["n_prefill_dispatches"] += 1
                st["prefill_rows"] += n
                st["prefill_padded_tokens"] += n_pad * padded
            st["t_prefill"] += time.perf_counter() - t0

            # one fused multi-step decode chunk over the whole pool
            t0 = time.perf_counter()
            cache, lengths, valid, cur_t, act_t, budget_t, out = self._chunk(
                params, cache, lengths, valid,
                jnp.asarray(cur), jnp.asarray(active), jnp.asarray(budget),
                stop_arr, steps=self.steps_per_dispatch,
            )
            # one batched fetch: each device_get is a tunnel round-trip
            out_host, act_host, cur, budget = jax.device_get(
                (out, act_t, cur_t, budget_t)
            )
            out_host = np.asarray(out_host)
            act_host = np.array(act_host)
            cur = np.array(cur)
            budget = np.array(budget)
            st["t_chunk"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            emitted = (out_host >= 0).sum(axis=1)
            st["n_chunks"] += 1
            # while_loop iterations this chunk = longest active prefix
            # (rows emit every step they are active; the loop exits once no
            # row is) — the per-chunk denominator for occupancy
            exe = int(emitted.max()) if emitted.size else 0
            st["executed_steps"] += exe
            st["slot_steps"] += exe * S
            st["emitted_tokens"] += int(emitted.sum())
            for s in range(S):
                if slot_req[s] < 0:
                    continue
                # emitted tokens for this row: the non-sentinel prefix
                for t in out_host[s]:
                    if t < 0:
                        break
                    outputs[slot_req[s]].append(int(t))
                if not act_host[s]:
                    slot_req[s] = -1
            active = act_host.copy()
            st["t_account"] += time.perf_counter() - t0

        st["wall_s"] = time.perf_counter() - t_start
        st["occupancy"] = (
            st["emitted_tokens"] / st["slot_steps"] if st["slot_steps"] else 0.0
        )
        self.last_stats = st
        return outputs
