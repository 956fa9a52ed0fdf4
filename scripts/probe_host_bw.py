"""Pinned-host -> HBM copy-bandwidth probe for the offload tier.

Measures the raw ``jax.device_put(pinned_host -> device)`` streaming rate at
layer-sized transfers, to place the offload decoder's measured 9.8 GB/s
effective rate (BASELINE.md, 13B bf16 layer-streamed decode) against the
achievable transfer roofline on this chip's tunnel/PCIe path. The reference's
analogue is accelerate's cpu/disk offload (huggingface.py:30-54), which
publishes no bandwidth numbers; this probe is the TPU-native roofline study.

Method: N pinned-host bf16 buffers of --mb each (distinct buffers so no
cache effects), one jitted consume program per iteration that brings a
buffer on-chip and reduces it (forces the copy; the reduce is ~free).
Synchronized with jax.device_get per round (block_until_ready returns early
through the axon tunnel).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=372,
                    help="buffer size in MiB (default ~one 13B bf16 layer)")
    ap.add_argument("--buffers", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    dev = jax.devices()[0]
    host_sh = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    dev_sh = jax.sharding.SingleDeviceSharding(dev, memory_kind="device")

    n_elems = args.mb * (1 << 20) // 2
    key = jax.random.PRNGKey(0)
    bufs = []
    for i in range(args.buffers):
        x = jax.jit(
            lambda k: jax.random.normal(k, (n_elems,), jnp.bfloat16),
            out_shardings=host_sh)(jax.random.fold_in(key, i))
        bufs.append(x)
    jax.device_get(bufs[-1][:1])

    @jax.jit
    def consume(w):
        return jax.device_put(w, dev_sh)[:: 1 << 18].astype(jnp.float32).sum()

    # warm the compile + first transfer
    jax.device_get(consume(bufs[0]))

    rates = []
    for r in range(args.rounds):
        t0 = time.perf_counter()
        acc = None
        for b in bufs:
            acc = consume(b)
        jax.device_get(acc)
        dt = time.perf_counter() - t0
        gb = args.buffers * n_elems * 2 / 1e9
        rates.append(gb / dt)
    rec = {
        "metric": "pinned_host_to_hbm_copy_bw",
        "mb_per_buffer": args.mb,
        "buffers": args.buffers,
        "rates_gb_s": [round(x, 2) for x in rates],
        "best_gb_s": round(max(rates), 2),
        "unit": "GB/s",
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
