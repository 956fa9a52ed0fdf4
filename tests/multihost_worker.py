"""Worker for the real 2-process jax.distributed test (test_parallel.py).

Each process joins a 2-process CPU gloo group via
``jax.distributed.initialize`` and runs the SAME full eval through
``simple_evaluate``; the evaluator auto-wraps the engine in ``MultihostLM``
(harness/evaluator.py) so each process scores only its host-cyclic request
slice and the results are all-gathered. Both processes must therefore emit
results identical to each other AND to a plain single-process run.

Usage: python multihost_worker.py PORT PROCESS_ID NUM_PROCESSES OUT_JSON \
           DATA_DIR [QUANT_SPEC]
(NUM_PROCESSES=1 produces the single-process oracle in the same
environment/codepath; QUANT_SPEC — e.g. ``w:int4g;pallas`` — runs the
eval on that quantization config, certifying the packed serving tier
under jax.distributed.)
"""

import json
import sys


def main():
    port, pid, nproc, out_path, data_dir = sys.argv[1:6]
    quant = sys.argv[6] if len(sys.argv) > 6 else None
    pid, nproc = int(pid), int(nproc)

    import jax

    # this machine's site pre-imports jax with JAX_PLATFORMS=axon,cpu; force
    # CPU before first backend use (env vars are too late — see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )
        assert jax.process_count() == nproc, (
            f"distributed init failed: process_count={jax.process_count()}"
        )

    from llm_lns_quantization_tpu.harness.evaluator import simple_evaluate

    margs = "family=gpt2,preset=tiny,dtype=float32,batch_size=2,seed=7"
    if quant:
        margs += f",quant={quant}"
    out = simple_evaluate(
        model="tpu",
        model_args=margs,
        tasks=["piqa", "boolq", "wikitext"],
        num_fewshot=0,
        no_cache=True,
        limit=None,
        bootstrap_iters=0,
        data_dir=data_dir,
    )
    with open(out_path, "w") as f:
        json.dump(out["results"], f, sort_keys=True)
    print(f"worker {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
