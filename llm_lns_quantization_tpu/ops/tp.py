"""SPMD partitioning rules for the quantized Pallas matmuls (tensor parallel).

A ``pl.pallas_call`` lowers to an opaque custom call, so GSPMD/Shardy cannot
partition it: under the ("data", "model") mesh the packed weight operands of
the real-quant tier would be all-gathered to full size on every device and
the kernel run replicated — correct, but it forfeits the entire point of
model-axis sharding (weights resident per-shard, compute N/p per device).
The reference never faces this problem because it has no tensor parallelism
at all (SURVEY.md §2.4); its scaling story is HF accelerate's layer-wise
``device_map`` placement.

This module wraps each kernel in ``jax.experimental.custom_partitioning`` so
the partitioner runs the kernel on *local shards* with the standard
megatron-layout collectives (the layout parallel/mesh.py assigns):

  * column parallel — weight [K, N] sharded P(None, "model"): every device
    keeps its N/p columns, runs the kernel locally, output stays sharded
    P(batch, "model"). No collective.
  * row parallel — weight sharded P("model", None): x arrives K-sharded
    (Shardy re-shards if needed), each device contracts its K/p slice, and
    the partial products are combined with one ``psum`` over "model" — the
    single all-reduce per transformer block of the megatron layout.
  * lns4 column parallel is special: the nibble-packed operand uses the
    halves layout (packed byte column j holds output columns j AND j+N/2,
    ops/packing.py LNS4Weight), so a contiguous shard of packed bytes is
    NOT a contiguous slice of output columns and the sharded result is not
    expressible as a NamedSharding. Instead each device decodes its own
    packed shard and the (activation-sized) outputs are all-gathered:
    M*N*2 bytes of ICI traffic versus K*N/2 for gathering the weights —
    a large win in the decode regime (small M) that packed weights target,
    and the weights stay resident-sharded either way.

The kernels themselves are unchanged; on a single device the wrappers are
bypassed entirely — custom_partitioning wraps the kernel in an opaque
sub-computation that costs real dispatch/fusion overhead in the decode
regime (measured 0.92x -> 0.69x of bf16 decode throughput on GPT-2 124M),
and partitioning has nothing to do with one device.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from . import matmul as qmm


def _single_device() -> bool:
    return jax.device_count() <= 1


def _pad_spec(sharding, ndim):
    spec = tuple(sharding.spec)
    return (spec + (None,) * ndim)[:ndim]


def _resolve(arg_shapes):
    """(x_row_axis, k_axis, n_axis) from the operand shardings, dropping any
    axis conflicts (an axis may shard at most one of the three roles)."""
    xspec = _pad_spec(arg_shapes[0].sharding, 2)
    wspec = _pad_spec(arg_shapes[1].sharding, 2)
    kax, nax = wspec
    if nax is not None and nax == kax:
        nax = None
    xrow = xspec[0] if xspec[0] not in (kax, nax) else None
    return xrow, kax, nax


def _def_partition(cp, local_fn, rule):
    """Attach column/row-parallel partitioning to a 2-D matmul-like
    ``custom_partitioning`` whose result is [M, N_out] with N_out tracking
    the weight's N axis contiguously (lns8 / int8)."""

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, nax = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, nax))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)
        n_args = len(arg_shapes)

        def lower(x, w, *rest):
            y = local_fn(x, w, *rest)
            if kax is not None:
                y = jax.lax.psum(y, kax)
            return y

        arg_specs = [P(xrow, kax), P(kax, nax)]
        if n_args == 3:
            # int8 per-column scale [N]: always tracks the weight's N
            # sharding (never K) — replicating it while codes are N-sharded
            # (both-axes-sharded weights) hands the local kernel a
            # full-length scale against N/p codes
            arg_specs.append(P(nax))
        out = NamedSharding(mesh, P(xrow, nax))
        return (mesh, lower, out,
                tuple(NamedSharding(mesh, s) for s in arg_specs))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule=rule,
    )
    return cp


@functools.lru_cache(maxsize=None)
def _lns_matmul_cp(frac_bits: int, out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)

    def local(x, codes):
        return qmm.lns_matmul(x, codes, frac_bits=frac_bits, out_dtype=dtype)

    return _def_partition(
        custom_partitioning(local), local, "i j, j k -> i k"
    )


@functools.lru_cache(maxsize=None)
def _int8_matmul_cp(out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)

    def local(x, codes, scale):
        # per-column scale folds into the partial products linearly, so the
        # row-parallel psum can run on scaled partials
        return qmm.int8_matmul(x, codes, scale, out_dtype=dtype)

    return _def_partition(
        custom_partitioning(local), local, "i j, j k, k -> i k"
    )


@functools.lru_cache(maxsize=None)
def _w8a8_matmul_cp(out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)

    def local(x, codes, scale):
        # row-parallel shards quantize their own K-slice of x (per-shard
        # row scales) — a strictly finer-grained quantization than one
        # global row scale, and the scaled f32 partials psum exactly
        return qmm.w8a8_matmul(x, codes, scale, out_dtype=dtype)

    return _def_partition(
        custom_partitioning(local), local, "i j, j k, k -> i k"
    )


@functools.lru_cache(maxsize=None)
def _mx_matmul_cp(exp_bits: int, man_bits: int, block_size: int,
                  out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)

    def local(x, codes, bscale):
        return qmm.mx_matmul(
            x, codes, bscale, exp_bits=exp_bits, man_bits=man_bits,
            block_size=block_size, out_dtype=dtype,
        )

    cp = custom_partitioning(local)

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, nax = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, nax))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)

        def lower(x, codes, bscale):
            y = local(x, codes, bscale)
            if kax is not None:
                y = jax.lax.psum(y, kax)
            return y

        # block scales [K/block, N] shard exactly like the codes [K, N]
        arg_specs = (P(xrow, kax), P(kax, nax), P(kax, nax))
        return (mesh, lower, NamedSharding(mesh, P(xrow, nax)),
                tuple(NamedSharding(mesh, s) for s in arg_specs))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, j k, l k -> i k",
    )
    return cp


def _halves_matmul_cp(local_matmul):
    """Shared halves-layout (nibble-packed) partitioning factory.

    ``local_matmul(x, packed) -> [M, N_local]``; the wrapper reshapes to
    [M, 2, N_local/2] so axis 2 tracks the packed byte columns contiguously,
    making the column-parallel all-gather a plain tiled gather (see module
    docstring). lns4 and fp4 share this verbatim — only the kernel differs.
    """

    def local3(x, packed):
        y = local_matmul(x, packed)
        m, n = y.shape
        return y.reshape(m, 2, n // 2)

    cp = custom_partitioning(local3)

    def infer(mesh, arg_shapes, result_shape):
        xrow, kax, _ = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, None, None))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)

        if kax is not None:  # row parallel: partial full-width products
            def lower(x, p):
                return jax.lax.psum(local3(x, p), kax)

            return (mesh, lower, NamedSharding(mesh, P(xrow, None, None)),
                    (NamedSharding(mesh, P(xrow, kax)),
                     NamedSharding(mesh, P(kax, None))))

        if nax is not None:  # column parallel: gather activation-sized output
            def lower(x, p):
                return jax.lax.all_gather(local3(x, p), nax, axis=2, tiled=True)

            return (mesh, lower, NamedSharding(mesh, P(xrow, None, None)),
                    (NamedSharding(mesh, P(xrow, None)),
                     NamedSharding(mesh, P(None, nax))))

        return (mesh, local3, NamedSharding(mesh, P(xrow, None, None)),
                (NamedSharding(mesh, P(xrow, None)),
                 NamedSharding(mesh, P(None, None))))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, j k -> i h k",
    )
    return cp


@functools.lru_cache(maxsize=None)
def _lns4_matmul_cp(out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)
    return _halves_matmul_cp(
        lambda x, packed: qmm.lns4_matmul(x, packed, out_dtype=dtype)
    )


@functools.lru_cache(maxsize=None)
def _fp8_matmul_cp(exp_bits: int, man_bits: int, e_bias: int,
                   out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)

    def local(x, codes):
        return qmm.fp8_matmul(
            x, codes, exp_bits=exp_bits, man_bits=man_bits, e_bias=e_bias,
            out_dtype=dtype,
        )

    return _def_partition(
        custom_partitioning(local), local, "i j, j k -> i k"
    )


def _add_bias(y, bias):
    # sharded path: the kernel runs bias-free on local shards and the bias is
    # added AFTER the partition rule's psum/all-gather (a per-shard add would
    # be summed model_par times under row parallelism). Single-device calls
    # fuse the bias into the kernel epilogue instead (ops.matmul._bias2d).
    if bias is None:
        return y
    return y + bias.reshape(1, -1).astype(y.dtype)


@functools.lru_cache(maxsize=None)
def _fp4_matmul_cp(out_dtype_name: str):
    dtype = jnp.dtype(out_dtype_name)
    return _halves_matmul_cp(
        lambda x, packed: qmm.fp4_matmul(x, packed, out_dtype=dtype)
    )


@functools.lru_cache(maxsize=None)
def _nf4_matmul_cp(block_size: int, out_dtype_name: str):
    """Halves-layout partitioning with the extra block-scale operand.

    Same strategy as _halves_matmul_cp; ``bscale`` is halves-aligned
    [K/block, 2, N/2] (ops/packing.py NF4Weight) precisely so its shards
    stay congruent with the packed byte columns here: axis 0 tracks the
    weight's K blocks (row parallel), axis 2 the packed columns (column
    parallel).
    """
    dtype = jnp.dtype(out_dtype_name)

    def local3(x, packed, bscale):
        y = qmm.nf4_matmul(x, packed, bscale, block_size=block_size,
                           out_dtype=dtype)
        m, n = y.shape
        return y.reshape(m, 2, n // 2)

    cp = custom_partitioning(local3)

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, _ = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, None, None))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)
        out = NamedSharding(mesh, P(xrow, None, None))

        if kax is not None:  # row parallel: partial full-width products
            def lower(x, p, s):
                return jax.lax.psum(local3(x, p, s), kax)

            return (mesh, lower, out,
                    (NamedSharding(mesh, P(xrow, kax)),
                     NamedSharding(mesh, P(kax, None)),
                     NamedSharding(mesh, P(kax, None, None))))

        if nax is not None:  # column parallel: gather activation-sized output
            def lower(x, p, s):
                return jax.lax.all_gather(local3(x, p, s), nax, axis=2,
                                          tiled=True)

            return (mesh, lower, out,
                    (NamedSharding(mesh, P(xrow, None)),
                     NamedSharding(mesh, P(None, nax)),
                     NamedSharding(mesh, P(None, None, nax))))

        return (mesh, local3, out,
                (NamedSharding(mesh, P(xrow, None)),
                 NamedSharding(mesh, P(None, None)),
                 NamedSharding(mesh, P(None, None, None))))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, j k, l h k -> i h k",
    )
    return cp


def lns_matmul(x, codes, frac_bits: int = 3, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.lns_matmul`` (see module docstring)."""
    if _single_device():
        return qmm.lns_matmul(x, codes, frac_bits=frac_bits,
                              out_dtype=out_dtype, bias=bias)
    y = _lns_matmul_cp(frac_bits, jnp.dtype(out_dtype).name)(x, codes)
    return _add_bias(y, bias)


def int8_matmul(x, codes, scale, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.int8_matmul``."""
    if _single_device():
        return qmm.int8_matmul(x, codes, scale, out_dtype=out_dtype, bias=bias)
    y = _int8_matmul_cp(jnp.dtype(out_dtype).name)(x, codes, scale)
    return _add_bias(y, bias)


def w8a8_matmul(x, codes, scale, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.w8a8_matmul`` (true s8 x s8 MXU)."""
    if _single_device():
        return qmm.w8a8_matmul(x, codes, scale, out_dtype=out_dtype, bias=bias)
    y = _w8a8_matmul_cp(jnp.dtype(out_dtype).name)(x, codes, scale)
    return _add_bias(y, bias)


def mx_matmul(x, codes, bscale, exp_bits=5, man_bits=2, block_size=16,
              out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.mx_matmul`` (MX block floating point).

    Row-parallel K sharding requires the K-shard per device to be a multiple
    of ``block_size`` — always true for the mesh sizes and projection shapes
    the megaton layout produces (mesh.py falls back to replication
    otherwise via its divisibility guard).
    """
    if _single_device():
        return qmm.mx_matmul(
            x, codes, bscale, exp_bits=exp_bits, man_bits=man_bits,
            block_size=block_size, out_dtype=out_dtype, bias=bias,
        )
    y = _mx_matmul_cp(
        exp_bits, man_bits, block_size, jnp.dtype(out_dtype).name
    )(x, codes, bscale)
    return _add_bias(y, bias)


def lns4_matmul(x, packed, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.lns4_matmul``."""
    if _single_device():
        return qmm.lns4_matmul(x, packed, out_dtype=out_dtype, bias=bias)
    y = _lns4_matmul_cp(jnp.dtype(out_dtype).name)(x, packed)
    m = y.shape[0]
    return _add_bias(y.reshape(m, y.shape[1] * y.shape[2]), bias)


@functools.lru_cache(maxsize=None)
def _kpair_matmul_cp(fmt: str, out_dtype_name: str):
    """kpair-layout (ops.packing.LNS4KWeight/FP4KWeight) partitioning.

    Much simpler than the halves-N layout: packed [K/2, N] tracks the
    weight's N contiguously (column parallel is a plain N shard, no output
    reshuffle), and because each byte pairs ADJACENT K rows, any even K-shard
    keeps its pairs local — row parallel shards packed rows congruently with
    x's K sharding and psums the partials. The sharding rule uses a distinct
    factor for the packed row axis (h = K/2, vs x's j = K)."""
    dtype = jnp.dtype(out_dtype_name)
    fn = {"lns4k": qmm.lns4k_matmul, "fp4k": qmm.fp4k_matmul}[fmt]

    def local(x, packed):
        return fn(x, packed, out_dtype=dtype)

    return _def_partition(
        custom_partitioning(local), local, "i j, h k -> i k"
    )


@functools.lru_cache(maxsize=None)
def _int4gk_matmul_cp(group_size: int, out_dtype_name: str):
    """kpair group-affine INT4: bands [K/group, N] shard exactly like the
    codes (same pattern as the MX block scales)."""
    dtype = jnp.dtype(out_dtype_name)

    def local(x, packed, scale, zero):
        return qmm.int4gk_matmul(x, packed, scale, zero,
                                 group_size=group_size, out_dtype=dtype)

    cp = custom_partitioning(local)

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, nax = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, nax))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)
        # row parallel is only congruent when whole groups land per shard
        # (bands [G, N] must shard with the codes); otherwise gather and run
        # the kernel replicated — only degenerate tiny configs hit this
        if kax is not None and arg_shapes[2].shape[0] % mesh.shape[kax] != 0:
            kax = None

        def lower(x, packed, scale, zero):
            y = local(x, packed, scale, zero)
            if kax is not None:
                y = jax.lax.psum(y, kax)
            return y

        arg_specs = (P(xrow, kax), P(kax, nax), P(kax, nax), P(kax, nax))
        return (mesh, lower, NamedSharding(mesh, P(xrow, nax)),
                tuple(NamedSharding(mesh, s) for s in arg_specs))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, h k, l k, l k -> i k",
    )
    return cp


def int4gk_matmul(x, packed, scale, zero, group_size=128,
                  out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.int4gk_matmul`` (kpair GPTQ grid)."""
    if _single_device():
        return qmm.int4gk_matmul(x, packed, scale, zero,
                                 group_size=group_size, out_dtype=out_dtype,
                                 bias=bias)
    y = _int4gk_matmul_cp(group_size, jnp.dtype(out_dtype).name)(
        x, packed, scale, zero)
    return _add_bias(y, bias)


@functools.lru_cache(maxsize=None)
def _nf4k_matmul_cp(block_size: int, out_dtype_name: str):
    """kpair NF4: the absmax band [K/block, N] shards exactly like the codes
    (same pattern as _int4gk_matmul_cp)."""
    dtype = jnp.dtype(out_dtype_name)

    def local(x, packed, bscale):
        return qmm.nf4k_matmul(x, packed, bscale, block_size=block_size,
                               out_dtype=dtype)

    cp = custom_partitioning(local)

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, nax = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, nax))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)
        if kax is not None and arg_shapes[2].shape[0] % mesh.shape[kax] != 0:
            kax = None  # blocks would split across shards: run replicated

        def lower(x, packed, bscale):
            y = local(x, packed, bscale)
            if kax is not None:
                y = jax.lax.psum(y, kax)
            return y

        arg_specs = (P(xrow, kax), P(kax, nax), P(kax, nax))
        return (mesh, lower, NamedSharding(mesh, P(xrow, nax)),
                tuple(NamedSharding(mesh, s) for s in arg_specs))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, h k, l k -> i k",
    )
    return cp


def nf4k_matmul(x, packed, bscale, block_size=64, out_dtype=jnp.bfloat16,
                bias=None):
    """Partitioning-aware ``ops.matmul.nf4k_matmul`` (kpair QLoRA NF4)."""
    if _single_device():
        return qmm.nf4k_matmul(x, packed, bscale, block_size=block_size,
                               out_dtype=out_dtype, bias=bias)
    y = _nf4k_matmul_cp(block_size, jnp.dtype(out_dtype).name)(
        x, packed, bscale)
    return _add_bias(y, bias)


def lns4k_matmul(x, packed, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.lns4k_matmul`` (0.5 B/elem tier)."""
    if _single_device():
        return qmm.lns4k_matmul(x, packed, out_dtype=out_dtype, bias=bias)
    y = _kpair_matmul_cp("lns4k", jnp.dtype(out_dtype).name)(x, packed)
    return _add_bias(y, bias)


def fp4k_matmul(x, packed, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.fp4k_matmul`` (0.5 B/elem tier)."""
    if _single_device():
        return qmm.fp4k_matmul(x, packed, out_dtype=out_dtype, bias=bias)
    y = _kpair_matmul_cp("fp4k", jnp.dtype(out_dtype).name)(x, packed)
    return _add_bias(y, bias)


def fp8_matmul(x, codes, exp_bits=4, man_bits=3, e_bias=7,
               out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.fp8_matmul`` (scale-free custom float)."""
    if _single_device():
        return qmm.fp8_matmul(
            x, codes, exp_bits=exp_bits, man_bits=man_bits, e_bias=e_bias,
            out_dtype=out_dtype, bias=bias,
        )
    y = _fp8_matmul_cp(exp_bits, man_bits, e_bias,
                       jnp.dtype(out_dtype).name)(x, codes)
    return _add_bias(y, bias)


def fp4_matmul(x, packed, out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.fp4_matmul`` (nibble-packed E2M1)."""
    if _single_device():
        return qmm.fp4_matmul(x, packed, out_dtype=out_dtype, bias=bias)
    y = _fp4_matmul_cp(jnp.dtype(out_dtype).name)(x, packed)
    m = y.shape[0]
    return _add_bias(y.reshape(m, y.shape[1] * y.shape[2]), bias)


def nf4_matmul(x, packed, bscale, block_size=64, out_dtype=jnp.bfloat16,
               bias=None):
    """Partitioning-aware ``ops.matmul.nf4_matmul`` (nibble-packed NF4)."""
    if _single_device():
        return qmm.nf4_matmul(x, packed, bscale, block_size=block_size,
                              out_dtype=out_dtype, bias=bias)
    y = _nf4_matmul_cp(block_size, jnp.dtype(out_dtype).name)(x, packed, bscale)
    m = y.shape[0]
    return _add_bias(y.reshape(m, y.shape[1] * y.shape[2]), bias)


@functools.lru_cache(maxsize=None)
def _int4g_matmul_cp(group_size: int, out_dtype_name: str):
    """Halves-layout partitioning with (scale, zero) operands — the nf4 rule
    with one more halves-aligned [K/group, 2, N/2] side band."""
    dtype = jnp.dtype(out_dtype_name)

    def local3(x, packed, scale, zero):
        y = qmm.int4g_matmul(x, packed, scale, zero, group_size=group_size,
                             out_dtype=dtype)
        m, n = y.shape
        return y.reshape(m, 2, n // 2)

    cp = custom_partitioning(local3)

    def infer(mesh, arg_shapes, result_shape):
        xrow, _, _ = _resolve(arg_shapes)
        return NamedSharding(mesh, P(xrow, None, None))

    def partition(mesh, arg_shapes, result_shape):
        xrow, kax, nax = _resolve(arg_shapes)
        out = NamedSharding(mesh, P(xrow, None, None))

        if kax is not None:  # row parallel
            def lower(x, p, s, z):
                return jax.lax.psum(local3(x, p, s, z), kax)

            side = NamedSharding(mesh, P(kax, None, None))
            return (mesh, lower, out,
                    (NamedSharding(mesh, P(xrow, kax)),
                     NamedSharding(mesh, P(kax, None)), side, side))

        if nax is not None:  # column parallel
            def lower(x, p, s, z):
                return jax.lax.all_gather(local3(x, p, s, z), nax, axis=2,
                                          tiled=True)

            side = NamedSharding(mesh, P(None, None, nax))
            return (mesh, lower, out,
                    (NamedSharding(mesh, P(xrow, None)),
                     NamedSharding(mesh, P(None, nax)), side, side))

        side = NamedSharding(mesh, P(None, None, None))
        return (mesh, local3, out,
                (NamedSharding(mesh, P(xrow, None)),
                 NamedSharding(mesh, P(None, None)), side, side))

    cp.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule="i j, j k, l h k, l h k -> i h k",
    )
    return cp


def int4g_matmul(x, packed, scale, zero, group_size=128,
                 out_dtype=jnp.bfloat16, bias=None):
    """Partitioning-aware ``ops.matmul.int4g_matmul`` (group-affine INT4)."""
    if _single_device():
        return qmm.int4g_matmul(x, packed, scale, zero, group_size=group_size,
                                out_dtype=out_dtype, bias=bias)
    y = _int4g_matmul_cp(group_size, jnp.dtype(out_dtype).name)(
        x, packed, scale, zero)
    m = y.shape[0]
    return _add_bias(y.reshape(m, y.shape[1] * y.shape[2]), bias)
