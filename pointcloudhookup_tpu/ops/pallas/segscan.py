"""One-pass segmented scan kernel.

The XLA Hillis-Steele segmented scan (ops/segments.py) makes log2(N)
full passes over HBM — ~22 at corridor sizes, several ms each way.  A
scan is bandwidth-bound at ONE pass: this kernel streams blocks through
VMEM as [R, 128] tiles and runs a two-level scan entirely on-chip:

  1. segmented Hillis-Steele along LANES within each row (7 steps,
     circular `pltpu.roll` shifts masked below the step distance);
  2. segmented Hillis-Steele along SUBLANES over the per-row end
     states ([R, 1], 8 steps);
  3. broadcast each row's incoming carry back across its lanes.

The (flag, value) carry threads across the sequential grid in SMEM.
Combine rule (right-dominant, identical to ops/segments.py): given
carry (cf, cv) and scanned block states (F, V),

    out = F ? V : op(cv, V);   carry' = (cf | F_last, out_last)

Reverse scans flip the input in XLA (one cheap pass), run the forward
kernel, and flip back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 256
_BLOCK = _ROWS * _LANES  # 32768

_IDENT = {
    ("add", "int32"): 0,
    ("add", "float32"): 0.0,
    ("max", "int32"): jnp.iinfo(jnp.int32).min,
    ("max", "float32"): -3.0e38,
    ("min", "int32"): jnp.iinfo(jnp.int32).max,
    ("min", "float32"): 3.0e38,
}

_OPS = {"add": lax.add, "max": lax.max, "min": lax.min}


def _kernel(v_ref, f_ref, out_ref, cf_ref, cv_ref, *, op: str, ident, rows: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        cf_ref[0] = jnp.int32(0)
        cv_ref[0] = jnp.asarray(ident, cv_ref.dtype)

    opf = _OPS[op]
    idf = jnp.asarray(ident, v_ref.dtype)
    v = v_ref[:]  # [R, 128]
    f = f_ref[:]  # [R, 128] i32

    # ---- 1. segmented HS along lanes (within each row)
    lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    d = 1
    while d < _LANES:
        vprev = pltpu.roll(v, shift=d, axis=1)
        fprev = pltpu.roll(f, shift=d, axis=1)
        valid = lane >= d
        blocked = (f > 0) | ~valid
        v = jnp.where(blocked, v, opf(vprev, v))
        f = f | jnp.where(valid, fprev, 0)
        d <<= 1

    # ---- 2. segmented HS along sublanes over row end states
    vs = v[:, _LANES - 1 :]  # [R, 1]
    fs = f[:, _LANES - 1 :]
    rowi = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    d = 1
    while d < rows:
        vprev = pltpu.roll(vs, shift=d, axis=0)
        fprev = pltpu.roll(fs, shift=d, axis=0)
        valid = rowi >= d
        blocked = (fs > 0) | ~valid
        vs = jnp.where(blocked, vs, opf(vprev, vs))
        fs = fs | jnp.where(valid, fprev, 0)
        d <<= 1

    # ---- 3. incoming carry per row = grid carry folded with the scan
    # of rows ABOVE it, broadcast across lanes
    gcv = cv_ref[0]
    vs_prev = jnp.where(rowi == 0, idf, pltpu.roll(vs, shift=1, axis=0))
    fs_prev = jnp.where(rowi == 0, 0, pltpu.roll(fs, shift=1, axis=0))
    w = jnp.where(fs_prev > 0, vs_prev, opf(jnp.full_like(vs_prev, gcv), vs_prev))
    out = jnp.where(f > 0, v, opf(jnp.broadcast_to(w, v.shape), v))
    out_ref[:] = out
    cf_ref[0] = cf_ref[0] | fs[rows - 1, 0]
    cv_ref[0] = out[rows - 1, _LANES - 1]


@functools.partial(
    jax.jit, static_argnames=("op", "reverse", "block", "interpret")
)
def segmented_scan_pallas(
    values,
    is_start,
    *,
    op: str = "add",
    reverse: bool = False,
    block: int = _BLOCK,
    interpret: bool = False,
):
    """Segmented inclusive scan along axis 0 of a 1-D array.

    op in {"add", "max", "min"}; values i32/f32 [N] with N a multiple
    of `block`; is_start bool[N] marks segment starts (or, for
    reverse=True, the scan restarts at segment ENDS exactly like
    ops/segments.segmented_scan).
    """
    n = values.shape[0]
    if n % block or block % _LANES:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    rows = block // _LANES
    dt = jnp.dtype(values.dtype).name
    if (op, dt) not in _IDENT:
        raise ValueError(f"unsupported op/dtype: {op}/{dt}")
    ident = _IDENT[(op, dt)]
    flags = is_start
    if reverse:
        flags = jnp.concatenate([is_start[1:], jnp.ones(1, bool)])
        values = values[::-1]
        flags = flags[::-1]
    v2 = values.reshape(n // _LANES, _LANES)
    f2 = flags.astype(jnp.int32).reshape(n // _LANES, _LANES)
    kernel = functools.partial(_kernel, op=op, ident=ident, rows=rows)
    out = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n // _LANES, _LANES), values.dtype),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), values.dtype),
        ],
        interpret=interpret,
    )(v2, f2)
    out = out.reshape(n)
    if reverse:
        out = out[::-1]
    return out
