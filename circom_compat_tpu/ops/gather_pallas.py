"""Pallas DMA row gather: the MSM's per-window coordinate gather.

The Pippenger window loop gathers (N, 16)-uint16 affine coordinate rows
in digit-sorted order (ops/msm.py). XLA's gather lowering moves ~2-5 GB/s
effective on this access pattern (round-1 ablation: ~0.55 s of the 1.17 s
2^20 MSM is sort+gather+digits) — far below what the DMA engines can
sustain. This kernel is the embedding-lookup pattern instead: the sorted
indices ride SMEM blocks, and the kernel issues one async HBM->VMEM row
copy per index through a K-deep semaphore ring, so many small DMAs are in
flight at once while the grid walks output blocks.

Status: correctness-verified in interpret mode (tests/test_gather_pallas.py);
on-TPU profitability is measured by scripts/bench_gather.py (the round-1
"tried and REJECTED" list shows this hardware punishes structure-only
reasoning — the MSM integration is gated on that measurement, env knob
CIRCOM_TPU_GATHER=pallas).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA ring depth: how many row copies are kept in flight per output block.
RING = 16
ROW_BLOCK = 1024


def _gather_kernel(rows_per_block: int, ring: int):
    def kernel(idx_ref, src_ref, out_ref, sems):
        # idx_ref: (rows_per_block,) int32 in SMEM (this block's indices)
        # src_ref: (N, C) source rows in HBM (pltpu.ANY)
        # out_ref: (rows_per_block, C) VMEM output block
        # sems:    (ring,) DMA semaphores
        def dma(j, wait: bool):
            row = idx_ref[j]
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % ring],
            )
            cp.wait() if wait else cp.start()

        def body(j, _):
            @pl.when(j >= ring)
            def _():
                dma(j - ring, wait=True)

            dma(j, wait=False)
            return _

        jax.lax.fori_loop(0, rows_per_block, body, None)

        def tail(j, _):
            dma(j, wait=True)
            return _

        jax.lax.fori_loop(max(rows_per_block - ring, 0), rows_per_block, tail, None)

    return kernel


@partial(jax.jit, static_argnames=("rows_per_block", "ring", "interpret"))
def gather_rows(src, idx, rows_per_block: int = ROW_BLOCK, ring: int = RING,
                interpret: bool | None = None):
    """src[idx] for src (N, C) and idx (M,) int32; M a multiple of
    rows_per_block. Equivalent to jnp.take(src, idx, axis=0) — but the
    rows move via explicit async DMAs instead of XLA's gather."""
    m = idx.shape[0]
    n, c = src.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(m // rows_per_block,),
        in_specs=[
            pl.BlockSpec((rows_per_block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # src stays in HBM
        ],
        out_specs=pl.BlockSpec((rows_per_block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
    )
    return pl.pallas_call(
        _gather_kernel(rows_per_block, ring),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), src.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), src)
