"""Dense compaction as per-lane DMA copies (Mosaic).

The dense fetch layout concatenates each lane's first ``cum[j+1] -
cum[j]`` output words.  The XLA form (`entropy2._compact` /
`_pack_triples`) gathers that layout with data-dependent indices, and
such gathers lower serially at ~17-27 ns/element (BASELINE.md r5) —
42 ms of the top sequence call and ~20 ms of the literals phase at
bench scale.  This kernel does the same compaction as 128 contiguous
HBM-to-HBM DMA copies over the TRANSPOSED plane (lane-major rows), one
per lane at its ragged ``cum[j]`` offset:

* each copy moves a static ``maxw`` words (DMA sizes are static);
  lanes are copied in ascending-offset order with a wait between, so
  lane j's padded tail is overwritten by lane j+1's real words and the
  final tail lands in the output's slack region (sliced off);
* the transpose itself is one XLA op (tiled, HBM-bandwidth);
* total cost ~ L x DMA latency + plane bytes at HBM bandwidth — sub-ms
  where the gather form took tens of ms.

Interpret mode and non-TPU backends keep the gather form (the engine's
CPU differential tests cover the packing semantics either way; the two
forms produce identical dense words for every real lane).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32


def _kernel(cumk_ref, flat_ref, out_ref, sem, *, L: int, rows: int, maxw: int):
    # 1-D HBM refs are (1024,)-tiled: slice offsets and sizes must be
    # PROVABLY divisible by 1024, so offsets are expressed as
    # constant-multiples (cumk holds cum >> 10; rows and maxw are
    # 1024-multiples by construction).
    def body(j, _):
        cp = pltpu.make_async_copy(
            flat_ref.at[pl.ds(j * rows, maxw)],
            out_ref.at[pl.ds(cumk_ref[j] * 1024, maxw)],
            sem,
        )
        cp.start()
        cp.wait()  # ordering: lane j+1 overwrites lane j's padded tail
        return 0

    jax.lax.fori_loop(0, L, body, 0)


@partial(jax.jit, static_argnames=("n_dense", "maxw"))
def compact_lanes_dma(planeT, cum, *, n_dense: int, maxw: int):
    """Compact ``planeT`` (L, ROWS) u32 rows into one dense u32 array:
    lane j's words ``planeT[j, :cum[j+1]-cum[j]]`` land at
    ``dense[cum[j]:cum[j+1]]``.  ``maxw`` >= every per-lane word count;
    ``cum`` must be ascending with cum[0] = 0 and cum[L] <= n_dense."""
    L, rows = planeT.shape
    assert maxw <= rows and maxw % 1024 == 0 and rows % 1024 == 0, (maxw, rows)
    n_pad = -(-(n_dense + maxw) // 1024) * 1024
    out = pl.pallas_call(
        partial(_kernel, L=L, rows=rows, maxw=maxw),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(cum >> 10, planeT.reshape(-1))
    return out[:n_dense]
