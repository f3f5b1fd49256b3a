"""Device decode kernels.

* ``bitbuf.py``      — per-lane N-word buffered bit windows (v2)
* ``entropy2.py``    — v2 kernels (select-based lookups, tile-aligned
  emission)
* ``lz77_device.py`` — pointer-doubling sequence execution (M2)

Why these are jnp/XLA programs rather than hand-written Pallas kernels
(per the Pallas TPU guide): the decode inner loop is dominated by
per-lane *data-dependent reads* — each lane's bit cursor addresses a
different word of the stream buffer.  Mosaic's vector ISA exposes no
per-lane VMEM gather (loads are tile-shaped; ``pltpu.roll``/``repeat``
and dynamic slices take scalar indices), so a Pallas version of these
kernels would have to express the same gathers through XLA-level
lowering or one-hot contractions — exactly what the jnp formulation
already does, with the measured costs documented in BASELINE.md.
Pallas remains the plan for the parts it *can* own (double-buffered
stream DMA HBM→VMEM ahead of the scan, fused output repacking, ring
collectives for the multi-chip gather) once profiling on unmediated
hardware shows where the per-step time actually lands.
"""
