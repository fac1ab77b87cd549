"""Runtime switches for Pallas kernel selection."""

import jax

enabled: bool = True
interpret: bool = False  # force interpreter mode (debugging / CPU tests)

# wide-batch gemv accuracy class. True (default) keeps the double-bf16
# correction terms (error ~2^-16, FMA-class — uniform with narrow-batch
# decode), measured at only 1.07x the plain path's step time after the
# round-3 bf16 fast-multiply work (B=8 layer stack: 621.4 vs 578.7
# us/step in-session, scripts/bench_step_composition.py — down from
# +35% in round 2, which met the flip-the-default bar). False selects
# plain bf16 dequant rounding (~2^-9, the XLA-fallback / reference-f16
# class) for maximum wide-batch throughput; Engine(decode_precise=)
# surfaces the knob. Narrow-batch (B <= wide_batch) is exact either way.
wide_precise: bool = True

# smallest batch routed to the `wide` gemv strategy in the STANDALONE
# tiled kernels (below/equal: group-expansion; above, the tile model
# `matmul._narrow_wins` can still pick narrow per shape). Read at
# trace time.
wide_batch: int = 2

# same switch for the LAYER-SCAN kernels (layer7/layer56), which have
# no per-shape tile model — one strategy serves the whole stack.
# Default 8 (round 5): the in-kernel narrow n>=2 form was REBUILT
# (exact 0/1 selection-dot group expansion — the old expand_dims
# construction never compiled on Mosaic at n>=2), and the rebuilt
# narrow beats wide at every batch through 8 while staying FMA-exact:
# in-session A/B (2026-08-21) b4 9.4-10.0k narrow vs 6.7k wide, b8
# 12.2-12.6k vs 10.4k; wide retakes it at b16 (13.4k vs 12.8k exact).
scan_wide_batch: int = 8

# slab (prefill) kernel: token count at/above which per-group scales
# expand across lanes on the VPU (broadcast+concat) instead of the MXU
# 0/1-mask dot. The crossover is real and N-dependent (in-session A/B,
# scripts/bench_prefill_ab.py): at T=256 the expansion dot rides the
# MXU for free next to a 2-row-block gemm while the VPU is the busy
# unit (101.1k vs 87.8k tok/s), but at T=1024 the gemm saturates the
# MXU and the VPU form wins (153.6k vs 138.4k, 0.89x dense bf16).
slab_vpu_expand_min_n: int = 512

# route decode batches ABOVE layer7.MAX_SCAN_BATCH through the
# layer-scan kernel run per equal batch slice (B=32 -> 2x16). Measured
# SLOWER than the composed per-op path at B=32 (10.6k vs 12.5k tok/s
# aggregate, scripts/bench_b32_split.py: the per-step [L,B,...] state
# slice/concat copies ~150 MB of f32 wkv state and the slices re-read
# the stacked weights) — kept as an opt-in for future shapes where the
# trade flips; default OFF leaves B > 16 on the composed path.
split_scan_batch: bool = False

# T==1 (decode) WKV runs as plain XLA ops fused into the surrounding
# step instead of a Pallas call: the kernel's fixed block-DMA cost
# (~17 us/call) dwarfs the actual state update at decode shapes.
decode_wkv_xla: bool = True


def use_pallas() -> bool:
    return enabled and (interpret or jax.default_backend() == "tpu")
