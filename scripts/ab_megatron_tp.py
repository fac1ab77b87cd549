"""A/B: Megatron-style K-shard + single psum vs the repo's all-column
plan (all_gather-in, all_gather-out) for the two "sharded-input"
matrices (att.Wo, ffn.Wv) — the deferred comparison from round 1
(parallel/tensor.py:21-26).

Runs on the virtual CPU mesh, so wall-clock is meaningless; what this
measures is what the compiler actually emits: collective op counts and
wire bytes per forward from the optimized HLO, plus a numeric parity
check of the two formulations.

Findings (recorded in docs/OVERLAP.md): per use the gather plan moves
2 activation tensors (C·B·4 bytes each, all-gather in + all-gather out)
where Megatron's row-parallel moves one all-reduce of the full output
(2·C·B·4/n wire bytes per device on a ring — the same order). The real
difference is layout freedom: K-sharding quantized weights constrains
shard boundaries to super-block multiples (k % 256 per shard) and the
split-halves "qk" nibble layout would need a per-shard scale reorder;
M-sharding is layout-free for every kind. With RWKV activations at
C..4C floats/token, both plans are ICI-negligible next to weight DMA —
so the all-column plan's format independence wins the tie.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/ab_megatron_tp.py
"""

import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def count_collectives(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = {}
    for name in ("all-gather", "all-reduce", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        ops[name] = len(re.findall(rf"\b{name}\b", txt))
    return ops


def main():
    n = 4
    devices = jax.devices()[:n]
    mesh = Mesh(np.asarray(devices).reshape(1, n), ("data", "model"))
    B, C = 8, 256
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))

    # activations arrive model-sharded on their feature dim (the producer
    # was column-parallel): x_loc = x[:, shard]
    # Plan A (repo): gather x -> local matmul over M-shard -> gather y.
    def plan_a(w_loc, x_loc):
        x_full = jax.lax.all_gather(x_loc, "model", axis=-1, tiled=True)
        y_loc = x_full @ w_loc.T  # w M-sharded: [C/n, C]
        return jax.lax.all_gather(y_loc, "model", axis=-1, tiled=True)

    # Plan B (Megatron row-parallel): local partial over the K-shard ->
    # one psum.
    def plan_b(w_loc, x_loc):
        return jax.lax.psum(x_loc @ w_loc.T, "model")  # w K-sharded [C, C/n]

    a = shard_map(
        plan_a, mesh=mesh,
        in_specs=(P("model", None), P(None, "model")),
        out_specs=P(None, None), check_vma=False,
    )
    b = shard_map(
        plan_b, mesh=mesh,
        in_specs=(P(None, "model"), P(None, "model")),
        out_specs=P(None, None), check_vma=False,
    )

    wa = jax.device_put(w, NamedSharding(mesh, P("model", None)))
    wb = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))

    ya = np.asarray(a(wa, xs))
    yb = np.asarray(b(wb, xs))
    ref = np.asarray(x) @ np.asarray(w).T
    np.testing.assert_allclose(ya, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(yb, ref, rtol=1e-4, atol=1e-4)
    print("numeric parity OK (both plans)")

    ca = count_collectives(a, wa, xs)
    cb = count_collectives(b, wb, xs)
    act = B * C * 4
    print(f"plan A (gather/gather): {ca}  wire ≈ 2 × all_gather({act} B)")
    print(f"plan B (Megatron psum): {cb}  wire ≈ 1 × all_reduce({act} B)")
    print("See docstring for the recorded conclusion (format independence "
          "wins; both are ICI-negligible at RWKV activation sizes).")


if __name__ == "__main__":
    main()
