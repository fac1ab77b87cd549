"""Perplexity evaluation (new vs the reference — needed for quantization
QA; the reference only had "coherent output" acceptance, plan.md:300-308).

Computes token-level negative log likelihood over a text file using the
FULL output option (one logit row per position)."""

from __future__ import annotations

import argparse
import math

import numpy as np

from . import common


def evaluate_ppl(info, params, tokenizer, text, *, chunk=256, max_tokens=None):
    import jax
    import jax.numpy as jnp

    from ..models import forward_chunk, init_state, logits_head

    tokens = tokenizer.encode(text)
    if max_tokens:
        tokens = tokens[: max_tokens + 1]
    if len(tokens) < 2:
        raise ValueError("need at least 2 tokens")

    state = init_state(info, 1)
    total_nll, total_n = 0.0, 0
    pos = 0
    while pos < len(tokens):
        seg = tokens[pos : pos + chunk]
        x, state = forward_chunk(
            info, params, state,
            jnp.asarray(np.asarray(seg)[None, :], jnp.int32),
            jnp.asarray([len(seg)], jnp.int32),
        )
        # row i (global position pos+i) predicts tokens[pos+i+1];
        # sum the NLL ON DEVICE — fetching the [chunk, V] logits to the
        # host is 64 MB per 256-token chunk at V=65536 over this
        # environment's tunnel, vs one f32 scalar here
        targets = tokens[pos + 1 : pos + len(seg) + 1]
        if targets:
            lg = logits_head(params, x[0, : len(targets)])
            logp = lg - jax.scipy.special.logsumexp(
                lg, axis=-1, keepdims=True
            )
            tgt = jnp.asarray(np.asarray(targets), jnp.int32)
            nll_seg = -jnp.take_along_axis(
                logp, tgt[:, None], axis=-1
            ).sum()
            total_nll += float(nll_seg)
            total_n += len(targets)
        pos += len(seg)
    nll = total_nll / total_n
    return math.exp(nll), nll, total_n


def compare_f16(args, tokenizer, text):
    """Quantization-QA mode: evaluate the SAME .gguf through the direct
    K-quant path and through dense f16 dequant (the reference's load
    path, GgufFile(allow_quantized_direct=False)), report both ppls,
    their delta, and the max relative logit difference on the first
    chunk. Acceptance: |delta nll| <= 0.005 nats — the scale-invariant
    form of SURVEY §7's "<=0.1 ppl delta at ppl ~20"."""
    import jax.numpy as jnp

    from ..gguf import GgufFile
    from ..models import forward_chunk, init_state, load_model, logits_head

    data = open(args.model, "rb").read()
    results = {}
    logit_rows = {}
    toks = tokenizer.encode(text)[: min(256, args.max_tokens)]
    for mode, direct in (("direct-quant", True), ("f16-dequant", False)):
        info, params = load_model(
            GgufFile(data, allow_quantized_direct=direct)
        )
        ppl, nll, n = evaluate_ppl(
            info, params, tokenizer, text, chunk=args.chunk,
            max_tokens=args.max_tokens,
        )
        results[mode] = (ppl, nll, n)
        x, _ = forward_chunk(
            info, params, init_state(info, 1),
            jnp.asarray(np.asarray(toks)[None, :], jnp.int32),
            jnp.asarray([len(toks)], jnp.int32),
        )
        logit_rows[mode] = np.asarray(logits_head(params, x[0]))
        print(f"{mode:13s}: tokens={n} nll={nll:.4f} ppl={ppl:.3f}")
    d_ppl = results["direct-quant"][0] - results["f16-dequant"][0]
    d_nll = results["direct-quant"][1] - results["f16-dequant"][1]
    a, b = logit_rows["direct-quant"], logit_rows["f16-dequant"]
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    print(f"delta ppl (direct - f16): {d_ppl:+.4f}   delta nll: {d_nll:+.5f}"
          f"   first-chunk max logit rel-diff: {rel:.2e}")
    # scale-invariant acceptance: |delta nll| <= 0.005 nats == |delta
    # ppl| <= 0.1 at ppl ~20 (the SURVEY §7 bound for a real model)
    print("PASS (<=0.005 nll delta)" if abs(d_nll) <= 0.005 else
          "FAIL (>0.005 nll delta)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--text", required=True, help="text file to evaluate")
    p.add_argument("--max-tokens", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument(
        "--compare-f16", action="store_true",
        help="also evaluate through dense f16 dequant and report the "
        "ppl delta + logit diff (quantization acceptance; .gguf only)",
    )
    args = p.parse_args(argv)

    tokenizer = common.load_tokenizer(args.vocab)
    text = open(args.text, encoding="utf-8").read()
    if args.compare_f16:
        if not args.model.endswith(".gguf"):
            raise SystemExit("--compare-f16 needs a .gguf model")
        compare_f16(args, tokenizer, text)
        return
    info, params = common.load_any_model(args)
    ppl, nll, n = evaluate_ppl(
        info, params, tokenizer, text, chunk=args.chunk, max_tokens=args.max_tokens
    )
    print(f"tokens={n} nll={nll:.4f} ppl={ppl:.3f}")


if __name__ == "__main__":
    main()
