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
        logits = np.asarray(logits_head(params, x[0, : len(seg)]))
        logp = logits - _logsumexp(logits)
        # row i (global position pos+i) predicts tokens[pos+i+1]
        targets = tokens[pos + 1 : pos + len(seg) + 1]
        for i, t in enumerate(targets):
            total_nll -= logp[i, t]
            total_n += 1
        pos += len(seg)
    nll = total_nll / total_n
    return math.exp(nll), nll, total_n


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--text", required=True, help="text file to evaluate")
    p.add_argument("--max-tokens", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=256)
    args = p.parse_args(argv)

    tokenizer = common.load_tokenizer(args.vocab)
    info, params = common.load_any_model(args)
    text = open(args.text, encoding="utf-8").read()
    ppl, nll, n = evaluate_ppl(
        info, params, tokenizer, text, chunk=args.chunk, max_tokens=args.max_tokens
    )
    print(f"tokens={n} nll={nll:.4f} ppl={ppl:.3f}")


if __name__ == "__main__":
    main()
