"""Tensor-name dialect table: every GGUF name pattern the reference
recognizes (ref: src/runtime/gguf.rs:1173-1329, 110 arms — six top-level
names plus per-block suffixes across the attn_/att_/time_mix_/
channel_mix_/ffn. dialects) must map to the identical model param name
here. Pinned as data so a regression in gguf_to_model_name is caught
pattern-by-pattern."""

import pytest

from web_rwkv_gguf_tpu.gguf.reader import gguf_to_model_name

# (gguf name pattern, expected model name); {n} = block number
REFERENCE_NAME_TABLE = [
    ('token_embd.weight', 'emb.weight'),
    ('output_norm.weight', 'ln_out.weight'),
    ('output_norm.bias', 'ln_out.bias'),
    ('output.weight', 'head.weight'),
    ('token_embd_norm.weight', 'blocks.0.ln0.weight'),
    ('token_embd_norm.bias', 'blocks.0.ln0.bias'),
    ('blk.{n}.attn_norm.weight', 'blocks.{n}.ln1.weight'),
    ('blk.{n}.attn_norm.bias', 'blocks.{n}.ln1.bias'),
    ('blk.{n}.attn_norm_2.weight', 'blocks.{n}.ln2.weight'),
    ('blk.{n}.attn_norm_2.bias', 'blocks.{n}.ln2.bias'),
    ('blk.{n}.ffn_norm.weight', 'blocks.{n}.ln2.weight'),
    ('blk.{n}.ffn_norm.bias', 'blocks.{n}.ln2.bias'),
    ('blk.{n}.attn_k.weight', 'blocks.{n}.att.key.weight'),
    ('blk.{n}.attn_v.weight', 'blocks.{n}.att.value.weight'),
    ('blk.{n}.attn_r.weight', 'blocks.{n}.att.receptance.weight'),
    ('blk.{n}.attn_g.weight', 'blocks.{n}.att.gate.weight'),
    ('blk.{n}.attn_output.weight', 'blocks.{n}.att.output.weight'),
    ('blk.{n}.attn_time_decay', 'blocks.{n}.att.time_decay'),
    ('blk.{n}.attn_time_first', 'blocks.{n}.att.time_first'),
    ('blk.{n}.attn_time_mix_k', 'blocks.{n}.att.time_mix_k'),
    ('blk.{n}.attn_time_mix_v', 'blocks.{n}.att.time_mix_v'),
    ('blk.{n}.attn_time_mix_r', 'blocks.{n}.att.time_mix_r'),
    ('blk.{n}.attn_time_mix_g', 'blocks.{n}.att.time_mix_g'),
    ('blk.{n}.attn_time_mix_x', 'blocks.{n}.att.time_mix_x'),
    ('blk.{n}.attn_time_mix_w', 'blocks.{n}.att.time_mix_w'),
    ('blk.{n}.attn_time_mix_w1', 'blocks.{n}.att.time_mix_w1'),
    ('blk.{n}.attn_time_mix_w2', 'blocks.{n}.att.time_mix_w2'),
    ('blk.{n}.attn_time_decay_w1', 'blocks.{n}.att.time_decay_w1'),
    ('blk.{n}.attn_time_decay_w2', 'blocks.{n}.att.time_decay_w2'),
    ('blk.{n}.time_maa_w1', 'blocks.{n}.att.time_mix_w1'),
    ('blk.{n}.time_maa_w2', 'blocks.{n}.att.time_mix_w2'),
    ('blk.{n}.time_decay_w1', 'blocks.{n}.att.time_decay_w1'),
    ('blk.{n}.time_decay_w2', 'blocks.{n}.att.time_decay_w2'),
    ('blk.{n}.attn_ln_x.weight', 'blocks.{n}.att.ln_x.weight'),
    ('blk.{n}.attn_ln_x.bias', 'blocks.{n}.att.ln_x.bias'),
    ('blk.{n}.attn_time_state', 'blocks.{n}.att.time_state'),
    ('blk.{n}.ffn_k.weight', 'blocks.{n}.ffn.key.weight'),
    ('blk.{n}.ffn_v.weight', 'blocks.{n}.ffn.value.weight'),
    ('blk.{n}.ffn_r.weight', 'blocks.{n}.ffn.receptance.weight'),
    ('blk.{n}.ffn_time_mix_k', 'blocks.{n}.ffn.time_mix_k'),
    ('blk.{n}.ffn_time_mix_r', 'blocks.{n}.ffn.time_mix_r'),
    ('blk.{n}.ffn.key.weight', 'blocks.{n}.ffn.key.weight'),
    ('blk.{n}.ffn.value.weight', 'blocks.{n}.ffn.value.weight'),
    ('blk.{n}.ffn.receptance.weight', 'blocks.{n}.ffn.receptance.weight'),
    ('blk.{n}.channel_mix_key.weight', 'blocks.{n}.ffn.key.weight'),
    ('blk.{n}.channel_mix_value.weight', 'blocks.{n}.ffn.value.weight'),
    ('blk.{n}.channel_mix_lerp_k.weight', 'blocks.{n}.ffn.x_k'),
    ('blk.{n}.time_mix_key.weight', 'blocks.{n}.att.key.weight'),
    ('blk.{n}.time_mix_value.weight', 'blocks.{n}.att.value.weight'),
    ('blk.{n}.time_mix_receptance.weight', 'blocks.{n}.att.receptance.weight'),
    ('blk.{n}.time_mix_gate.weight', 'blocks.{n}.att.gate.weight'),
    ('blk.{n}.time_mix_output.weight', 'blocks.{n}.att.output.weight'),
    ('blk.{n}.time_mix_lerp_fused.weight', 'blocks.{n}.att.time_maa'),
    ('blk.{n}.time_mix_w0.weight', 'blocks.{n}.att.w0'),
    ('blk.{n}.time_mix_w1.weight', 'blocks.{n}.att.w1'),
    ('blk.{n}.time_mix_w2.weight', 'blocks.{n}.att.w2'),
    ('blk.{n}.time_mix_a0.weight', 'blocks.{n}.att.a0'),
    ('blk.{n}.time_mix_a1.weight', 'blocks.{n}.att.a1'),
    ('blk.{n}.time_mix_a2.weight', 'blocks.{n}.att.a2'),
    ('blk.{n}.time_mix_g1.weight', 'blocks.{n}.att.g1'),
    ('blk.{n}.time_mix_g2.weight', 'blocks.{n}.att.g2'),
    ('blk.{n}.time_mix_v0.weight', 'blocks.{n}.att.v0'),
    ('blk.{n}.time_mix_v1.weight', 'blocks.{n}.att.v1'),
    ('blk.{n}.time_mix_v2.weight', 'blocks.{n}.att.v2'),
    ('blk.{n}.time_mix_r_k.weight', 'blocks.{n}.att.r_k'),
    ('blk.{n}.time_mix_k_k.weight', 'blocks.{n}.att.k_k'),
    ('blk.{n}.time_mix_k_a.weight', 'blocks.{n}.att.k_a'),
    ('blk.{n}.time_mix_ln.weight', 'blocks.{n}.att.ln_x.weight'),
    ('blk.{n}.time_mix_ln.bias', 'blocks.{n}.att.ln_x.bias'),
    ('blk.{n}.attn_x_r', 'blocks.{n}.att.x_r'),
    ('blk.{n}.attn_x_w', 'blocks.{n}.att.x_w'),
    ('blk.{n}.attn_x_k', 'blocks.{n}.att.x_k'),
    ('blk.{n}.attn_x_v', 'blocks.{n}.att.x_v'),
    ('blk.{n}.attn_x_a', 'blocks.{n}.att.x_a'),
    ('blk.{n}.attn_x_g', 'blocks.{n}.att.x_g'),
    ('blk.{n}.attn_w0', 'blocks.{n}.att.w0'),
    ('blk.{n}.attn_w1', 'blocks.{n}.att.w1'),
    ('blk.{n}.attn_w2', 'blocks.{n}.att.w2'),
    ('blk.{n}.attn_a0', 'blocks.{n}.att.a0'),
    ('blk.{n}.attn_a1', 'blocks.{n}.att.a1'),
    ('blk.{n}.attn_a2', 'blocks.{n}.att.a2'),
    ('blk.{n}.attn_g1', 'blocks.{n}.att.g1'),
    ('blk.{n}.attn_g2', 'blocks.{n}.att.g2'),
    ('blk.{n}.attn_v0', 'blocks.{n}.att.v0'),
    ('blk.{n}.attn_v1', 'blocks.{n}.att.v1'),
    ('blk.{n}.attn_v2', 'blocks.{n}.att.v2'),
    ('blk.{n}.attn_r_k', 'blocks.{n}.att.r_k'),
    ('blk.{n}.attn_k_k', 'blocks.{n}.att.k_k'),
    ('blk.{n}.attn_k_a', 'blocks.{n}.att.k_a'),
    ('blk.{n}.ffn_x_k', 'blocks.{n}.ffn.x_k'),
    ('blk.{n}.att_x_r', 'blocks.{n}.att.x_r'),
    ('blk.{n}.att_x_w', 'blocks.{n}.att.x_w'),
    ('blk.{n}.att_x_k', 'blocks.{n}.att.x_k'),
    ('blk.{n}.att_x_v', 'blocks.{n}.att.x_v'),
    ('blk.{n}.att_x_a', 'blocks.{n}.att.x_a'),
    ('blk.{n}.att_x_g', 'blocks.{n}.att.x_g'),
    ('blk.{n}.att_w0', 'blocks.{n}.att.w0'),
    ('blk.{n}.att_w1', 'blocks.{n}.att.w1'),
    ('blk.{n}.att_w2', 'blocks.{n}.att.w2'),
    ('blk.{n}.att_a0', 'blocks.{n}.att.a0'),
    ('blk.{n}.att_a1', 'blocks.{n}.att.a1'),
    ('blk.{n}.att_a2', 'blocks.{n}.att.a2'),
    ('blk.{n}.att_g1', 'blocks.{n}.att.g1'),
    ('blk.{n}.att_g2', 'blocks.{n}.att.g2'),
    ('blk.{n}.att_v0', 'blocks.{n}.att.v0'),
    ('blk.{n}.att_v1', 'blocks.{n}.att.v1'),
    ('blk.{n}.att_v2', 'blocks.{n}.att.v2'),
    ('blk.{n}.att_r_k', 'blocks.{n}.att.r_k'),
    ('blk.{n}.att_k_k', 'blocks.{n}.att.k_k'),
    ('blk.{n}.att_k_a', 'blocks.{n}.att.k_a'),
]


@pytest.mark.parametrize("gguf_name,expected", REFERENCE_NAME_TABLE)
def test_reference_pattern_maps_identically(gguf_name, expected):
    for n in (0, 7, 23):  # block-number substitution where applicable
        g = gguf_name.replace("{n}", str(n))
        e = expected.replace("{n}", str(n))
        assert gguf_to_model_name(g) == e


def test_unknown_names_pass_through_as_none():
    for name in ("blk.0.mystery.weight", "rope.freqs", "blk.x"):
        assert gguf_to_model_name(name) is None
