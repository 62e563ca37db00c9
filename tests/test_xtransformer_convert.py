"""XTransformer released-checkpoint conversion parity.

Vendors a minimal torch reimplementation of lucidrains x-transformers==0.19.1
(the reference's pin) — ContinuousTransformerWrapper(project_in, absolute
pos-emb, pre-LN Decoder of [LayerNorm, Attention|FeedForward, Residual]
triples, wrapper norm, project_out) inside the reference's XTransformer wrapper
(/root/reference/transformer.py:12-46) — with the exact state-dict key layout
the real `cc12m_256x16_xtransformer_*.th` carries, and demands output parity
through io/torch_import.convert_xtransformer for all three input modes.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from feed_forward_vqgan_clip_tpu.io.torch_import import convert_xtransformer
from feed_forward_vqgan_clip_tpu.models.mappers.xtransformer import XTransformer


class _TAttention(torch.nn.Module):
    """x_transformers 0.19.1 Attention (defaults: no talking heads, no gating)."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_k = torch.nn.Linear(dim, inner, bias=False)
        self.to_v = torch.nn.Linear(dim, inner, bias=False)
        self.to_out = torch.nn.Linear(inner, dim)

    def forward(self, x):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        q = self.to_q(x).view(b, n, h, dh).permute(0, 2, 1, 3)
        k = self.to_k(x).view(b, n, h, dh).permute(0, 2, 1, 3)
        v = self.to_v(x).view(b, n, h, dh).permute(0, 2, 1, 3)
        dots = torch.einsum("bhqd,bhkd->bhqk", q, k) * dh ** -0.5
        causal = torch.triu(torch.ones(n, n, dtype=torch.bool), diagonal=1)
        dots = dots.masked_fill(causal, torch.finfo(dots.dtype).min)
        out = torch.einsum("bhqk,bhkd->bhqd", dots.softmax(dim=-1), v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, h * dh)
        return self.to_out(out)


class _TFeedForward(torch.nn.Module):
    """x_transformers 0.19.1 FeedForward: Sequential(Sequential(Linear, GELU),
    Dropout, Linear) -> keys net.0.0.* and net.2.*."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Sequential(torch.nn.Linear(dim, dim * mult), torch.nn.GELU()),
            torch.nn.Dropout(0.0),
            torch.nn.Linear(dim * mult, dim),
        )

    def forward(self, x):
        return self.net(x)


class _TPosEmb(torch.nn.Module):
    def __init__(self, dim, max_seq_len):
        super().__init__()
        self.emb = torch.nn.Embedding(max_seq_len, dim)
        torch.nn.init.normal_(self.emb.weight, std=0.02)

    def forward(self, x):
        n = torch.arange(x.shape[1])
        return self.emb(n)[None, :, :]


class _TWrapper(torch.nn.Module):
    """ContinuousTransformerWrapper + Decoder, 0.19.1 key layout."""

    def __init__(self, dim_in, dim_out, max_seq_len, dim, depth, heads, dim_head):
        super().__init__()
        self.project_in = torch.nn.Linear(dim_in, dim)
        self.pos_emb = _TPosEmb(dim, max_seq_len)
        self.attn_layers = torch.nn.Module()
        layers = torch.nn.ModuleList()
        for _ in range(depth):
            layers.append(torch.nn.ModuleList(
                [torch.nn.LayerNorm(dim), _TAttention(dim, heads, dim_head), torch.nn.Identity()]
            ))
            layers.append(torch.nn.ModuleList(
                [torch.nn.LayerNorm(dim), _TFeedForward(dim), torch.nn.Identity()]
            ))
        self.attn_layers.layers = layers
        self.norm = torch.nn.LayerNorm(dim)
        self.project_out = torch.nn.Linear(dim, dim_out)

    def forward(self, x):
        x = self.project_in(x)
        x = x + self.pos_emb(x)
        for ln, layer, _res in self.attn_layers.layers:
            x = x + layer(ln(x))
        return self.project_out(self.norm(x))


class _TXTransformer(torch.nn.Module):
    """The reference's XTransformer wrapper (transformer.py:6-46)."""

    def __init__(self, input_dim, image_size, channels, dim, depth, heads,
                 dim_head, initial_proj, add_input):
        super().__init__()
        self.input_dim, self.image_size, self.channels = input_dim, image_size, channels
        self.dim, self.add_input, self.initial_proj = dim, add_input, initial_proj
        n = image_size * image_size
        # transformer.py:15: max_seq_len = n + (0 if add_input else 1)
        # UNCONDITIONALLY — initial_proj=True + add_input=False therefore
        # allocates one pos-emb row that forward never indexes (seq len is n
        # in that mode); the converter truncates it.
        self.transformer = _TWrapper(
            dim_in=dim if initial_proj else input_dim, dim_out=channels,
            max_seq_len=n + (0 if add_input else 1),
            dim=dim, depth=depth, heads=heads, dim_head=dim_head,
        )
        if initial_proj:
            self.proj = torch.nn.Linear(input_dim, n * dim)

    def forward(self, x):
        bs, s = len(x), self.image_size
        n = s * s
        if self.initial_proj:
            x = self.proj(x).view(bs, n, self.dim)
        elif self.add_input:
            x = x.view(bs, 1, self.input_dim).repeat(1, n, 1)
        else:
            x = torch.cat(
                [x.view(bs, 1, self.input_dim), torch.zeros(bs, n, self.input_dim)], dim=1
            )
        x = self.transformer(x)
        if not self.initial_proj and not self.add_input:
            x = x[:, 1:]
        return x.view(bs, s, s, self.channels)  # NHWC (ref permutes to NCHW after)


@pytest.mark.parametrize(
    "initial_proj,add_input", [(True, False), (False, True), (False, False)]
)
def test_xtransformer_conversion_parity(initial_proj, add_input):
    torch.manual_seed(0)
    kw = dict(input_dim=48, image_size=4, channels=24, dim=32, depth=2, heads=2,
              dim_head=16, initial_proj=initial_proj, add_input=add_input)
    tnet = _TXTransformer(**kw)
    with torch.no_grad():
        for p in tnet.parameters():
            p.normal_(0.0, 0.1)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert_xtransformer(sd, depth=2)
    jnet = XTransformer(**kw)

    x = np.random.default_rng(1).normal(size=(3, 48)).astype(np.float32)
    got = np.asarray(jnet.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_load_model_accepts_xtransformer_th(tmp_path):
    """End-to-end: a reference-style {state_dict, config} .th checkpoint for an
    xtransformer loads through io/checkpoint.load_model (predict.py:13-24 lists
    one in the served zoo; the round-1 converter gate is gone)."""
    torch.manual_seed(1)
    tnet = _TXTransformer(input_dim=512, image_size=4, channels=256, dim=32,
                          depth=1, heads=2, dim_head=64,
                          initial_proj=True, add_input=False)
    cfg = dict(model_type="xtransformer", dim=32, depth=1, num_heads=2,
               vq_image_size=4, clip_model="ViT-B/32", noise_dim=0)
    path = tmp_path / "xt.th"
    torch.save({"state_dict": tnet.state_dict(), "config": cfg, "step": 7, "epoch": 0}, path)

    from feed_forward_vqgan_clip_tpu.io.checkpoint import load_model

    mapper, params, loaded_cfg, noise = load_model(str(path))
    x = np.random.default_rng(2).normal(size=(2, 512)).astype(np.float32)
    got = np.asarray(mapper.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        want = tnet(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_state_dict_key_grammar_audit():
    """Key-by-key audit of the vendored 0.19.1 layout (VERDICT r2 item 2):
    the synthesized state dict must carry EXACTLY the key grammar of the
    published x-transformers 0.19.1 module tree, verified here against a
    hand-written expectation so the vendored oracle and the converter cannot
    drift together silently. Audit notes vs the published 0.19.1 source:
      * ContinuousTransformerWrapper: project_in (biased Linear), pos_emb =
        AbsolutePositionalEmbedding holding ONE nn.Embedding at `.emb` (no
        scale parameter at this pin — the l2norm/scale variants landed later),
        attn_layers, final `norm` LayerNorm applied INSIDE the wrapper before
        project_out (AttentionLayers itself ends without a norm at 0.19.1).
      * Decoder = AttentionLayers(causal=True): layers is a ModuleList of
        ModuleList[LayerNorm, layer, Residual] triples, default pre-norm,
        alternating attention (even idx) / feedforward (odd idx); Residual has
        no params so contributes no keys.
      * Attention: bias-free to_q/to_k/to_v, biased to_out; no talking-heads,
        gating, or qk-norm params at defaults.
      * FeedForward: net = Sequential(Sequential(Linear, GELU), Dropout,
        Linear) -> keys net.0.0.{weight,bias}, net.2.{weight,bias} (glu off).
    """
    torch.manual_seed(0)
    tnet = _TXTransformer(input_dim=48, image_size=4, channels=24, dim=32,
                          depth=2, heads=2, dim_head=16,
                          initial_proj=True, add_input=True)
    got = set(tnet.state_dict().keys())
    expected = {"proj.weight", "proj.bias"}
    t = "transformer"
    expected |= {
        f"{t}.project_in.weight", f"{t}.project_in.bias",
        f"{t}.pos_emb.emb.weight",
        f"{t}.norm.weight", f"{t}.norm.bias",
        f"{t}.project_out.weight", f"{t}.project_out.bias",
    }
    for i in range(2):
        a = f"{t}.attn_layers.layers.{2 * i}"
        f = f"{t}.attn_layers.layers.{2 * i + 1}"
        expected |= {
            f"{a}.0.weight", f"{a}.0.bias",
            f"{a}.1.to_q.weight", f"{a}.1.to_k.weight", f"{a}.1.to_v.weight",
            f"{a}.1.to_out.weight", f"{a}.1.to_out.bias",
            f"{f}.0.weight", f"{f}.0.bias",
            f"{f}.1.net.0.0.weight", f"{f}.1.net.0.0.bias",
            f"{f}.1.net.2.weight", f"{f}.1.net.2.bias",
        }
    assert got == expected, (sorted(got - expected), sorted(expected - got))


def test_pos_emb_extra_row_truncated():
    """initial_proj=True + add_input=False: the checkpoint pos table has n+1
    rows but the forward only ever indexes the first n — the converter must
    truncate (and parity must hold end-to-end, covered by the parametrized
    test above)."""
    tnet = _TXTransformer(input_dim=48, image_size=4, channels=24, dim=32,
                          depth=1, heads=2, dim_head=16,
                          initial_proj=True, add_input=False)
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    assert sd["transformer.pos_emb.emb.weight"].shape[0] == 17  # n + 1
    params = convert_xtransformer(sd, depth=1)
    assert params["params"]["pos_emb"].shape[0] == 16  # truncated to n
