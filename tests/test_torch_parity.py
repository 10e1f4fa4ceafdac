"""Cross-framework activation parity (SURVEY.md §4 #3, BASELINE.json north
star: per-layer activations allclose in eval mode with imported weights).

PyG is unavailable offline, so the torch side is an independent minimal
reimplementation of the reference semantics (MySAGEConv message/aggregate,
encoder.py:94-102; BatchNorm eval; cosine VQ eval path, vq.py:650-659) — not
a copy — exercised through the state_dict importer.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from conftest import random_graph
from stemgnn_tpu.core.config import EncoderConfig, VQConfig
from stemgnn_tpu.nn.encoder import encoder_apply
from stemgnn_tpu.utils.torch_import import import_encoder, import_vq
from stemgnn_tpu.vq import vq_apply


class TorchSage(nn.Module):
    """Reference-semantics SAGE layer: mean_j relu(x_j + xe) -> lin_l, plus
    root lin_r."""

    def __init__(self, d_in, d_out):
        super().__init__()
        self.lin_l = nn.Linear(d_in, d_out)
        self.lin_r = nn.Linear(d_in, d_out, bias=False)

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index
        msg = torch.relu(x[src] + edge_attr)
        agg = torch.zeros_like(x[:, : msg.shape[1]])
        agg = torch.zeros(x.shape[0], msg.shape[1], dtype=x.dtype)
        agg.index_add_(0, dst, msg)
        cnt = torch.zeros(x.shape[0], dtype=x.dtype)
        cnt.index_add_(0, dst, torch.ones_like(dst, dtype=x.dtype))
        agg = agg / cnt.clamp(min=1).unsqueeze(1)
        return self.lin_l(agg) + self.lin_r(x)


class TorchEncoder(nn.Module):
    def __init__(self, d, layers=2):
        super().__init__()
        self.layers = nn.ModuleList([TorchSage(d, d) for _ in range(layers)])
        self.norms = nn.ModuleList([nn.BatchNorm1d(d) for _ in range(layers)])

    def forward(self, x, edge_index, edge_attr):
        z = x
        for i, (conv, norm) in enumerate(zip(self.layers, self.norms)):
            z = conv(z, edge_index, edge_attr)
            z = norm(z)
            if i < len(self.layers) - 1:
                z = torch.relu(z)
        return z


def test_encoder_activation_parity(rng):
    d, n, e = 32, 40, 120
    x, s, r, ef = random_graph(rng, n=n, e=e, d=d)
    tmodel = TorchEncoder(d)
    tmodel.eval()
    # give the running stats some non-trivial values
    with torch.no_grad():
        for norm in tmodel.norms:
            norm.running_mean.uniform_(-0.5, 0.5)
            norm.running_var.uniform_(0.5, 1.5)
    tz = tmodel(torch.tensor(x), torch.tensor(np.stack([s, r])),
                torch.tensor(ef)).detach().numpy()

    cfg = EncoderConfig(input_dim=d, hidden_dim=d, num_layers=2,
                        normalize="batch", dropout=0.0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, state = import_encoder(sd, cfg)
    jz, _, _ = encoder_apply(params, state, cfg, jnp.asarray(x),
                             jnp.asarray(s), jnp.asarray(r),
                             edge_feat=jnp.asarray(ef), training=False)
    np.testing.assert_allclose(np.asarray(jz), tz, rtol=1e-4, atol=1e-4)


class TorchCosineVQ(nn.Module):
    """Reference cosine-VQ eval path: project_in -> per-head l2norm -> cosine
    argmax -> gather -> project_out (vq.py:849-1064, eval branch)."""

    def __init__(self, dim, heads, code_dim, codebook_size):
        super().__init__()
        self.heads, self.code_dim = heads, code_dim
        self.project_in = nn.Linear(dim, heads * code_dim)
        self.project_out = nn.Linear(heads * code_dim, dim)
        embed = torch.randn(heads, codebook_size, code_dim)
        embed = embed / embed.norm(dim=-1, keepdim=True)
        self.register_buffer("embed", embed)

    def forward(self, z):
        n = z.shape[0]
        xp = self.project_in(z)
        xh = xp.view(n, self.heads, self.code_dim).permute(1, 0, 2)
        xh = xh / xh.norm(dim=-1, keepdim=True).clamp(min=1e-12)
        dist = torch.einsum("hnd,hcd->hnc", xh, self.embed)
        ind = dist.argmax(-1)
        quant = torch.stack([self.embed[h][ind[h]]
                             for h in range(self.heads)])
        codes = quant.permute(1, 0, 2).reshape(n, -1)
        return self.project_out(codes), ind.T


def test_vq_activation_parity(rng):
    dim, heads, cd, cs = 32, 4, 16, 24
    tvq = TorchCosineVQ(dim, heads, cd, cs)
    tvq.eval()
    z = rng.standard_normal((30, dim)).astype(np.float32)
    tout, tind = tvq(torch.tensor(z))

    cfg = VQConfig(dim=dim, codebook_size=cs, codebook_dim=cd, heads=heads)
    sd = {k if not k.startswith("embed") else "_codebook.embed": v.numpy()
          for k, v in tvq.state_dict().items()}
    params, state = import_vq(sd, cfg)
    res = vq_apply(params, state, cfg, jnp.asarray(z), training=False)
    np.testing.assert_array_equal(np.asarray(res["indices"]),
                                  tind.detach().numpy())
    np.testing.assert_allclose(np.asarray(res["quantize"]),
                               tout.detach().numpy(), rtol=1e-4, atol=1e-4)
