"""Value-level torch goldens for the pretrained SD import path.

The manifests (tests/test_manifests.py) prove the importers map 100% of
real diffusers *keys and shapes*; these tests prove the *values* compute
the same function. Each test fabricates a small random diffusers-layout
torch state dict (native torch conventions: conv OIHW, linear [out,in],
'.'-separated diffusers names), runs a raw-torch functional transcription
of the corresponding diffusers block (torch.nn.functional only, consuming
the dict in its native layout), imports the SAME dict through
models/importers.py rules into our Flax block, and asserts fp32 forward
parity. Negative controls prove the harness discriminates: a transposed
conv kernel or a swapped attention head split fails.

This kills the layout-convention risk class (OIHW↔HWIO transposes, head
splits, GroupNorm grouping, GEGLU gelu form, up/downsample padding phase)
for the models the reference actually generates with — the SD-v1-4 UNet
and AutoencoderKL (PolypGeneratorModel.py:17-22,
train_with_lora_per_class.py:304-308).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from polyp_tpu.models import importers as imp
from polyp_tpu.models.unet_blocks import (
    Downsample2D,
    ResnetBlock2D,
    SpatialSelfAttention,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
)

RTOL, ATOL = 2e-4, 3e-4


# ---------------------------------------------------------------------------
# state-dict fabrication (torch layouts, diffusers names)
# ---------------------------------------------------------------------------

class Fab:
    """Accumulates a diffusers-layout numpy state dict."""

    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.sd: dict[str, np.ndarray] = {}

    def _w(self, shape, scale=0.2):
        return (self.rng.standard_normal(shape) * scale).astype(np.float32)

    def conv(self, name, cout, cin, k=3):
        self.sd[f"{name}.weight"] = self._w((cout, cin, k, k))
        self.sd[f"{name}.bias"] = self._w((cout,), 0.1)

    def linear(self, name, cout, cin, bias=True):
        self.sd[f"{name}.weight"] = self._w((cout, cin))
        if bias:
            self.sd[f"{name}.bias"] = self._w((cout,), 0.1)

    def norm(self, name, c):
        # scale near 1, bias near 0 — keeps activations O(1) through depth
        self.sd[f"{name}.weight"] = (1.0 + 0.1 * self.rng.standard_normal(c)
                                     ).astype(np.float32)
        self.sd[f"{name}.bias"] = self._w((c,), 0.1)

    def resnet(self, p, cin, cout, temb_dim=None, time_emb=True):
        self.norm(f"{p}.norm1", cin)
        self.conv(f"{p}.conv1", cout, cin)
        if time_emb:
            self.linear(f"{p}.time_emb_proj", cout, temb_dim)
        self.norm(f"{p}.norm2", cout)
        self.conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            self.conv(f"{p}.conv_shortcut", cout, cin, 1)

    def transformer2d(self, p, c, ctx_dim):
        self.norm(f"{p}.norm", c)
        self.conv(f"{p}.proj_in", c, c, 1)
        self.conv(f"{p}.proj_out", c, c, 1)
        b = f"{p}.transformer_blocks.0"
        for attn, kdim in (("attn1", c), ("attn2", ctx_dim)):
            self.linear(f"{b}.{attn}.to_q", c, c, bias=False)
            self.linear(f"{b}.{attn}.to_k", c, kdim, bias=False)
            self.linear(f"{b}.{attn}.to_v", c, kdim, bias=False)
            self.linear(f"{b}.{attn}.to_out.0", c, c)
        self.linear(f"{b}.ff.net.0.proj", c * 8, c)
        self.linear(f"{b}.ff.net.2", c, c * 4)
        for i in (1, 2, 3):
            self.norm(f"{b}.norm{i}", c)

    def vae_attention(self, p, c):
        self.norm(f"{p}.group_norm", c)
        for proj in ("to_q", "to_k", "to_v"):
            self.linear(f"{p}.{proj}", c, c, bias=True)
        self.linear(f"{p}.to_out.0", c, c)


def _t(sd, key):
    return torch.from_numpy(sd[key])


def _tb(sd, key):
    k = f"{key}.bias"
    return torch.from_numpy(sd[k]) if k in sd else None


# ---------------------------------------------------------------------------
# raw-torch functional transcriptions of the diffusers blocks
# ---------------------------------------------------------------------------

def t_group_norm(sd, p, x, eps=1e-5):
    c = x.shape[1]
    return F.group_norm(x, math.gcd(c, 32), _t(sd, f"{p}.weight"),
                        _t(sd, f"{p}.bias"), eps)


def t_conv(sd, p, x, stride=1, padding=1):
    return F.conv2d(x, _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"),
                    stride=stride, padding=padding)


def t_resnet(sd, p, x, temb=None, eps=1e-5):
    h = F.silu(t_group_norm(sd, f"{p}.norm1", x, eps))
    h = t_conv(sd, f"{p}.conv1", h)
    if f"{p}.time_emb_proj.weight" in sd:
        t = F.linear(F.silu(temb), _t(sd, f"{p}.time_emb_proj.weight"),
                     _t(sd, f"{p}.time_emb_proj.bias"))
        h = h + t[:, :, None, None]
    h = F.silu(t_group_norm(sd, f"{p}.norm2", h, eps))
    h = t_conv(sd, f"{p}.conv2", h)
    if f"{p}.conv_shortcut.weight" in sd:
        x = F.conv2d(x, _t(sd, f"{p}.conv_shortcut.weight"),
                     _t(sd, f"{p}.conv_shortcut.bias"))
    return h + x


def t_attention(sd, p, x, ctx, heads, wrong_split=False):
    """diffusers Attention: linear q/k/v, (B,T,H,D) head split, SDPA,
    merge, to_out.0. `wrong_split` is the negative control: an interleaved
    (B,T,D,H)-style split that passes every shape check."""
    ctx = x if ctx is None else ctx
    q = F.linear(x, _t(sd, f"{p}.to_q.weight"), _tb(sd, f"{p}.to_q"))
    k = F.linear(ctx, _t(sd, f"{p}.to_k.weight"), _tb(sd, f"{p}.to_k"))
    v = F.linear(ctx, _t(sd, f"{p}.to_v.weight"), _tb(sd, f"{p}.to_v"))
    b, tq, inner = q.shape
    d = inner // heads

    def split(z):
        if wrong_split:
            return z.view(b, -1, d, heads).permute(0, 3, 1, 2)
        return z.view(b, -1, heads, d).transpose(1, 2)

    out = F.scaled_dot_product_attention(split(q), split(k), split(v))
    out = out.transpose(1, 2).reshape(b, tq, inner)
    return F.linear(out, _t(sd, f"{p}.to_out.0.weight"),
                    _t(sd, f"{p}.to_out.0.bias"))


def t_transformer_block(sd, p, x, ctx, heads):
    def ln(which, h):
        return F.layer_norm(h, (h.shape[-1],), _t(sd, f"{p}.{which}.weight"),
                            _t(sd, f"{p}.{which}.bias"), eps=1e-5)

    x = x + t_attention(sd, f"{p}.attn1", ln("norm1", x), None, heads)
    x = x + t_attention(sd, f"{p}.attn2", ln("norm2", x), ctx, heads)
    h = F.linear(ln("norm3", x), _t(sd, f"{p}.ff.net.0.proj.weight"),
                 _t(sd, f"{p}.ff.net.0.proj.bias"))
    a, gate = h.chunk(2, dim=-1)
    return x + F.linear(a * F.gelu(gate), _t(sd, f"{p}.ff.net.2.weight"),
                        _t(sd, f"{p}.ff.net.2.bias"))


def t_transformer2d(sd, p, x, ctx, heads):
    n, c, hh, w = x.shape
    y = t_group_norm(sd, f"{p}.norm", x, eps=1e-6)
    y = F.conv2d(y, _t(sd, f"{p}.proj_in.weight"), _t(sd, f"{p}.proj_in.bias"))
    y = y.permute(0, 2, 3, 1).reshape(n, hh * w, c)
    y = t_transformer_block(sd, f"{p}.transformer_blocks.0", y, ctx, heads)
    y = y.reshape(n, hh, w, c).permute(0, 3, 1, 2)
    return x + F.conv2d(y, _t(sd, f"{p}.proj_out.weight"),
                        _t(sd, f"{p}.proj_out.bias"))


def t_vae_attention(sd, p, x):
    n, c, hh, w = x.shape
    y = t_group_norm(sd, f"{p}.group_norm", x, eps=1e-6)
    y = y.permute(0, 2, 3, 1).reshape(n, hh * w, c)
    out = t_attention(sd, p, y, None, heads=1)
    return x + out.reshape(n, hh, w, c).permute(0, 3, 1, 2)


def t_sinusoidal(timesteps, dim):
    """diffusers Timesteps: flip_sin_to_cos=True, downscale_freq_shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    freqs = torch.exp(exponent / half)
    args = timesteps.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def t_time_embedding(sd, p, timesteps, base_dim):
    emb = t_sinusoidal(timesteps, base_dim)
    emb = F.linear(emb, _t(sd, f"{p}.linear_1.weight"),
                   _t(sd, f"{p}.linear_1.bias"))
    return F.linear(F.silu(emb), _t(sd, f"{p}.linear_2.weight"),
                    _t(sd, f"{p}.linear_2.bias"))


# ---------------------------------------------------------------------------
# plumbing: torch dict → flax params via the real importer rules
# ---------------------------------------------------------------------------

def import_block(sd, rules, root, module, *example_args, **kw):
    """Apply importer rules, validate the resulting subtree against the
    module's init shapes, and return (apply_fn, params)."""
    tree = imp.to_pytree(imp.apply_rules(sd, rules))[root]
    ref = module.init(jax.random.PRNGKey(0), *example_args, **kw)["params"]
    problems = imp.validate_against(tree, ref)
    assert not problems, problems
    tree = jax.tree_util.tree_map(
        lambda imported, r: np.asarray(imported, dtype=r.dtype), tree, ref)
    return lambda *a, **k: module.apply({"params": tree}, *a, **k), tree


def nhwc(x_nchw: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x_nchw.numpy().transpose(0, 2, 3, 1))


def assert_close(flax_out, torch_out, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(np.asarray(flax_out, np.float32),
                               torch_out.numpy(), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# block-family goldens
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cin,cout", [(32, 32), (32, 64)])
def test_resnet_block_golden(cin, cout):
    fab = Fab(1)
    fab.resnet("res", cin, cout, temb_dim=24)
    x = torch.from_numpy(fab.rng.standard_normal((2, cin, 6, 6)
                                                 ).astype(np.float32))
    temb = torch.from_numpy(fab.rng.standard_normal((2, 24)
                                                    ).astype(np.float32))
    with torch.no_grad():
        want = t_resnet(fab.sd, "res", x, temb)
    apply, _ = import_block(fab.sd, imp._resnet_rules(r"res", "res"), "res",
                            ResnetBlock2D(cout), nhwc(x), jnp.asarray(temb))
    got = apply(nhwc(x), jnp.asarray(temb.numpy()))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_transformer2d_golden():
    c, heads, ctx_dim = 32, 2, 24
    fab = Fab(2)
    fab.transformer2d("t2d", c, ctx_dim)
    x = torch.from_numpy(fab.rng.standard_normal((2, c, 4, 4)
                                                 ).astype(np.float32))
    ctx = torch.from_numpy(fab.rng.standard_normal((2, 7, ctx_dim)
                                                   ).astype(np.float32))
    with torch.no_grad():
        want = t_transformer2d(fab.sd, "t2d", x, ctx, heads)
    module = Transformer2D(heads, c // heads, depth=1,
                           cross_attention_dim=ctx_dim)
    apply, _ = import_block(fab.sd, imp._transformer_rules(r"t2d", "t2d"),
                            "t2d", module, nhwc(x), jnp.asarray(ctx.numpy()))
    got = apply(nhwc(x), jnp.asarray(ctx.numpy()))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_vae_attention_golden():
    c = 32
    fab = Fab(3)
    fab.vae_attention("va", c)
    x = torch.from_numpy(fab.rng.standard_normal((2, c, 5, 5)
                                                 ).astype(np.float32))
    with torch.no_grad():
        want = t_vae_attention(fab.sd, "va", x)
    module = SpatialSelfAttention(num_heads=1, eps=1e-6, qkv_bias=True)
    apply, _ = import_block(fab.sd, imp._vae_attention_rules(r"va", "va"),
                            "va", module, nhwc(x))
    got = apply(nhwc(x))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_downsample_unet_golden():
    """UNet convention: symmetric padding=1 (diffusers downsample_padding)."""
    fab = Fab(4)
    fab.conv("d.conv", 32, 32)
    x = torch.from_numpy(fab.rng.standard_normal((2, 32, 8, 8)
                                                 ).astype(np.float32))
    with torch.no_grad():
        want = t_conv(fab.sd, "d.conv", x, stride=2, padding=1)
    apply, _ = import_block(fab.sd, imp._conv(r"d\.conv", "d/conv"), "d",
                            Downsample2D(32), nhwc(x))
    got = apply(nhwc(x))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_downsample_vae_golden():
    """VAE Encoder convention: F.pad (0,1,0,1) then VALID conv — a
    DIFFERENT function from symmetric padding (window phase shifts)."""
    fab = Fab(5)
    fab.conv("d.conv", 32, 32)
    x = torch.from_numpy(fab.rng.standard_normal((2, 32, 8, 8)
                                                 ).astype(np.float32))
    with torch.no_grad():
        padded = F.pad(x, (0, 1, 0, 1))
        want = F.conv2d(padded, _t(fab.sd, "d.conv.weight"),
                        _t(fab.sd, "d.conv.bias"), stride=2)
        sym = t_conv(fab.sd, "d.conv", x, stride=2, padding=1)
    assert not np.allclose(want.numpy(), sym.numpy(), rtol=RTOL, atol=ATOL), \
        "conventions coincide — test has no power"
    apply, _ = import_block(fab.sd, imp._conv(r"d\.conv", "d/conv"), "d",
                            Downsample2D(32, asymmetric=True), nhwc(x))
    got = apply(nhwc(x))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_upsample_golden():
    fab = Fab(6)
    fab.conv("u.conv", 32, 32)
    x = torch.from_numpy(fab.rng.standard_normal((2, 32, 4, 4)
                                                 ).astype(np.float32))
    with torch.no_grad():
        want = t_conv(fab.sd, "u.conv",
                      F.interpolate(x, scale_factor=2.0, mode="nearest"))
    apply, _ = import_block(fab.sd, imp._conv(r"u\.conv", "u/conv"), "u",
                            Upsample2D(32), nhwc(x))
    got = apply(nhwc(x))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def test_timestep_embedding_golden():
    fab = Fab(7)
    base, dim = 32, 128
    fab.linear("te.linear_1", dim, base)
    fab.linear("te.linear_2", dim, dim)
    timesteps = torch.tensor([0, 1, 17, 999])
    with torch.no_grad():
        want = t_time_embedding(fab.sd, "te", timesteps, base)
    rules = (imp._linear(r"te\.linear_1", "te/linear_1")
             + imp._linear(r"te\.linear_2", "te/linear_2"))
    apply, _ = import_block(fab.sd, rules, "te",
                            TimestepEmbedding(base, dim),
                            jnp.asarray(timesteps.numpy()))
    got = apply(jnp.asarray(timesteps.numpy()))
    assert_close(got, want)


# ---------------------------------------------------------------------------
# negative controls: the harness must fail on classic layout mistakes
# ---------------------------------------------------------------------------

def test_transposed_conv_kernel_fails():
    """An O↔I-transposed square conv kernel passes every shape check; the
    value golden must catch it."""
    fab = Fab(8)
    fab.resnet("res", 32, 32, temb_dim=24)
    x = torch.from_numpy(fab.rng.standard_normal((2, 32, 6, 6)
                                                 ).astype(np.float32))
    temb = torch.from_numpy(fab.rng.standard_normal((2, 24)
                                                    ).astype(np.float32))
    with torch.no_grad():
        want = t_resnet(fab.sd, "res", x, temb)
    fab.sd["res.conv1.weight"] = np.ascontiguousarray(
        fab.sd["res.conv1.weight"].transpose(1, 0, 2, 3))
    apply, _ = import_block(fab.sd, imp._resnet_rules(r"res", "res"), "res",
                            ResnetBlock2D(32), nhwc(x),
                            jnp.asarray(temb.numpy()))
    got = apply(nhwc(x), jnp.asarray(temb.numpy()))
    assert not np.allclose(np.asarray(jnp.transpose(got, (0, 3, 1, 2))),
                           want.numpy(), rtol=RTOL, atol=ATOL)


def test_swapped_head_split_fails():
    """An interleaved head split is shape-identical; the golden must
    discriminate it from the (B,T,H,D) split."""
    c, heads, ctx_dim = 32, 2, 24
    fab = Fab(9)
    fab.transformer2d("t2d", c, ctx_dim)
    x = torch.from_numpy(fab.rng.standard_normal((2, c, 4, 4)
                                                 ).astype(np.float32))
    ctx = torch.from_numpy(fab.rng.standard_normal((2, 7, ctx_dim)
                                                   ).astype(np.float32))
    tokens = x.permute(0, 2, 3, 1).reshape(2, 16, c)
    with torch.no_grad():
        right = t_attention(fab.sd, "t2d.transformer_blocks.0.attn1",
                            tokens, None, heads)
        wrong = t_attention(fab.sd, "t2d.transformer_blocks.0.attn1",
                            tokens, None, heads, wrong_split=True)
    assert not np.allclose(right.numpy(), wrong.numpy(),
                           rtol=RTOL, atol=ATOL)
    # and ours matches the RIGHT split
    module = Transformer2D(heads, c // heads, depth=1,
                           cross_attention_dim=ctx_dim)
    apply, params = import_block(
        fab.sd, imp._transformer_rules(r"t2d", "t2d"), "t2d", module,
        nhwc(x), jnp.asarray(ctx.numpy()))
    from polyp_tpu.models.unet_blocks import Attention
    attn = Attention(heads, c // heads)
    attn_params = params["transformer_blocks_0"]["attn1"]
    got = attn.apply({"params": attn_params}, jnp.asarray(tokens.numpy()))
    assert_close(got, right)
    assert not np.allclose(np.asarray(got), wrong.numpy(),
                           rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# end-to-end tiny UNet / tiny VAE goldens through the real import entry
# points (file → import_unet_condition / import_vae → forward)
# ---------------------------------------------------------------------------

def fabricate_tiny_unet_sd() -> dict[str, np.ndarray]:
    """Diffusers-layout dict for models.tiny_condition_unet: ch=(32,64),
    1 layer/block, heads=2, ctx=32, down=(CrossAttn, Down),
    up=(Up, CrossAttn)."""
    fab = Fab(10)
    temb = 128
    fab.conv("conv_in", 32, 4)
    fab.linear("time_embedding.linear_1", temb, 32)
    fab.linear("time_embedding.linear_2", temb, temb)
    fab.resnet("down_blocks.0.resnets.0", 32, 32, temb)
    fab.transformer2d("down_blocks.0.attentions.0", 32, 32)
    fab.conv("down_blocks.0.downsamplers.0.conv", 32, 32)
    fab.resnet("down_blocks.1.resnets.0", 32, 64, temb)
    fab.resnet("mid_block.resnets.0", 64, 64, temb)
    fab.transformer2d("mid_block.attentions.0", 64, 32)
    fab.resnet("mid_block.resnets.1", 64, 64, temb)
    # up 0 (UpBlock2D, cout=64): skips popped are [down1res(64), down0ds(32)]
    fab.resnet("up_blocks.0.resnets.0", 64 + 64, 64, temb)
    fab.resnet("up_blocks.0.resnets.1", 64 + 32, 64, temb)
    fab.conv("up_blocks.0.upsamplers.0.conv", 64, 64)
    # up 1 (CrossAttn, cout=32): skips [down0attn(32), conv_in(32)]
    fab.resnet("up_blocks.1.resnets.0", 64 + 32, 32, temb)
    fab.transformer2d("up_blocks.1.attentions.0", 32, 32)
    fab.resnet("up_blocks.1.resnets.1", 32 + 32, 32, temb)
    fab.transformer2d("up_blocks.1.attentions.1", 32, 32)
    fab.norm("conv_norm_out", 32)
    fab.conv("conv_out", 4, 32)
    return fab.sd


def t_tiny_unet(sd, x, timesteps, ctx):
    t = t_time_embedding(sd, "time_embedding", timesteps, 32)
    h = t_conv(sd, "conv_in", x)
    skips = [h]
    h = t_resnet(sd, "down_blocks.0.resnets.0", h, t)
    h = t_transformer2d(sd, "down_blocks.0.attentions.0", h, ctx, 2)
    skips.append(h)
    h = t_conv(sd, "down_blocks.0.downsamplers.0.conv", h, stride=2)
    skips.append(h)
    h = t_resnet(sd, "down_blocks.1.resnets.0", h, t)
    skips.append(h)
    h = t_resnet(sd, "mid_block.resnets.0", h, t)
    h = t_transformer2d(sd, "mid_block.attentions.0", h, ctx, 2)
    h = t_resnet(sd, "mid_block.resnets.1", h, t)
    for j in range(2):
        h = torch.cat([h, skips.pop()], dim=1)
        h = t_resnet(sd, f"up_blocks.0.resnets.{j}", h, t)
    h = F.interpolate(h, size=skips[-1].shape[2:], mode="nearest")
    h = t_conv(sd, "up_blocks.0.upsamplers.0.conv", h)
    for j in range(2):
        h = torch.cat([h, skips.pop()], dim=1)
        h = t_resnet(sd, f"up_blocks.1.resnets.{j}", h, t)
        h = t_transformer2d(sd, f"up_blocks.1.attentions.{j}", h, ctx, 2)
    h = F.silu(t_group_norm(sd, "conv_norm_out", h))
    return t_conv(sd, "conv_out", h)


def test_tiny_unet_end_to_end_golden(tmp_path):
    from polyp_tpu.models import tiny_condition_unet

    sd = fabricate_tiny_unet_sd()
    rng = np.random.default_rng(11)
    x = torch.from_numpy(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    timesteps = torch.tensor([5, 700])
    ctx = torch.from_numpy(rng.standard_normal((2, 7, 32)).astype(np.float32))
    with torch.no_grad():
        want = t_tiny_unet(sd, x, timesteps, ctx)

    path = tmp_path / "diffusion_pytorch_model.bin"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    model = tiny_condition_unet(dtype=jnp.float32)
    like = model.init(jax.random.PRNGKey(0), nhwc(x),
                      jnp.asarray(timesteps.numpy()),
                      jnp.asarray(ctx.numpy()))["params"]
    params = imp.import_unet_condition(path, like=like)
    got = model.apply({"params": params}, nhwc(x),
                      jnp.asarray(timesteps.numpy()),
                      jnp.asarray(ctx.numpy()))
    assert_close(jnp.transpose(got, (0, 3, 1, 2)), want)


def fabricate_tiny_vae_sd() -> dict[str, np.ndarray]:
    """Diffusers-layout dict for models.tiny_vae: ch=(16,16,32,32),
    encoder 2 layers/block, decoder 3, latent 4."""
    fab = Fab(12)
    ch = (16, 16, 32, 32)
    fab.conv("encoder.conv_in", ch[0], 3)
    prev = ch[0]
    for i, c in enumerate(ch):
        for j in range(2):
            fab.resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c, time_emb=False)
        prev = c
        if i < 3:
            fab.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
    fab.resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1], time_emb=False)
    fab.vae_attention("encoder.mid_block.attentions.0", ch[-1])
    fab.resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1], time_emb=False)
    fab.norm("encoder.conv_norm_out", ch[-1])
    fab.conv("encoder.conv_out", 8, ch[-1])
    fab.conv("quant_conv", 8, 8, 1)
    fab.conv("post_quant_conv", 4, 4, 1)
    rev = tuple(reversed(ch))
    fab.conv("decoder.conv_in", rev[0], 4)
    fab.resnet("decoder.mid_block.resnets.0", rev[0], rev[0], time_emb=False)
    fab.vae_attention("decoder.mid_block.attentions.0", rev[0])
    fab.resnet("decoder.mid_block.resnets.1", rev[0], rev[0], time_emb=False)
    prev = rev[0]
    for i, c in enumerate(rev):
        for j in range(3):
            fab.resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c, time_emb=False)
        prev = c
        if i < 3:
            fab.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
    fab.norm("decoder.conv_norm_out", rev[-1])
    fab.conv("decoder.conv_out", 3, rev[-1])
    return fab.sd


def t_tiny_vae_encode_moments(sd, x):
    ch = (16, 16, 32, 32)
    h = t_conv(sd, "encoder.conv_in", x)
    for i in range(4):
        for j in range(2):
            h = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h,
                         eps=1e-6)
        if i < 3:
            h = F.pad(h, (0, 1, 0, 1))  # VAE asymmetric downsample
            h = F.conv2d(
                h, _t(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"),
                _t(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"),
                stride=2)
    h = t_resnet(sd, "encoder.mid_block.resnets.0", h, eps=1e-6)
    h = t_vae_attention(sd, "encoder.mid_block.attentions.0", h)
    h = t_resnet(sd, "encoder.mid_block.resnets.1", h, eps=1e-6)
    h = F.silu(t_group_norm(sd, "encoder.conv_norm_out", h, eps=1e-6))
    h = t_conv(sd, "encoder.conv_out", h)
    return F.conv2d(h, _t(sd, "quant_conv.weight"), _t(sd, "quant_conv.bias"))


def t_tiny_vae_decode(sd, z):
    z = F.conv2d(z, _t(sd, "post_quant_conv.weight"),
                 _t(sd, "post_quant_conv.bias"))
    h = t_conv(sd, "decoder.conv_in", z)
    h = t_resnet(sd, "decoder.mid_block.resnets.0", h, eps=1e-6)
    h = t_vae_attention(sd, "decoder.mid_block.attentions.0", h)
    h = t_resnet(sd, "decoder.mid_block.resnets.1", h, eps=1e-6)
    for i in range(4):
        for j in range(3):
            h = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, eps=1e-6)
        if i < 3:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(t_group_norm(sd, "decoder.conv_norm_out", h, eps=1e-6))
    return t_conv(sd, "decoder.conv_out", h)


def test_tiny_vae_end_to_end_golden(tmp_path):
    from polyp_tpu.models import tiny_vae

    sd = fabricate_tiny_vae_sd()
    rng = np.random.default_rng(13)
    x = torch.from_numpy(rng.standard_normal((1, 3, 16, 16)
                                             ).astype(np.float32))
    z = torch.from_numpy(rng.standard_normal((1, 4, 2, 2)
                                             ).astype(np.float32))
    with torch.no_grad():
        want_moments = t_tiny_vae_encode_moments(sd, x)
        want_img = t_tiny_vae_decode(sd, z)

    path = tmp_path / "diffusion_pytorch_model.bin"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    model = tiny_vae(dtype=jnp.float32)
    like = model.init(jax.random.PRNGKey(0), nhwc(x), jax.random.PRNGKey(1))
    params = imp.import_vae(path, like=like["params"])
    moments = model.apply({"params": params}, nhwc(x),
                          method=model.encode_moments)
    assert_close(jnp.transpose(moments, (0, 3, 1, 2)), want_moments)
    img = model.apply({"params": params}, nhwc(z), method=model.decode)
    assert_close(jnp.transpose(img, (0, 3, 1, 2)), want_img, atol=5e-4)
