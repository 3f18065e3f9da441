"""Measured PyTorch-CPU reference baseline (VERDICT r1 item 8).

SURVEY §6 requires the reference throughput to be *measured, not copied*.
diffusers isn't installed in this image, so this is a faithful torch timing
mirror of the reference's sampling workload
(train_with_lora_per_class.py:73-78: StableDiffusionPipeline at 256px,
25 UniPC steps, guidance 7.5 → 2× batch CFG, plus one VAE decode per image):
the exact SD-v1-4 UNet2DConditionModel architecture (860M params — conv/
GroupNorm/attention/GEGLU graph identical, random weights; weights don't
change FLOPs or memory traffic) and the AutoencoderKL decoder, fp32 eager —
what `torch.load` + `pipe.to("cpu")` runs.

Prints one JSON line; tools/reference_baseline.json vendors the measurement
for bench.py's vs_baseline computation.

Run: python tools/bench_reference.py [--steps 3] [--image-size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class Resnet(nn.Module):
    def __init__(self, cin, cout, temb=1280):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, t):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(t))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return h + (self.shortcut(x) if self.shortcut else x)


class Block(nn.Module):
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU FF."""

    def __init__(self, c, heads=8, ctx=768):
        super().__init__()
        self.n1, self.n2, self.n3 = (nn.LayerNorm(c) for _ in range(3))
        self.q1, self.k1, self.v1 = (nn.Linear(c, c, bias=False)
                                     for _ in range(3))
        self.o1 = nn.Linear(c, c)
        self.q2 = nn.Linear(c, c, bias=False)
        self.k2 = nn.Linear(ctx, c, bias=False)
        self.v2 = nn.Linear(ctx, c, bias=False)
        self.o2 = nn.Linear(c, c)
        self.ff1 = nn.Linear(c, c * 8)
        self.ff2 = nn.Linear(c * 4, c)
        self.heads = heads

    def _attn(self, q, k, v):
        n, tq, c = q.shape
        h = self.heads
        q = q.view(n, tq, h, c // h).transpose(1, 2)
        k = k.view(n, k.shape[1], h, c // h).transpose(1, 2)
        v = v.view(n, v.shape[1], h, c // h).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        return out.transpose(1, 2).reshape(n, tq, c)

    def forward(self, x, ctx):
        h = self.n1(x)
        x = x + self.o1(self._attn(self.q1(h), self.k1(h), self.v1(h)))
        h = self.n2(x)
        x = x + self.o2(self._attn(self.q2(h), self.k2(ctx), self.v2(ctx)))
        h = self.ff1(self.n3(x))
        a, g = h.chunk(2, dim=-1)
        return x + self.ff2(a * F.gelu(g))


class Transformer(nn.Module):
    def __init__(self, c, heads=8):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.block = Block(c, heads)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, ctx):
        n, c, hh, w = x.shape
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(n, hh * w, c)
        y = self.block(y, ctx)
        y = y.reshape(n, hh, w, c).permute(0, 3, 1, 2)
        return x + self.proj_out(y)


class TorchSDUNet(nn.Module):
    """SD-v1-4 UNet2DConditionModel compute graph (PolypGeneratorModel.py:21)."""

    def __init__(self, ch=(320, 640, 1280, 1280), layers=2):
        super().__init__()
        self.conv_in = nn.Conv2d(4, ch[0], 3, padding=1)
        self.t1 = nn.Linear(ch[0], 1280)
        self.t2 = nn.Linear(1280, 1280)
        self.down_res = nn.ModuleList()
        self.down_attn = nn.ModuleList()
        self.downs = nn.ModuleList()
        cin = ch[0]
        skips = [cin]
        for i, cout in enumerate(ch):
            for j in range(layers):
                self.down_res.append(Resnet(cin if j == 0 else cout, cout))
                self.down_attn.append(Transformer(cout) if i < 3 else None)
                skips.append(cout)
            if i < 3:
                self.downs.append(nn.Conv2d(cout, cout, 3, stride=2, padding=1))
                skips.append(cout)
            cin = cout
        self.mid1 = Resnet(ch[-1], ch[-1])
        self.mid_attn = Transformer(ch[-1])
        self.mid2 = Resnet(ch[-1], ch[-1])
        self.up_res = nn.ModuleList()
        self.up_attn = nn.ModuleList()
        self.ups = nn.ModuleList()
        rev = list(reversed(ch))
        prev = ch[-1]
        for i, cout in enumerate(rev):
            for j in range(layers + 1):
                skip = skips.pop()
                self.up_res.append(Resnet((prev if j == 0 else cout) + skip, cout))
                self.up_attn.append(Transformer(cout) if i > 0 else None)
            if i < 3:
                self.ups.append(nn.Conv2d(cout, cout, 3, padding=1))
            prev = cout
        self.norm_out = nn.GroupNorm(32, ch[0])
        self.conv_out = nn.Conv2d(ch[0], 4, 3, padding=1)
        self.ch, self.layers = ch, layers

    def forward(self, x, temb_sin, ctx):
        t = self.t2(F.silu(self.t1(temb_sin)))
        h = self.conv_in(x)
        skips = [h]
        k = 0
        for i in range(4):
            for _ in range(self.layers):
                h = self.down_res[k](h, t)
                if self.down_attn[k] is not None:
                    h = self.down_attn[k](h, ctx)
                skips.append(h)
                k += 1
            if i < 3:
                h = self.downs[i](h)
                skips.append(h)
        h = self.mid2(self.mid_attn(self.mid1(h, t), ctx), t)
        k = 0
        for i in range(4):
            for _ in range(self.layers + 1):
                h = torch.cat([h, skips.pop()], dim=1)
                h = self.up_res[k](h, t)
                if self.up_attn[k] is not None:
                    h = self.up_attn[k](h, ctx)
                k += 1
            if i < 3:
                h = self.ups[i](F.interpolate(h, scale_factor=2, mode="nearest"))
        return self.conv_out(F.silu(self.norm_out(h)))


class TorchVAEDecoder(nn.Module):
    """AutoencoderKL decoder compute graph (latent → 8× upsampled RGB)."""

    def __init__(self, ch=(512, 512, 256, 128)):
        super().__init__()
        self.conv_in = nn.Conv2d(4, ch[0], 3, padding=1)
        self.mid1 = Resnet(ch[0], ch[0])
        self.mid2 = Resnet(ch[0], ch[0])
        self.blocks = nn.ModuleList()
        self.ups = nn.ModuleList()
        prev = ch[0]
        for i, c in enumerate(ch):
            for j in range(3):
                self.blocks.append(Resnet(prev if j == 0 else c, c))
            prev = c
            if i < 3:
                self.ups.append(nn.Conv2d(c, c, 3, padding=1))
        self.norm_out = nn.GroupNorm(32, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 3, 3, padding=1)

    def forward(self, z):
        t = torch.zeros(z.shape[0], 1280)
        h = self.conv_in(z)
        h = self.mid2(self.mid1(h, t), t)
        k = 0
        for i in range(4):
            for _ in range(3):
                h = self.blocks[k](h, t)
                k += 1
            if i < 3:
                h = self.ups[i](F.interpolate(h, scale_factor=2, mode="nearest"))
        return self.conv_out(F.silu(self.norm_out(h)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2,
                    help="timed UNet CFG steps (extrapolated to 25)")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--num-inference-steps", type=int, default=25,
                    help="the reference's step count (:74)")
    ap.add_argument("--threads", type=int, default=os.cpu_count(),
                    help="torch intra-op threads (default: all cores, so a "
                    "multi-core host measures its own realistic baseline)")
    args = ap.parse_args()

    torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    latent = args.image_size // 8
    unet = TorchSDUNet().eval()
    n_params = sum(p.numel() for p in unet.parameters())
    # exact architecture check: the real SD-v1-4 UNet2DConditionModel total
    assert n_params == 859_520_964, n_params

    x = torch.randn(2, 4, latent, latent)      # CFG pair for ONE image
    temb = torch.randn(2, 320)
    ctx = torch.randn(2, 77, 768)

    unet(x, temb, ctx)                          # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        unet(x, temb, ctx)
    step_s = (time.perf_counter() - t0) / args.steps

    vae = TorchVAEDecoder().eval()
    z = torch.randn(1, 4, latent, latent)
    vae(z)                                      # warmup
    t0 = time.perf_counter()
    img = vae(z)
    vae_s = time.perf_counter() - t0
    assert img.shape == (1, 3, args.image_size, args.image_size)

    per_image = args.num_inference_steps * step_s + vae_s
    result = {
        "torch_cpu_unet_cfg_step_sec": round(step_s, 3),
        "torch_cpu_vae_decode_sec": round(vae_s, 3),
        "torch_cpu_samples_per_sec": round(1.0 / per_image, 6),
        "unet_params": n_params,
        "image_size": args.image_size,
        "num_inference_steps": args.num_inference_steps,
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
