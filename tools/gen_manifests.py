"""Generate key/shape manifests of the reference's pretrained checkpoints.

The importers (polyp_tpu/models/importers.py, models/efficientnet.py) must
map **real** torch/diffusers state-dict keys — not keys invented in this
repo. These manifests pin that contract as JSON fixtures
(tests/fixtures/manifests/*.json) consumed by tests/test_manifests.py:

* `sd14_text_encoder.json` — generated from the ACTUAL installed
  `transformers.CLIPTextModel` with SD-v1-4's text-encoder config (the exact
  class the reference loads, train_with_lora_per_class.py:305).
* `sd14_unet.json` / `sd14_vae.json` — generated from an independent
  structural spec of diffusers' `UNet2DConditionModel` / `AutoencoderKL`
  state-dict layout (diffusers is not installed here). Each is validated
  against the published exact parameter totals of SD-v1-4 —
  859,520,964 (UNet) and 83,653,863 (VAE) — a strong check that the spec
  matches the real model (PolypGeneratorModel.py:17-22).
* `efficientnet_b0.json` — torchvision `efficientnet_b0` layout
  (IMAGENET1K_V1, PolypClassificationModel.py:8), validated against the
  published 5,288,548 trainable parameters.

Run: PYTHONPATH=. python tools/gen_manifests.py
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests/fixtures/manifests"


def n_params(man: dict[str, list[int]], trainable_only: bool = False) -> int:
    total = 0
    for k, shape in man.items():
        if trainable_only and ("running_" in k or "num_batches_tracked" in k):
            continue
        n = 1
        for d in shape:
            n *= d
        total += n
    return total


def save(name: str, man: dict[str, list[int]]) -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    with open(OUT / name, "w") as f:
        json.dump(dict(sorted(man.items())), f, indent=0)
    print(f"{name}: {len(man)} tensors, {n_params(man):,} params")


# ---------------------------------------------------------------------------
# CLIP text encoder — from the real transformers library
# ---------------------------------------------------------------------------

def clip_text_manifest() -> dict[str, list[int]]:
    from transformers import CLIPTextConfig, CLIPTextModel

    # SD-v1-4 text_encoder/config.json values (CLIP ViT-L/14 text tower)
    cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu")
    model = CLIPTextModel(cfg)
    return {k: list(v.shape) for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel (SD-v1 config) — structural spec
# ---------------------------------------------------------------------------

def unet_manifest() -> dict[str, list[int]]:
    man: dict[str, list[int]] = {}

    def conv(name, cout, cin, k):
        man[f"{name}.weight"] = [cout, cin, k, k]
        man[f"{name}.bias"] = [cout]

    def linear(name, cout, cin):
        man[f"{name}.weight"] = [cout, cin]
        man[f"{name}.bias"] = [cout]

    def norm(name, c):
        man[f"{name}.weight"] = [c]
        man[f"{name}.bias"] = [c]

    temb = 1280
    ctx = 768

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin, 3)
        linear(f"{p}.time_emb_proj", cout, temb)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def transformer(p, c):
        norm(f"{p}.norm", c)
        conv(f"{p}.proj_in", c, c, 1)  # SD-v1: conv projections
        b = f"{p}.transformer_blocks.0"
        for attn, kv in (("attn1", c), ("attn2", ctx)):
            man[f"{b}.{attn}.to_q.weight"] = [c, c]
            man[f"{b}.{attn}.to_k.weight"] = [c, kv]
            man[f"{b}.{attn}.to_v.weight"] = [c, kv]
            linear(f"{b}.{attn}.to_out.0", c, c)
        linear(f"{b}.ff.net.0.proj", 8 * c, c)  # GEGLU: 2×(4c)
        linear(f"{b}.ff.net.2", c, 4 * c)
        norm(f"{b}.norm1", c)
        norm(f"{b}.norm2", c)
        norm(f"{b}.norm3", c)
        conv(f"{p}.proj_out", c, c, 1)

    block_out = [320, 640, 1280, 1280]
    layers = 2

    conv("conv_in", block_out[0], 4, 3)
    linear("time_embedding.linear_1", temb, block_out[0])
    linear("time_embedding.linear_2", temb, temb)

    # down: CrossAttn×3 + plain; downsampler on all but the last block
    cin = block_out[0]
    for i, cout in enumerate(block_out):
        for j in range(layers):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
            if i < 3:
                transformer(f"down_blocks.{i}.attentions.{j}", cout)
        if i < 3:
            conv(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)
        cin = cout

    resnet("mid_block.resnets.0", block_out[-1], block_out[-1])
    transformer("mid_block.attentions.0", block_out[-1])
    resnet("mid_block.resnets.1", block_out[-1], block_out[-1])

    # up: plain + CrossAttn×3; 3 resnets each; skip-concat channel bookkeeping
    # per diffusers get_up_block (res_skip = in_ch on the last resnet)
    rev = list(reversed(block_out))             # [1280, 1280, 640, 320]
    prev_out = block_out[-1]
    for i, cout in enumerate(rev):
        in_ch = rev[min(i + 1, 3)]
        for j in range(layers + 1):
            res_skip = in_ch if j == layers else cout
            res_in = prev_out if j == 0 else cout
            resnet(f"up_blocks.{i}.resnets.{j}", res_in + res_skip, cout)
            if i > 0:
                transformer(f"up_blocks.{i}.attentions.{j}", cout)
        if i < 3:
            conv(f"up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)
        prev_out = cout

    norm("conv_norm_out", block_out[0])
    conv("conv_out", 4, block_out[0], 3)
    return man


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL (SD-v1 config) — structural spec
# ---------------------------------------------------------------------------

def vae_manifest() -> dict[str, list[int]]:
    man: dict[str, list[int]] = {}

    def conv(name, cout, cin, k):
        man[f"{name}.weight"] = [cout, cin, k, k]
        man[f"{name}.bias"] = [cout]

    def norm(name, c):
        man[f"{name}.weight"] = [c]
        man[f"{name}.bias"] = [c]

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin, 3)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def attention(p, c):
        norm(f"{p}.group_norm", c)
        for proj in ("to_q", "to_k", "to_v"):
            man[f"{p}.{proj}.weight"] = [c, c]
            man[f"{p}.{proj}.bias"] = [c]
        man[f"{p}.to_out.0.weight"] = [c, c]
        man[f"{p}.to_out.0.bias"] = [c]

    block_out = [128, 256, 512, 512]
    latent = 4

    # encoder: 2 resnets/block, downsample on all but last, double-latent out
    conv("encoder.conv_in", block_out[0], 3, 3)
    cin = block_out[0]
    for i, cout in enumerate(block_out):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout)
        if i < 3:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout, 3)
        cin = cout
    resnet("encoder.mid_block.resnets.0", cin, cin)
    attention("encoder.mid_block.attentions.0", cin)
    resnet("encoder.mid_block.resnets.1", cin, cin)
    norm("encoder.conv_norm_out", cin)
    conv("encoder.conv_out", 2 * latent, cin, 3)

    # decoder: 3 resnets/block over reversed channels, upsample on all but last
    conv("decoder.conv_in", block_out[-1], latent, 3)
    resnet("decoder.mid_block.resnets.0", block_out[-1], block_out[-1])
    attention("decoder.mid_block.attentions.0", block_out[-1])
    resnet("decoder.mid_block.resnets.1", block_out[-1], block_out[-1])
    rev = list(reversed(block_out))             # [512, 512, 256, 128]
    prev = rev[0]
    for i, cout in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else cout, cout)
        if i < 3:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout, 3)
        prev = cout
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", 3, rev[-1], 3)

    conv("quant_conv", 2 * latent, 2 * latent, 1)
    conv("post_quant_conv", latent, latent, 1)
    return man


# ---------------------------------------------------------------------------
# torchvision efficientnet_b0 — structural spec
# ---------------------------------------------------------------------------

def efficientnet_b0_manifest() -> dict[str, list[int]]:
    man: dict[str, list[int]] = {}

    def bn(name, c):
        man[f"{name}.weight"] = [c]
        man[f"{name}.bias"] = [c]
        man[f"{name}.running_mean"] = [c]
        man[f"{name}.running_var"] = [c]
        man[f"{name}.num_batches_tracked"] = []

    def convbn(prefix, cout, cin, k, groups=1):
        man[f"{prefix}.0.weight"] = [cout, cin // groups, k, k]
        bn(f"{prefix}.1", cout)

    # (expand, cin, cout, repeats, kernel) — B0 stage table
    stages = [(1, 32, 16, 1, 3), (6, 16, 24, 2, 3), (6, 24, 40, 2, 5),
              (6, 40, 80, 3, 3), (6, 80, 112, 3, 5), (6, 112, 192, 4, 5),
              (6, 192, 320, 1, 3)]

    convbn("features.0", 32, 3, 3)  # stem
    for s, (expand, cin, cout, repeats, k) in enumerate(stages, start=1):
        for b in range(repeats):
            cin_b = cin if b == 0 else cout
            exp_ch = cin_b * expand
            p = f"features.{s}.{b}.block"
            j = 0
            if expand != 1:
                convbn(f"{p}.{j}", exp_ch, cin_b, 1)
                j += 1
            convbn(f"{p}.{j}", exp_ch, exp_ch, k, groups=exp_ch)  # depthwise
            j += 1
            se = max(1, cin_b // 4)
            man[f"{p}.{j}.fc1.weight"] = [se, exp_ch, 1, 1]
            man[f"{p}.{j}.fc1.bias"] = [se]
            man[f"{p}.{j}.fc2.weight"] = [exp_ch, se, 1, 1]
            man[f"{p}.{j}.fc2.bias"] = [exp_ch]
            j += 1
            convbn(f"{p}.{j}", cout, exp_ch, 1)  # project
    convbn("features.8", 1280, 320, 1)  # head
    man["classifier.1.weight"] = [1000, 1280]
    man["classifier.1.bias"] = [1000]
    return man


def main() -> None:
    text = clip_text_manifest()
    assert n_params(text) == 123_060_480, n_params(text)
    save("sd14_text_encoder.json", text)

    unet = unet_manifest()
    assert n_params(unet) == 859_520_964, n_params(unet)
    save("sd14_unet.json", unet)

    vae = vae_manifest()
    assert n_params(vae) == 83_653_863, n_params(vae)
    save("sd14_vae.json", vae)

    eff = efficientnet_b0_manifest()
    assert n_params(eff, trainable_only=True) == 5_288_548, \
        n_params(eff, trainable_only=True)
    save("efficientnet_b0.json", eff)


if __name__ == "__main__":
    main()
