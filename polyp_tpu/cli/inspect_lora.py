"""LoRA adapter introspection CLI — the get_lorarized_layers.py equivalent
(C15, generator_model/get_lorarized_layers.py:7-24): list the module paths
carrying lora_A/lora_B factors in a saved adapter, plus rank/param stats.

Usage: python -m polyp_tpu.cli.inspect_lora <adapter-checkpoint-dir>
"""

from __future__ import annotations

import argparse

from polyp_tpu.lora import count_lora_params, load_lora, lorarized_layers


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="orbax adapter checkpoint dir")
    args = parser.parse_args(argv)

    bundle = load_lora(args.path)
    adapter = bundle.get("unet_lora", bundle) if isinstance(bundle, dict) else bundle
    modules = lorarized_layers(adapter)
    print("Recovered LoRA target modules:")
    for module in modules:
        print(f"- {module}")
    ranks = set()

    def walk(node):
        if isinstance(node, dict):
            if "lora_A" in node:
                ranks.add(int(node["lora_A"].shape[-1]))
            for v in node.values():
                walk(v)

    walk(adapter)
    print(f"\n{len(modules)} adapted modules, rank(s) {sorted(ranks)}, "
          f"{count_lora_params(adapter):,} adapter params")
    extras = [k for k in bundle
              if k not in ("unet_lora",)] if isinstance(bundle, dict) else []
    if extras:
        print(f"bundle extras: {extras}")


if __name__ == "__main__":
    main()
