"""Generation server: HTTP front-end over a diffusion sampler.

The production/serving layer the reference lacks entirely (its only
interface is SLURM batch scripts, SURVEY §1 CLI/cluster layer). A tiny
stdlib HTTP server exposes the jitted sampling pipeline:

  POST /generate   {"prompt": str, "num_images": int≤max_batch, "seed": int}
                   → {"images": [base64 PNG, ...], "latency_s": float}
  GET  /healthz    → {"status": "ok", "model": ..., "warm": bool}

Design: the sampler is compiled once per (batch_size) at warmup; requests
are served single-flight (the chip is exclusive) from a lock; base64 PNGs
keep the dependency surface at stdlib. For real deployments put any HTTP
fan-in in front — the serving-critical part is the resident compiled
pipeline, not the socket handling.
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

from PIL import Image

from polyp_tpu.pipeline import to_uint8
from polyp_tpu.utils.rng import batch_seed_key


class GenerationService:
    """Wraps a prompt→BatchSampler factory with warmup and single-flight
    execution."""

    def __init__(self, sampler_for_prompt: Callable, max_batch: int = 8,
                 model_name: str = "polyp-sd", warm_prompt: str | None = None):
        self._factory = sampler_for_prompt
        self.max_batch = max_batch
        self.model_name = model_name
        self._lock = threading.Lock()
        self._warm = False
        if warm_prompt is not None:
            self.generate(warm_prompt, 1, seed=0)

    def generate(self, prompt: str, num_images: int, seed: int = 0) -> dict:
        if not 1 <= num_images <= self.max_batch:
            raise ValueError(f"num_images must be in [1, {self.max_batch}]")
        with self._lock:
            t0 = time.perf_counter()
            sampler = self._factory(prompt)
            images = to_uint8(sampler(num_images, batch_seed_key(seed, 0)))
            latency = time.perf_counter() - t0
            self._warm = True
        payload = []
        for img in images:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            payload.append(base64.b64encode(buf.getvalue()).decode())
        return {"images": payload, "latency_s": round(latency, 3),
                "prompt": prompt, "seed": seed}

    @property
    def warm(self) -> bool:
        return self._warm


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": service.model_name,
                                 "warm": service.warm})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                result = service.generate(
                    req.get("prompt", ""), int(req.get("num_images", 1)),
                    int(req.get("seed", 0)))
                self._send(200, result)
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # surface, don't crash the server
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(service: GenerationService, host: str = "127.0.0.1",
          port: int = 8787) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server


def main(argv=None):
    import argparse

    from polyp_tpu.cli.common import load_sd_stack
    from polyp_tpu.cli.sd_common import make_sampler
    from polyp_tpu.configs import DiffusionConfig

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--pretrained-dir", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--quantize", default=None,
                        choices=["w8a8", "w8a8_static"],
                        help="W8A8 UNet sampling (ops/quant.py); _static "
                             "calibrates per-timestep scales on first use")
    args = parser.parse_args(argv)

    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    config = DiffusionConfig(image_size=args.image_size,
                             num_inference_steps=args.steps,
                             quantize=args.quantize)
    sampler = make_sampler(stack, stack.unet_params,
                           stack.text_params["params"], config)
    service = GenerationService(sampler.for_prompt, args.max_batch,
                                warm_prompt="a colon polyp")
    server = serve(service, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} (warm)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
