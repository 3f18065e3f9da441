"""Generation server: HTTP front-end over a diffusion sampler with
cross-request micro-batching.

The production/serving layer the reference lacks entirely (its only
interface is SLURM batch scripts, SURVEY §1 CLI/cluster layer). A tiny
stdlib HTTP server exposes the jitted sampling pipeline:

  POST /generate   {"prompt": str, "num_images": int≤max_batch, "seed": int,
                    "model": str?}   # routing key when serving several
                   → {"images": [base64 PNG, ...], "latency_s": float,
                      "model": str, "batched_samples": int}
  GET  /healthz    → {"status": "ok", "model": ..., "models": [...],
                      "warm": bool,
                      "stats": {requests, launches, coalesced_samples,
                                launches_by_model}}

Design — continuous micro-batching on an exclusive accelerator:

* Requests land on a queue; a single dispatcher thread owns the chip (it is
  exclusive — SURVEY §2). The dispatcher takes the oldest request, waits up
  to `batch_window_s` for more, and coalesces them into ONE device launch of
  up to `max_batch` samples, each sample carrying its own prompt embedding
  and its own PRNG key (StableDiffusionSampler.generate_batch). Under load
  the window never idles: the queue drains while the previous launch runs.
* Launch/readback pipelining (`pipeline_depth` ≥ 2, default 1 = OFF): JAX
  dispatch is asynchronous, so the dispatcher CAN hand a launch's
  device→host readback to a completion thread and immediately coalesce the
  next launch. MEASURED NEGATIVE on this host and left opt-in (the
  fused-kernel treatment): same-session A/B at 8 clients, distilled
  students, depth 1 = 12.36 samples/s vs depth 2 = 10.91 (-12%; base
  25-step path -3%) — on a 1-core host the completion thread's
  readback/conversion contends with the dispatcher's next-launch prep and
  the clients' PNG encodes for the one core, costing more than the overlap
  hides (BASELINE.md round-4 serving). Determinism is depth-independent
  (completion order = launch order; samples are pure functions of
  (prompt, seed, index)) and both depths are semantics-pinned by tests.
* Launches are padded to `max_batch` (pipeline.generate_batch pad_to), so
  every launch reuses ONE compiled executable regardless of how many
  requests coalesced — no shape-driven recompiles on the serving path.
* Determinism contract: sample j of a request is a pure function of
  (prompt, seed, j) — per-sample initial latents via the samplers' `init`
  hook — so a response is byte-identical whether the request ran alone or
  coalesced with others. Holds for the deterministic samplers (ddim η=0,
  dpmpp_2m, unipc — the SD serving default); the ancestral ddpm sampler
  draws shared per-step noise and does not make this guarantee.
* base64 PNGs keep the dependency surface at stdlib. For real deployments
  put any HTTP fan-in in front — the serving-critical parts are the
  resident compiled pipeline and the coalescing dispatcher, not the socket
  handling.
* Multi-model: one service can host several samplers (e.g. the three
  per-class distilled students, `polyp-serve --distilled-dir ...
  --distilled-class all`) behind one chip. The dispatcher coalesces only
  same-model requests and serves models in arrival order (FIFO by launch),
  so one model's burst cannot starve another's queued request.
* Admission control (bounded by default): at most `max_pending` requests may
  wait for a launch slot — request max_pending+1 is shed at the door with
  `ServiceOverloaded` (HTTP 429 + Retry-After) instead of joining an
  unbounded queue whose p99 degrades without limit (the round-4 overload
  datapoint: p99 = 21.7 s at 16 clients on an unbounded queue). An optional
  per-request `timeout_s` deadline covers the QUEUE WAIT: a request whose
  deadline passes before its launch is expired with `DeadlineExceeded`
  (HTTP 503) — once launched, device work is not cancellable and runs to
  completion. Shed/expired counts surface in /healthz stats.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Sequence

import jax
import numpy as np

from polyp_tpu.data.native import encode_png_or_pil
from polyp_tpu.pipeline import to_uint8
from polyp_tpu.utils.rng import key_for

# fn(prompts, keys) -> float images in [-1, 1], NHWC, len(prompts) rows.
# StableDiffusionSampler.generate_batch (partially applied with
# pad_to=max_batch) is the product implementation.
MultiPromptSampler = Callable[[Sequence[str], jax.Array], jax.Array]


def request_sample_key(seed: int, index: int) -> jax.Array:
    """Per-sample serving key: sample `index` of a request is keyed by
    fold_in(PRNGKey(seed), index) — a pure function of (seed, index), so the
    response is independent of coalescing, of num_images splits, and of the
    quota-generation contract (utils/rng.batch_seed_key), which stays
    reserved for the reference-parity top-up path."""
    return key_for(seed, index)


class ServiceOverloaded(RuntimeError):
    """Admission refused: `max_pending` requests already queued. Clients
    should back off and retry (HTTP 429)."""


class DeadlineExceeded(TimeoutError):
    """The request's `timeout_s` elapsed while it waited in the queue —
    it was never launched (HTTP 503). Launched work always completes."""


@dataclass
class _Request:
    prompt: str
    num_images: int
    seed: int
    model: str = ""                           # routing key (multi-model)
    deadline: float | None = None             # monotonic; queue-wait bound
    done: threading.Event = field(default_factory=threading.Event)
    images: np.ndarray | None = None          # uint8 [n,H,W,C]
    batched_samples: int = 0                  # launch size it rode in
    error: BaseException | None = None


class GenerationService:
    """Request-coalescing front end over one or several MultiPromptSamplers.

    One dispatcher thread owns the device; `generate` is safe to call from
    any number of threads (the HTTP server is threading).

    Multi-model serving: pass a dict {model_key: sampler} to host several
    models (e.g. the three per-class distilled students) behind one chip.
    Requests carry a `model` key (default: the first); the dispatcher
    coalesces only same-model requests into a launch and drains models in
    arrival order, so a burst on one model cannot starve another — each
    launch takes the OLDEST pending request plus whatever same-model
    requests fit."""

    def __init__(self, batch_sampler: MultiPromptSampler
                 | dict[str, MultiPromptSampler], max_batch: int = 8,
                 model_name: str = "polyp-sd", warm_prompt: str | None = None,
                 batch_window_s: float = 0.05, pipeline_depth: int = 1,
                 max_pending: int | None = 64,
                 default_timeout_s: float | None = None):
        if not isinstance(batch_sampler, dict):
            batch_sampler = {model_name: batch_sampler}
        if not batch_sampler:
            raise ValueError("need at least one sampler")
        self._samplers = dict(batch_sampler)
        self.default_model = next(iter(self._samplers))
        self.max_batch = max_batch
        self.model_name = model_name
        self.batch_window_s = batch_window_s
        # Admission control: at most `max_pending` requests admitted but not
        # yet launched (None = unbounded, the pre-round-5 behavior). The
        # bound is on REQUESTS waiting for a launch slot; in-flight device
        # work is bounded separately by `pipeline_depth`.
        self.max_pending = max_pending
        self.default_timeout_s = default_timeout_s
        self._pending_count = 0
        self._pending_lock = threading.Lock()
        self._queue: queue.Queue[_Request | None] = queue.Queue()
        self._warm = False
        self._closed = False
        self.stats = {"requests": 0, "launches": 0, "coalesced_samples": 0,
                      "shed": 0, "expired": 0,
                      "launches_by_model": {k: 0 for k in self._samplers}}
        # Launch/readback pipelining: depth ≥ 2 lets the dispatcher enqueue
        # launch N+1's device work while the completion thread blocks on
        # launch N's device→host transfer; the semaphore bounds in-flight
        # launches so the device queue cannot grow unbounded. Default 1
        # (strict serialization): the overlap measured NEGATIVE on a
        # 1-core host — see the module docstring's A/B numbers.
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._stats_lock = threading.Lock()
        self._inflight = threading.Semaphore(self.pipeline_depth)
        self._completions: queue.Queue[tuple | None] = queue.Queue()
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._completer.start()
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()
        if warm_prompt is not None:
            self.generate(warm_prompt, 1, seed=0)

    @property
    def models(self) -> list[str]:
        return list(self._samplers)

    # -- client side ------------------------------------------------------

    def generate(self, prompt: str, num_images: int, seed: int = 0,
                 model: str | None = None,
                 timeout_s: float | None = None) -> dict:
        if not 1 <= num_images <= self.max_batch:
            raise ValueError(f"num_images must be in [1, {self.max_batch}]")
        model = model or self.default_model
        if model not in self._samplers:
            raise ValueError(f"unknown model {model!r} "
                             f"(serving: {sorted(self._samplers)})")
        if self._closed:
            raise RuntimeError("service is closed")
        # Admission: shed at the door when max_pending requests already
        # wait for a launch slot — bounded queue wait beats unbounded p99.
        with self._pending_lock:
            if (self.max_pending is not None
                    and self._pending_count >= self.max_pending):
                self.stats["shed"] += 1
                raise ServiceOverloaded(
                    f"{self._pending_count} requests pending "
                    f"(max_pending={self.max_pending}); retry later")
            self._pending_count += 1
        t0 = time.perf_counter()
        timeout_s = self.default_timeout_s if timeout_s is None else timeout_s
        deadline = (time.monotonic() + timeout_s
                    if timeout_s is not None else None)
        req = _Request(prompt, int(num_images), int(seed), model,
                       deadline=deadline)
        self._queue.put(req)
        req.done.wait()
        if req.error is not None:
            raise req.error
        latency = time.perf_counter() - t0
        # Native libpng encode at zlib level 1 (data/native.py, PIL fallback):
        # PIL's default encode host-bound the measured 16-client scenario
        # (BASELINE.md round-4 serving); the payload is transient, so encode
        # speed wins over the ~20% size increase.
        payload = [base64.b64encode(encode_png_or_pil(img)).decode()
                   for img in req.images]
        return {"images": payload, "latency_s": round(latency, 3),
                "prompt": prompt, "seed": seed, "model": model,
                "batched_samples": req.batched_samples}

    @property
    def warm(self) -> bool:
        return self._warm

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._dispatcher.join(timeout=5)
        if not self._dispatcher.is_alive():
            # Safe to stop the completer: the dispatcher enqueues every
            # launched batch's completion tuple BEFORE exiting, so FIFO
            # ordering guarantees they all drain ahead of this sentinel.
            self._completions.put(None)
            self._completer.join(timeout=5)
        # else: a launch is still in flight past the join timeout (e.g. a
        # cold compile) — leave the completer running so its waiting
        # clients are still answered; enqueueing the sentinel now could
        # stop the completer BEFORE that batch's completion arrives,
        # stranding every caller blocked in generate(). Both threads are
        # daemons; process exit reaps them.

    # -- dispatcher side ---------------------------------------------------

    def _unpend(self, n: int) -> None:
        with self._pending_lock:
            self._pending_count -= n

    def _expire(self, req: _Request) -> bool:
        """True (and the request is answered with DeadlineExceeded) when its
        queue-wait deadline passed before a launch slot opened."""
        if req.deadline is None or time.monotonic() < req.deadline:
            return False
        with self._stats_lock:
            self.stats["expired"] += 1
        self._unpend(1)
        req.error = DeadlineExceeded(
            "request timed out in queue before reaching a launch slot")
        req.done.set()
        return True

    def _dispatch_loop(self) -> None:
        from collections import deque

        pending: deque[_Request] = deque()
        closing = False
        while True:
            if not pending:
                if closing:
                    return
                req = self._queue.get()
                if req is None:
                    return
                pending.append(req)
            head = pending.popleft()
            if self._expire(head):
                continue
            batch = [head]
            total = head.num_images
            deadline = time.monotonic() + self.batch_window_s
            while total < self.max_batch:
                # scoop already-pending same-model requests, FIFO;
                # expired requests are answered and dropped as they surface
                i = 0
                while i < len(pending) and total < self.max_batch:
                    r = pending[i]
                    if self._expire(r):
                        del pending[i]
                    elif (r.model == head.model
                            and total + r.num_images <= self.max_batch):
                        del pending[i]
                        batch.append(r)
                        total += r.num_images
                    else:
                        i += 1
                if total >= self.max_batch or closing:
                    break
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:          # close() while coalescing
                    closing = True       # flush this + all pending batches
                    continue
                pending.append(nxt)      # scooped next iteration if same model
            self._launch_batch(batch, total)

    def _launch_batch(self, batch: list[_Request], total: int) -> None:
        """Dispatch one device launch WITHOUT blocking on its result: JAX
        returns device futures immediately, so the dispatcher goes straight
        back to coalescing the next batch while `_complete_loop` pays the
        device→host readback of this one."""
        prompts: list[str] = []
        keys: list[jax.Array] = []
        for r in batch:
            for j in range(r.num_images):
                prompts.append(r.prompt)
                keys.append(request_sample_key(r.seed, j))
        self._inflight.acquire()  # bound launches in flight
        # launched: these requests no longer occupy admission slots —
        # in-flight device work is bounded by pipeline_depth, not max_pending
        self._unpend(len(batch))
        try:
            images_dev = self._samplers[batch[0].model](
                prompts, jax.numpy.stack(keys))
        except BaseException as e:  # trace/dispatch-time failure
            self._inflight.release()
            for r in batch:
                r.error = e
                r.done.set()
            return
        self._completions.put((batch, total, images_dev))

    def _complete_loop(self) -> None:
        while True:
            item = self._completions.get()
            if item is None:
                return
            batch, total, images_dev = item
            try:
                # blocking device→host transfer; device-side failures of the
                # async launch also surface here
                images = to_uint8(images_dev)
                self._warm = True
                with self._stats_lock:
                    self.stats["requests"] += len(batch)
                    self.stats["launches"] += 1
                    self.stats["launches_by_model"][batch[0].model] += 1
                    self.stats["coalesced_samples"] += (total
                                                        if len(batch) > 1
                                                        else 0)
                off = 0
                for r in batch:
                    r.images = images[off:off + r.num_images]
                    r.batched_samples = total
                    off += r.num_images
            except BaseException as e:  # propagate to every waiting request
                for r in batch:
                    r.error = e
            finally:
                self._inflight.release()
                for r in batch:
                    r.done.set()


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
                                 "models": service.models,
                                 "warm": service.warm,
                                 "max_pending": service.max_pending,
                                 "stats": dict(service.stats)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                timeout = req.get("timeout_s")
                result = service.generate(
                    req.get("prompt", ""), int(req.get("num_images", 1)),
                    int(req.get("seed", 0)), req.get("model"),
                    timeout_s=float(timeout) if timeout is not None else None)
                self._send(200, result)
            except ServiceOverloaded as e:
                # shed cleanly: bounded queue wait for admitted requests,
                # explicit backpressure for the rest
                self.send_response(429)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
            except DeadlineExceeded as e:
                self._send(503, {"error": str(e)})
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
    from pathlib import Path

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
    parser.add_argument("--batch_window_ms", type=float, default=50.0,
                        help="how long the dispatcher waits to coalesce "
                             "concurrent requests into one device launch")
    parser.add_argument("--pipeline_depth", type=int, default=1,
                        help="launches in flight: 2 overlaps launch N+1's "
                             "device compute with launch N's device->host "
                             "image readback — measured NEGATIVE on a "
                             "1-core host (-12%% distilled, BASELINE.md "
                             "round 4), default 1 = strict serialization")
    parser.add_argument("--max_pending", type=int, default=64,
                        help="admission bound: requests queued past this "
                             "are shed with HTTP 429 (0 = unbounded, the "
                             "pre-round-5 behavior)")
    parser.add_argument("--request_timeout_s", type=float, default=None,
                        help="default per-request queue-wait deadline; a "
                             "request not launched within this window gets "
                             "HTTP 503 (launched work always completes)")
    parser.add_argument("--quantize", default=None,
                        choices=["w8a8", "w8a8_static", "promoted"],
                        help="W8A8 UNet sampling (ops/quant.py); _static "
                             "calibrates per-timestep scales on first use; "
                             "'promoted' expands to the gate-passing config "
                             "(quant.promoted_config — w8a8_static + "
                             "fp_head 5 as of round 4)")
    parser.add_argument("--quant-fp-head", type=int, default=0,
                        help="with --quantize: first N sampling steps in "
                             "full precision (the gate-passing promoted "
                             "config is w8a8_static + fp_head 5 — "
                             "polyp_tpu/ops/quant_gate.json, BASELINE.md "
                             "round 4)")
    parser.add_argument("--quant-fp-tail", type=int, default=0,
                        help="with --quantize: final N steps full precision "
                             "(measured: no fidelity effect; kept for "
                             "experimentation)")
    parser.add_argument("--distilled-dir", default=None,
                        help="serve a polyp-distill-sd output instead of "
                             "the base stack: few-step trailing-grid DDIM, "
                             "guidance folded (cond-only 1x-batch UNet)")
    parser.add_argument("--distilled-class", default="all",
                        help="which distilled_{cls} student(s) to serve: a "
                             "class name, or 'all' to host every "
                             "distilled_* found (multi-model routing via "
                             "the request's \"model\" field)")
    parser.add_argument("--vae-decoder", default="full",
                        choices=["full", "tiny"],
                        help="'tiny' serves through a distilled "
                             "models/tiny_decoder.TinyDecoder instead of "
                             "the full AutoencoderKL decode — the few-step "
                             "Amdahl lever (polyp-distill-vae trains one)")
    parser.add_argument("--tiny-decoder-dir", default=None,
                        help="polyp-distill-vae output dir (default: "
                             "<distilled-dir>/models/tiny_decoder, else "
                             "./models/tiny_decoder)")
    args = parser.parse_args(argv)

    from polyp_tpu.ops.quant import resolve_quantize_arg
    qmode, qhead, qtail = resolve_quantize_arg(
        args.quantize, args.quant_fp_head, args.quant_fp_tail,
        distilled=args.distilled_dir is not None)
    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    config = DiffusionConfig(image_size=args.image_size,
                             num_inference_steps=args.steps,
                             quantize=qmode,
                             quant_fp_head=qhead,
                             quant_fp_tail=qtail)

    def as_batch_sampler(s):
        # pad_to=max_batch: every launch shares one compiled executable
        return lambda prompts, keys: s.generate_batch(prompts, keys,
                                                      pad_to=args.max_batch)

    decoder = None
    if args.vae_decoder == "tiny":
        from polyp_tpu.models.tiny_decoder import load_tiny_decoder
        tiny_dir = args.tiny_decoder_dir
        if tiny_dir is None:
            candidate = (Path(args.distilled_dir) / "models" / "tiny_decoder"
                         if args.distilled_dir else None)
            tiny_dir = (candidate if candidate and candidate.exists()
                        else "./models/tiny_decoder")
        module, dparams, dmeta = load_tiny_decoder(tiny_dir)
        decoder = (module, dparams)
        print(f"tiny decoder from {tiny_dir} "
              f"(trained rel_l2 vs full decode: {dmeta.get('rel_l2')})")

    if args.distilled_dir is not None:
        from polyp_tpu.cli.distill_sd import load_student_sampler
        models_dir = Path(args.distilled_dir) / "models"
        if args.distilled_class == "all":
            classes = sorted(p.name.split("distilled_", 1)[1]
                             for p in models_dir.glob("distilled_*")
                             if p.is_dir())
        else:
            classes = [args.distilled_class]
        if not classes:
            raise FileNotFoundError(f"no distilled_* under {models_dir}")
        samplers, warm_prompts = {}, {}
        for cls in classes:
            samplers[cls] = as_batch_sampler(
                load_student_sampler(stack, args.distilled_dir, cls, config,
                                     decoder=decoder))
            warm_prompts[cls] = json.loads(
                (models_dir / f"distilled_{cls}_meta.json")
                .read_text())["prompt"]
        model_name = f"polyp-sd-distilled[{','.join(classes)}]"
        admission = dict(max_pending=args.max_pending or None,
                         default_timeout_s=args.request_timeout_s)
        service = GenerationService(
            samplers, args.max_batch, model_name=model_name,
            batch_window_s=args.batch_window_ms / 1e3,
            pipeline_depth=args.pipeline_depth, **admission)
        for cls in classes:  # warm every student with its trained embedding
            service.generate(warm_prompts[cls], 1, seed=0, model=cls)
    else:
        sampler = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], config,
                               decoder=decoder)
        service = GenerationService(
            as_batch_sampler(sampler), args.max_batch,
            model_name="polyp-sd", warm_prompt="a colon polyp",
            batch_window_s=args.batch_window_ms / 1e3,
            pipeline_depth=args.pipeline_depth,
            max_pending=args.max_pending or None,
            default_timeout_s=args.request_timeout_s)
    server = serve(service, args.host, args.port)
    print(f"serving {service.models} on http://{args.host}:{args.port} "
          f"(warm)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        service.close()
        server.shutdown()


if __name__ == "__main__":
    main()
