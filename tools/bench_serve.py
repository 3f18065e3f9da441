"""Serving benchmark: closed-loop concurrent clients against the
micro-batching GenerationService (polyp_tpu/serve.py).

The reference has no serving story at all (SURVEY §1: its only interface
is SLURM batch scripts), so there is no baseline row to beat — this tool
establishes OUR serving numbers: sustained samples/sec and per-request
latency percentiles under concurrent load, and the coalescing win over a
solo-dispatch server (max_batch=1, the no-micro-batching strawman every
request-at-a-time server is).

Method: `--clients N` threads each run a closed loop (issue a 1-image
request, wait for the response, repeat) for `--duration` seconds against
the in-process GenerationService — the dispatcher, the padding contract,
and the compiled pipeline are exactly the production path; the HTTP socket
layer is skipped by default because it is stdlib pass-through (opt in with
--http to include it). Each request gets a distinct (seed, prompt-index)
so responses exercise per-sample keys and several prompt embeddings.

Outputs one JSON line per configuration:

  {"mode": "coalesced"|"solo", "clients": N, "throughput_samples_per_s": ...,
   "p50_s": ..., "p95_s": ..., "mean_batch_occupancy": ..., ...}

Chip run (exclusive TPU, ~2 min each config):

    python tools/bench_serve.py --image_size 256 --steps 25 --clients 8

CPU smoke (tiny stack, seconds):

    JAX_PLATFORMS=cpu python tools/bench_serve.py --tiny --image_size 64 \
        --steps 2 --clients 4 --duration 6

Reading the CPU smoke: coalescing LOSES on CPU (speedup ~0.3×) because CPU
compute scales linearly with the padded batch — a pad_to=8 launch costs 8×
a solo launch even when only 4 rows are real. That is an artifact of the
smoke platform, not the design: on the v5e the sampler is launch-bound at
these batch sizes (BASELINE.md batch sweeps: batch 8 ≈ batch 1 per-launch
cost), so a coalesced launch amortizes a full device pass across up to
max_batch requests. The chip run is the measurement of record.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from polyp_tpu.cli.common import load_sd_stack            # noqa: E402
from polyp_tpu.cli.sd_common import make_sampler          # noqa: E402
from polyp_tpu.configs import DiffusionConfig             # noqa: E402
from polyp_tpu.serve import GenerationService             # noqa: E402

PROMPTS = [
    "a realistic photo of colon polyp",
    "a realistic photo of adenomatous colon polyp",
    "a realistic photo of hyperplastic colon polyp",
    "a realistic photo of sessile serrated colon polyp",
]


def percentile(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return float("nan")
    idx = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[idx]


def _closed_loop(duration: float,
                 clients: list[tuple[str, "object"]]) -> tuple[float, dict]:
    """The shared closed-loop client harness: one thread per (key, issue)
    pair, each issuing back-to-back requests for `duration` seconds via
    `issue(cid, n)`. Returns (elapsed, {key: sorted latencies}) — the
    single- and multi-model load benches shape their own stats on top."""
    buckets: dict[str, list[float]] = {}
    for key, _ in clients:
        buckets.setdefault(key, [])
    lock = threading.Lock()
    stop = time.monotonic() + duration

    def run(cid: int, key: str, issue) -> None:
        n = 0
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            issue(cid, n)
            dt = time.perf_counter() - t0
            n += 1
            with lock:
                buckets[key].append(dt)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=run, args=(c, k, f))
               for c, (k, f) in enumerate(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    for lats in buckets.values():
        lats.sort()
    return elapsed, buckets


def run_multimodel_load(service: GenerationService, duration: float,
                        assignments: list[tuple[str, str]]) -> dict:
    """Closed-loop load with per-client (model, prompt) routing — the
    multi-model fairness measurement: per-model throughput and latency
    percentiles under whatever client mix `assignments` encodes (e.g. a
    burst: most clients on one model, one client each on the others)."""
    launches_before = dict(service.stats["launches_by_model"])
    clients = [(m, lambda cid, n, m=m, p=p: service.generate(
                    p, 1, seed=cid * 100003 + n, model=m))
               for m, p in assignments]
    elapsed, per_model = _closed_loop(duration, clients)
    out: dict = {"duration_s": round(elapsed, 2),
                 "clients_by_model": {}, "per_model": {}}
    for m, _ in assignments:
        out["clients_by_model"][m] = out["clients_by_model"].get(m, 0) + 1
    total = 0
    for m, lats in per_model.items():
        total += len(lats)
        out["per_model"][m] = {
            "requests": len(lats),
            "throughput_samples_per_s": round(len(lats) / elapsed, 3),
            "p50_s": round(percentile(lats, 0.50), 3),
            "p95_s": round(percentile(lats, 0.95), 3),
            "launches": service.stats["launches_by_model"][m]
                        - launches_before.get(m, 0),
        }
    out["throughput_samples_per_s"] = round(total / elapsed, 3)
    return out


def run_load(service: GenerationService, clients: int, duration: float,
             http_port: int | None = None,
             prompts: list[str] = PROMPTS) -> dict:
    """Closed-loop load: each client thread issues 1-image requests
    back-to-back for `duration` seconds. Returns latency/throughput stats."""
    launches_before = service.stats["launches"]
    if http_port is not None:
        import base64  # noqa: F401  (responses carry base64 PNGs)
        import http.client

        def issue(prompt: str, seed: int) -> None:
            conn = http.client.HTTPConnection("127.0.0.1", http_port)
            body = json.dumps({"prompt": prompt, "num_images": 1,
                               "seed": seed})
            conn.request("POST", "/generate", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            payload = json.loads(resp.read())
            conn.close()
            if resp.status != 200:
                raise RuntimeError(payload.get("error", "request failed"))
    else:
        def issue(prompt: str, seed: int) -> None:
            service.generate(prompt, 1, seed=seed)

    spec = [("all", lambda cid, n: issue(prompts[(cid + n) % len(prompts)],
                                         seed=cid * 100003 + n))
            ] * clients
    elapsed, buckets = _closed_loop(duration, spec)
    latencies = buckets["all"]
    launches = max(1, service.stats["launches"] - launches_before)
    return {
        "clients": clients,
        "duration_s": round(elapsed, 2),
        "requests": len(latencies),
        "throughput_samples_per_s": round(len(latencies) / elapsed, 3),
        "p50_s": round(percentile(latencies, 0.50), 3),
        "p95_s": round(percentile(latencies, 0.95), 3),
        "p99_s": round(percentile(latencies, 0.99), 3),
        "launches": launches,
        "mean_batch_occupancy": round(len(latencies) / launches, 2),
    }


def run_overload(args) -> None:
    """Overload scenario: OPEN-LOOP arrivals at `--arrival_rate` req/s
    (> capacity) against bounded vs unbounded admission.

    Open loop is the case admission control exists for: arrivals do not
    wait for completions, so an unbounded queue grows as (rate-capacity)*t
    and the queue-wait percentile grows with it without limit, while a
    bounded queue sheds the excess (429, no retry — open-loop drops) and
    keeps every ACCEPTED request's latency near max_pending/capacity.
    (A closed-loop harness cannot show this: N blocking clients self-limit
    the queue to N — measured on-chip: at 32 closed-loop clients the
    unbounded queue's p99 was fine at 4.1 s and shedding only added retry
    latency. That measurement motivated this open-loop harness.)

    Latency is measured from the SCHEDULED arrival time, so worker-pool
    scheduling jitter does not hide queue growth."""
    from polyp_tpu.serve import ServiceOverloaded

    batch_sampler = build_batch_sampler(args, args.max_batch)
    n_requests = int(args.arrival_rate * args.duration)
    for bound in (args.max_pending, None):
        service = GenerationService(
            batch_sampler, max_batch=args.max_batch,
            warm_prompt=PROMPTS[0],
            batch_window_s=args.batch_window_ms / 1e3,
            max_pending=bound)
        lats: list[float] = []
        shed = [0]
        lock = threading.Lock()
        t0 = time.perf_counter() + 0.5

        def worker(i: int) -> None:
            sched = t0 + i / args.arrival_rate
            delay = sched - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            try:
                service.generate(PROMPTS[i % len(PROMPTS)], 1, seed=i)
                with lock:
                    lats.append(time.perf_counter() - sched)
            except ServiceOverloaded:
                with lock:
                    shed[0] += 1

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(n_requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        lats.sort()
        print(json.dumps({
            "scenario": "overload_open_loop",
            "max_pending": bound,
            "arrival_rate_per_s": args.arrival_rate,
            "duration_s": args.duration,
            "offered": n_requests,
            "accepted": len(lats),
            "shed": shed[0],
            "goodput_samples_per_s": round(len(lats) / args.duration, 3),
            "p50_s": round(percentile(lats, 0.50), 3),
            "p95_s": round(percentile(lats, 0.95), 3),
            "p99_s": round(percentile(lats, 0.99), 3),
            "max_s": round(lats[-1], 3) if lats else None,
        }))
        service.close()


def build_batch_sampler(args, max_batch: int):
    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    config = DiffusionConfig(image_size=args.image_size,
                             num_inference_steps=args.steps,
                             quantize=args.quantize,
                             quant_fp_head=args.quant_fp_head,
                             quant_fp_tail=args.quant_fp_tail)
    decoder = None
    if getattr(args, "vae_decoder", "full") == "tiny":
        from polyp_tpu.models.tiny_decoder import load_tiny_decoder
        module, dparams, _ = load_tiny_decoder(
            args.tiny_decoder_dir or "./models/tiny_decoder")
        decoder = (module, dparams)
    if args.distilled_dir is not None:
        # distilled-student serving: few-step trailing DDIM, folded
        # guidance (cond-only 1× batch) — the step-count × CFG-halving
        # serving speedup is exactly what this mode measures vs the base
        from polyp_tpu.cli.distill_sd import load_student_sampler
        sampler = load_student_sampler(stack, args.distilled_dir,
                                       args.distilled_class, config,
                                       decoder=decoder)
    else:
        sampler = make_sampler(stack, stack.unet_params,
                               stack.text_params["params"], config,
                               decoder=decoder)

    def batch_sampler(prompts, keys):
        return sampler.generate_batch(prompts, keys, pad_to=max_batch)

    return batch_sampler


def run_multimodel_bench(args) -> None:
    """Multi-model distilled serving: host every distilled_{cls} student
    behind one chip (serve.py multi-model routing) and measure (a) a mixed
    even load and (b) a BURST on one model with single clients on the
    others — the fairness scenario: the dispatcher drains models in
    arrival order, so the burst must not starve the quiet models."""
    from pathlib import Path

    from polyp_tpu.cli.distill_sd import load_student_sampler

    stack = load_sd_stack(args.pretrained_dir, tiny=args.tiny)
    config = DiffusionConfig(image_size=args.image_size,
                             num_inference_steps=args.steps,
                             quantize=args.quantize,
                             quant_fp_head=args.quant_fp_head,
                             quant_fp_tail=args.quant_fp_tail)
    models_dir = Path(args.distilled_dir) / "models"
    classes = sorted(p.name.split("distilled_", 1)[1]
                     for p in models_dir.glob("distilled_*") if p.is_dir())
    if not classes:
        raise FileNotFoundError(f"no distilled_* under {models_dir}")
    samplers, prompts_by = {}, {}
    for cls in classes:
        print(f"# loading student {cls}", file=sys.stderr)
        s = load_student_sampler(stack, args.distilled_dir, cls, config)
        samplers[cls] = (lambda prompts, keys, _s=s:
                         _s.generate_batch(prompts, keys,
                                           pad_to=args.max_batch))
        prompts_by[cls] = json.loads(
            (models_dir / f"distilled_{cls}_meta.json").read_text())["prompt"]
    service = GenerationService(samplers, args.max_batch,
                                batch_window_s=args.batch_window_ms / 1e3,
                                pipeline_depth=args.pipeline_depth)
    try:
        for cls in classes:  # compile+warm each student outside the window
            service.generate(prompts_by[cls], 1, seed=0, model=cls)

        mixed = [(classes[i % len(classes)],
                  prompts_by[classes[i % len(classes)]])
                 for i in range(args.clients)]
        stats = run_multimodel_load(service, args.duration, mixed)
        stats["scenario"] = "mixed"
        print(json.dumps(stats))

        burst_n = max(args.clients - (len(classes) - 1), 1)
        burst = ([(classes[0], prompts_by[classes[0]])] * burst_n
                 + [(c, prompts_by[c]) for c in classes[1:]])
        stats = run_multimodel_load(service, args.duration, burst)
        stats["scenario"] = f"burst:{classes[0]}x{burst_n}"
        print(json.dumps(stats))
    finally:
        # a mid-load device error must still stop the dispatcher/completer
        # threads — the chip is exclusive and a live service keeps it
        service.close()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pretrained-dir", default=None)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--duration", type=float, default=60.0)
    parser.add_argument("--batch_window_ms", type=float, default=50.0)
    parser.add_argument("--pipeline_depth", type=int, default=1,
                        help="launches in flight (GenerationService): 2 "
                             "overlaps compute with image readback — "
                             "measured NEGATIVE on a 1-core host "
                             "(BASELINE.md round 4); default 1 = serial")
    parser.add_argument("--quantize", default=None,
                        choices=["w8a8", "w8a8_static", "promoted"])
    parser.add_argument("--quant-fp-head", type=int, default=0,
                        help="with --quantize: first N steps full precision"
                             " (promoted gate-passing config: w8a8_static"
                             " + fp_head 5)")
    parser.add_argument("--quant-fp-tail", type=int, default=0)
    parser.add_argument("--distilled-dir", default=None,
                        help="bench a polyp-distill-sd student instead of "
                             "the base sampler")
    parser.add_argument("--distilled-class", default="AD")
    parser.add_argument("--http", action="store_true",
                        help="route requests through the HTTP layer too")
    parser.add_argument("--skip_solo", action="store_true",
                        help="skip the max_batch=1 no-coalescing baseline")
    parser.add_argument("--overload", action="store_true",
                        help="overload scenario: open-loop arrivals at "
                             "--arrival_rate > capacity, bounded "
                             "(max_pending) vs unbounded queue — shed "
                             "counts and accepted-request percentiles "
                             "(run_overload)")
    parser.add_argument("--arrival_rate", type=float, default=16.0,
                        help="open-loop offered load for --overload, req/s")
    parser.add_argument("--max_pending", type=int, default=16,
                        help="admission bound for --overload's bounded run")
    parser.add_argument("--vae-decoder", default="full",
                        choices=["full", "tiny"], dest="vae_decoder",
                        help="'tiny' serves through the distilled "
                             "TinyDecoder (polyp-distill-vae output)")
    parser.add_argument("--tiny-decoder-dir", default=None)
    args = parser.parse_args(argv)

    # expand --quantize promoted into the concrete gate-passing config
    # (quant.promoted_config) before any stack is built
    from polyp_tpu.ops.quant import resolve_quantize_arg
    args.quantize, args.quant_fp_head, args.quant_fp_tail = \
        resolve_quantize_arg(args.quantize, args.quant_fp_head,
                             args.quant_fp_tail,
                             distilled=args.distilled_dir is not None)

    if args.overload:
        return run_overload(args)

    if args.distilled_dir is not None and args.distilled_class == "all":
        return run_multimodel_bench(args)

    prompts = PROMPTS
    if args.distilled_dir is not None:
        from pathlib import Path
        meta = json.loads(
            (Path(args.distilled_dir) / "models" /
             f"distilled_{args.distilled_class}_meta.json").read_text())
        prompts = [meta["prompt"]]  # the embedding the student trained on
    results = []
    modes = [("coalesced", args.max_batch)]
    if not args.skip_solo:
        modes.append(("solo", 1))
    for mode, max_batch in modes:
        print(f"# {mode}: building stack (max_batch={max_batch})",
              file=sys.stderr)
        batch_sampler = build_batch_sampler(args, max_batch)
        service = GenerationService(
            batch_sampler, max_batch=max_batch,
            warm_prompt=prompts[0],
            batch_window_s=args.batch_window_ms / 1e3,
            pipeline_depth=args.pipeline_depth)
        server = None
        port = None
        if args.http:
            from polyp_tpu.serve import serve
            server = serve(service, port=0)
            port = server.server_address[1]
        # warm each distinct prompt embedding outside the timed window
        for p in prompts:
            service.generate(p, 1, seed=0)
        clients = args.clients if mode == "coalesced" else min(
            args.clients, 2)  # solo drains serially; 2 keeps it saturated
        stats = run_load(service, clients, args.duration, http_port=port,
                         prompts=prompts)
        stats["mode"] = mode
        stats["max_batch"] = max_batch
        stats["image_size"] = args.image_size
        stats["steps"] = args.steps
        stats["pipeline_depth"] = args.pipeline_depth
        stats["quantize"] = args.quantize
        if args.quant_fp_head or args.quant_fp_tail:
            stats["quant_fp_head"] = args.quant_fp_head
            stats["quant_fp_tail"] = args.quant_fp_tail
        if args.distilled_dir is not None:
            stats["distilled"] = args.distilled_class
        results.append(stats)
        print(json.dumps(stats))
        if server is not None:
            server.shutdown()
        service.close()
    if len(results) == 2:
        speedup = (results[0]["throughput_samples_per_s"] /
                   max(results[1]["throughput_samples_per_s"], 1e-9))
        print(json.dumps({"coalescing_speedup": round(speedup, 2)}))


if __name__ == "__main__":
    main()
