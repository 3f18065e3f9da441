"""FID math + generation server."""

import json
import urllib.request
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from polyp_tpu.eval.fid import (
    FeatureExtractor,
    feature_statistics,
    fid_between_dirs,
    frechet_distance,
)


class TestFrechet:
    def test_identical_gaussians_zero(self):
        mu = np.array([1.0, 2.0])
        sigma = np.array([[2.0, 0.3], [0.3, 1.0]])
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)

    def test_mean_shift_only(self):
        mu1, mu2 = np.zeros(3), np.array([3.0, 4.0, 0.0])
        sigma = np.eye(3)
        # d² = |μ₁−μ₂|² when covariances match
        assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(25.0)

    def test_commuting_covariances_closed_form(self):
        # diagonal Σ: d² = Σ_i (√a_i − √b_i)²  (+0 mean term)
        a = np.diag([4.0, 9.0])
        b = np.diag([1.0, 1.0])
        mu = np.zeros(2)
        expected = (2 - 1) ** 2 + (3 - 1) ** 2
        assert frechet_distance(mu, a, mu, b) == pytest.approx(expected)

    def test_statistics_shapes(self):
        feats = np.random.default_rng(0).normal(size=(50, 8))
        mu, sigma = feature_statistics(feats)
        assert mu.shape == (8,) and sigma.shape == (8, 8)
        np.testing.assert_allclose(sigma, sigma.T)

    def test_sampled_gaussians_approximate_distance(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(4000, 4))
        b = rng.normal(size=(4000, 4)) + 2.0
        d = frechet_distance(*feature_statistics(a), *feature_statistics(b))
        assert d == pytest.approx(4 * 4.0, rel=0.15)  # |Δμ|² = 16


class TestClassFrechet:
    def test_per_class_distances(self, synth_polyp_dir, tmp_path):
        """class_frechet_distances: per-class real-vs-samples distances;
        copies of the real images score ≈0, shifted images score higher;
        classes without a samples dir or with <2 images are skipped."""
        from PIL import Image

        from polyp_tpu.eval.fid import FeatureExtractor, class_frechet_distances

        samples = tmp_path / "samples"
        img_dir = synth_polyp_dir["image_dir"]
        csv = synth_polyp_dir["csv"]
        # AD: exact copies of the real AD images; HP: heavily shifted
        import pandas as pd
        df = pd.read_csv(csv)
        for cls, shift in (("AD", 0), ("HP", 100)):
            d = samples / cls
            d.mkdir(parents=True)
            for i, image_id in enumerate(df[df.cls == cls].image_id):
                arr = np.asarray(Image.open(img_dir / f"{image_id}.tif"))
                arr = np.clip(arr.astype(np.int32) + shift, 0, 255)
                Image.fromarray(arr.astype(np.uint8)).save(d / f"{i}.png")
        # an interrupted run's empty samples dir must be skipped, not crash
        (samples / "ASS").mkdir()

        # cheap deterministic extractor — keeps the fast tier compile-free
        extractor = FeatureExtractor(
            fn=lambda u8: u8.reshape(len(u8), -1)[:, :32].astype(np.float32),
            name="flat32", calibrated=False)
        out = class_frechet_distances(img_dir, csv, samples,
                                      image_size=16, extractor=extractor)
        assert out["extractor"] == "flat32" and out["calibrated"] is False
        # ASS has only 1 real image and no samples dir → skipped
        assert set(out["per_class"]) == {"AD", "HP"}
        assert out["per_class"]["AD"] == pytest.approx(0.0, abs=1e-6)
        assert out["per_class"]["HP"] > 100.0

        # an empty dir for a class with >=2 real images (HP) exercises the
        # except-ValueError skip in class_frechet_distances (_load_dir
        # raises on zero images), unlike ASS above which short-circuits on
        # the <2-real-images guard before _load_dir runs
        import shutil
        samples2 = tmp_path / "samples_interrupted"
        (samples2 / "HP").mkdir(parents=True)
        shutil.copytree(samples / "AD", samples2 / "AD")
        out2 = class_frechet_distances(img_dir, csv, samples2,
                                       image_size=16, extractor=extractor)
        assert set(out2["per_class"]) == {"AD"}


class TestFidDirs:
    def test_same_dir_near_zero_distinct_dirs_positive(self, tmp_path):
        rng = np.random.default_rng(0)
        for name, offset in [("real", 0), ("fake", 120)]:
            d = tmp_path / name
            d.mkdir()
            for i in range(12):
                arr = np.clip(offset + rng.integers(0, 100, (24, 24, 3)),
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
        # cheap fixed random-projection extractor keeps this test fast
        proj = np.asarray(rng.normal(size=(24 * 24 * 3, 16)), np.float32)
        extractor = FeatureExtractor(
            lambda x: (x.reshape(len(x), -1).astype(np.float32) / 255.0) @ proj,
            name="proj", calibrated=False)
        same = fid_between_dirs(tmp_path / "real", tmp_path / "real",
                                extractor, image_size=24)
        diff = fid_between_dirs(tmp_path / "real", tmp_path / "fake",
                                extractor, image_size=24)
        assert same["frechet_distance"] == pytest.approx(0.0, abs=1e-6)
        assert diff["frechet_distance"] > same["frechet_distance"] + 1.0


def _fake_batch_sampler(prompts, keys):
    """MultiPromptSampler stand-in: each sample is a pure function of its
    own (prompt, key) — the same contract generate_batch provides."""
    outs = [jax.random.uniform(k, (8, 8, 3), minval=-1, maxval=1)
            + (0.1 if "polyp" in p else 0.0)
            for p, k in zip(prompts, list(keys))]
    return jnp.stack(outs)


class TestServer:
    @pytest.fixture(scope="class")
    def server(self):
        from polyp_tpu.serve import GenerationService, serve

        service = GenerationService(_fake_batch_sampler, max_batch=4,
                                    warm_prompt="warm")
        server = serve(service, port=0)
        yield f"http://127.0.0.1:{server.server_address[1]}"
        server.shutdown()
        service.close()

    def _post(self, url, payload):
        req = urllib.request.Request(
            url + "/generate", json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_healthz(self, server):
        with urllib.request.urlopen(server + "/healthz") as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok" and body["warm"]

    def test_generate_returns_decodable_pngs(self, server):
        import base64
        import io
        status, body = self._post(server, {"prompt": "a polyp",
                                           "num_images": 2, "seed": 5})
        assert status == 200
        assert len(body["images"]) == 2
        img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
        assert img.size == (8, 8)

    def test_generate_deterministic_per_seed(self, server):
        _, a = self._post(server, {"prompt": "x", "num_images": 1, "seed": 9})
        _, b = self._post(server, {"prompt": "x", "num_images": 1, "seed": 9})
        assert a["images"] == b["images"]

    def test_bad_batch_size_rejected(self, server):
        status, body = self._post(server, {"prompt": "x", "num_images": 99})
        assert status == 400
        assert "num_images" in body["error"]

    def test_unknown_route_404(self, server):
        status, _ = self._post(server.replace("/generate", "") + "",
                               {"prompt": "x"}) if False else (404, None)
        import urllib.error
        try:
            urllib.request.urlopen(server + "/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404


class TestCoalescing:
    """The micro-batching dispatcher: concurrent requests ride one device
    launch, results are independent of what they were batched with, and a
    request that doesn't fit heads the next launch instead of splitting."""

    def _service(self, max_batch=4, window=0.5, sampler=None):
        from polyp_tpu.serve import GenerationService

        calls = []

        def counting(prompts, keys):
            calls.append(list(prompts))
            return (sampler or _fake_batch_sampler)(prompts, keys)

        svc = GenerationService(counting, max_batch=max_batch,
                                batch_window_s=window)
        return svc, calls

    def _concurrent(self, svc, requests):
        """Submit requests from parallel threads; returns results in order."""
        import threading

        results = [None] * len(requests)
        errors = []

        def run(i, kwargs):
            try:
                results[i] = svc.generate(**kwargs)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        threads = [threading.Thread(target=run, args=(i, kw))
                   for i, kw in enumerate(requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors
        return results

    def test_concurrent_requests_share_one_launch(self):
        svc, calls = self._service()
        try:
            a, b = self._concurrent(svc, [
                dict(prompt="a polyp", num_images=1, seed=1),
                dict(prompt="another", num_images=1, seed=2),
            ])
            assert a["batched_samples"] == 2 and b["batched_samples"] == 2
            assert len(calls) == 1 and len(calls[0]) == 2
            assert svc.stats["launches"] == 1
            assert svc.stats["coalesced_samples"] == 2
        finally:
            svc.close()

    def test_result_independent_of_coalescing(self):
        svc, _ = self._service()
        try:
            solo = svc.generate("a polyp", 2, seed=7)
            a, _b = self._concurrent(svc, [
                dict(prompt="a polyp", num_images=2, seed=7),
                dict(prompt="noise", num_images=2, seed=3),
            ])
            assert a["batched_samples"] == 4
            assert solo["images"] == a["images"]
        finally:
            svc.close()

    def test_oversize_spill_heads_next_launch(self):
        svc, calls = self._service(max_batch=4)
        try:
            a, b = self._concurrent(svc, [
                dict(prompt="big", num_images=3, seed=1),
                dict(prompt="spill", num_images=2, seed=2),
            ])
            # 3+2 > 4: two launches, neither request split across launches
            assert len(calls) == 2
            assert sorted(len(c) for c in calls) == [2, 3]
            assert len(a["images"]) == 3 and len(b["images"]) == 2
        finally:
            svc.close()

    def test_window_zero_disables_coalescing(self):
        svc, calls = self._service(window=0.0)
        try:
            self._concurrent(svc, [
                dict(prompt="x", num_images=1, seed=1),
                dict(prompt="y", num_images=1, seed=2),
            ])
            assert len(calls) == 2
            assert svc.stats["coalesced_samples"] == 0
        finally:
            svc.close()

    def test_sampler_error_propagates(self):
        def boom(prompts, keys):
            raise RuntimeError("kernel on fire")

        svc, _ = self._service(sampler=boom)
        try:
            with pytest.raises(RuntimeError, match="kernel on fire"):
                svc.generate("x", 1)
        finally:
            svc.close()

    def test_per_sample_keys_decouple_num_images_split(self):
        # one request of 2 images == two requests of 1 image each, because
        # sample j of a request is keyed by (seed, j) — but DIFFERENT seeds
        # differ (no accidental key reuse across requests)
        svc, _ = self._service()
        try:
            both = svc.generate("p", 2, seed=11)
            first = svc.generate("p", 1, seed=11)
            assert both["images"][0] == first["images"][0]
            other = svc.generate("p", 1, seed=12)
            assert other["images"][0] != first["images"][0]
        finally:
            svc.close()


class TestPipelining:
    """Launch/readback pipelining (serve.py GenerationService
    pipeline_depth): at depth 2 the dispatcher launches request B while
    request A's device→host readback (to_uint8) is still in flight; at
    depth 1 the semaphore restores strict launch-then-read serialization.
    Readback is made observable by wrapping serve.to_uint8 with a sleep."""

    def _svc(self, monkeypatch, depth):
        import time

        from polyp_tpu import serve as serve_mod

        events = []
        real = serve_mod.to_uint8

        def slow_readback(x):
            events.append(("readback_start", time.perf_counter()))
            time.sleep(0.4)
            out = real(x)
            events.append(("readback_end", time.perf_counter()))
            return out

        monkeypatch.setattr(serve_mod, "to_uint8", slow_readback)

        def sampler(prompts, keys):
            events.append(("launch", time.perf_counter()))
            return _fake_batch_sampler(prompts, keys)

        # max_batch=1 + window 0: every request is its own launch, so the
        # event order isolates pipelining from coalescing
        svc = serve_mod.GenerationService(sampler, max_batch=1,
                                          batch_window_s=0.0,
                                          pipeline_depth=depth)
        return svc, events

    def _two_staggered(self, svc):
        import threading
        import time

        threads = [threading.Thread(target=svc.generate, args=("p", 1),
                                    kwargs={"seed": i}) for i in (1, 2)]
        threads[0].start()
        time.sleep(0.1)  # A is mid-readback (0.4 s) when B arrives
        threads[1].start()
        for t in threads:
            t.join(timeout=10)

    def test_depth2_launches_next_during_readback(self, monkeypatch):
        svc, events = self._svc(monkeypatch, depth=2)
        try:
            self._two_staggered(svc)
        finally:
            svc.close()
        launches = [ts for k, ts in events if k == "launch"]
        ends = [ts for k, ts in events if k == "readback_end"]
        assert len(launches) == 2 and len(ends) == 2
        # the overlap: B launched while A's readback was still sleeping
        assert launches[1] < ends[0]
        assert svc.stats["launches"] == 2

    def test_depth1_serializes_launch_and_readback(self, monkeypatch):
        svc, events = self._svc(monkeypatch, depth=1)
        try:
            self._two_staggered(svc)
        finally:
            svc.close()
        launches = [ts for k, ts in events if k == "launch"]
        ends = [ts for k, ts in events if k == "readback_end"]
        assert len(launches) == 2 and len(ends) == 2
        # depth 1 = the pre-pipelining dispatcher: B waits for A's readback
        assert launches[1] >= ends[0]

    def test_pipelined_results_stay_deterministic(self, monkeypatch):
        # same (prompt, seed) → same images whether the launch rode the
        # pipelined path alone or interleaved with another in-flight launch
        svc, _ = self._svc(monkeypatch, depth=2)
        try:
            solo = svc.generate("p", 1, seed=7)
            import threading
            got = {}

            def run(name, seed):
                got[name] = svc.generate("p", 1, seed=seed)

            a = threading.Thread(target=run, args=("a", 7))
            b = threading.Thread(target=run, args=("b", 3))
            a.start(); b.start()
            a.join(timeout=10); b.join(timeout=10)
        finally:
            svc.close()
        assert got["a"]["images"] == solo["images"]
        assert got["b"]["images"] != solo["images"]


class TestBenchServe:
    """tools/bench_serve.py load harness: stats accounting over the
    GenerationService (launch deltas exclude warm-up, occupancy is
    requests per launch within the timed window)."""

    def test_run_load_stats(self):
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from polyp_tpu.serve import GenerationService
        from tools.bench_serve import run_load

        svc = GenerationService(_fake_batch_sampler, max_batch=4,
                                warm_prompt="warm", batch_window_s=0.02)
        try:
            svc.generate("pre-existing traffic", 1, seed=0)  # pre-load launch
            stats = run_load(svc, clients=3, duration=1.0)
        finally:
            svc.close()
        assert stats["requests"] > 0
        assert stats["launches"] > 0
        # launch delta must not count the warm-up / pre-load launches
        assert stats["launches"] <= stats["requests"]
        assert stats["throughput_samples_per_s"] > 0
        assert 0 < stats["p50_s"] <= stats["p95_s"] <= stats["p99_s"]
        occupancy = stats["requests"] / stats["launches"]
        assert stats["mean_batch_occupancy"] == pytest.approx(occupancy,
                                                              abs=0.01)

    def test_percentile_edges(self):
        from tools.bench_serve import percentile

        assert percentile([1.0], 0.95) == 1.0
        vals = [float(i) for i in range(100)]
        assert percentile(vals, 0.0) == 0.0
        assert percentile(vals, 1.0) == 99.0
        assert abs(percentile(vals, 0.5) - 50.0) <= 1.0


class TestMultiModel:
    """Multi-model routing: same-model coalescing, cross-model isolation,
    FIFO fairness across models, per-model stats."""

    def _service(self, window=0.5, max_batch=4):
        from polyp_tpu.serve import GenerationService

        calls = []

        def tagged(tag):
            def sampler(prompts, keys):
                calls.append((tag, list(prompts)))
                return _fake_batch_sampler(prompts, keys) + (
                    0.01 if tag == "B" else 0.0)
            return sampler

        svc = GenerationService({"A": tagged("A"), "B": tagged("B")},
                                max_batch=max_batch, batch_window_s=window)
        return svc, calls

    def _concurrent(self, svc, requests):
        import threading

        results = [None] * len(requests)
        errors = []

        def run(i, kw):
            try:
                results[i] = svc.generate(**kw)
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=run, args=(i, kw))
                   for i, kw in enumerate(requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        return results

    def test_same_model_coalesces_cross_model_does_not(self):
        svc, calls = self._service()
        try:
            a1, a2, b1 = self._concurrent(svc, [
                dict(prompt="p", num_images=1, seed=1, model="A"),
                dict(prompt="q", num_images=1, seed=2, model="A"),
                dict(prompt="r", num_images=1, seed=3, model="B"),
            ])
            assert a1["model"] == "A" and b1["model"] == "B"
            # A-requests rode one launch; B got its own
            assert svc.stats["launches"] == 2
            assert svc.stats["launches_by_model"] == {"A": 1, "B": 1}
            tags = sorted(t for t, _ in calls)
            assert tags == ["A", "B"]
        finally:
            svc.close()

    def test_default_model_is_first_key(self):
        svc, calls = self._service(window=0.0)
        try:
            out = svc.generate("p", 1, seed=4)
            assert out["model"] == "A"
        finally:
            svc.close()

    def test_unknown_model_rejected(self):
        svc, _ = self._service(window=0.0)
        try:
            with pytest.raises(ValueError, match="unknown model"):
                svc.generate("p", 1, model="nope")
        finally:
            svc.close()

    def test_result_independent_of_cross_model_traffic(self):
        svc, _ = self._service()
        try:
            solo = svc.generate("p", 2, seed=7, model="B")
            mixed = self._concurrent(svc, [
                dict(prompt="p", num_images=2, seed=7, model="B"),
                dict(prompt="z", num_images=2, seed=8, model="A"),
            ])[0]
            assert solo["images"] == mixed["images"]
        finally:
            svc.close()

    def test_close_flushes_all_pending_models(self):
        # requests queued at close() time must still be answered
        svc, _ = self._service(window=0.2)
        import threading
        results = []
        t = threading.Thread(target=lambda: results.append(
            svc.generate("p", 1, seed=1, model="B")))
        t.start()
        import time as _t
        _t.sleep(0.05)  # B waiting inside the window
        svc.close()
        t.join(timeout=30)
        assert results and results[0]["model"] == "B"


class TestAdmissionControl:
    """Bounded admission (serve.py round 5): requests past `max_pending`
    shed with ServiceOverloaded, queue-wait deadlines expire with
    DeadlineExceeded, and both surface as 429/503 + stats — the measured
    alternative to the unbounded queue whose p99 degrades without limit."""

    def _blocking_service(self, max_pending, **kw):
        import threading

        from polyp_tpu.serve import GenerationService

        gate = threading.Event()
        started = threading.Event()

        def sampler(prompts, keys):
            started.set()
            assert gate.wait(timeout=30), "test gate never opened"
            return _fake_batch_sampler(prompts, keys)

        svc = GenerationService(sampler, max_batch=1, batch_window_s=0.0,
                                max_pending=max_pending, **kw)
        return svc, gate, started

    def _bg(self, svc, n, **kw):
        import threading

        outs, errs = [], []

        def run(seed):
            try:
                outs.append(svc.generate("p", 1, seed=seed, **kw))
            except Exception as e:
                errs.append(e)

        threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        return threads, outs, errs

    def test_shed_past_max_pending(self):
        from polyp_tpu.serve import ServiceOverloaded

        svc, gate, started = self._blocking_service(max_pending=2)
        try:
            # A launches (occupies the device, no longer pending) ...
            threads_a, outs_a, errs_a = self._bg(svc, 1)
            assert started.wait(timeout=10)
            # ... B and C fill the two admission slots ...
            threads_bc, outs_bc, errs_bc = self._bg(svc, 2)
            import time
            deadline = time.monotonic() + 5
            while svc._pending_count < 2 and time.monotonic() < deadline:
                time.sleep(0.01)
            # ... D is shed at the door, synchronously
            with pytest.raises(ServiceOverloaded, match="max_pending=2"):
                svc.generate("p", 1, seed=99)
            assert svc.stats["shed"] == 1
            gate.set()
            for t in threads_a + threads_bc:
                t.join(timeout=30)
            assert not errs_a and not errs_bc
            assert len(outs_a) + len(outs_bc) == 3  # admitted all complete
        finally:
            gate.set()
            svc.close()

    def test_unbounded_when_none(self):
        svc, gate, started = self._blocking_service(max_pending=None)
        try:
            threads, outs, errs = self._bg(svc, 6)
            assert started.wait(timeout=10)
            gate.set()
            for t in threads:
                t.join(timeout=30)
            assert not errs and len(outs) == 6
            assert svc.stats["shed"] == 0
        finally:
            gate.set()
            svc.close()

    def test_queued_request_expires_after_timeout(self):
        from polyp_tpu.serve import DeadlineExceeded

        svc, gate, started = self._blocking_service(max_pending=None)
        try:
            threads_a, outs_a, _ = self._bg(svc, 1)
            assert started.wait(timeout=10)
            # B waits behind A's launch with a 50 ms queue-wait deadline
            threads_b, outs_b, errs_b = self._bg(svc, 1, timeout_s=0.05)
            import time
            time.sleep(0.3)  # let B's deadline lapse while A blocks
            gate.set()
            for t in threads_a + threads_b:
                t.join(timeout=30)
            assert len(outs_a) == 1          # launched work completes
            assert not outs_b
            assert len(errs_b) == 1 and isinstance(errs_b[0], DeadlineExceeded)
            assert svc.stats["expired"] == 1
        finally:
            gate.set()
            svc.close()

    def test_no_deadline_no_expiry(self):
        svc, gate, started = self._blocking_service(max_pending=None)
        try:
            threads, outs, errs = self._bg(svc, 3)
            assert started.wait(timeout=10)
            import time
            time.sleep(0.2)
            gate.set()
            for t in threads:
                t.join(timeout=30)
            assert not errs and len(outs) == 3
            assert svc.stats["expired"] == 0
        finally:
            gate.set()
            svc.close()

    def test_http_429_and_stats(self):
        import threading
        import urllib.error

        from polyp_tpu.serve import GenerationService, serve

        gate = threading.Event()
        started = threading.Event()

        def sampler(prompts, keys):
            started.set()
            assert gate.wait(timeout=30)
            return _fake_batch_sampler(prompts, keys)

        service = GenerationService(sampler, max_batch=1,
                                    batch_window_s=0.0, max_pending=1)
        server = serve(service, port=0)
        url = f"http://127.0.0.1:{server.server_address[1]}"

        def post():
            req = urllib.request.Request(
                url + "/generate",
                json.dumps({"prompt": "p", "num_images": 1}).encode(),
                {"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                return resp.status

        try:
            t1 = threading.Thread(target=post)  # launches, blocks in sampler
            t1.start()
            assert started.wait(timeout=10)
            t2 = threading.Thread(target=post)  # fills the 1 admission slot
            t2.start()
            import time
            deadline = time.monotonic() + 5
            while service._pending_count < 1 and time.monotonic() < deadline:
                time.sleep(0.01)
            try:
                post()
                assert False, "expected HTTP 429"
            except urllib.error.HTTPError as e:
                assert e.code == 429
                assert e.headers.get("Retry-After") == "1"
                assert "max_pending" in json.loads(e.read())["error"]
            gate.set()
            t1.join(timeout=30)
            t2.join(timeout=30)
            with urllib.request.urlopen(url + "/healthz") as resp:
                body = json.loads(resp.read())
            assert body["max_pending"] == 1
            assert body["stats"]["shed"] == 1
        finally:
            gate.set()
            server.shutdown()
            service.close()
